"""SFT/DPO finetuning (C44 trainer capability): chatml mask semantics vs the
reference's preprocess_qwen rules, masked-CE learning, DPO math oracle +
preference learning on a tiny qwen2."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tspo_tpu.models.llava_video import IMAGE_TOKEN_INDEX
from tspo_tpu.models.qwen2 import Qwen2Config, embed_tokens, init_qwen2_params
from tspo_tpu.train.finetune import (
    IGNORE_INDEX,
    ChatMLSpecials,
    completion_logprob,
    dpo_loss,
    make_dpo_step,
    make_sft_step,
    preprocess_chatml,
    sft_loss,
    splice_video_labels,
)

SP = ChatMLSpecials(im_start=500, im_end=501, newline=198)


def toy_encode(text):
    # deterministic toy tokenizer: one id per character, offset out of specials
    return [2 + (ord(c) % 400) for c in text]


def test_preprocess_chatml_mask_semantics():
    convs = [{"from": "human", "value": "hi"},
             {"from": "gpt", "value": "yo"}]
    ids, labels = preprocess_chatml(convs, toy_encode, SP,
                                    system_message="sys")
    assert len(ids) == len(labels)
    sys_len = 1 + len(toy_encode("system\nsys")) + 2
    user_len = 1 + len(toy_encode("user\nhi")) + 2
    # assistant turn fully supervised
    assert labels[sys_len + user_len:] == ids[sys_len + user_len:]
    # user/system content masked...
    content = labels[:sys_len + user_len]
    masked = [l for l in content if l == IGNORE_INDEX]
    # ...except the reference's always-unmasked specials (im_start/im_end/\n)
    special_positions = [i for i, t in enumerate(ids[:sys_len + user_len])
                         if t in (SP.im_start, SP.im_end, SP.newline)]
    for i in special_positions:
        assert labels[i] == ids[i]
    assert len(masked) == sys_len + user_len - len(special_positions)


def test_preprocess_drops_leading_non_user_and_rewrites_image():
    convs = [{"from": "gpt", "value": "stale"},
             {"from": "human", "value": "Q"},
             {"from": "gpt", "value": "A"}]
    ids, labels = preprocess_chatml(convs, toy_encode, SP)
    flat = "".join(map(chr, range(0)))  # noop; just assert stale dropped:
    assert len(ids) < len(preprocess_chatml(
        [{"from": "human", "value": "Q"}] + convs, toy_encode, SP)[0])

    img_id = 999

    def enc(text):
        return [img_id if w == "<image>" else 7 for w in text.split()]

    ids2, _ = preprocess_chatml([{"from": "human", "value": "<image> x"},
                                 {"from": "gpt", "value": "y"}],
                                enc, SP, image_token_id=img_id)
    assert IMAGE_TOKEN_INDEX in ids2 and img_id not in ids2


def test_splice_video_labels():
    labels = [1, 2, IGNORE_INDEX, 4]
    out = splice_video_labels(labels, 3, img_pos=2)
    assert out.tolist() == [1, 2, IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 4]


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = Qwen2Config.tiny()
    params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return cfg, params


def _batch(cfg, params, ids, labels):
    ids = jnp.asarray(ids)[None]
    emb = embed_tokens(params, ids)
    return emb, jnp.asarray(labels)[None], jnp.ones(ids.shape, bool)


def test_sft_loss_ignores_masked_positions(tiny_lm):
    cfg, params = tiny_lm
    ids = [5, 6, 7, 8, 9]
    all_masked = [IGNORE_INDEX] * 5
    emb, lab, val = _batch(cfg, params, ids, all_masked)
    assert float(sft_loss(params, emb, lab, val, cfg)) == 0.0
    # supervising only the last token gives a positive CE
    lab1 = [IGNORE_INDEX] * 4 + [9]
    emb1, lab1, val1 = _batch(cfg, params, ids, lab1)
    assert float(sft_loss(params, emb1, lab1, val1, cfg)) > 0.0


def test_sft_learns_supervised_answer(tiny_lm):
    cfg, params = tiny_lm
    opt = optax.adam(3e-3)
    step = make_sft_step(opt, cfg)
    ids = [5, 6, 7, 3, 3, 3]
    labels = [IGNORE_INDEX] * 3 + [3, 3, 3]
    emb, lab, val = _batch(cfg, params, ids, labels)
    state = opt.init(params)
    p = params
    first = None
    for i in range(60):
        p, state, loss = step(p, state, emb, lab, val)
        first = first if first is not None else float(loss)
    assert float(loss) < 0.2 * first


def test_dpo_loss_oracle(tiny_lm):
    cfg, params = tiny_lm
    ids_c = [5, 6, 7, 8]
    ids_r = [5, 6, 9, 9]
    labels = [IGNORE_INDEX, IGNORE_INDEX] + ids_c[2:]
    chosen = _batch(cfg, params, ids_c, labels)
    rejected = _batch(cfg, params, ids_r,
                      [IGNORE_INDEX, IGNORE_INDEX] + ids_r[2:])
    # policy == ref  =>  logits 0  =>  loss = log 2, accuracy well-defined
    loss, metrics = dpo_loss(params, params, chosen, rejected, cfg, beta=0.1)
    assert abs(float(loss) - float(np.log(2))) < 1e-5
    assert float(metrics["rewards_chosen"]) == 0.0
    # formula oracle against completion_logprob
    pc = completion_logprob(params, *chosen, cfg)
    pr = completion_logprob(params, *rejected, cfg)
    p2 = jax.tree.map(lambda x: x * 1.01 if x.ndim >= 2 else x, params)
    loss2, _ = dpo_loss(p2, params, chosen, rejected, cfg, beta=0.1)
    qc = completion_logprob(p2, *chosen, cfg)
    qr = completion_logprob(p2, *rejected, cfg)
    delta = float(qc[0] - pc[0]) - float(qr[0] - pr[0])
    want = -np.log(1 / (1 + np.exp(-0.1 * delta)))
    assert abs(float(loss2) - want) < 1e-4


def test_dpo_learns_preference(tiny_lm):
    cfg, params = tiny_lm
    opt = optax.adam(1e-3)
    step = make_dpo_step(opt, cfg, beta=0.5)
    ids_c = [5, 6, 7, 8]
    ids_r = [5, 6, 9, 9]
    chosen = _batch(cfg, params, ids_c,
                    [IGNORE_INDEX, IGNORE_INDEX] + ids_c[2:])
    rejected = _batch(cfg, params, ids_r,
                      [IGNORE_INDEX, IGNORE_INDEX] + ids_r[2:])
    p, state = params, opt.init(params)
    for _ in range(30):
        p, state, loss, metrics = step(p, params, state, chosen, rejected)
    assert float(metrics["rewards_chosen"]) > float(metrics["rewards_rejected"])
    assert float(loss) < float(np.log(2))


def test_losses_differentiable_past_flash_threshold(monkeypatch):
    """Length buckets >= 512 cross qwen2_forward's flash threshold; on TPU
    the "auto" impl picks the Pallas kernel, which has NO differentiation
    rule — sft_loss/completion_logprob must pin flash_impl="jax".  Simulate
    the TPU dispatch decision and assert the kernel is never reached while
    grads still flow."""
    import dataclasses

    import tspo_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def boom(*a, **k):
        raise AssertionError("Pallas kernel reached from a training loss")

    monkeypatch.setattr(pa, "pallas_flash_attention", boom)
    # distinct cfg -> fresh trace under the patched backend
    cfg = dataclasses.replace(Qwen2Config.tiny(), vocab_size=97)
    params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, S = 1, 512
    embeds = jax.random.normal(jax.random.PRNGKey(1),
                               (B, S, cfg.hidden_size), jnp.float32) * 0.02
    labels = jnp.where(jnp.arange(S)[None] % 3 == 0, 5, IGNORE_INDEX)
    valid = jnp.ones((B, S), bool)
    loss, grads = jax.value_and_grad(sft_loss)(params, embeds, labels,
                                               valid, cfg)
    assert np.isfinite(float(loss))
    g = np.asarray(grads["layers"]["q"]["kernel"])
    assert np.abs(g).max() > 0
    lp = jax.grad(lambda p: completion_logprob(p, embeds, labels, valid,
                                               cfg).sum())(params)
    assert np.isfinite(np.asarray(lp["layers"]["q"]["kernel"]).max())
