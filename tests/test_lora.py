"""LoRA adapters on the qwen2 stack (reference peft lora_enable path):
zero-init identity, frozen-base training via optax.masked, merge fidelity."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tspo_tpu.models.qwen2 import (KVCache, Qwen2Config, add_lora,
                                   embed_tokens, init_qwen2_params,
                                   lora_param_mask, merge_lora,
                                   quantize_qwen2_params, qwen2_forward)
from tspo_tpu.train.finetune import IGNORE_INDEX, lora_optimizer, sft_loss


def _forward(params, cfg, ids):
    emb = embed_tokens(params, jnp.asarray(ids)[None])
    cache = KVCache.create(cfg, 1, emb.shape[1], emb.dtype)
    h, _ = qwen2_forward(params, emb, cache, jnp.arange(emb.shape[1]),
                         jnp.ones((1, emb.shape[1]), bool), cfg)
    return np.asarray(h)


def test_lora_zero_init_is_identity():
    cfg = Qwen2Config.tiny()
    params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    lp = add_lora(params, jax.random.PRNGKey(1), rank=4)
    ids = [5, 6, 7, 8]
    np.testing.assert_allclose(_forward(params, cfg, ids),
                               _forward(lp, cfg, ids), rtol=1e-6)


def test_lora_trains_only_adapters_and_learns():
    cfg = Qwen2Config.tiny()
    params = add_lora(init_qwen2_params(jax.random.PRNGKey(0), cfg,
                                        jnp.float32),
                      jax.random.PRNGKey(1), rank=4, alpha=8.0)
    mask = lora_param_mask(params)
    assert mask["layers"]["q"]["lora_a"] is True
    assert mask["layers"]["q"]["kernel"] is False
    opt = lora_optimizer(5e-2, params)
    state = opt.init(params)

    ids = [5, 6, 7, 3, 3, 3]
    labels = jnp.asarray([IGNORE_INDEX] * 3 + [3, 3, 3])[None]
    emb = embed_tokens(params, jnp.asarray(ids)[None])
    valid = jnp.ones((1, len(ids)), bool)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(sft_loss)(p, emb, labels, valid, cfg)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    p = params
    first = None
    for _ in range(60):
        p, state, loss = step(p, state)
        first = first if first is not None else float(loss)
    # rank-4 adapters on a frozen random base plateau well above zero;
    # a full nat of improvement proves the adapters are the thing learning
    assert float(loss) < first - 1.0
    # base weights untouched; adapters moved
    np.testing.assert_array_equal(np.asarray(p["layers"]["q"]["kernel"]),
                                  np.asarray(params["layers"]["q"]["kernel"]))
    assert np.abs(np.asarray(p["layers"]["q"]["lora_b"])).max() > 0


def test_merge_lora_matches_adapter_forward():
    cfg = Qwen2Config.tiny()
    params = add_lora(init_qwen2_params(jax.random.PRNGKey(0), cfg,
                                        jnp.float32),
                      jax.random.PRNGKey(1), rank=4)
    # give B real values so the adapters do something
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: (jnp.ones_like(x) * 0.01
                         if str(getattr(path[-1], "key", "")) == "lora_b"
                         else x), params)
    merged = merge_lora(params)
    assert "lora_a" not in merged["layers"]["q"]
    ids = [5, 6, 7, 8]
    np.testing.assert_allclose(_forward(params, cfg, ids),
                               _forward(merged, cfg, ids),
                               rtol=2e-4, atol=2e-5)


def test_merge_lora_on_quantized_base():
    """quantize -> add_lora -> merge_lora used to KeyError on 'kernel';
    now the delta folds into a dequant/requant round-trip and the merged
    model stays int8 with a forward close to the runtime-adapter one."""
    cfg = Qwen2Config.tiny()
    params = quantize_qwen2_params(
        init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    lp = add_lora(params, jax.random.PRNGKey(1), rank=4)
    lp = jax.tree_util.tree_map_with_path(
        lambda path, x: (jnp.ones_like(x) * 0.01
                         if str(getattr(path[-1], "key", "")) == "lora_b"
                         else x), lp)
    merged = merge_lora(lp)
    q = merged["layers"]["q"]
    assert "lora_a" not in q and "kernel" not in q
    assert q["kernel_q"].dtype == jnp.int8
    ids = [5, 6, 7, 8]
    ref = _forward(lp, cfg, ids)
    got = _forward(merged, cfg, ids)
    # requantization noise bounds the diff, not exact equality
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.05


def test_merge_lora_quantized_zero_delta_roundtrip():
    """With B=0 the quantized merge is a pure dequant->requant round-trip:
    the int8 codes must come back essentially unchanged."""
    cfg = Qwen2Config.tiny()
    params = quantize_qwen2_params(
        init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    merged = merge_lora(add_lora(params, jax.random.PRNGKey(1), rank=4))
    for name in ("q", "gate"):
        a = np.asarray(params["layers"][name]["kernel_q"], np.int32)
        b = np.asarray(merged["layers"][name]["kernel_q"], np.int32)
        assert np.abs(a - b).max() <= 1
