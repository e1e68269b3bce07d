"""Qwen2.5-VL parity vs torch transformers (tiny config): preprocessing,
vision tower, M-RoPE LM, and end-to-end logits/first-token."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tspo_tpu.models.qwen25vl import (  # noqa: E402
    Qwen25VLConfig,
    Qwen25VLModel,
    _vision_layout,
    _vision_rope,
    preprocess_video,
    qwen25vl_vision_forward,
    rope_index_for_video,
)
from tspo_tpu.models.qwen2 import (  # noqa: E402
    KVCache,
    embed_tokens,
    lm_logits,
    mrope_cos_sin,
    qwen2_forward,
)
from tspo_tpu.ops.flash_attention import flash_attention  # noqa: E402

CFG = Qwen25VLConfig.tiny()


def test_flash_attention_matches_dense():
    rng = np.random.default_rng(0)
    B, S, H, hd = 2, 100, 3, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.float32)
    valid = jnp.asarray(rng.random((B, S)) > 0.2).at[:, 0].set(True)
    # (key 0 valid: a fully-masked query row is undefined behavior in any
    # flash formulation and never occurs in real use)

    def dense(q, k, v, valid, causal):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        ok = valid[:, None, None, :]
        if causal:
            cm = jnp.tril(jnp.ones((S, S), bool))
            ok = ok & cm[None, None]
        s = jnp.where(ok, s, -1e30)
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", a, v)

    for causal in (False, True):
        want = dense(q, k, v, valid, causal)
        got = flash_attention(q, k, v, valid, causal=causal, q_chunk=32,
                              k_chunk=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def torch_model():
    v, lm = CFG.vision, CFG.lm
    hf_cfg = transformers.Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=lm.vocab_size, hidden_size=lm.hidden_size,
            intermediate_size=lm.intermediate_size,
            num_hidden_layers=lm.num_layers, num_attention_heads=lm.num_heads,
            num_key_value_heads=lm.num_kv_heads, head_dim=lm.head_dim,
            rope_theta=lm.rope_theta, rms_norm_eps=lm.rms_eps,
            max_position_embeddings=lm.max_position_embeddings,
            tie_word_embeddings=False, attention_dropout=0.0,
            rope_scaling={"type": "mrope",
                          "mrope_section": list(CFG.mrope_section)},
        ),
        vision_config=dict(
            depth=v.depth, hidden_size=v.hidden, intermediate_size=v.intermediate,
            num_heads=v.heads, patch_size=v.patch_size,
            temporal_patch_size=v.temporal_patch_size,
            spatial_merge_size=v.spatial_merge_size, window_size=v.window_size,
            fullatt_block_indexes=list(v.fullatt_block_indexes),
            out_hidden_size=v.out_hidden, tokens_per_second=v.tokens_per_second,
            hidden_act="silu",
        ),
        image_token_id=CFG.image_token_id, video_token_id=CFG.video_token_id,
        vision_start_token_id=CFG.vision_start_token_id,
        vision_end_token_id=CFG.vision_end_token_id,
    )
    torch.manual_seed(0)
    return transformers.Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()


@pytest.fixture(scope="module")
def jax_model(torch_model):
    return Qwen25VLModel.from_torch_checkpoint(torch_model, CFG,
                                               dtype=jnp.float32)


@pytest.fixture(scope="module")
def video_inputs():
    rng = np.random.default_rng(1)
    # H=W=32 divisible by factor 8 -> smart_resize is identity, so torch and
    # jax preprocessing see identical pixels
    frames = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    return frames


def test_preprocess_matches_hf_processor(video_inputs):
    v = CFG.vision
    proc = transformers.models.qwen2_vl.image_processing_qwen2_vl.Qwen2VLImageProcessor(
        patch_size=v.patch_size, temporal_patch_size=v.temporal_patch_size,
        merge_size=v.spatial_merge_size, min_pixels=1, max_pixels=10 ** 8)
    out = proc(images=None, videos=[list(video_inputs)], return_tensors="np")
    want = out["pixel_values_videos"]
    grid_want = out["video_grid_thw"][0]
    got, grid = preprocess_video(video_inputs, v, min_pixels=1,
                                 max_pixels=10 ** 8)
    np.testing.assert_array_equal(np.asarray(grid), grid_want)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_vision_tower_parity(torch_model, jax_model, video_inputs):
    v = CFG.vision
    patches, grid = preprocess_video(video_inputs, v, min_pixels=1,
                                     max_pixels=10 ** 8)
    with torch.no_grad():
        want = torch_model.model.visual(
            torch.from_numpy(patches.astype(np.float32)),
            grid_thw=torch.tensor([list(grid)])).numpy()
    pos_hw, window_cells = _vision_layout(*grid, v.spatial_merge_size,
                                          v.merger_window)
    cos, sin = _vision_rope(pos_hw, v.head_dim)
    got = np.asarray(qwen25vl_vision_forward(
        jax_model.params["visual"], jnp.asarray(patches), jnp.asarray(cos),
        jnp.asarray(sin), jnp.asarray(window_cells), v))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_mrope_lm_logits_parity(torch_model, jax_model, video_inputs):
    """Full multimodal prefill: vision features spliced at video_pad tokens,
    3D rope positions — logits vs HF forward."""
    c = CFG
    v = c.vision
    patches, grid = preprocess_video(video_inputs, v, min_pixels=1,
                                     max_pixels=10 ** 8)
    n_vid = int(np.prod(grid) // v.merge_unit)
    rng = np.random.default_rng(2)
    pre = rng.integers(0, 500, size=6).tolist() + [c.vision_start_token_id]
    post = [c.vision_end_token_id] + rng.integers(0, 500, size=5).tolist()
    ids = np.asarray(pre + [c.video_token_id] * n_vid + post)

    with torch.no_grad():
        want = torch_model(
            input_ids=torch.from_numpy(ids)[None],
            pixel_values_videos=torch.from_numpy(patches.astype(np.float32)),
            video_grid_thw=torch.tensor([list(grid)]),
            second_per_grid_ts=torch.tensor([2.0]),
        ).logits[0].numpy()

    feats, grid2 = (jax_model.encode_video(video_inputs)
                    if False else (None, None))
    pos_hw, window_cells = _vision_layout(*grid, v.spatial_merge_size,
                                          v.merger_window)
    cos_v, sin_v = _vision_rope(pos_hw, v.head_dim)
    feats = qwen25vl_vision_forward(
        jax_model.params["visual"], jnp.asarray(patches), jnp.asarray(cos_v),
        jnp.asarray(sin_v), jnp.asarray(window_cells), v)

    lm = jax_model.params["lm"]
    emb = embed_tokens(lm, jnp.asarray(ids))
    emb = emb.at[len(pre):len(pre) + n_vid].set(feats.astype(emb.dtype))
    pos3, _ = rope_index_for_video(len(pre), grid, len(post),
                                   v.spatial_merge_size, v.tokens_per_second,
                                   2.0)
    cos, sin = mrope_cos_sin(jnp.asarray(pos3), c.lm.head_dim,
                             c.lm.rope_theta, c.mrope_section)
    S = len(ids)
    cache = KVCache.create(c.lm, 1, S, jnp.float32)
    h, _ = qwen2_forward(lm, emb[None], cache, jnp.arange(S),
                         jnp.ones((1, S), bool), c.lm,
                         rope_cos_sin=(cos, sin))
    got = np.asarray(lm_logits(lm, h, c.lm))[0]
    # fp32 accumulation-order noise amplified through the LM head; argmax
    # parity is asserted exactly in test_generate_end_to_end
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=1.5e-2)


def test_generate_end_to_end(torch_model, jax_model, video_inputs):
    """Greedy generation matches HF generate on the chat-formatted prompt."""
    c = CFG
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    jax_model.second_per_grid_t = 2.0
    out = jax_model.generate(video_inputs, "What?", max_new_tokens=4)
    got_toks = [int(t) for t in out.split()]

    v = c.vision
    patches, grid = preprocess_video(video_inputs, v, min_pixels=1,
                                     max_pixels=jax_model.max_pixels)
    n_vid = int(np.prod(grid) // v.merge_unit)
    pre_ids, vid_ids, post_ids = jax_model.build_prompt_ids("What?", n_vid)
    ids = torch.tensor(pre_ids + vid_ids + post_ids)[None]
    with torch.no_grad():
        want = torch_model.generate(
            ids, pixel_values_videos=torch.from_numpy(patches.astype(np.float32)),
            video_grid_thw=torch.tensor([list(grid)]),
            second_per_grid_ts=torch.tensor([2.0]),
            max_new_tokens=4, do_sample=False,
            eos_token_id=-7, pad_token_id=0).numpy()[0, ids.shape[1]:]
    assert got_toks == want.tolist()


def test_loglikelihood_matches_torch(torch_model, jax_model, video_inputs):
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    jax_model.second_per_grid_t = 2.0
    lp, greedy = jax_model.loglikelihood(video_inputs, "What?", "ab")
    assert isinstance(greedy, bool)

    c = CFG
    v = c.vision
    patches, grid = preprocess_video(video_inputs, v, min_pixels=1,
                                     max_pixels=jax_model.max_pixels)
    n_vid = int(np.prod(grid) // v.merge_unit)
    pre_ids, vid_ids, post_ids = jax_model.build_prompt_ids("What?", n_vid)
    cont_ids = list(jax_model.encode("ab"))
    ids = torch.tensor(pre_ids + vid_ids + post_ids + cont_ids)[None]
    with torch.no_grad():
        logits = torch_model(
            input_ids=ids,
            pixel_values_videos=torch.from_numpy(patches.astype(np.float32)),
            video_grid_thw=torch.tensor([list(grid)]),
            second_per_grid_ts=torch.tensor([2.0])).logits[0]
    n = len(cont_ids)
    logp = torch.log_softmax(logits[-n - 1:-1], dim=-1)
    want = float(logp[torch.arange(n), torch.tensor(cont_ids)].sum())
    # summed logprobs inherit the fp32 accumulation noise seen in the
    # logits-parity test (~1e-2/position)
    assert abs(lp - want) < 0.1


def test_config_from_hf_dict(torch_model):
    """Qwen25VLConfig.from_hf_config round-trips the HF config."""
    from tspo_tpu.models.qwen25vl import Qwen25VLConfig
    hf = torch_model.config.to_dict()
    cfg = Qwen25VLConfig.from_hf_config(hf)
    assert cfg.lm.hidden_size == CFG.lm.hidden_size
    assert cfg.lm.num_kv_heads == CFG.lm.num_kv_heads
    assert cfg.vision.depth == CFG.vision.depth
    assert cfg.vision.fullatt_block_indexes == CFG.vision.fullatt_block_indexes
    assert cfg.mrope_section == CFG.mrope_section
    assert cfg.video_token_id == CFG.video_token_id


def test_generate_speculative_matches_plain(jax_model, video_inputs):
    """speculative=True under mrope prefill + delta decode positions:
    identical output (exact-greedy verification)."""
    import dataclasses
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    plain = jax_model.generate(video_inputs, "What?", max_new_tokens=6)
    spec = dataclasses.replace(jax_model, speculative=True, draft_len=3)
    spec.encode, spec.decode = jax_model.encode, jax_model.decode
    assert spec.generate(video_inputs, "What?", max_new_tokens=6) == plain

def test_speculative_capacity_clamp_and_fallback(jax_model, video_inputs):
    """Same capacity contract as the llava backbone: near max_context the
    draft clamps to the cache headroom, and at zero headroom the call falls
    back to plain greedy instead of raising the static capacity guard."""
    import dataclasses
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    plain = jax_model.generate(video_inputs, "What?", max_new_tokens=6)
    feats, _ = jax_model.encode_video(video_inputs)
    pre, vid, post = jax_model.build_prompt_ids("What?", feats.shape[0])
    S = len(pre) + len(vid) + len(post)
    for ctx in (S + 6, S + 6 + 1):   # fallback, then clamp to d=1
        tight = dataclasses.replace(
            jax_model, speculative=True, draft_len=3,
            cfg=dataclasses.replace(jax_model.cfg, max_context=ctx))
        tight.encode, tight.decode = jax_model.encode, jax_model.decode
        assert tight.generate(video_inputs, "What?", max_new_tokens=6) == plain


def test_generate_stream_matches_generate(jax_model, video_inputs):
    """''.join(generate_stream deltas) == generate output (m-rope prompt
    tables threaded through the chunked decode)."""
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    want = jax_model.generate(video_inputs, "What?", max_new_tokens=6)
    for chunk in (2, 8):
        got = "".join(jax_model.generate_stream(video_inputs, "What?",
                                                max_new_tokens=6,
                                                chunk=chunk))
        assert got == want, (chunk, got, want)


def test_generate_sampled_and_stream_parity(jax_model, video_inputs):
    """temperature>0 routes generate to sample_decode (m-rope threaded):
    a vanishing nucleus reproduces greedy; a fixed seed is deterministic;
    and the sampled stream's joined deltas equal the fused sampled
    generate at equal seed."""
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    greedy = jax_model.generate(video_inputs, "What?", max_new_tokens=5)
    top1 = jax_model.generate(video_inputs, "What?", max_new_tokens=5,
                              temperature=5.0, top_p=1e-9)
    assert top1 == greedy
    a = jax_model.generate(video_inputs, "What?", max_new_tokens=5,
                           temperature=2.0, seed=3)
    b = jax_model.generate(video_inputs, "What?", max_new_tokens=5,
                           temperature=2.0, seed=3)
    assert a == b
    got = "".join(jax_model.generate_stream(video_inputs, "What?",
                                            max_new_tokens=5, chunk=2,
                                            temperature=2.0, seed=3))
    assert got == a


def test_multi_round_single_turn_equals_generate(jax_model, video_inputs):
    """A one-round conversation through generate_multi_round is
    byte-identical to generate (the rendered post text matches generate's
    own), greedy and sampled at equal seed; state!=None is rejected."""
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    want = jax_model.generate(video_inputs, "What?", max_new_tokens=5)
    got = jax_model.generate_multi_round(video_inputs, [("What?", None)],
                                         max_new_tokens=5)
    assert got == want
    ws = jax_model.generate(video_inputs, "What?", max_new_tokens=5,
                            temperature=2.0, top_p=0.9, seed=11)
    gs = jax_model.generate_multi_round(video_inputs, [("What?", None)],
                                        max_new_tokens=5, temperature=2.0,
                                        top_p=0.9, seed=11)
    assert gs == ws
    with pytest.raises(ValueError, match="sampled"):
        jax_model.generate_multi_round(
            video_inputs, [("What?", None)], temperature=1.0,
            state=jax_model.new_conversation_state())


def test_multi_round_renders_history_and_streams(jax_model, video_inputs):
    """Round 2 conditions on the full rendered history (a different round-1
    answer changes the prompt, the chat-template markers appear in the
    rendered text), and the stream joins to the non-stream output."""
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    rendered = jax_model._render_rounds([("Q1?", "A1."), ("Q2?", None)])
    assert rendered == ("Q1?<|im_end|>\n<|im_start|>assistant\nA1."
                        "<|im_end|>\n<|im_start|>user\nQ2?<|im_end|>\n"
                        "<|im_start|>assistant\n")
    r2a = jax_model.generate_multi_round(
        video_inputs, [("Q1?", "A1."), ("Q2?", None)], max_new_tokens=5)
    r2b = jax_model.generate_multi_round(
        video_inputs, [("Q1?", "totally different answer text"),
                       ("Q2?", None)], max_new_tokens=5)
    assert r2a != r2b or r2a  # history reaches the model (tiny weights may
    # still tie; the render assert above pins the mechanism)
    stream = "".join(jax_model.generate_multi_round_stream(
        video_inputs, [("Q1?", "A1."), ("Q2?", None)], max_new_tokens=5))
    assert stream == r2a
    with pytest.raises(ValueError, match="unanswered"):
        jax_model.generate_multi_round(video_inputs, [("Q1?", "A1.")])


def test_multi_round_stateful_matches_stateless(jax_model, video_inputs):
    """Prefix-KV conversation rounds (m-rope shift through extension
    prefill + decode) are token-exact vs the stateless full-prefill path,
    round by round; sampled rounds refuse the state."""
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    st = jax_model.new_conversation_state()
    turns = []
    for q in ["Q1?", "And then?", "Why is that?"]:
        want = jax_model.generate_multi_round(
            video_inputs, [*turns, (q, None)], max_new_tokens=4)
        got = jax_model.generate_multi_round(
            video_inputs, [*turns, (q, None)], max_new_tokens=4, state=st)
        assert got == want, f"round {len(turns) + 1} diverged"
        turns.append((q, want))
    assert st.cache is not None and st.covered == len(st.ids)
    with pytest.raises(ValueError, match="sampled"):
        jax_model.generate_multi_round(video_inputs, [("q", None)],
                                       temperature=1.0, state=st)


def test_multi_round_stateful_stream_and_abandon(jax_model, video_inputs):
    """Streaming stateful rounds join to the non-stream output; an
    abandoned stream leaves the state checked-out/reset and the next
    round still answers exactly."""
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    st = jax_model.new_conversation_state()
    w1 = jax_model.generate_multi_round(video_inputs, [("Q1?", None)],
                                        max_new_tokens=4)
    s1 = "".join(jax_model.generate_multi_round_stream(
        video_inputs, [("Q1?", None)], max_new_tokens=4, state=st))
    assert s1 == w1
    # abandon mid-stream: state must recover
    g = jax_model.generate_multi_round_stream(
        video_inputs, [("Q1?", w1), ("Q2?", None)], max_new_tokens=4,
        state=st)
    next(g)
    g.close()
    w2 = jax_model.generate_multi_round(
        video_inputs, [("Q1?", w1), ("Q2?", None)], max_new_tokens=4)
    g2 = jax_model.generate_multi_round(
        video_inputs, [("Q1?", w1), ("Q2?", None)], max_new_tokens=4,
        state=st)
    assert g2 == w2


def test_multi_round_independent_prefix_reuse(jax_model, video_inputs):
    """The serve-layer prefix-cache pattern on qwen25vl: independent
    single-turn questions against one state — divergence right after the
    video block truncates the old question/answer, and each answer equals
    the stateless generate()."""
    jax_model.encode = lambda s: [ord(ch) % 500 for ch in s]
    jax_model.decode = lambda toks: " ".join(map(str, toks))
    st = jax_model.new_conversation_state()
    for q in ["What?", "What color is it?", "How many objects?"]:
        want = jax_model.generate(video_inputs, q, max_new_tokens=4)
        got = jax_model.generate_multi_round(video_inputs, [(q, None)],
                                             max_new_tokens=4, state=st)
        assert got == want, f"question {q!r} diverged"
