"""LLaVA-Video backbone tests: SigLIP parity vs torch, 2dPool/grid-token
oracles, and full-stack first-token parity against a torch re-composition of
the pipeline (tower -> projector -> pool -> splice -> Qwen2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tspo_tpu.models.llava_video import (  # noqa: E402
    IMAGE_TOKEN_INDEX,
    LLaVAVideoConfig,
    LLaVAVideoModel,
    add_token_per_grid,
    build_qwen15_prompt,
    encode_video_chunk,
    pool_2d_average,
    tokenize_with_image,
)
from tspo_tpu.models.siglip import (  # noqa: E402
    SigLIPConfig,
    siglip_encode,
    siglip_params_from_torch,
)

CFG = LLaVAVideoConfig.tiny()


@pytest.fixture(scope="module")
def torch_siglip():
    v = CFG.vision
    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=v.width, intermediate_size=v.intermediate,
        num_hidden_layers=v.layers + 1,  # checkpoint has one extra layer
        num_attention_heads=v.heads, image_size=v.image_size,
        patch_size=v.patch_size, layer_norm_eps=v.layer_norm_eps,
        hidden_act="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    return transformers.SiglipVisionModel(hf_cfg).eval()


def test_siglip_parity_truncated_tower(torch_siglip):
    """Our tower == torch hidden_states[layers] (the LLaVA truncation:
    hidden state after dropping the final layer, no post-layernorm)."""
    v = CFG.vision
    params = siglip_params_from_torch(torch_siglip, v, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, 3, v.image_size, v.image_size)).astype(np.float32)
    with torch.no_grad():
        out = torch_siglip(pixel_values=torch.from_numpy(pixels),
                           output_hidden_states=True)
    want = out.hidden_states[v.layers].numpy()       # after layer `layers`
    got = np.asarray(siglip_encode(params, jnp.asarray(pixels), v))
    assert got.shape == (3, v.num_patches, v.width)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pool_2d_average_matches_torch():
    F, g, D = 2, 9, 5  # odd grid: edge row/col dropped
    x = np.random.default_rng(1).normal(size=(F, g * g, D)).astype(np.float32)
    want = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x).view(F, g, g, D).permute(0, 3, 1, 2), 2
    ).permute(0, 2, 3, 1).reshape(F, -1, D).numpy()
    got = np.asarray(pool_2d_average(jnp.asarray(x), g, 2))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_add_token_per_grid_matches_torch():
    """Oracle: the reference permute gymnastics (llava_arch.py:222-243)."""
    F, side, D = 3, 4, 7
    x = np.random.default_rng(2).normal(size=(F, side * side, D)).astype(np.float32)
    nl = np.random.default_rng(3).normal(size=D).astype(np.float32)

    t = torch.from_numpy(x).view(F, 1, side, side, D).permute(4, 0, 2, 1, 3)
    t = t.flatten(1, 2).flatten(2, 3)
    t = torch.cat([t, torch.from_numpy(nl)[:, None, None].expand(D, F * side, 1)], dim=-1)
    want = t.flatten(1, 2).transpose(0, 1).numpy()

    got = np.asarray(add_token_per_grid(jnp.asarray(x), jnp.asarray(nl), side))
    assert got.shape == (F * side * (side + 1), D)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_tokenize_with_image():
    enc = lambda s: [ord(c) for c in s]
    ids = tokenize_with_image("ab<image>\ncd", enc)
    assert ids == [ord("a"), ord("b"), IMAGE_TOKEN_INDEX, ord("\n"),
                   ord("c"), ord("d")]
    prompt = build_qwen15_prompt("Why?")
    assert "<image>\nWhy?" in prompt and prompt.endswith("assistant\n")


@pytest.fixture(scope="module")
def torch_stack(torch_siglip):
    """torch Qwen2 + projector + newline matching a random jax model."""
    lm_cfg = CFG.lm
    hf_cfg = transformers.Qwen2Config(
        vocab_size=lm_cfg.vocab_size, hidden_size=lm_cfg.hidden_size,
        intermediate_size=lm_cfg.intermediate_size,
        num_hidden_layers=lm_cfg.num_layers,
        num_attention_heads=lm_cfg.num_heads,
        num_key_value_heads=lm_cfg.num_kv_heads, head_dim=lm_cfg.head_dim,
        rope_theta=lm_cfg.rope_theta, rms_norm_eps=lm_cfg.rms_eps,
        tie_word_embeddings=False, attention_dropout=0.0)
    torch.manual_seed(1)
    qwen = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    torch.manual_seed(2)
    proj0 = torch.nn.Linear(CFG.vision.width, lm_cfg.hidden_size)
    proj2 = torch.nn.Linear(lm_cfg.hidden_size, lm_cfg.hidden_size)
    newline = torch.randn(lm_cfg.hidden_size) * 0.1
    return qwen, proj0, proj2, newline


@pytest.fixture(scope="module")
def jax_model(torch_siglip, torch_stack):
    qwen, proj0, proj2, newline = torch_stack
    sd = {}
    for k, v in qwen.state_dict().items():
        sd[k if k.startswith("lm_head") else k] = v
    for k, v in torch_siglip.state_dict().items():
        sd["model.vision_tower.vision_tower." + k] = v
    sd["model.mm_projector.0.weight"] = proj0.weight
    sd["model.mm_projector.0.bias"] = proj0.bias
    sd["model.mm_projector.2.weight"] = proj2.weight
    sd["model.mm_projector.2.bias"] = proj2.bias
    sd["model.image_newline"] = newline
    enc = lambda s: [ord(c) % CFG.lm.vocab_size for c in s]
    dec = lambda toks: " ".join(str(t) for t in toks)
    return LLaVAVideoModel.from_torch_checkpoint(sd, CFG, dtype=jnp.float32,
                                                 encode=enc, decode=dec,
                                                 batch_frames=4,
                                                 max_new_tokens=4)


def test_full_stack_first_token_parity(torch_siglip, torch_stack, jax_model):
    """First generated token matches a torch re-composition of the whole
    pipeline on identical preprocessed frames."""
    qwen, proj0, proj2, newline = torch_stack
    v, side = CFG.vision, CFG.pooled_side
    F = 2
    rng = np.random.default_rng(4)
    # frames already at tower resolution -> device preprocess reduces to
    # normalize only, shared exactly by both sides
    frames = rng.integers(0, 256, (F, v.image_size, v.image_size, 3),
                          dtype=np.uint8)
    pixels = ((frames.astype(np.float32) / 255.0) - 0.5) / 0.5
    pixels_t = torch.from_numpy(pixels.transpose(0, 3, 1, 2))

    with torch.no_grad():
        feat = torch_siglip(pixel_values=pixels_t,
                            output_hidden_states=True).hidden_states[v.layers]
        feat = proj2(torch.nn.functional.gelu(proj0(feat)))
        D = feat.shape[-1]
        pooled = torch.nn.functional.avg_pool2d(
            feat.view(F, v.grid, v.grid, D).permute(0, 3, 1, 2), 2
        ).permute(0, 2, 3, 1).reshape(F, -1, D)
        t = pooled.view(F, 1, side, side, D).permute(4, 0, 2, 1, 3)
        t = t.flatten(1, 2).flatten(2, 3)
        t = torch.cat([t, newline[:, None, None].expand(D, F * side, 1)], dim=-1)
        vid_tokens = t.flatten(1, 2).transpose(0, 1)

        prompt = jax_model._prompt("What?")
        ids = tokenize_with_image(prompt, jax_model.encode)
        p = ids.index(IMAGE_TOKEN_INDEX)
        emb_w = qwen.get_input_embeddings().weight
        embeds = torch.cat([emb_w[torch.tensor(ids[:p])], vid_tokens,
                            emb_w[torch.tensor(ids[p + 1:])]])[None]
        logits = qwen(inputs_embeds=embeds).logits[0, -1]
        want_tok = int(torch.argmax(logits))

    out = jax_model.generate(frames, "What?", max_new_tokens=1)
    got_tok = int(out.split()[0])
    assert got_tok == want_tok


def test_generate_deterministic(jax_model):
    frames = np.random.default_rng(5).integers(
        0, 256, (3, 40, 56, 3), dtype=np.uint8)
    a = jax_model.generate(frames, "Describe.", max_new_tokens=4)
    b = jax_model.generate(frames, "Describe.", max_new_tokens=4)
    assert a == b


def test_encode_video_chunking(jax_model):
    frames = np.random.default_rng(6).integers(
        0, 256, (6, 32, 32, 3), dtype=np.uint8)
    toks = jax_model.encode_video(frames)
    assert toks.shape == (6 * CFG.tokens_per_frame, CFG.lm.hidden_size)
    one = LLaVAVideoModel(params=jax_model.params, cfg=CFG,
                          encode=jax_model.encode, decode=jax_model.decode,
                          batch_frames=16)
    np.testing.assert_allclose(np.asarray(toks), np.asarray(one.encode_video(frames)),
                               rtol=2e-4, atol=2e-4)


def test_loglikelihood_matches_torch(torch_siglip, torch_stack, jax_model):
    """loglikelihood of a continuation vs torch re-composition."""
    qwen, proj0, proj2, newline = torch_stack
    v, side = CFG.vision, CFG.pooled_side
    frames = np.random.default_rng(7).integers(
        0, 256, (2, v.image_size, v.image_size, 3), dtype=np.uint8)
    question, continuation = "Which?", "AB"

    lp, greedy = jax_model.loglikelihood(frames, question, continuation)
    assert isinstance(greedy, bool)

    # torch oracle
    from tspo_tpu.models.llava_video import (IMAGE_TOKEN_INDEX,
                                             build_qwen15_prompt,
                                             tokenize_with_image)
    pixels = ((frames.astype(np.float32) / 255.0) - 0.5) / 0.5
    with torch.no_grad():
        feat = torch_siglip(pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
                            output_hidden_states=True).hidden_states[v.layers]
        feat = proj2(torch.nn.functional.gelu(proj0(feat)))
        D = feat.shape[-1]
        F = feat.shape[0]
        pooled = torch.nn.functional.avg_pool2d(
            feat.view(F, v.grid, v.grid, D).permute(0, 3, 1, 2), 2
        ).permute(0, 2, 3, 1).reshape(F, -1, D)
        t = pooled.view(F, 1, side, side, D).permute(4, 0, 2, 1, 3)
        t = t.flatten(1, 2).flatten(2, 3)
        t = torch.cat([t, newline[:, None, None].expand(D, F * side, 1)], dim=-1)
        vid = t.flatten(1, 2).transpose(0, 1)

        ids = tokenize_with_image(jax_model._prompt(question), jax_model.encode)
        cont_ids = list(jax_model.encode(continuation))
        all_ids = ids + cont_ids
        p = all_ids.index(IMAGE_TOKEN_INDEX)
        emb_w = qwen.get_input_embeddings().weight
        embeds = torch.cat([emb_w[torch.tensor(all_ids[:p])], vid,
                            emb_w[torch.tensor(all_ids[p + 1:])]])[None]
        logits = qwen(inputs_embeds=embeds).logits[0]
        n = len(cont_ids)
        logp = torch.log_softmax(logits[-n - 1:-1], dim=-1)
        want = float(logp[torch.arange(n), torch.tensor(cont_ids)].sum())
    assert abs(lp - want) < 5e-3


def test_quantized_lm_generates(jax_model):
    from tspo_tpu.models.llava_video import LLaVAVideoModel
    frames = np.random.default_rng(8).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    base = jax_model.generate(frames, "Q?", max_new_tokens=3)
    q = LLaVAVideoModel(params=jax_model.params, cfg=CFG,
                        encode=jax_model.encode, decode=jax_model.decode,
                        batch_frames=4).quantize_lm()
    out = q.generate(frames, "Q?", max_new_tokens=3)
    assert len(out.split()) == len(base.split())  # generates; tokens may
    # differ slightly under int8 on random weights


def test_quantized_siglip_close_to_float(torch_siglip):
    from tspo_tpu.models.siglip import (quantize_siglip_params, siglip_encode,
                                        siglip_params_from_torch)
    v = CFG.vision
    params = siglip_params_from_torch(torch_siglip, v, dtype=jnp.float32)
    pixels = jnp.asarray(np.random.default_rng(9).normal(
        size=(3, 3, v.image_size, v.image_size)), jnp.float32)
    a = np.asarray(siglip_encode(params, pixels, v))
    b = np.asarray(siglip_encode(quantize_siglip_params(params), pixels, v)
                   ).astype(np.float32)
    # patch features are near-zero-mean; compare normalized error
    err = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert err < 0.05, err


def test_generate_batch_matches_sequential(jax_model):
    """Batched G-rollout decode == per-subset sequential generate."""
    rng = np.random.default_rng(10)
    subsets = [rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
               for _ in range(3)]
    seq = [jax_model.generate(f, "Q?", max_new_tokens=3) for f in subsets]
    bat = jax_model.generate_batch(subsets, "Q?", max_new_tokens=3)
    assert bat == seq


def test_generate_batch_multi_matches_sequential(jax_model):
    """Ragged cross-sample batch (different questions AND frame counts) ==
    per-item sequential generate — per-row rope/masking through
    greedy_decode's ragged-prompt support."""
    rng = np.random.default_rng(11)
    frame_sets = [rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
                  for n in (2, 4, 3)]
    questions = ["What happens?", "Q?", "Describe the very long scene now"]
    seq = [jax_model.generate(f, q, max_new_tokens=3)
           for f, q in zip(frame_sets, questions)]
    bat = jax_model.generate_batch_multi(frame_sets, questions,
                                         max_new_tokens=3)
    assert bat == seq


def test_llava_config_from_hf_dict():
    from tspo_tpu.models.llava_video import LLaVAVideoConfig
    hf = {"vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
          "num_hidden_layers": 2, "num_attention_heads": 4,
          "num_key_value_heads": 2, "head_dim": 16, "rope_theta": 10000.0,
          "rms_norm_eps": 1e-6, "mm_spatial_pool_stride": 2,
          "mm_newline_position": "grid", "mm_spatial_pool_mode": "average"}
    cfg = LLaVAVideoConfig.from_hf_config(hf)
    assert cfg.lm.hidden_size == 64 and cfg.lm.num_kv_heads == 2
    assert cfg.mm_newline_position == "grid" and cfg.pool_stride == 2
    assert cfg.vision.num_patches == 729  # production SigLIP geometry
    assert cfg.lm.qkv_bias is True and cfg.lm.eos_token_id == 151645


def test_llava_config_from_llama_hf_dict():
    """llama/vicuna LLaVA config.json: family defaults the HF file omits —
    bias-free attention, eos </s>=2, rope theta 1e4 (the round-3 review
    found the vicuna load path crashed on missing bias keys otherwise)."""
    from tspo_tpu.models.llava_video import LLaVAVideoConfig
    hf = {"model_type": "llava",
          "architectures": ["LlavaLlamaForCausalLM"],
          "vocab_size": 32000, "hidden_size": 64, "intermediate_size": 128,
          "num_hidden_layers": 2, "num_attention_heads": 4,
          "rms_norm_eps": 1e-5,
          "rope_scaling": {"type": "linear", "factor": 2.0}}
    cfg = LLaVAVideoConfig.from_hf_config(hf)
    assert cfg.lm.qkv_bias is False
    assert cfg.lm.eos_token_id == 2
    assert cfg.lm.rope_theta == 10_000.0
    assert cfg.lm.num_kv_heads == 4          # MHA when key omitted
    assert cfg.lm.rope_scaling_factor == 2.0
    # mistral flavor keeps its sliding window
    hf_m = dict(hf, model_type="llava_mistral", sliding_window=4096,
                num_key_value_heads=2)
    cfg_m = LLaVAVideoConfig.from_hf_config(hf_m)
    assert cfg_m.lm.sliding_window == 4096 and cfg_m.lm.num_kv_heads == 2


def test_llava_config_rejects_nonlinear_rope_scaling():
    """Only HF 'linear' rope scaling is implemented; a yarn/llama3 config
    must fail loudly instead of misapplying its factor as a position
    divisor (silent garbage generations otherwise)."""
    from tspo_tpu.models.llava_video import LLaVAVideoConfig
    hf = {"model_type": "llava",
          "vocab_size": 32000, "hidden_size": 64, "intermediate_size": 128,
          "num_hidden_layers": 2, "num_attention_heads": 4}
    for bad in ({"rope_type": "llama3", "factor": 8.0},
                {"type": "yarn", "factor": 4.0}):
        with pytest.raises(ValueError, match="rope_scaling"):
            LLaVAVideoConfig.from_hf_config(dict(hf, rope_scaling=bad))
    # both spellings of linear are accepted
    cfg = LLaVAVideoConfig.from_hf_config(
        dict(hf, rope_scaling={"rope_type": "linear", "factor": 2.0}))
    assert cfg.lm.rope_scaling_factor == 2.0


def test_harness_loglikelihood_dispatch_tiny_backbone(jax_model, tmp_path):
    """evaluate_task with request_type='loglikelihood' reaches the backbone's
    loglikelihood and answers by argmax choice (VERDICT r1 Missing #2)."""
    cv2 = pytest.importorskip("cv2")
    from tspo_tpu.eval.harness import evaluate_task
    w = cv2.VideoWriter(str(tmp_path / "v.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(40):
        w.write(np.full((48, 48, 3), (i * 6) % 255, np.uint8))
    w.release()
    docs = [{"question_id": "q0", "question": "What?",
             "options": ["A. x", "B. y"], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": "v.mp4",
             "frame_idx": [0.0, 5.0, 10.0, 15.0]}]
    res = evaluate_task("VideoMME", docs, jax_model,
                        video_root=str(tmp_path), max_frames_num=4,
                        request_type="loglikelihood", on_error="raise")
    assert res.results[0]["pred_answer"] in ("A", "B")
    assert res.samples[0]["response"] in ("A", "B")


def test_text_only_generate_zero_frames(jax_model):
    """LocalBackboneProvider judges with NO video: generate must handle a
    0-frame array (code-review r2 finding #2)."""
    out = jax_model.generate(np.zeros((0, 32, 32, 3), np.uint8), "Judge this")
    assert isinstance(out, str)
    from tspo_tpu.eval.llm_judge import LocalBackboneProvider
    res = LocalBackboneProvider(jax_model)._complete_with_retry(
        "score this", system_prompt="you are a judge")
    assert res.success


def test_generate_multi_round(jax_model):
    """Multi-round chat: earlier QA pairs ride the conversation template;
    round 2 with a different history must see a different prompt (and may
    produce a different continuation), while a None-history call matches
    plain generate exactly."""
    v = CFG.vision
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, v.image_size, v.image_size, 3),
                          dtype=np.uint8)
    solo = jax_model.generate(frames, "What?", max_new_tokens=3)
    multi1 = jax_model.generate_multi_round(frames, [("What?", None)],
                                            max_new_tokens=3)
    assert multi1 == solo  # single-turn degenerate case

    from tspo_tpu.models.conversation import build_prompt_multi
    turns = [("What?", solo), ("And then?", None)]
    p2 = build_prompt_multi(turns, jax_model.conv_template)
    assert solo in p2 and p2.endswith("assistant\n")
    out2 = jax_model.generate_multi_round(frames, turns, max_new_tokens=3)
    assert isinstance(out2, str) and out2


def test_multi_round_stateful_matches_stateless(jax_model):
    """Conversation prefix-KV reuse: three rounds through one
    ConversationState answer token-for-token like the stateless full
    re-prefill path, while the video encodes exactly once for the whole
    stateful conversation."""
    v = CFG.vision
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, (2, v.image_size, v.image_size, 3),
                          dtype=np.uint8)
    # default headroom: rounds 2-3 take the real chunked-extension path
    # (small headrooms would silently reset + re-prefill instead)
    state = jax_model.new_conversation_state()
    counts = {"n": 0}
    orig = jax_model.encode_video
    jax_model.encode_video = \
        lambda f: (counts.__setitem__("n", counts["n"] + 1) or orig(f))
    try:
        turns = []
        for r, q in enumerate(["What?", "And then?", "Why is that?"]):
            want = jax_model.generate_multi_round(
                frames, [*turns, (q, None)], max_new_tokens=3)
            got = jax_model.generate_multi_round(
                frames, [*turns, (q, None)], max_new_tokens=3, state=state)
            assert got == want, f"round {r} diverged"
            turns.append((q, want))
    finally:
        del jax_model.encode_video
    # 3 stateless calls encode each time; the stateful path encodes once
    assert counts["n"] == 4
    assert state.cache is not None and state.covered > 0


def test_multi_round_state_capacity_overflow_reprefills(jax_model):
    """headroom=0 sizes the cache exactly to round 1, so round 2 overflows
    capacity — the state must re-prefill into a larger cache and still
    match the stateless answer."""
    v = CFG.vision
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (2, v.image_size, v.image_size, 3),
                          dtype=np.uint8)
    state = jax_model.new_conversation_state(headroom=0)
    a1 = jax_model.generate_multi_round(frames, [("What?", None)],
                                        max_new_tokens=3, state=state)
    cap1 = state.cache.k.shape[2]
    turns = [("What?", a1), ("And then?", None)]
    want = jax_model.generate_multi_round(frames, turns, max_new_tokens=3)
    got = jax_model.generate_multi_round(frames, turns, max_new_tokens=3,
                                         state=state)
    assert got == want
    assert state.cache.k.shape[2] > cap1


def test_multi_round_state_headroom_boundary_sweep(jax_model):
    """Property: stateful == stateless at EVERY cache headroom, including
    capacities just past the reuse boundary.  Regression for the
    extension-pad clamp bug: chunks pad to a 64/256 bucket, and a
    near-capacity cache let the pad writes silently clamp onto covered
    prefix KV (dynamic_update_slice clamps instead of erroring) — wrong
    answers with no exception.  The capacity check now budgets the pad
    overhang, resetting to a full re-prefill instead."""
    v = CFG.vision
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (2, v.image_size, v.image_size, 3),
                          dtype=np.uint8)
    for headroom in (0, 40, 72, 120, 200):
        state = jax_model.new_conversation_state(headroom=headroom)
        turns = []
        for q in ("What?", "And then after that happens?"):
            want = jax_model.generate_multi_round(
                frames, [*turns, (q, None)], max_new_tokens=3)
            got = jax_model.generate_multi_round(
                frames, [*turns, (q, None)], max_new_tokens=3, state=state)
            assert got == want, f"headroom={headroom!r} q={q!r}"
            turns.append((q, want))


def test_multi_round_state_clamps_max_new_like_stateless(jax_model):
    """Near max_context the stateful path must truncate the generation
    budget like generate() does, not raise (round-4 review finding)."""
    import dataclasses
    v = CFG.vision
    rng = np.random.default_rng(12)
    frames = rng.integers(0, 256, (2, v.image_size, v.image_size, 3),
                          dtype=np.uint8)
    # measure the prompt size, then shrink max_context to prompt + a few
    state = jax_model.new_conversation_state()
    jax_model.generate_multi_round(frames, [("What?", None)],
                                   max_new_tokens=1, state=state)
    prompt_e = state.covered - 1            # prompt embeds + 1 answer token
    tight = dataclasses.replace(
        jax_model, cfg=dataclasses.replace(jax_model.cfg,
                                           max_context=prompt_e + 5))
    s2 = tight.new_conversation_state()
    got = tight.generate_multi_round(frames, [("What?", None)],
                                     max_new_tokens=64, state=s2)
    want = tight.generate(frames, "", max_new_tokens=64,
                          prompt=__import__(
                              "tspo_tpu.models.conversation",
                              fromlist=["build_prompt_multi"]
                          ).build_prompt_multi([("What?", None)],
                                               tight.conv_template))
    assert got == want                      # both truncated, both answer
    """An exception during a stateful round (after the cache was donated
    into device calls) must leave the state clean — the next round falls
    back to a full re-prefill and still matches stateless."""
    import tspo_tpu.models.qwen2 as q2
    v = CFG.vision
    rng = np.random.default_rng(10)
    frames = rng.integers(0, 256, (2, v.image_size, v.image_size, 3),
                          dtype=np.uint8)
    state = jax_model.new_conversation_state(headroom=256)
    a1 = jax_model.generate_multi_round(frames, [("What?", None)],
                                        max_new_tokens=3, state=state)
    turns = [("What?", a1), ("And then?", None)]
    orig = q2.prefill_extend
    q2.prefill_extend = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("injected"))
    try:
        with pytest.raises(RuntimeError, match="injected"):
            jax_model.generate_multi_round(frames, turns, max_new_tokens=3,
                                           state=state)
    finally:
        q2.prefill_extend = orig
    assert state.cache is None              # checked out, not dangling
    want = jax_model.generate_multi_round(frames, turns, max_new_tokens=3)
    got = jax_model.generate_multi_round(frames, turns, max_new_tokens=3,
                                         state=state)
    assert got == want


def test_generate_speculative_matches_plain(jax_model):
    """speculative=True must produce the identical answer string (exact
    greedy verification; drafts come from the prompt text + history)."""
    import dataclasses
    frames = np.random.default_rng(9).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    q = "What color is the square? A. red B. blue"
    plain = jax_model.generate(frames, q, max_new_tokens=10)
    spec_model = dataclasses.replace(jax_model, speculative=True, draft_len=4)
    spec = spec_model.generate(frames, q, max_new_tokens=10)
    assert spec == plain

def test_speculative_capacity_clamp_and_fallback(jax_model):
    """Near max_context, speculation clamps draft_len to the remaining cache
    headroom; at zero headroom it falls back to plain greedy.  A prompt that
    plain greedy handles must never raise the static capacity guard under
    speculative=True (and the answer stays greedy-exact either way)."""
    import dataclasses
    frames = np.random.default_rng(3).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    q = "Pick one: A. up B. down"
    plain = jax_model.generate(frames, q, max_new_tokens=8)
    ids = tokenize_with_image(jax_model._prompt(q), jax_model.encode,
                              jax_model.bos_token_id)
    emb = jax_model.splice_embeddings(ids, jax_model.encode_video(frames),
                                      None)
    S = emb.shape[1]
    # headroom 0 -> plain-greedy fallback; headroom 2 -> draft clamps to 2
    for ctx in (S + 8, S + 8 + 2):
        tight = dataclasses.replace(
            jax_model, speculative=True, draft_len=4,
            cfg=dataclasses.replace(jax_model.cfg, max_context=ctx))
        assert tight.generate(frames, q, max_new_tokens=8) == plain


def test_generate_cache_capacity_guard(jax_model):
    """Writes past max_context would be silently clamped onto the last KV
    slot by dynamic_update_slice: a prompt that fills the whole context must
    raise, and an over-budget max_new must truncate to the headroom (prefix-
    exact vs asking for exactly the headroom)."""
    import dataclasses
    frames = np.random.default_rng(4).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    q = "Pick one: A. up B. down"
    ids = tokenize_with_image(jax_model._prompt(q), jax_model.encode,
                              jax_model.bos_token_id)
    S = jax_model.splice_embeddings(ids, jax_model.encode_video(frames),
                                    None).shape[1]
    full = dataclasses.replace(
        jax_model, cfg=dataclasses.replace(jax_model.cfg, max_context=S))
    with pytest.raises(ValueError, match="no cache slot"):
        full.generate(frames, q, max_new_tokens=4)
    want = jax_model.generate(frames, q, max_new_tokens=3)
    tight = dataclasses.replace(
        jax_model, cfg=dataclasses.replace(jax_model.cfg, max_context=S + 3))
    assert tight.generate(frames, q, max_new_tokens=10) == want
    # batched path shares the guard
    with pytest.raises(ValueError, match="no cache slot"):
        full.generate_batch([frames, frames], q, max_new_tokens=4)


def test_generate_rejects_zero_max_new(jax_model):
    frames = np.random.default_rng(5).integers(
        0, 256, (1, 32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="max_new_tokens"):
        jax_model.generate(frames, "q", max_new_tokens=0)


def test_generate_custom_prompt_without_image_raises(jax_model):
    """A custom prompt missing <image> used to silently drop the video
    (text-only embeddings, hallucinated answer); it must refuse instead,
    matching the audio path's missing-sentinel error."""
    frames = np.random.default_rng(6).integers(
        0, 256, (1, 32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="<image>"):
        jax_model.generate(frames, "", prompt="Describe the video.")


def test_generate_stream_matches_generate(jax_model):
    """''.join(generate_stream deltas) == generate output, across chunk
    sizes incl. non-divisors; every yielded delta is non-empty."""
    frames = np.random.default_rng(11).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    q = "Describe the scene."
    want = jax_model.generate(frames, q, max_new_tokens=9)
    for chunk in (1, 3, 8, 16):
        deltas = list(jax_model.generate_stream(frames, q,
                                                max_new_tokens=9,
                                                chunk=chunk))
        assert all(deltas), deltas
        assert "".join(deltas) == want, (chunk, deltas, want)


def test_generate_stream_near_max_context(jax_model):
    """A prompt that generate() handles must stream too, even when the
    rounded-up final chunk would exceed max_context (extra throwaway steps
    get real cache slots)."""
    import dataclasses
    frames = np.random.default_rng(12).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    q = "Pick one: A. up B. down"
    ids = tokenize_with_image(jax_model._prompt(q), jax_model.encode,
                              jax_model.bos_token_id)
    emb = jax_model.splice_embeddings(ids, jax_model.encode_video(frames),
                                      None)
    tight = dataclasses.replace(
        jax_model,
        cfg=dataclasses.replace(jax_model.cfg, max_context=emb.shape[1] + 5))
    want = tight.generate(frames, q, max_new_tokens=5)
    got = "".join(tight.generate_stream(frames, q, max_new_tokens=5,
                                        chunk=4))
    assert got == want


def test_generate_stream_multibyte_safe(jax_model):
    """A multibyte character whose byte-level BPE tokens straddle a chunk
    boundary must NOT leak U+FFFD into the stream (review finding): the
    unstable tail is held back until it decodes cleanly, and the joined
    deltas equal the full decode."""
    import dataclasses

    # fake detokenizer: every PAIR of token ids renders one char; an
    # unpaired trailing token decodes to the replacement char — exactly the
    # byte-level-BPE split-character behavior
    def pair_decode(toks):
        text = "".join(chr(0x4E00 + (a % 100)) for a in toks[0::2][: len(toks) // 2])
        return text + ("�" if len(toks) % 2 else "")

    model = dataclasses.replace(jax_model, decode=pair_decode)
    frames = np.random.default_rng(13).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    want = model.generate(frames, "Describe.", max_new_tokens=7)
    for chunk in (1, 3):           # odd chunks force straddles
        deltas = list(model.generate_stream(frames, "Describe.",
                                            max_new_tokens=7, chunk=chunk))
        assert "".join(deltas) == want, (chunk, deltas, want)
        # no replacement char in any non-final delta
        assert not any("�" in d for d in deltas[:-1]), deltas


def test_generate_multi_round_stream_matches(jax_model):
    """Streaming multi-round == non-stream multi-round, for BOTH the
    stateless path and the stateful prefix-KV path, across three rounds
    and a non-divisor chunk size; the state commits after each fully
    consumed stream (covered grows round over round)."""
    v = CFG.vision
    rng = np.random.default_rng(21)
    frames = rng.integers(0, 256, (2, v.image_size, v.image_size, 3),
                          dtype=np.uint8)
    state = jax_model.new_conversation_state()
    turns = []
    covered_prev = 0
    for q in ("What?", "And then?", "Why is that?"):
        want = jax_model.generate_multi_round(frames, [*turns, (q, None)],
                                              max_new_tokens=5)
        stateless = "".join(jax_model.generate_multi_round_stream(
            frames, [*turns, (q, None)], max_new_tokens=5, chunk=3))
        stateful = "".join(jax_model.generate_multi_round_stream(
            frames, [*turns, (q, None)], max_new_tokens=5, chunk=3,
            state=state))
        assert stateless == want, (q, stateless, want)
        assert stateful == want, (q, stateful, want)
        assert state.cache is not None and state.covered > covered_prev
        covered_prev = state.covered
        turns.append((q, want))


def test_multi_round_stream_abandoned_leaves_state_clean(jax_model):
    """A stream abandoned mid-answer (client disconnect) must NOT commit
    the round: the state stays checked-out (cache None — clean full
    re-prefill next round) and the next stateful round still matches the
    stateless answer exactly."""
    v = CFG.vision
    rng = np.random.default_rng(22)
    frames = rng.integers(0, 256, (2, v.image_size, v.image_size, 3),
                          dtype=np.uint8)
    state = jax_model.new_conversation_state()
    a1 = jax_model.generate_multi_round(frames, [("What?", None)],
                                        max_new_tokens=4, state=state)
    turns = [("What?", a1), ("And then?", None)]
    it = jax_model.generate_multi_round_stream(frames, turns,
                                               max_new_tokens=4, chunk=1,
                                               state=state)
    assert next(it)                 # one delta landed, then the client dies
    it.close()
    assert state.cache is None      # checked out, never committed
    assert state.video_tokens is not None   # the video encode survives
    want = jax_model.generate_multi_round(frames, turns, max_new_tokens=4)
    got = jax_model.generate_multi_round(frames, turns, max_new_tokens=4,
                                         state=state)
    assert got == want
    assert state.cache is not None  # the retry re-prefilled and committed


def test_generate_sampled_top1_matches_greedy(jax_model):
    """temperature>0 routes to sample_decode; a vanishing nucleus makes it
    reproduce the greedy answer exactly, and a fixed seed is deterministic."""
    frames = np.random.default_rng(15).integers(
        0, 256, (3, 40, 56, 3), dtype=np.uint8)
    greedy = jax_model.generate(frames, "Describe.", max_new_tokens=4)
    top1 = jax_model.generate(frames, "Describe.", max_new_tokens=4,
                              temperature=5.0, top_p=1e-9)
    assert top1 == greedy
    a = jax_model.generate(frames, "Describe.", max_new_tokens=4,
                           temperature=2.0, seed=9)
    b = jax_model.generate(frames, "Describe.", max_new_tokens=4,
                           temperature=2.0, seed=9)
    assert a == b


def test_unseeded_sampling_draws_fresh_key(jax_model, monkeypatch):
    """seed=None must mean a fresh draw per call (OpenAI/HF do_sample
    semantics), not PRNGKey(0) — else every unseeded sampled request with
    the same prompt returns the identical completion (advisor round-4
    finding).  Explicit seeds stay deterministic."""
    from tspo_tpu.models import qwen2
    keys = []

    def fake_sample_decode(params, embeds, valid, cache, cfg, max_new,
                           key, temperature, top_p):
        keys.append(np.asarray(key))
        return jnp.array([5], jnp.int32), 1

    monkeypatch.setattr(qwen2, "sample_decode", fake_sample_decode)
    frames = np.zeros((2, 40, 56, 3), np.uint8)
    for seed in (None, None, 9, 9):
        jax_model.generate(frames, "Describe.", max_new_tokens=2,
                           temperature=1.0, seed=seed)
    assert not np.array_equal(keys[0], keys[1])   # fresh draw per call
    assert np.array_equal(keys[2], keys[3])       # explicit seed pinned


def test_generate_stream_sampled_joins_to_generate(jax_model):
    """temperature>0 on generate_stream routes to sample_decode_stream;
    at a fixed seed the joined deltas equal the fused sampled generate's
    answer (token-exact stream + prefix detokenization)."""
    frames = np.random.default_rng(21).integers(
        0, 256, (3, 40, 56, 3), dtype=np.uint8)
    want = jax_model.generate(frames, "Describe.", max_new_tokens=6,
                              temperature=2.0, seed=4)
    got = "".join(jax_model.generate_stream(
        frames, "Describe.", max_new_tokens=6, chunk=2,
        temperature=2.0, seed=4))
    assert got == want


def test_multi_round_sampled(jax_model):
    """temperature>0 on generate_multi_round: stateless rounds ride the
    conversation template through the sampled generate (seed-deterministic,
    stream joins equal), prefix-KV state is refused loudly."""
    frames = np.random.default_rng(31).integers(
        0, 256, (3, 40, 56, 3), dtype=np.uint8)
    turns = [("What is shown?", "A scene."), ("And then?", None)]
    a = jax_model.generate_multi_round(frames, turns, max_new_tokens=5,
                                       temperature=2.0, seed=6)
    b = jax_model.generate_multi_round(frames, turns, max_new_tokens=5,
                                       temperature=2.0, seed=6)
    assert a == b
    got = "".join(jax_model.generate_multi_round_stream(
        frames, turns, max_new_tokens=5, chunk=2, temperature=2.0, seed=6))
    assert got == a
    state = jax_model.new_conversation_state()
    with pytest.raises(ValueError, match="prefix-KV"):
        jax_model.generate_multi_round(frames, turns, max_new_tokens=5,
                                       temperature=2.0, seed=6, state=state)
    with pytest.raises(ValueError, match="prefix-KV"):
        next(jax_model.generate_multi_round_stream(
            frames, turns, max_new_tokens=5, temperature=2.0, state=state))
