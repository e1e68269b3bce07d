"""Conversation templates: byte parity vs the reference llava/conversation.py
Conversation.get_prompt for every carried template, tokenizer_image_token BOS
parity vs mm_utils.py, rope-override parity vs the lmms-eval adapter formula,
and end-to-end generate parity for a tiny vicuna-geometry LLaVA (llama LM, no
qkv bias, linear rope scaling, vicuna_v1 template, BOS tokenizer).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tspo_tpu.models.conversation import (CONV_TEMPLATES, build_prompt,
                                          get_template, stop_str,
                                          vicuna_rope_overrides)

REF_CONV = "/root/reference/llava/conversation.py"
REF_MM = "/root/reference/llava/mm_utils.py"


_REF_CONV_CACHE = []


def _load_ref_conversation():
    if not os.path.exists(REF_CONV):
        pytest.skip("reference checkout not available")
    if _REF_CONV_CACHE:
        return _REF_CONV_CACHE[0]
    # the reference module calls AutoTokenizer.from_pretrained at import for
    # its llama-3 template (caught by its safe_load_tokenizer); make that
    # fail INSTANTLY — offline env vars are read by huggingface_hub at import
    # time, so setting them here cannot stop a zero-egress network hang
    import transformers
    orig = transformers.AutoTokenizer.from_pretrained

    def _offline(*a, **k):
        raise OSError("offline test environment")

    transformers.AutoTokenizer.from_pretrained = _offline
    try:
        spec = importlib.util.spec_from_file_location("ref_conversation",
                                                      REF_CONV)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _REF_CONV_CACHE.append(mod)
        return mod
    finally:
        transformers.AutoTokenizer.from_pretrained = orig


def _load_ref_mm_utils():
    if not os.path.exists(REF_MM):
        pytest.skip("reference checkout not available")
    # mm_utils imports torch + transformers (in image) and llava.constants
    stubs = {}
    name = "llava.constants"
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.IMAGE_TOKEN_INDEX = -200
        m.DEFAULT_IMAGE_TOKEN = "<image>"
        stubs[name] = m
        pkg = types.ModuleType("llava")
        pkg.constants = m
        stubs["llava"] = pkg
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location("ref_mm_utils", REF_MM)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"cannot import reference mm_utils: {e}")
    finally:
        for n in stubs:
            sys.modules.pop(n, None)


# templates whose reference render needs no hub tokenizer
_PARITY_TEMPLATES = ("qwen_1_5", "qwen_2", "vicuna_v1", "chatml_direct",
                     "llama_2", "llava_llama_2", "mistral_instruct",
                     "llava_mistral_instruct")


@pytest.mark.parametrize("name", _PARITY_TEMPLATES)
def test_render_matches_reference(name):
    ref = _load_ref_conversation()
    q = "<image>\nWhat is happening in the video?"
    conv = ref.conv_templates[name].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], q)
    conv.append_message(conv.roles[1], None)
    assert get_template(name).render(q) == conv.get_prompt()


@pytest.mark.parametrize("name", ("vicuna_v1", "chatml_direct", "llama_2"))
def test_render_with_assistant_matches_reference(name):
    """The loglikelihood path appends the continuation as the assistant turn
    (llava_vid_tspo.py:420-423)."""
    ref = _load_ref_conversation()
    q = "<image>\nWhich option?"
    conv = ref.conv_templates[name].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], q)
    conv.append_message(conv.roles[1], "B. the second one")
    assert get_template(name).render(q, "B. the second one") == \
        conv.get_prompt()


def test_stop_strings_match_reference_rule():
    """llava_vid_tspo.py:536: stop = sep2 for TWO style, else sep."""
    ref = _load_ref_conversation()
    for name in ("vicuna_v1", "chatml_direct", "qwen_1_5",
                 "mistral_instruct"):
        conv = ref.conv_templates[name]
        want = conv.sep if conv.sep_style != ref.SeparatorStyle.TWO \
            else conv.sep2
        assert stop_str(name) == want


def test_build_prompt_prepends_image_token():
    out = build_prompt("Why?", "vicuna_v1")
    assert "<image>\nWhy?" in out
    assert out.endswith("ASSISTANT:")
    out = build_prompt("Why?", "qwen_1_5")
    assert out.endswith("<|im_start|>assistant\n")


def test_llama3_template_renders():
    out = build_prompt("Why?", "llava_llama_3")
    assert out.startswith("<|begin_of_text|><|start_header_id|>system")
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert "<image>\nWhy?<|eot_id|>" in out
    assert stop_str("llava_llama_3") == "<|eot_id|>"   # its sep


def test_unknown_template_raises():
    with pytest.raises(KeyError, match="unknown conv template"):
        get_template("nope")
    assert set(_PARITY_TEMPLATES) <= set(CONV_TEMPLATES)


def test_rope_overrides_match_adapter_formula():
    """llava_vid_tspo.py:159-174."""
    import math
    for frames, stride, is224 in ((64, 2, False), (64, 2, True),
                                  (32, 2, False), (4, 2, False),
                                  (96, 4, False)):
        grid = 16 if is224 else 24
        least = frames * (grid // stride) ** 2 + 1000
        factor = math.ceil(least / 4096)
        got = vicuna_rope_overrides(frames, stride, is224)
        if factor >= 2:
            assert got["rope_scaling"] == {"factor": float(factor),
                                           "type": "linear"}
            assert got["max_sequence_length"] == 4096 * factor
        else:
            assert got == {}


# ---------------------------------------------------------------------------
# tokenizer_image_token BOS parity
# ---------------------------------------------------------------------------

class _BosTok:
    """Minimal callable mimicking a llama tokenizer: BOS + per-char ids."""

    bos_token_id = 1

    def __call__(self, s):
        out = types.SimpleNamespace()
        out.input_ids = [1] + [2 + (ord(c) % 200) for c in s]
        return out

    def encode_list(self, s):
        return self(s).input_ids


@pytest.mark.parametrize("prompt", [
    "hello <image>\nworld",
    "<image>\nquestion?",
    "a<image>b<image>c",
    "no image here",
])
def test_tokenize_with_image_bos_matches_reference(prompt):
    from tspo_tpu.models.llava_video import tokenize_with_image
    ref = _load_ref_mm_utils()
    tok = _BosTok()
    want = ref.tokenizer_image_token(prompt, tok, image_token_index=-200)
    got = tokenize_with_image(prompt, tok.encode_list, bos_token_id=1)
    assert got == want


def test_tokenize_with_image_no_bos_matches_reference():
    from tspo_tpu.models.llava_video import tokenize_with_image
    ref = _load_ref_mm_utils()

    class _PlainTok:
        bos_token_id = None

        def __call__(self, s):
            out = types.SimpleNamespace()
            out.input_ids = [2 + (ord(c) % 200) for c in s]
            return out

    tok = _PlainTok()
    prompt = "x<image>y"
    want = ref.tokenizer_image_token(prompt, tok, image_token_index=-200)
    got = tokenize_with_image(prompt, lambda s: tok(s).input_ids,
                              bos_token_id=None)
    assert got == want


# ---------------------------------------------------------------------------
# tiny vicuna-geometry LLaVA end-to-end
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def vicuna_stack():
    """Tiny llama-geometry LM (bias-free, GQA, linear rope scaling 2.0) +
    SigLIP tower + projector, as both torch modules and a jax LLaVA model."""
    import transformers
    import jax.numpy as jnp
    from tspo_tpu.models.llava_video import (LLaVAVideoConfig,
                                             LLaVAVideoModel)
    from tspo_tpu.models.qwen2 import Qwen2Config
    from tspo_tpu.models.siglip import SigLIPConfig

    vis = SigLIPConfig.tiny()
    lm_cfg = Qwen2Config(
        vocab_size=256, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, rope_theta=10_000.0,
        rms_eps=1e-5, max_position_embeddings=64, eos_token_id=2,
        qkv_bias=False, rope_scaling_factor=2.0)
    cfg = LLaVAVideoConfig(lm=lm_cfg, vision=vis, max_context=512)

    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10_000.0, rms_norm_eps=1e-5,
        max_position_embeddings=64, attention_bias=False,
        rope_scaling={"type": "linear", "factor": 2.0},
        tie_word_embeddings=False, attention_dropout=0.0)
    torch.manual_seed(7)
    llama = transformers.LlamaForCausalLM(hf_cfg).eval()

    hf_vis = transformers.SiglipVisionConfig(
        hidden_size=vis.width, intermediate_size=vis.intermediate,
        num_hidden_layers=vis.layers + 1, num_attention_heads=vis.heads,
        image_size=vis.image_size, patch_size=vis.patch_size,
        layer_norm_eps=vis.layer_norm_eps, hidden_act="gelu_pytorch_tanh")
    torch.manual_seed(8)
    tower = transformers.SiglipVisionModel(hf_vis).eval()
    torch.manual_seed(9)
    proj0 = torch.nn.Linear(vis.width, lm_cfg.hidden_size)
    proj2 = torch.nn.Linear(lm_cfg.hidden_size, lm_cfg.hidden_size)
    newline = torch.randn(lm_cfg.hidden_size) * 0.1

    sd = dict(llama.state_dict())
    for k, v in tower.state_dict().items():
        sd["model.vision_tower.vision_tower." + k] = v
    sd["model.mm_projector.0.weight"] = proj0.weight
    sd["model.mm_projector.0.bias"] = proj0.bias
    sd["model.mm_projector.2.weight"] = proj2.weight
    sd["model.mm_projector.2.bias"] = proj2.bias
    sd["model.image_newline"] = newline

    enc = lambda s: [1] + [3 + (ord(c) % 250) for c in s]   # BOS tokenizer
    dec = lambda toks: " ".join(str(t) for t in toks)
    model = LLaVAVideoModel.from_torch_checkpoint(
        sd, cfg, dtype=jnp.float32, encode=enc, decode=dec, batch_frames=4,
        max_new_tokens=4, conv_template="vicuna_v1", bos_token_id=1)
    return model, llama, tower, proj0, proj2, newline, cfg


def test_vicuna_llava_first_token_parity(vicuna_stack):
    """Greedy first token == torch recomposition through the vicuna_v1
    prompt, BOS-aware splice, and rope-scaled llama decode."""
    from tspo_tpu.models.llava_video import (IMAGE_TOKEN_INDEX,
                                             tokenize_with_image)
    model, llama, tower, proj0, proj2, newline, cfg = vicuna_stack
    v, side = cfg.vision, cfg.pooled_side
    F = 2
    frames = np.random.default_rng(11).integers(
        0, 256, (F, v.image_size, v.image_size, 3), dtype=np.uint8)
    pixels = ((frames.astype(np.float32) / 255.0) - 0.5) / 0.5

    prompt = model._prompt("What?")
    assert prompt.startswith("A chat between a curious user")
    assert prompt.endswith("ASSISTANT:")
    ids = tokenize_with_image(prompt, model.encode, bos_token_id=1)
    assert ids[0] == 1 and ids.count(IMAGE_TOKEN_INDEX) == 1

    with torch.no_grad():
        feat = tower(pixel_values=torch.from_numpy(
            pixels.transpose(0, 3, 1, 2)),
            output_hidden_states=True).hidden_states[v.layers]
        feat = proj2(torch.nn.functional.gelu(proj0(feat)))
        D = feat.shape[-1]
        pooled = torch.nn.functional.avg_pool2d(
            feat.view(F, v.grid, v.grid, D).permute(0, 3, 1, 2), 2
        ).permute(0, 2, 3, 1).reshape(F, -1, D)
        t = pooled.view(F, 1, side, side, D).permute(4, 0, 2, 1, 3)
        t = t.flatten(1, 2).flatten(2, 3)
        t = torch.cat([t, newline[:, None, None].expand(D, F * side, 1)],
                      dim=-1)
        vid = t.flatten(1, 2).transpose(0, 1)
        p = ids.index(IMAGE_TOKEN_INDEX)
        emb_w = llama.get_input_embeddings().weight
        embeds = torch.cat([emb_w[torch.tensor(ids[:p])], vid,
                            emb_w[torch.tensor(ids[p + 1:])]])[None]
        logits = llama(inputs_embeds=embeds).logits[0, -1]
        want_tok = int(torch.argmax(logits))

    out = model.generate(frames, "What?", max_new_tokens=1)
    assert int(out.split()[0]) == want_tok


def test_vicuna_llava_greedy_decode_parity(vicuna_stack):
    """Four greedy steps match HF generate on the same spliced embeds —
    proves the KV-cache decode under rope scaling, not just prefill."""
    from tspo_tpu.models.llava_video import (IMAGE_TOKEN_INDEX,
                                             tokenize_with_image)
    model, llama, tower, proj0, proj2, newline, cfg = vicuna_stack
    v, side = cfg.vision, cfg.pooled_side
    F = 2
    frames = np.random.default_rng(12).integers(
        0, 256, (F, v.image_size, v.image_size, 3), dtype=np.uint8)
    pixels = ((frames.astype(np.float32) / 255.0) - 0.5) / 0.5
    ids = tokenize_with_image(model._prompt("Q?"), model.encode,
                              bos_token_id=1)
    with torch.no_grad():
        feat = tower(pixel_values=torch.from_numpy(
            pixels.transpose(0, 3, 1, 2)),
            output_hidden_states=True).hidden_states[v.layers]
        feat = proj2(torch.nn.functional.gelu(proj0(feat)))
        D = feat.shape[-1]
        pooled = torch.nn.functional.avg_pool2d(
            feat.view(F, v.grid, v.grid, D).permute(0, 3, 1, 2), 2
        ).permute(0, 2, 3, 1).reshape(F, -1, D)
        t = pooled.view(F, 1, side, side, D).permute(4, 0, 2, 1, 3)
        t = t.flatten(1, 2).flatten(2, 3)
        t = torch.cat([t, newline[:, None, None].expand(D, F * side, 1)],
                      dim=-1)
        vid = t.flatten(1, 2).transpose(0, 1)
        p = ids.index(IMAGE_TOKEN_INDEX)
        emb_w = llama.get_input_embeddings().weight
        embeds = torch.cat([emb_w[torch.tensor(ids[:p])], vid,
                            emb_w[torch.tensor(ids[p + 1:])]])[None]
        toks = llama.generate(inputs_embeds=embeds, max_new_tokens=4,
                              do_sample=False,
                              eos_token_id=None)[0].tolist()

    out = model.generate(frames, "Q?", max_new_tokens=4)
    got = [int(x) for x in out.split()]
    assert got == toks[: len(got)] and len(got) >= 1


# ---------------------------------------------------------------------------
# multi-round rendering (generate_until_multi_round support)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", _PARITY_TEMPLATES)
def test_render_turns_matches_reference_multi_round(name):
    """Two full QA rounds + a third open question — byte parity with the
    reference Conversation.get_prompt message loop, which the single-turn
    adapters never exercise past two messages."""
    ref = _load_ref_conversation()
    turns = [("<image>\nWhat is shown?", "A dog in the park."),
             ("What happens next?", "It chases a ball."),
             ("How does it end?", None)]
    conv = ref.conv_templates[name].copy()
    conv.messages = []
    for q, a in turns:
        conv.append_message(conv.roles[0], q)
        conv.append_message(conv.roles[1], a)
    assert get_template(name).render_turns(turns) == conv.get_prompt()


def test_build_prompt_multi_image_token_first_turn_only():
    from tspo_tpu.models.conversation import build_prompt_multi
    out = build_prompt_multi([("q1", "a1"), ("q2", None)], "qwen_1_5")
    assert out.count("<image>") == 1
    assert "<image>\nq1" in out and "user\nq2" in out and "a1" in out
    # single-turn degenerate case == build_prompt
    assert build_prompt_multi([("q", None)], "vicuna_v1") == \
        build_prompt("q", "vicuna_v1")


def test_harness_multi_round_flow(tmp_path):
    """output_type=generate_until_multi_round: rounds accumulate context,
    the final answer is scored, rounds ride the sample record."""
    import cv2
    import dataclasses
    from tspo_tpu.eval.harness import evaluate_task
    from tspo_tpu.eval.tasks import TASK_REGISTRY, BenchmarkTask

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(20):
        w.write(np.full((48, 48, 3), i * 10, np.uint8))
    w.release()

    seen_prompts = []

    class ChatBackbone:
        def generate(self, frames, prompt, **kw):
            raise AssertionError("multi-round must use generate_multi_round")

        def generate_multi_round(self, frames, turns):
            seen_prompts.append(list(turns))
            return f"round{len(turns)}"

    def round_prompt(doc, r, responses, kwargs):
        return doc["question"] if r == 0 else f"followup after {responses[-1]}"

    task = BenchmarkTask(
        name="_mr_test",
        doc_to_text=lambda doc, kw=None: doc["question"],
        process_response=lambda doc, resp, rng=None: {"final": resp},
        aggregate=lambda rs: {"n": len(rs)},
        output_type="generate_until_multi_round",
        num_rounds=3, round_prompt=round_prompt)
    TASK_REGISTRY["_mr_test"] = task
    try:
        docs = [{"question_id": "q0", "question": "What?", "video_path": path,
                 "frame_idx": [0, 1, 2, 3]}]
        res = evaluate_task("_mr_test", docs, ChatBackbone(), video_root="",
                            max_frames_num=4)
    finally:
        TASK_REGISTRY.pop("_mr_test", None)
    assert res.results[0]["final"] == "round3"
    # round 2 saw round 1's answer in its prompt and in its turn history
    assert seen_prompts[1][0] == ("What?", "round1")
    assert seen_prompts[1][1] == ("followup after round1", None)
    assert res.samples[0]["rounds"] == [
        ("What?", "round1"), ("followup after round1", "round2"),
        ("followup after round2", "round3")]


def test_harness_multi_round_uses_conversation_state(tmp_path):
    """Backbones exposing new_conversation_state get per-doc prefix-KV
    reuse through the harness multi-round loop: answers equal the stateless
    path's, and the video encodes once per doc instead of once per round."""
    import cv2
    import jax.numpy as jnp
    from tspo_tpu.eval.harness import evaluate_task
    from tspo_tpu.eval.tasks import TASK_REGISTRY, BenchmarkTask
    from tspo_tpu.models.llava_video import LLaVAVideoConfig, LLaVAVideoModel

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(20):
        w.write(np.full((48, 48, 3), i * 10, np.uint8))
    w.release()

    cfg = LLaVAVideoConfig.tiny()
    model = LLaVAVideoModel.random_init(
        0, cfg, dtype=jnp.float32,
        encode=lambda s: [ord(c) % cfg.lm.vocab_size for c in s],
        decode=lambda t: " ".join(str(x) for x in t),
        batch_frames=4, max_new_tokens=3)
    counts = {"n": 0}
    orig = model.encode_video
    model.encode_video = \
        lambda f: (counts.__setitem__("n", counts["n"] + 1) or orig(f))

    def round_prompt(doc, r, responses, kwargs):
        return doc["question"] if r == 0 else "And then?"

    task = BenchmarkTask(
        name="_mr_state",
        doc_to_text=lambda doc, kw=None: doc["question"],
        process_response=lambda doc, resp, rng=None: {"final": resp},
        aggregate=lambda rs: {"n": len(rs)},
        output_type="generate_until_multi_round",
        num_rounds=2, round_prompt=round_prompt)
    TASK_REGISTRY["_mr_state"] = task
    docs = [{"question_id": "q0", "question": "What?", "video_path": path,
             "frame_idx": [0, 1, 2, 3]}]
    try:
        res = evaluate_task("_mr_state", docs, model, video_root="",
                            max_frames_num=4)
    finally:
        TASK_REGISTRY.pop("_mr_state", None)
        del model.encode_video
    assert counts["n"] == 1                  # one vision encode per doc
    # stateless expectation for both rounds on the exact gathered frames
    from tspo_tpu.video.reader import load_video_indices
    frames = load_video_indices(path, np.asarray([0, 1, 2, 3]))
    a1 = model.generate_multi_round(frames, [("What?", None)])
    a2 = model.generate_multi_round(frames, [("What?", a1),
                                             ("And then?", None)])
    assert res.samples[0]["rounds"] == [("What?", a1), ("And then?", a2)]


def test_harness_multi_round_transcript_fallback(tmp_path):
    """Backbones without generate_multi_round get a plain transcript."""
    import cv2
    from tspo_tpu.eval.harness import evaluate_task
    from tspo_tpu.eval.tasks import TASK_REGISTRY, BenchmarkTask

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(20):
        w.write(np.full((48, 48, 3), i * 10, np.uint8))
    w.release()

    prompts = []

    class PlainBackbone:
        def generate(self, frames, prompt, **kw):
            prompts.append(prompt)
            return f"a{len(prompts)}"

    task = BenchmarkTask(
        name="_mr_fb", doc_to_text=lambda doc, kw=None: "Q",
        process_response=lambda doc, resp, rng=None: {"final": resp},
        aggregate=lambda rs: {}, output_type="generate_until_multi_round",
        num_rounds=2)
    TASK_REGISTRY["_mr_fb"] = task
    try:
        docs = [{"question_id": "q0", "video_path": path,
                 "frame_idx": [0, 1]}]
        res = evaluate_task("_mr_fb", docs, PlainBackbone(), video_root="",
                            max_frames_num=2)
    finally:
        TASK_REGISTRY.pop("_mr_fb", None)
    assert prompts == ["Q", "Q\na1\nQ"]
    assert res.results[0]["final"] == "a2"
