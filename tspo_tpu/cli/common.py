"""Shared CLI plumbing: checkpoint loading and backbone construction."""

from __future__ import annotations

import json
import os

import numpy as np


def machine_cache_tag() -> str:
    """Host fingerprint for XLA cache paths.  CPU AOT executables are
    machine-feature-specific: loading an artifact compiled on a host with
    different vector extensions SIGILLs/segfaults at run time (XLA warns
    'Machine type used for XLA:CPU compilation doesn't match...'), and
    this repo's cache dirs travel between hosts across build rounds —
    keying the path by the local CPU makes stale cross-host entries
    unreachable instead of fatal."""
    import hashlib
    import platform
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    raw = platform.machine() + flags
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache — full-size tower compiles take
    minutes on remote-compile backends; cached reruns skip them.  The
    directory is keyed by :func:`machine_cache_tag` so artifacts never
    cross host CPU types."""
    import jax
    path = path or os.path.join(os.path.expanduser("~"), ".cache",
                                "tspo_tpu_xla", machine_cache_tag())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def load_scorer(model_path: str | None, *, dtype=None, batch_frames: int = 256,
                seed: int = 0, tiny: bool = False):
    """TSPOScorer from a merged checkpoint directory (npz format or a torch
    merged TSPO-0.4B), or random weights when ``model_path`` is None
    (smoke/bench runs).  ``tiny`` selects the small test config (fast CPU
    smoke runs of the full pipelines)."""
    import jax.numpy as jnp
    from ..configs import CLIPConfig, SelectorConfig
    from ..models.tspo_model import TSPOScorer, build_random_scorer

    dtype = dtype or jnp.bfloat16
    tokenize = None
    if model_path:
        tokenize = make_clip_tokenizer(model_path)
        if os.path.exists(os.path.join(model_path, "tspo_params.npz")):
            return TSPOScorer.load(model_path, dtype=dtype, tokenize=tokenize,
                                   batch_frames=batch_frames)
        return _scorer_from_torch_dir(model_path, dtype, tokenize, batch_frames)
    if tiny:
        clip_cfg = CLIPConfig.tiny()
        return build_random_scorer(
            seed=seed, clip_cfg=clip_cfg,
            selector_cfg=SelectorConfig(dim=clip_cfg.text.projection_dim,
                                        num_heads=4),
            dtype=jnp.float32, batch_frames=32,
            tokenize=_stub_tokenizer(eos=clip_cfg.text.eos_token_id, length=8))
    return build_random_scorer(seed=seed, dtype=dtype,
                               batch_frames=batch_frames,
                               tokenize=_stub_tokenizer())


def _scorer_from_torch_dir(path: str, dtype, tokenize, batch_frames):
    """Load a reference-format merged TSPO-0.4B HF directory (safetensors or
    pytorch_model.bin) — merge_weights.py output.  The CLIP geometry is
    inferred from tensor shapes (64-dim-head CLIP family rule), so no
    parsable config.json is required."""
    from ..configs import SelectorConfig
    from ..models.clip import clip_config_from_state_dict
    from ..models.tspo_model import TSPOScorer
    sd = {}
    st_files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if st_files:
        from safetensors import safe_open
        for fname in st_files:
            with safe_open(os.path.join(path, fname), framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
    else:
        import torch
        sd = torch.load(os.path.join(path, "pytorch_model.bin"),
                        map_location="cpu", weights_only=True)
    clip_cfg = clip_config_from_state_dict(
        {k: v for k, v in sd.items() if not k.startswith("selector.")})
    sel_dim = clip_cfg.text.projection_dim
    return TSPOScorer.from_torch_merged(
        sd, clip_cfg=clip_cfg,
        selector_cfg=SelectorConfig(dim=sel_dim), dtype=dtype,
        tokenize=tokenize, batch_frames=batch_frames)


def make_clip_tokenizer(model_path: str):
    """CLIP tokenizer from a local checkpoint dir; returns
    problem -> (input_ids, attention_mask) with CLIP padding/truncation.

    Raises instead of degrading: a merged TSPO-0.4B dir with missing or
    corrupt tokenizer files must fail loudly, never phase-1-score benchmarks
    with garbage text features.  The reference fails here too
    (``CLIPProcessor.from_pretrained`` raises, merge_weights.py:57).  The
    char-hash stub is reserved for ``model_path=None`` / ``tiny`` smoke and
    bench runs (load_scorer above)."""
    errors = []
    try:
        from transformers import CLIPTokenizerFast
        tok = CLIPTokenizerFast.from_pretrained(model_path)
    except Exception as e:
        errors.append(f"CLIPTokenizerFast: {e}")
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(model_path)
        except Exception as e2:
            errors.append(f"AutoTokenizer: {e2}")
            detail = "\n  ".join(errors)
            raise RuntimeError(
                f"no usable tokenizer in checkpoint dir {model_path!r}.\n"
                "Phase-1 scoring conditions on CLIP text features; running "
                "with a fallback tokenizer would silently select garbage "
                "frames on every benchmark, so this is fatal.\n"
                "Runbook: the merged TSPO-0.4B export must contain the CLIP "
                "tokenizer files (vocab.json + merges.txt, or "
                "tokenizer.json, plus tokenizer_config.json) — re-run the "
                "merge (scripts/merge_weights.py equivalent: "
                "tspo_tpu.train.checkpoint.export_merged) or copy them from "
                "the openai/clip-vit-large-patch14 checkpoint.\n"
                f"  {detail}") from e2

    def tokenize(problem: str):
        out = tok(problem, return_tensors="np", padding=True, truncation=True)
        return out["input_ids"], out["attention_mask"]

    return tokenize


def _stub_tokenizer(eos: int = 49407, length: int = 16, vocab: int | None = None):
    vocab = vocab if vocab is not None else eos + 1
    def tokenize(problem: str):
        ids = np.full((1, length), 3, np.int32)
        for i, ch in enumerate(problem[: length - 2]):
            ids[0, i + 1] = 1 + (ord(ch) % max(vocab - 2, 1))
        ids[0, -1] = eos
        return ids, np.ones((1, length), np.int32)
    return tokenize


def load_backbone(kind: str, model_path: str | None = None, **kw):
    """Backbone adapter factory: 'stub' (testing), 'llava_video' (jax),
    'qwen2_5_vl' (jax)."""
    # conv_template/speculative/max_frames_num only apply to the llava
    # family; strip for others (qwen2_5_vl's adapter has its own kwargs)
    _conv_template = kw.pop("conv_template", None)
    _speculative = kw.pop("speculative", False)
    _max_frames = kw.pop("max_frames_num", 64)
    if kind == "llava_video":
        kw["conv_template"] = _conv_template
        kw["speculative"] = _speculative
        kw["max_frames_num"] = _max_frames
    if kind == "stub":
        class Stub:
            def generate(self, frames, prompt):
                return "A"
        return Stub()
    if kind == "llava_video":
        import dataclasses
        from ..models.llava_video import LLaVAVideoModel, LLaVAVideoConfig
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(model_path)
        cfg_path = os.path.join(model_path, "config.json")
        if os.path.exists(cfg_path):
            hf = json.load(open(cfg_path))
            cfg = LLaVAVideoConfig.from_hf_config(hf)
        else:
            hf, cfg = {}, LLaVAVideoConfig()
        conv_template = kw.pop("conv_template", None)
        max_frames_num = kw.pop("max_frames_num", 64)
        if "vicuna" in str(model_path).lower() or \
                "yi" in str(model_path).lower():
            # old vicuna/yi checkpoints: adapter-default template + computed
            # long-context rope scaling (llava_vid_tspo.py:94, 159-174)
            conv_template = conv_template or "vicuna_v1"
            if cfg.lm.rope_scaling_factor == 1.0:
                from ..models.conversation import vicuna_rope_overrides
                over = vicuna_rope_overrides(
                    max_frames_num,
                    cfg.pool_stride,
                    vision_224="224" in str(hf.get("mm_vision_tower", "")))
                if over:
                    cfg = dataclasses.replace(cfg, lm=dataclasses.replace(
                        cfg.lm, rope_scaling_factor=over["rope_scaling"]
                        ["factor"]))
        speculative = kw.pop("speculative", False)
        model = _load_llava_dir(model_path, cfg, **kw)
        model.encode = lambda s: tok(s).input_ids
        model.decode = lambda toks: tok.decode(toks, skip_special_tokens=True)
        model.conv_template = conv_template or "qwen_1_5"
        model.bos_token_id = tok.bos_token_id
        model.speculative = speculative
        return model
    if kind == "qwen2_5_vl":
        from ..models.qwen25vl import load_qwen25vl_adapter
        model = load_qwen25vl_adapter(model_path, **kw)
        model.speculative = _speculative
        return model
    raise ValueError(f"unknown backbone: {kind}")


def _load_llava_dir(path: str, cfg, **kw):
    from ..models.llava_video import LLaVAVideoModel
    import glob
    sd = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open
        for fname in st_files:
            with safe_open(fname, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
    else:
        import torch
        for fname in sorted(glob.glob(os.path.join(path, "pytorch_model*.bin"))):
            sd.update(torch.load(fname, map_location="cpu", weights_only=True))
    return LLaVAVideoModel.from_torch_checkpoint(sd, cfg, **kw)


def load_jsonl(path: str) -> list:
    with open(path, encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]
