"""Llama-family language models (vicuna/Llama-2, Llama-3, Mistral) on the
qwen2 decoder core.

The reference vendors per-LM glue classes `LlavaLlamaForCausalLM` /
`LlavaMistralForCausalLM` / `LlavaMixtralForCausalLM`
(llava/model/language_model/, SURVEY.md C39) for older LLaVA-NeXT
checkpoints; TSPO's shipped backbones are Qwen2-based, so these were
vendored-inactive in round 1.  Architecturally they are the same decoder as
Qwen2 — RMSNorm, SwiGLU, rotary half-rotation, (grouped) multi-head
attention — differing only in geometry and three knobs the shared core now
carries on `Qwen2Config`:

  - ``qkv_bias=False``: Llama/Mistral attention projections have no biases;
  - ``rope_scaling_factor``: HF "linear" rope scaling, used by old vicuna
    checkpoints (the reference adapter patches it in at load,
    llava_vid_tspo.py:159-174);
  - ``sliding_window``: Mistral's 4096-token windowed attention, enforced in
    both the dense mask and the flash kernels (ops/pallas_attention.py).

Everything else (KV cache, greedy ``lax.while_loop`` decode, TP shardings,
int8 weight-only quantization, LoRA) is the shared qwen2 machinery.
Mixtral's MoE layers are NOT rebuilt: `llava_mixtral` is dead code in the
reference's TSPO path (no shipped checkpoint or launcher uses it) and EP is
out of scope per SURVEY.md §2.5.

Weight loading reuses ``qwen2_params_from_torch`` verbatim — HF Llama and
Mistral state dicts use the identical key layout, just without q/k/v biases.
"""

from __future__ import annotations

from .qwen2 import Qwen2Config, qwen2_params_from_torch


def vicuna_7b_config(rope_scaling_factor: float = 1.0) -> Qwen2Config:
    """Llama-2-7B geometry (lmsys/vicuna-7b-v1.5, the LM of older
    LLaVA-NeXT-Video checkpoints).  ``rope_scaling_factor=2.0`` reproduces
    the reference's patched long-context vicuna load."""
    return Qwen2Config(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
        rope_theta=10_000.0, rms_eps=1e-5, max_position_embeddings=4096,
        eos_token_id=2, qkv_bias=False,
        rope_scaling_factor=rope_scaling_factor)


def llama3_8b_config() -> Qwen2Config:
    """Meta-Llama-3-8B(-Instruct) geometry (GQA, 128k vocab)."""
    return Qwen2Config(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=500_000.0, rms_eps=1e-5, max_position_embeddings=8192,
        eos_token_id=128009, qkv_bias=False)


def mistral_7b_config() -> Qwen2Config:
    """Mistral-7B-v0.1/-Instruct geometry (GQA + 4096 sliding window) —
    the LM behind `llava_mistral`."""
    return Qwen2Config(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=10_000.0, rms_eps=1e-5, max_position_embeddings=32768,
        eos_token_id=2, qkv_bias=False, sliding_window=4096)


def llama_params_from_torch(model_or_sd, cfg: Qwen2Config, dtype=None,
                            prefix: str = "model.") -> dict:
    """HF ``LlamaForCausalLM`` / ``MistralForCausalLM`` state dicts share the
    qwen2 key layout (bias-free per ``cfg.qkv_bias=False``)."""
    import jax.numpy as jnp
    return qwen2_params_from_torch(
        model_or_sd, cfg, prefix=prefix,
        dtype=dtype if dtype is not None else jnp.bfloat16)
