"""SigLIP vision tower — LLaVA-Video-7B-Qwen2's frame encoder.

Reference: the vendored SigLIP ViT-SO400M-384 implementation
(llava/model/multimodal_encoder/siglip_encoder.py).  The LLaVA tower *drops
the final transformer layer* and the pooling head (siglip_encoder.py:570-571)
and emits the raw hidden state of the remaining stack — 729 patch tokens per
frame, no class token, no final layernorm (siglip_encoder.py:576-589).

Same TPU construction as the CLIP tower: stacked layers + lax.scan, patchify
as one GEMM, fused on-device preprocessing (resize to SxS + 0.5/0.5
normalization — SigLipImageProcessor semantics), bf16 with fp32 norms.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.hf_port import state_dict_of, stack_layers
from .clip import _layer_norm, dynamic_int8_linear


@dataclass(frozen=True)
class SigLIPConfig:
    width: int = 1152
    layers: int = 26            # 27 in the checkpoint; LLaVA drops the last
    heads: int = 16
    intermediate: int = 4304
    patch_size: int = 14
    image_size: int = 384
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid   # 729 for SO400M-384

    @classmethod
    def tiny(cls) -> "SigLIPConfig":
        return cls(width=64, layers=2, heads=4, intermediate=128, patch_size=8,
                   image_size=32)


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)  # gelu_pytorch_tanh


def _lin(p, x):
    """Linear on bf16 kernels or weight-only/activation int8 (kernel_q+scale,
    the shared models/clip.py quant scheme)."""
    if "kernel_q" in p:
        return dynamic_int8_linear(p, x, x.dtype)
    return x @ p["kernel"] + p["bias"]


def quantize_siglip_params(params) -> dict:
    """Per-output-channel int8 weights for the six GEMMs per layer (the tower
    shares the CLIP layer structure; feature cosine >= 0.995 tested)."""

    def quant(p):
        k = np.asarray(p["kernel"], np.float32)
        s = np.abs(k).max(axis=-2, keepdims=True) / 127.0 + 1e-12
        q = np.clip(np.round(k / s), -127, 127).astype(np.int8)
        return {"kernel_q": jnp.asarray(q),
                "scale": jnp.asarray(np.squeeze(s, -2), jnp.float32),
                "bias": p["bias"]}

    lp = params["layers"]
    qlayers = {"ln1": lp["ln1"], "ln2": lp["ln2"],
               "attn": {n: quant(lp["attn"][n]) for n in ("q", "k", "v", "o")},
               "mlp": {n: quant(lp["mlp"][n]) for n in ("fc1", "fc2")}}
    return {**params, "layers": qlayers}


def _mha(x, lp, heads):
    """q/k/v stay in the natural [B, S, W] GEMM layout and attention runs
    through the Pallas lane kernel on TPU (ops/vit_attention.py) — the same
    no-transpose design that took the CLIP tower 650 -> 755 f/s; the XLA
    einsum fallback materializes [B, H, 729, 729] scores + 4 relayouts per
    layer (phase-2 roofline measured the einsum tower at 27% MFU)."""
    from ..ops.vit_attention import vit_attention
    q = _lin(lp["q"], x)
    k = _lin(lp["k"], x)
    v = _lin(lp["v"], x)
    ctx = vit_attention(q, k, v, heads)
    return _lin(lp["o"], ctx)


def siglip_encode(params: Mapping, pixel_values: jnp.ndarray,
                  cfg: SigLIPConfig = SigLIPConfig()) -> jnp.ndarray:
    """[B, 3, S, S] preprocessed pixels -> [B, grid^2, width] patch features
    (pre-layernorm hidden state, matching the truncated LLaVA tower)."""
    B = pixel_values.shape[0]
    P, g = cfg.patch_size, cfg.grid
    # so400m-384 geometry: 384 px / patch 14 -> 27x27 patches covering only
    # 378 px; torch's stride-14 valid Conv2d reads pixels [0, 378) and
    # ignores the bottom/right 6-px margin — crop before the
    # patchify-as-GEMM reshape (divisible tiny test configs hid this)
    if pixel_values.shape[-1] != g * P:
        pixel_values = pixel_values[:, :, : g * P, : g * P]
    x = pixel_values.reshape(B, 3, g, P, g, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, 3 * P * P)
    x = x.astype(params["patch_kernel"].dtype) @ params["patch_kernel"]
    x = x + params["patch_bias"] + params["position_embedding"]

    def block(h, lp):
        r = h
        h = _layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
        h = r + _mha(h, lp["attn"], cfg.heads)
        r = h
        h = _layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
        h = _gelu_tanh(_lin(lp["mlp"]["fc1"], h))
        h = _lin(lp["mlp"]["fc2"], h)
        return r + h, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    return x


@partial(jax.jit, static_argnames=("image_size", "dtype"))
def siglip_preprocess(frames: jnp.ndarray, image_size: int = 384,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """[T, H, W, 3] uint8 -> [T, 3, S, S]; SigLipImageProcessor semantics:
    direct resize to (S, S) bicubic, rescale, normalize mean=std=0.5."""
    T = frames.shape[0]
    x = frames.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (T, image_size, image_size, 3), method="cubic")
    x = (x - 0.5) / 0.5
    return x.transpose(0, 3, 1, 2).astype(dtype)


# ---------------------------------------------------------------------------
# Weight port / init
# ---------------------------------------------------------------------------

def _lin_stack(sd, n, fmt):
    return {"kernel": stack_layers(sd, n, fmt + ".weight").transpose(0, 2, 1),
            "bias": stack_layers(sd, n, fmt + ".bias")}


def _ln_stack(sd, n, fmt):
    return {"scale": stack_layers(sd, n, fmt + ".weight"),
            "bias": stack_layers(sd, n, fmt + ".bias")}


def siglip_params_from_torch(model_or_sd, cfg: SigLIPConfig,
                             dtype=jnp.bfloat16,
                             prefix: str = "vision_model.") -> dict:
    """Port an HF ``SiglipVisionModel`` state dict, keeping only
    ``cfg.layers`` transformer layers (LLaVA truncation)."""
    sd = state_dict_of(model_or_sd)
    patch = sd[prefix + "embeddings.patch_embedding.weight"]  # [W, 3, P, P]
    f = prefix + "encoder.layers.{i}"
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), {
        "patch_kernel": patch.reshape(cfg.width, -1).T,
        "patch_bias": sd[prefix + "embeddings.patch_embedding.bias"],
        "position_embedding": sd[prefix + "embeddings.position_embedding.weight"],
        "layers": {
            "ln1": _ln_stack(sd, cfg.layers, f + ".layer_norm1"),
            "ln2": _ln_stack(sd, cfg.layers, f + ".layer_norm2"),
            "attn": {
                "q": _lin_stack(sd, cfg.layers, f + ".self_attn.q_proj"),
                "k": _lin_stack(sd, cfg.layers, f + ".self_attn.k_proj"),
                "v": _lin_stack(sd, cfg.layers, f + ".self_attn.v_proj"),
                "o": _lin_stack(sd, cfg.layers, f + ".self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _lin_stack(sd, cfg.layers, f + ".mlp.fc1"),
                "fc2": _lin_stack(sd, cfg.layers, f + ".mlp.fc2"),
            },
        },
    })


def init_siglip_params(rng, cfg: SigLIPConfig, dtype=jnp.bfloat16) -> dict:
    keys = iter(jax.random.split(rng, 8))
    W, I, L = cfg.width, cfg.intermediate, cfg.layers

    def lin(n, fi, fo):
        return {"kernel": jax.random.normal(next(keys), (n, fi, fo), dtype) * 0.02,
                "bias": jnp.zeros((n, fo), dtype)}

    def ln(n):
        return {"scale": jnp.ones((n, W), dtype), "bias": jnp.zeros((n, W), dtype)}

    return {
        "patch_kernel": jax.random.normal(next(keys), (3 * cfg.patch_size ** 2, W),
                                          dtype) * 0.02,
        "patch_bias": jnp.zeros(W, dtype),
        "position_embedding": jax.random.normal(next(keys),
                                                (cfg.num_patches, W), dtype) * 0.01,
        "layers": {
            "ln1": ln(L), "ln2": ln(L),
            "attn": {x: lin(L, W, W) for x in ("q", "k", "v", "o")},
            "mlp": {"fc1": lin(L, W, I), "fc2": lin(L, I, W)},
        },
    }
