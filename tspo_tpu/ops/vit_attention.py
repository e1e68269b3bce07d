"""Fused single-shot ViT attention — Pallas TPU kernel for the CLIP/SigLIP
towers (no mask, full sequence fits VMEM).

Why this exists (measured on v5e, see bench.py): XLA's einsum attention at the
CLIP-L/14 vision shape ([B, 16 heads, 257, 64]) materializes the [B, H, S, S]
score tensor in HBM and pays 4 layout transposes per layer — 44% of tower
time for ~8% of FLOPs.  This kernel takes q/k/v in their NATURAL [B, S, W]
GEMM-output layout (no transposes at all), slices heads on the lane axis
inside VMEM, and computes softmax(q kᵀ)v per head in one shot — S=257 fits
VMEM whole, so no online-softmax machinery is needed (contrast
ops/pallas_attention.py, the blocked flash kernel for the 12k-token backbone
prefill).  End-to-end tower: 650 -> 755 frames/s, feature cosine vs XLA
>= 0.9998.

The reference gets the same capability from flash-attn 2.5.9 CUDA wheels
(SURVEY.md §0); this is the TPU-native counterpart for the scoring towers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _lane_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, head_dim: int,
                 scale: float):
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[0][:, sl]
        kh = k_ref[0][:, sl]
        vh = v_ref[0][:, sl]
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q_ref.dtype)
        o_ref[0, :, sl] = jnp.dot(
            p, vh, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _xla_attention(q, k, v, heads: int):
    B, S, W = q.shape
    hd = W // heads
    qh = q.reshape(B, S, heads, hd)
    kh = k.reshape(B, S, heads, hd)
    vh = v.reshape(B, S, heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (1.0 / np.sqrt(hd))
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, S, W)


def vit_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int,
                  impl: str = "auto", interpret: bool = False) -> jnp.ndarray:
    """Unmasked multi-head attention over [B, S, W] (W = heads * head_dim).

    impl: "pallas" (TPU lane-sliced kernel), "xla" (einsum), or "auto"
    (pallas on TPU backends, xla elsewhere).  Inputs/outputs stay in the
    natural GEMM layout; no [B, H, S, hd] transposes anywhere.
    """
    B, S, W = q.shape
    if W % heads:
        raise ValueError(f"width {W} not divisible by heads {heads}")
    hd = W // heads
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _xla_attention(q, k, v, heads)
    kernel = partial(_lane_kernel, heads=heads, head_dim=hd,
                     scale=1.0 / np.sqrt(hd))
    return pl.pallas_call(
        kernel, grid=(B,),
        in_specs=[pl.BlockSpec((1, S, W), lambda b: (b, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, S, W), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, W), q.dtype),
        interpret=interpret,
    )(q, k, v)
