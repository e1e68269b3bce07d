"""Pallas TPU flash-attention kernel.

Hand-scheduled counterpart of ops/flash_attention.py for the hot attention
shapes (backbone prefill 3k-13k tokens): grid (B, H, q_blocks, k_blocks)
with the innermost k dimension iterated sequentially per q block,
online-softmax running stats in VMEM scratch, one [blk_q, head_dim] fp32
accumulator — the standard TPU flash schedule from the Pallas guide
(/opt/skills/guides/pallas_guide.md, Patterns).

Performance-critical choices (measured on v5e, docs/KERNELS.md):
  - matmuls run on the MXU in the INPUT dtype with fp32 accumulation
    (``preferred_element_type``) — casting inputs to fp32 first (the old
    kernel, and ops/flash_attention.py) runs the MXU at the ~8x slower fp32
    rate, which made prefill attention half of the B=8 P=3200 prefill time;
  - native GQA: k/v may carry ``KV < H`` heads — the grid's h axis indexes
    kv via ``h // (H // KV)`` so nothing is repeated (the XLA-flash path
    materializes the 7x-repeated KV, +366 MB/layer at the 7B shape);
  - dead blocks are skipped: k blocks entirely above the causal diagonal or
    entirely past the valid prefix length do no compute (their DMA still
    streams, but MXU/VPU work is gated by ``pl.when``).

TPU layout notes: scratch tensors keep the 128-lane last dimension (running
max/denom live broadcast across lanes), and key validity is a *contiguous
prefix length* per batch in SMEM rather than a mask vector — which matches
every call site (right-padded prompts; fully-valid vision sequences).

``pallas_flash_attention`` mirrors ``flash_attention`` (causal + prefix-valid
keys) and is verified against it in tests (interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_LANES = 128


def _kernel(len_ref, qoff_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr,
            acc_scr, *, scale: float, causal: bool, blk_q: int, blk_k: int,
            window: int | None):
    ki = pl.program_id(3)
    qi = pl.program_id(2)                 # bound at top level: the CPU
    bi = pl.program_id(0)                 # interpreter can't translate
    n_k = pl.num_programs(3)              # program_id inside pl.when regions

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    n_valid = len_ref[bi]                 # SMEM, indexed by the grid's b axis
    q_off = qoff_ref[0]                   # q rows sit at key positions
    #                                       [q_off, q_off + Sq) — suffix
    #                                       prefill over an existing cache
    live = ki * blk_k < n_valid           # block has at least one valid key
    if causal:                            # ...and is not above the diagonal
        live = jnp.logical_and(
            live, ki * blk_k <= q_off + (qi + 1) * blk_q - 1)
    if window is not None:                # ...and not wholly past the window
        live = jnp.logical_and(
            live,
            q_off + qi * blk_q - (ki * blk_k + blk_k - 1) < window)

    @pl.when(live)
    def _():
        q = q_ref[0, 0]                                    # [blk_q, hd]
        k = k_ref[0, 0]                                    # [blk_k, hd]
        v = v_ref[0, 0]
        # input-dtype MXU matmul, fp32 accumulation
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        k_pos = ki * blk_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = k_pos < n_valid
        if causal or window is not None:
            q_pos = q_off + qi * blk_q + \
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            if causal:
                mask = mask & (q_pos >= k_pos)
            if window is not None:
                mask = mask & (q_pos - k_pos < window)
        s = jnp.where(mask, s, _NEG)

        m_prev = m_scr[:, 0]                               # [blk_q]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        p = jnp.exp(s - m_new[:, None])
        corr = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, 0] * corr + jnp.sum(p, axis=1)
        acc_scr[:] = acc_scr[:] * corr[:, None] + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new[:, None], m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new[:, None], l_scr.shape)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[0, 0] = (acc_scr[:] /
                       jnp.maximum(l_scr[:, 0], 1e-37)[:, None]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("causal", "blk_q", "blk_k", "interpret", "window"))
def pallas_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           valid_k: jnp.ndarray | None = None,
                           causal: bool = False, blk_q: int = 512,
                           blk_k: int = 512, interpret: bool = False,
                           window: int | None = None,
                           q_offset=0) -> jnp.ndarray:
    """q [B, Sq, H, hd], k/v [B, Sk, KV, hd] -> [B, Sq, H, hd].

    ``KV`` may divide ``H`` (grouped-query attention): head h attends to kv
    head ``h // (H // KV)`` with no materialized repeat.  ``valid_k``
    [B, Sk] bool must be a contiguous True prefix (right-padded sequences) —
    only its per-row count enters the kernel.  ``window`` restricts keys to
    q_pos - k_pos < window (Mistral sliding-window), with whole dead blocks
    skipped like the causal triangle.  ``q_offset`` (traced scalar) places
    the q rows at key positions [q_offset, q_offset + Sq) — suffix prefill
    appended after an existing cache (conversation extension, chunked
    admission); 0 is the ordinary full-prompt case.
    """
    B, Sq, H, hd = q.shape
    Sk = k.shape[1]
    KV = k.shape[2]
    if H % KV:
        raise ValueError(f"H={H} not divisible by kv heads {KV}")
    group = H // KV
    blk_q = min(blk_q, max(Sq, 8))
    blk_k = min(blk_k, max(Sk, 8))
    n_q = -(-Sq // blk_q)
    n_k = -(-Sk // blk_k)
    pad_q = n_q * blk_q - Sq
    pad_k = n_k * blk_k - Sk

    qt = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    kt = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    vt = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    if valid_k is None:
        lengths = jnp.full((B,), Sk, jnp.int32)
    else:
        lengths = jnp.sum(valid_k.astype(jnp.int32), axis=-1)

    grid = (B, H, n_q, n_k)
    out = pl.pallas_call(
        partial(_kernel, scale=1.0 / np.sqrt(hd), causal=causal,
                blk_q=blk_q, blk_k=blk_k, window=window),
        grid=grid,
        in_specs=[
            # full [B] vector in SMEM every program (TPU lowering rejects
            # sub-blocks whose dims neither tile nor equal the array)
            pl.BlockSpec((B,), lambda b, h, qi, ki: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda b, h, qi, ki: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, blk_q, hd), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, blk_k, hd),
                         lambda b, h, qi, ki, g=group: (b, h // g, ki, 0)),
            pl.BlockSpec((1, 1, blk_k, hd),
                         lambda b, h, qi, ki, g=group: (b, h // g, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, hd),
                               lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, n_q * blk_q, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, _LANES), jnp.float32),   # running max
            pltpu.VMEM((blk_q, _LANES), jnp.float32),   # running denom
            pltpu.VMEM((blk_q, hd), jnp.float32),       # output accumulator
        ],
        interpret=interpret,
    )(lengths, jnp.asarray(q_offset, jnp.int32).reshape(1), qt, kt, vt)
    return out.transpose(0, 2, 1, 3)[:, :Sq]
