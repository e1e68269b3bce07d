"""Memory-efficient attention: chunked online-softmax (flash) in pure JAX.

Used where materializing [S, S] scores would blow HBM: the Qwen2.5-VL vision
tower's global-attention layers (~10k patches after TSPO selects 64 frames)
and long-context LM prefill.  The lax.scan over KV chunks keeps the working
set at O(q_chunk * k_chunk) while XLA fuses the inner GEMMs onto the MXU;
numerics are fp32 online max/sum regardless of input dtype.

(A Pallas kernel version can drop in behind the same signature; this
formulation is already compute-bound on TPU for the shapes we run.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30


@partial(jax.jit, static_argnames=("causal", "q_chunk", "k_chunk", "window"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    valid_k: jnp.ndarray | None = None, causal: bool = False,
                    q_chunk: int = 1024, k_chunk: int = 1024,
                    window: int | None = None) -> jnp.ndarray:
    """q [B, Sq, H, hd], k/v [B, Sk, H, hd] -> [B, Sq, H, hd].

    ``valid_k`` [B, Sk] masks padded keys; ``causal`` applies q_pos >= k_pos
    with aligned sequence ends (standard self-attention when Sq == Sk);
    ``window`` additionally restricts to q_pos - k_pos < window (Mistral
    sliding-window attention).
    """
    B, Sq, H, hd = q.shape
    Sk = k.shape[1]
    scale = 1.0 / np.sqrt(hd)
    qc = min(q_chunk, Sq)
    kc = min(k_chunk, Sk)
    n_q = -(-Sq // qc)
    n_k = -(-Sk // kc)
    pad_q = n_q * qc - Sq
    pad_k = n_k * kc - Sk

    qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    vk = jnp.ones((B, Sk), bool) if valid_k is None else valid_k
    vk = jnp.pad(vk, ((0, 0), (0, pad_k)))

    qp = qp.reshape(B, n_q, qc, H, hd)
    kp = kp.reshape(B, n_k, kc, H, hd)
    vp = vp.reshape(B, n_k, kc, H, hd)
    vk = vk.reshape(B, n_k, kc)

    # align sequence ENDS (the documented causal contract): query i sits at
    # absolute position i + (Sk - Sq), so Sq < Sk means a suffix of queries
    # against a longer key prefix (incremental decode); Sq == Sk is standard
    # self-attention with a zero offset
    q_pos = jnp.arange(n_q * qc).reshape(n_q, qc) + (Sk - Sq)
    k_pos = jnp.arange(n_k * kc).reshape(n_k, kc)

    def per_q_chunk(qi):
        qb = qp[:, qi].astype(jnp.float32) * scale          # [B, qc, H, hd]

        def kv_step(carry, ki):
            m, l, acc = carry
            kb = kp[:, ki].astype(jnp.float32)
            vb = vp[:, ki].astype(jnp.float32)
            s = jnp.einsum("bqhd,bkhd->bhqk", qb, kb)       # [B, H, qc, kc]
            ok = vk[:, ki][:, None, None, :]                # [B, 1, 1, kc]
            if causal:
                cm = q_pos[qi][:, None] >= k_pos[ki][None, :]
                ok = ok & cm[None, None]
            if window is not None:
                wm = q_pos[qi][:, None] - k_pos[ki][None, :] < window
                ok = ok & wm[None, None]
            s = jnp.where(ok, s, _NEG)
            m_new = jnp.maximum(m, s.max(axis=-1))          # [B, H, qc]
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + p.sum(axis=-1)
            acc_new = acc * corr[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, vb)
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((B, H, qc), _NEG, jnp.float32)
        l0 = jnp.zeros((B, H, qc), jnp.float32)
        a0 = jnp.zeros((B, H, qc, hd), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(kv_step, (m0, l0, a0), jnp.arange(n_k))
        out = acc / jnp.maximum(l, 1e-37)[..., None]        # [B, H, qc, hd]
        return out.transpose(0, 2, 1, 3)                    # [B, qc, H, hd]

    out = jax.lax.map(per_q_chunk, jnp.arange(n_q))         # [n_q, B, qc, H, hd]
    out = out.transpose(1, 0, 2, 3, 4).reshape(B, n_q * qc, H, hd)
    return out[:, :Sq].astype(q.dtype)
