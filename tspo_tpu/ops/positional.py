"""Sinusoidal temporal positional encoding.

Matches reference ``model/temporal_agent.py:10-19``: positions are *normalized*
(pos/T, so the encoding is invariant to absolute video length) and frequencies
follow the standard transformer schedule exp(-log(1e4) * 2i / C).

TPU notes: computed in fp32 regardless of activation dtype (bf16 sin/cos loses
precision at the low-frequency end), then cast by the caller.  Supports padded
buckets: ``true_len`` normalizes positions by the real frame count while the
array is sized to the padded bucket, so one jit trace serves all videos in a
bucket.
"""

from __future__ import annotations

import jax.numpy as jnp


def sinusoidal_positional_encoding(padded_len: int, channels: int,
                                   true_len: jnp.ndarray | int | None = None,
                                   dtype=jnp.float32) -> jnp.ndarray:
    """Return [padded_len, channels] PE; positions normalized by ``true_len``.

    Reference semantics (temporal_agent.py:15): position = arange(T)/T.
    ``true_len`` may be a traced scalar (dynamic video length inside jit).
    """
    if true_len is None:
        true_len = padded_len
    half = channels // 2
    pos = jnp.arange(padded_len, dtype=jnp.float32)[:, None] / jnp.asarray(
        true_len, jnp.float32)                                      # [T, 1]
    div = jnp.exp(jnp.arange(0, channels, 2, dtype=jnp.float32) *
                  (-jnp.log(10000.0) / channels))                   # [half]
    angles = pos * div[None, :]                                     # [T, half]
    pe = jnp.zeros((padded_len, channels), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    # cos lane has floor(C/2) columns; for odd C angles carries one extra
    pe = pe.at[:, 1::2].set(jnp.cos(angles[:, :half]))
    return pe.astype(dtype)
