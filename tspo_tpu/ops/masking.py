"""Window masks and shape-bucketing utilities.

The reference builds its window mask with a python double loop over clamped
indices (``model/temporal_agent.py:97-104``).  The clamped writes collapse to a
contiguous band: mask[j, c] = 1  iff  j - w//2 <= c <= j - w//2 + w - 1, clipped
to [0, T-1].  We express that directly with broadcasting — and, for the O(T*w)
banded-attention path, as per-row column offsets.

XLA needs static shapes, so variable frame counts are padded to buckets
(SURVEY.md §7.3 item 2); ``valid_mask`` carries the true length.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def window_mask(seq_len: int, window_size: int,
                valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dense [T, T] boolean band mask, True where attention is allowed.

    Equivalent to reference ``create_window_mask`` (temporal_agent.py:97-104):
    row j attends columns [j - w//2, j + w - w//2 - 1] ∩ [0, T-1].
    ``valid`` ([T] bool) additionally masks padded key columns.
    """
    j = jnp.arange(seq_len)[:, None]
    c = jnp.arange(seq_len)[None, :]
    lo = j - window_size // 2
    mask = (c >= lo) & (c <= lo + window_size - 1)
    if valid is not None:
        mask = mask & valid[None, :]
    return mask


def band_offsets(window_size: int) -> np.ndarray:
    """Column offsets of the band relative to the query row: [-w//2, w-w//2-1]."""
    return np.arange(window_size) - window_size // 2


def bucket_for(n: int, buckets=(64, 128, 256, 512, 1024, 2048, 4096, 8192)) -> int:
    """Smallest bucket >= n; falls back to next multiple of the largest bucket."""
    for b in buckets:
        if n <= b:
            return b
    big = buckets[-1]
    return ((n + big - 1) // big) * big


def pad_to_bucket(x: np.ndarray, bucket: int, axis: int = 0, fill=0):
    """Pad ``x`` along ``axis`` to ``bucket``; returns (padded, valid_mask[bucket])."""
    n = x.shape[axis]
    if n > bucket:
        raise ValueError(f"length {n} exceeds bucket {bucket}")
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, bucket - n)
    padded = np.pad(x, pad_width, constant_values=fill)
    valid = np.zeros(bucket, bool)
    valid[:n] = True
    return padded, valid
