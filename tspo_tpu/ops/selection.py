"""Frame-selection ops: top-k, bin-max, AKS, Gumbel straight-through top-k.

Reference behavior being matched (see SURVEY.md C4/C5):
  - topk:    ``llava_qwen.py:154-157`` / ``temporal_agent.py:191-192``
  - bin-max: ``llava_qwen.py:159-176`` (uniform proposal bins, argmax per bin)
  - AKS:     ``model/utils.py:83-153`` (recursive mean/std split; host-side)
  - gumbel straight-through top-k: ``model/utils.py:69-80`` (stochastic
    selection, *noise-free* log-probs)
  - uniform: ``model/utils.py:53-67``

TPU design: the device ops take a fixed padded length with a ``valid`` mask so
one compiled program serves a whole shape bucket; invalid slots score -inf and
sort to the tail.  The device ops return ``(indices[k], count)`` where
``count = min(k, n_valid)``; callers slice ``indices[:count]`` host-side.
AKS and the tiny host helpers stay in numpy — they are O(T) on small arrays and
irregular (SURVEY.md §7.3 item 5).
"""

from __future__ import annotations

import heapq
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_NEG = -1e30


def generate_uniform_integers(t: int, l: int) -> list:
    """l integers uniformly spanning [0, t] (banker's rounding, ref utils.py:10-16)."""
    if l <= 0:
        return []
    if l == 1:
        return [t]
    step = t / (l - 1)
    return [round(i * step) for i in range(l)]


def uniform_sample_indices(n: int, num_samples: int) -> list:
    """Stride-based uniform subsample of range(n) (ref utils.py:53-67)."""
    if num_samples <= 0 or num_samples > n:
        return []
    step = n // num_samples
    remainder = n % num_samples
    out, index = [], 0
    for i in range(num_samples):
        out.append(index)
        index += step + (1 if i < remainder else 0)
    return out


def _sort_selected(indices: jnp.ndarray, keep: jnp.ndarray, pad_value: int):
    """Ascending sort of kept indices; dropped ones pushed to the tail."""
    key = jnp.where(keep, indices, pad_value)
    return jnp.sort(key)


@partial(jax.jit, static_argnames=("k",))
def topk_select(scores: jnp.ndarray, k: int, valid: jnp.ndarray | None = None):
    """Top-k scores -> ascending frame indices.

    Returns (indices[k] int32, count int32).  When fewer than k frames are
    valid, the first ``count`` slots hold the selection and the rest are T
    (an out-of-range sentinel).
    """
    T = scores.shape[0]
    if valid is None:
        valid = jnp.ones(T, bool)
    masked = jnp.where(valid, scores, _NEG)
    _, idx = jax.lax.top_k(masked, k)
    keep = valid[idx]
    return _sort_selected(idx, keep, T).astype(jnp.int32), jnp.sum(keep).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def bin_max_select(scores: jnp.ndarray, k: int, valid: jnp.ndarray | None = None):
    """k uniform proposal bins over the true length; argmax of scores per bin.

    Matches reference bin-max (llava_qwen.py:159-176): proposals are
    ``round(i*(n-1)/(k-1))``, every frame joins its nearest proposal (ties to
    the lower bin, as torch argmin), and the best-scoring frame per bin wins
    (ties to the lower index, as torch argmax).  Requires n_valid >= k — the
    host wrapper in models/tspo_model.py handles the degenerate small-video
    case by returning all indices, which is what the reference computes too.
    """
    T = scores.shape[0]
    if valid is None:
        valid = jnp.ones(T, bool)
    n = jnp.sum(valid).astype(jnp.float32)                      # true length (traced)
    i = jnp.arange(k, dtype=jnp.float32)
    proposals = jnp.round(i * (n - 1.0) / (k - 1.0))            # [k]
    x = jnp.arange(T, dtype=jnp.float32)
    dist = jnp.abs(x[:, None] - proposals[None, :])             # [T, k]
    slot = jnp.argmin(dist, axis=1)                             # [T], first-min ties
    masked = jnp.where(valid, scores, _NEG)
    in_bin = slot[None, :] == jnp.arange(k)[:, None]            # [k, T]
    per_bin = jnp.where(in_bin, masked[None, :], _NEG)          # [k, T]
    sel = jnp.argmax(per_bin, axis=1).astype(jnp.int32)         # first-max ties
    # A bin can only be empty if n < k (host handles); count = k here.
    return jnp.sort(sel), jnp.asarray(k, jnp.int32)


def gumbel_topk(rng: jax.Array, logits: jnp.ndarray, k: int,
                valid: jnp.ndarray | None = None, tau: float = 1.0,
                k_len: jnp.ndarray | None = None):
    """Gumbel-softmax straight-through top-k frame sampling.

    Matches reference ``model/utils.py:69-80``:
      selection   ~ top-k of softmax((logits + Gumbel)/tau)   (stochastic)
      probs       = straight-through one-hot (grads flow through the softmax)
      log_probs   = log_softmax(logits)                        (noise-free)

    Returns (indices[k] ascending, st_probs[T], log_probs[T]).  Gradients of
    ``log_probs`` at the selected indices drive the REINFORCE update
    (tspo_trainer.py:540-545,594-607).

    ``k_len`` (optional traced scalar <= k) selects only the top ``k_len``
    frames: the result equals gumbel_topk with k=k_len — the first k_len
    entries are the chosen indices ascending, the tail is 0-padded.  This is
    how mixed "general"/"specific" batches (different per-sample K,
    tspo_trainer.py per-type sample_len) share one compiled program.
    """
    T = logits.shape[0]
    if valid is None:
        valid = jnp.ones(T, bool)
    masked = jnp.where(valid, logits, _NEG)
    g = jax.random.gumbel(rng, (T,), dtype=logits.dtype)
    y = jax.nn.softmax(jnp.where(valid, (masked + g) / tau, _NEG))
    _, idxv = jax.lax.top_k(y, k)                       # by value, descending
    if k_len is None:
        idx = jnp.sort(idxv).astype(jnp.int32)
        one_hot = jnp.zeros_like(y).at[idx].set(1.0)
    else:
        keep = jnp.arange(k) < k_len
        # sentinels >= T sort to the tail; kept indices end up ascending first
        idx = jnp.sort(jnp.where(keep, idxv, T + jnp.arange(k)))
        idx = jnp.where(keep, idx, 0).astype(jnp.int32)
        one_hot = jnp.zeros_like(y).at[idxv].set(keep.astype(y.dtype))
    st_probs = one_hot - jax.lax.stop_gradient(y) + y
    log_probs = jax.nn.log_softmax(masked)
    return idx, st_probs, log_probs


# ---------------------------------------------------------------------------
# AKS — adaptive keyframe sampling (host-side; ref model/utils.py:83-153)
# ---------------------------------------------------------------------------

def _meanstd_split(dic_scores, n, fns, t1, t2, all_depth):
    """Recursive segment split: keep segments whose top-n scores stand out
    (mean of top-n minus segment mean > t1 and std > t2), bisect the rest up
    to ``all_depth``."""
    split_scores, split_fn = [], []
    no_split_scores, no_split_fn = [], []
    for dic, fn in zip(dic_scores, fns):
        score, depth = dic["score"], dic["depth"]
        mean = np.mean(score)
        std = np.std(score)
        top_n = heapq.nlargest(n, range(len(score)), score.__getitem__)
        mean_diff = np.mean([score[t] for t in top_n]) - mean
        if mean_diff > t1 and std > t2:
            no_split_scores.append(dic)
            no_split_fn.append(fn)
        elif depth < all_depth:
            h = len(score) // 2
            split_scores.append(dict(score=score[:h], depth=depth + 1))
            split_scores.append(dict(score=score[h:], depth=depth + 1))
            split_fn.append(fn[:h])
            split_fn.append(fn[h:])
        else:
            no_split_scores.append(dic)
            no_split_fn.append(fn)
    if split_scores:
        rec_scores, rec_fn = _meanstd_split(split_scores, n, split_fn, t1, t2, all_depth)
    else:
        rec_scores, rec_fn = [], []
    return no_split_scores + rec_scores, no_split_fn + rec_fn


def aks_select(scores: np.ndarray, max_num_frames: int,
               t1: float = 0.2, t2: float = -100.0, all_depth: int = 3) -> list:
    """Adaptive keyframe sampling over a host score vector.

    Thresholds follow the reference defaults (utils.py:131-133 — LVB profile;
    VideoMME uses t1=0.8, all_depth=5).  Budget per surviving segment is
    ``max_num_frames / 2**depth``.
    """
    scores = np.asarray(scores, np.float32)
    fn = list(range(len(scores)))
    num = max_num_frames
    if len(scores) < num:
        return fn
    lo, hi = np.min(scores), np.max(scores)
    normalized = (scores - lo) / (hi - lo) if hi > lo else np.zeros_like(scores)
    segs, seg_fns = _meanstd_split([dict(score=normalized, depth=0)], num, [fn],
                                   t1, t2, all_depth)
    out = []
    for s, f in zip(segs, seg_fns):
        f_num = int(num / 2 ** s["depth"])
        topk = heapq.nlargest(f_num, range(len(s["score"])), s["score"].__getitem__)
        out.extend(f[t] for t in topk)
    out.sort()
    return out
