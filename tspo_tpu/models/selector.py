"""MultiModalAlign selector head — the ~3.5M-param trainable temporal agent.

Reference: ``model/temporal_agent.py:21-143`` (Simple_SelfAttn + MultiModal_Align).
Score for frame t:  mean-over-text-tokens cosine(contextualized frame emb,
text emb) + raw CLIP frame-text cosine, divided by temperature ``score_tau``.

TPU-first design decisions:
  - The reference materializes a dense [T, T] mask and full attention scores,
    masking all but a width-``w`` band (alpha=0 kills the global branch,
    temporal_agent.py:54-55).  We compute the band directly: O(T*w) gathers and
    [T, w] score tiles instead of O(T^2).  ``score_frames_dense`` keeps the
    literal formulation for equivalence tests.
  - Padded-bucket friendly: a ``valid`` mask + traced ``true_len`` let one
    compiled program serve every video in a shape bucket.
  - fp32 accumulation for the cosine/mean fusion (SURVEY.md §7.3 item 4:
    index fidelity is tie-sensitive).

The unused-but-checkpointed ``ffn_o`` projection and the dropout of the
reference are carried as parameters only, for checkpoint compatibility with
merged TSPO-0.4B selector state dicts (scripts/merge_weights.py:31-58).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import SelectorConfig
from ..ops.positional import sinusoidal_positional_encoding
from ..ops.masking import window_mask

Params = Mapping


def _linear_init(rng, fan_in, fan_out, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias — same bound
    as torch nn.Linear's kaiming_uniform(a=sqrt(5)) default."""
    kr, br = jax.random.split(rng)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(kr, (fan_in, fan_out), dtype, -bound, bound),
        "bias": jax.random.uniform(br, (fan_out,), dtype, -bound, bound),
    }


def init_selector_params(rng: jax.Array, cfg: SelectorConfig = SelectorConfig(),
                         dtype=jnp.float32) -> Params:
    d = cfg.dim
    keys = jax.random.split(rng, 6)
    return {
        "temporal": {
            "q": _linear_init(keys[0], d, d, dtype),
            "k": _linear_init(keys[1], d, d, dtype),
            "v": _linear_init(keys[2], d, d, dtype),
            "ffn_o": _linear_init(keys[3], d, d, dtype),  # checkpointed, unused
        },
        "mlp": {
            "fc1": _linear_init(keys[4], d, d, dtype),
            "fc2": _linear_init(keys[5], d, d, dtype),
        },
    }


def selector_param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _pair_cosine(a: jnp.ndarray, b: jnp.ndarray, eps: float) -> jnp.ndarray:
    """[N, C] x [M, C] -> [N, M] cosine similarity (ref temporal_agent.py:106-114).

    fp32 accumulation: bf16 cosine sums can flip near-tie frame rankings.
    """
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    dots = a32 @ b32.T
    an = jnp.sqrt(jnp.sum(a32 * a32, axis=-1))[:, None]
    bn = jnp.sqrt(jnp.sum(b32 * b32, axis=-1))[None, :]
    return dots / (an * bn + eps)


def _contextualize(params: Params, frame_emb, valid, true_len, cfg: SelectorConfig,
                   window_size: int, dense_mask: bool):
    """Shared trunk: PE -> windowed self-attn -> MLP residual. Returns [T, D]."""
    T, D = frame_emb.shape
    H, hd = cfg.num_heads, cfg.head_dim
    w = window_size

    pe = sinusoidal_positional_encoding(T, D, true_len, frame_emb.dtype)
    x = frame_emb + pe

    q = _dense(params["temporal"]["q"], x).reshape(T, H, hd).transpose(1, 0, 2)
    k = _dense(params["temporal"]["k"], x).reshape(T, H, hd).transpose(1, 0, 2)
    v = _dense(params["temporal"]["v"], x).reshape(T, H, hd).transpose(1, 0, 2)
    scale = 1.0 / np.sqrt(hd)

    if dense_mask:
        # Literal reference formulation (temporal_agent.py:38-56) for testing.
        mask = window_mask(T, w, valid)                        # [T, T]
        scores = jnp.einsum("htd,hsd->hts", q, k) * scale
        scores = jnp.where(mask[None], scores, cfg.mask_fill)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("hts,hsd->htd", attn, v)
    else:
        # Banded O(T*w): gather the w keys/values in each row's window.
        offs = jnp.arange(w) - w // 2                          # [w]
        cols = jnp.arange(T)[:, None] + offs[None, :]          # [T, w]
        in_range = (cols >= 0) & (cols < T)
        cols_c = jnp.clip(cols, 0, T - 1)
        band_ok = in_range & valid[cols_c]                     # [T, w]
        k_band = k[:, cols_c, :]                               # [H, T, w, hd]
        v_band = v[:, cols_c, :]
        scores = jnp.einsum("htd,htwd->htw", q, k_band) * scale
        scores = jnp.where(band_ok[None], scores, cfg.mask_fill)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("htw,htwd->htd", attn, v_band)

    ctx = ctx.transpose(1, 0, 2).reshape(T, D)
    h = _dense(params["mlp"]["fc1"], ctx)
    h = jax.nn.relu(h)
    h = _dense(params["mlp"]["fc2"], h)
    return h + frame_emb                                       # residual w/ raw input


def score_frames(params: Params, frame_emb: jnp.ndarray, text_emb: jnp.ndarray,
                 clip_scores: jnp.ndarray, *, cfg: SelectorConfig = SelectorConfig(),
                 window_size: int | None = None, score_tau: float | jnp.ndarray | None = None,
                 valid: jnp.ndarray | None = None, true_len=None,
                 dense_mask: bool = False):
    """Score every candidate frame against the question.

    Args:
      frame_emb:   [T, D] CLIP image embeddings (padded to a bucket).
      text_emb:    [M, D] CLIP text embedding(s); reference passes M=1.
      clip_scores: [T] raw CLIP frame-text cosine.
      valid:       [T] bool, True for real frames; None = all valid.
      true_len:    real frame count (traced ok); defaults to sum(valid).
      score_tau:   temperature; traced ok (annealed during training).

    Returns (logits [T] fp32, contextual_emb [T, D]).  Padded logits are
    meaningless — downstream selection masks them via ``valid``.
    """
    T, D = frame_emb.shape
    if valid is None:
        valid = jnp.ones(T, bool)
    if true_len is None:
        true_len = jnp.sum(valid)
    window_size = cfg.window_size if window_size is None else window_size
    score_tau = cfg.score_tau if score_tau is None else score_tau

    ctx = _contextualize(params, frame_emb, valid, true_len, cfg, window_size,
                         dense_mask)
    if text_emb.ndim == 1:
        text_emb = text_emb[None, :]
    sim = _pair_cosine(ctx, text_emb, cfg.cosine_eps).mean(axis=-1)   # [T]
    logits = (sim + clip_scores.astype(jnp.float32)) / score_tau
    return logits, ctx


def score_frames_dense(params, frame_emb, text_emb, clip_scores, **kw):
    """Dense-mask formulation (test oracle for the banded path)."""
    kw["dense_mask"] = True
    return score_frames(params, frame_emb, text_emb, clip_scores, **kw)


# ---------------------------------------------------------------------------
# Torch checkpoint interop (scripts/merge_weights.py selector state dicts)
# ---------------------------------------------------------------------------

_TORCH_MAP = {
    "temporal.Self_q": ("temporal", "q"),
    "temporal.Self_k": ("temporal", "k"),
    "temporal.Self_v": ("temporal", "v"),
    "temporal.ffn_o": ("temporal", "ffn_o"),
    "mlp.0": ("mlp", "fc1"),
    "mlp.2": ("mlp", "fc2"),
}


def selector_params_from_torch(state_dict: Mapping[str, "np.ndarray"],
                               dtype=jnp.float32) -> Params:
    """Convert a torch ``MultiModal_Align`` state dict (tensors or ndarrays)
    to our param pytree.  Accepts keys with or without a ``multiModal_align.``
    prefix (merge_weights.py strips it when extracting from the ZeRO shard)."""
    flat = {}
    for k, v in state_dict.items():
        k = k.removeprefix("multiModal_align.")
        arr = np.asarray(v.detach().cpu().float().numpy() if hasattr(v, "detach") else v)
        flat[k] = arr
    out = {"temporal": {}, "mlp": {}}
    for tkey, (grp, name) in _TORCH_MAP.items():
        w = flat[f"{tkey}.weight"]
        b = flat[f"{tkey}.bias"]
        out[grp][name] = {"kernel": jnp.asarray(w.T, dtype), "bias": jnp.asarray(b, dtype)}
    return out


def selector_params_to_torch(params: Params) -> dict:
    """Inverse of :func:`selector_params_from_torch` (numpy arrays, torch key
    layout) — used by the merged-checkpoint exporter."""
    out = {}
    for tkey, (grp, name) in _TORCH_MAP.items():
        p = params[grp][name]
        out[f"{tkey}.weight"] = np.asarray(p["kernel"]).T.copy()
        out[f"{tkey}.bias"] = np.asarray(p["bias"]).copy()
    return out
