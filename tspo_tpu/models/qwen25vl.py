"""Qwen2.5-VL backbone — the zero-shot transfer target of TSPO.

Reference usage: ``demo/qwen25vl_tspo.py`` and the eval adapter
``lmms_eval/models/simple/qwen2_5_vl_tspo.py`` + vendored
``qwen25vl_vision_process.py`` (smart_resize pixel budget).  The torch model
comes from transformers; this is a from-scratch JAX rebuild:

  vision tower: 3D patchify (2-frame temporal patches) -> 32 blocks of
    RMSNorm + 2D-rope attention (windowed 112px; global every 8th block) +
    SwiGLU -> 2x2 patch merger MLP into the LM width.
    TPU mapping: window attention runs as *batched fixed-size windows*
    (gather merged cells per window, pad, mask) — no varlen flash needed;
    the four global layers use chunked flash attention (ops/flash_attention).
  language model: the Qwen2 decoder of models/qwen2.py with multimodal 3D
    rope (mrope sections) during prefill.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache, partial
from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.flash_attention import flash_attention
from ..utils.hf_port import state_dict_of
from .clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
from .qwen2 import (KVCache, Qwen2Config, embed_tokens, greedy_decode,
                    mrope_cos_sin, qwen2_params_from_torch,
                    init_qwen2_params)


@dataclass(frozen=True)
class Qwen25VLVisionConfig:
    depth: int = 32
    hidden: int = 1280
    intermediate: int = 3420
    heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple = (7, 15, 23, 31)
    out_hidden: int = 3584
    tokens_per_second: float = 2.0
    rms_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2

    @property
    def merger_window(self) -> int:
        """Window side in merged cells (HF vit_merger_window_size)."""
        return self.window_size // self.spatial_merge_size // self.patch_size

    @property
    def patch_dim(self) -> int:
        return 3 * self.temporal_patch_size * self.patch_size ** 2

    @classmethod
    def tiny(cls) -> "Qwen25VLVisionConfig":
        return cls(depth=4, hidden=32, intermediate=64, heads=4, patch_size=4,
                   window_size=16, fullatt_block_indexes=(1, 3), out_hidden=64)


@dataclass(frozen=True)
class Qwen25VLConfig:
    vision: Qwen25VLVisionConfig = field(default_factory=Qwen25VLVisionConfig)
    lm: Qwen2Config = field(default_factory=lambda: Qwen2Config(
        rope_theta=1_000_000.0, eos_token_id=151645))
    mrope_section: tuple = (16, 24, 24)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    max_context: int = 16384

    @classmethod
    def tiny(cls) -> "Qwen25VLConfig":
        lm = Qwen2Config.tiny()
        return cls(vision=Qwen25VLVisionConfig.tiny(), lm=lm,
                   mrope_section=(2, 3, 3),        # sums to head_dim//2 = 8
                   image_token_id=lm.vocab_size - 5,
                   video_token_id=lm.vocab_size - 4,
                   vision_start_token_id=lm.vocab_size - 3,
                   vision_end_token_id=lm.vocab_size - 2,
                   max_context=2048)

    @classmethod
    def from_hf_config(cls, hf: dict) -> "Qwen25VLConfig":
        """Build from an HF Qwen2_5_VL config.json dict (handles both the
        nested text_config layout and older flat layouts)."""
        t = hf.get("text_config", hf)
        v = hf["vision_config"]
        rope = t.get("rope_scaling") or hf.get("rope_scaling") or {}
        lm = Qwen2Config(
            vocab_size=t["vocab_size"], hidden_size=t["hidden_size"],
            intermediate_size=t["intermediate_size"],
            num_layers=t["num_hidden_layers"],
            num_heads=t["num_attention_heads"],
            num_kv_heads=t["num_key_value_heads"],
            head_dim=t.get("head_dim",
                           t["hidden_size"] // t["num_attention_heads"]),
            rope_theta=t.get("rope_theta", 1_000_000.0),
            rms_eps=t.get("rms_norm_eps", 1e-6),
            max_position_embeddings=t.get("max_position_embeddings", 32768),
            tie_word_embeddings=t.get("tie_word_embeddings",
                                      hf.get("tie_word_embeddings", False)),
            eos_token_id=hf.get("eos_token_id", 151645))
        vision = Qwen25VLVisionConfig(
            depth=v["depth"], hidden=v.get("hidden_size", 1280),
            intermediate=v["intermediate_size"], heads=v["num_heads"],
            patch_size=v["patch_size"],
            temporal_patch_size=v["temporal_patch_size"],
            spatial_merge_size=v["spatial_merge_size"],
            window_size=v["window_size"],
            fullatt_block_indexes=tuple(v["fullatt_block_indexes"]),
            out_hidden=v["out_hidden_size"],
            tokens_per_second=v.get("tokens_per_second", 2.0))
        return cls(vision=vision, lm=lm,
                   mrope_section=tuple(rope.get("mrope_section", (16, 24, 24))),
                   image_token_id=hf.get("image_token_id", 151655),
                   video_token_id=hf.get("video_token_id", 151656),
                   vision_start_token_id=hf.get("vision_start_token_id", 151652),
                   vision_end_token_id=hf.get("vision_end_token_id", 151653))


# ---------------------------------------------------------------------------
# Host-side preprocessing (smart_resize + 3D patchify, HF processor parity)
# ---------------------------------------------------------------------------

def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280):
    """HF Qwen2VLImageProcessor.smart_resize: dims divisible by ``factor``,
    pixel count within budget, aspect preserved."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio must be < 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def preprocess_video(frames: np.ndarray, cfg: Qwen25VLVisionConfig,
                     min_pixels: int = 56 * 56, max_pixels: int = 235200):
    """[T, H, W, 3] uint8 -> (patches [n_patches, patch_dim] fp32, grid_thw).

    Matches Qwen2VLImageProcessor._preprocess ordering exactly: CLIP-stat
    normalization, odd-tail frame repeat, (t, h', w', merge, merge) cell-major
    flatten with (c, tp, P, P) inner layout.  max_pixels default 235200
    follows the TSPO eval budget (evaluation/TSPO_qwen25_vl.sh:25)."""
    import cv2
    T, H, W, _ = frames.shape
    factor = cfg.patch_size * cfg.spatial_merge_size
    rh, rw = smart_resize(H, W, factor, min_pixels, max_pixels)
    resized = np.stack([cv2.resize(f, (rw, rh), interpolation=cv2.INTER_CUBIC)
                        for f in frames])
    x = resized.astype(np.float32) / 255.0
    x = (x - np.array(CLIP_IMAGE_MEAN)) / np.array(CLIP_IMAGE_STD)
    x = x.transpose(0, 3, 1, 2)                               # [T, C, H, W]

    tp, P, m = cfg.temporal_patch_size, cfg.patch_size, cfg.spatial_merge_size
    if T % tp != 0:
        x = np.concatenate([x, np.repeat(x[-1:], tp - T % tp, axis=0)])
    grid_t = x.shape[0] // tp
    grid_h, grid_w = rh // P, rw // P
    x = x.reshape(grid_t, tp, 3, grid_h // m, m, P, grid_w // m, m, P)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = x.reshape(grid_t * grid_h * grid_w, 3 * tp * P * P)
    return patches, (grid_t, grid_h, grid_w)


@lru_cache(maxsize=64)
def _vision_layout(grid_t: int, grid_h: int, grid_w: int, merge: int,
                   merger_window: int):
    """Host-side per-grid layout (cached):

      pos_hw        [n_cells*mu, 2] (h, w) patch positions, cell-major order
      window_cells  [n_windows, merger_window^2] merged-cell ids (-1 pad)
    """
    Hm, Wm = grid_h // merge, grid_w // merge
    # (h, w) ids in the processor's cell-major patch order
    h_ids = np.arange(grid_h).reshape(Hm, merge, 1, 1)
    h_ids = np.broadcast_to(h_ids, (Hm, merge, Wm, merge)).transpose(0, 2, 1, 3)
    w_ids = np.arange(grid_w).reshape(1, 1, Wm, merge)
    w_ids = np.broadcast_to(w_ids, (Hm, merge, Wm, merge)).transpose(0, 2, 1, 3)
    pos_hw = np.stack([h_ids.reshape(-1), w_ids.reshape(-1)], axis=-1)
    pos_hw = np.tile(pos_hw, (grid_t, 1))                    # [t*h*w, 2]

    vw = merger_window
    nwh, nww = -(-Hm // vw), -(-Wm // vw)
    cells = np.full((grid_t, nwh * vw, nww * vw), -1, np.int64)
    cells[:, :Hm, :Wm] = np.arange(grid_t * Hm * Wm).reshape(grid_t, Hm, Wm)
    cells = cells.reshape(grid_t, nwh, vw, nww, vw).transpose(0, 1, 3, 2, 4)
    window_cells = cells.reshape(grid_t * nwh * nww, vw * vw)
    return pos_hw, window_cells


def _vision_rope(pos_hw: np.ndarray, head_dim: int, theta: float = 10000.0):
    """2D rope cos/sin [S, head_dim] from (h, w) patch positions."""
    dim = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2) / dim))  # [head_dim//4]
    freqs = pos_hw[:, :, None] * inv_freq[None, None, :]      # [S, 2, hd//4]
    half = freqs.reshape(len(pos_hw), -1)                     # [S, hd//2]
    emb = np.concatenate([half, half], axis=-1)               # [S, head_dim]
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


# ---------------------------------------------------------------------------
# Vision tower forward
# ---------------------------------------------------------------------------

def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


def _rot_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope_vis(x, cos, sin):
    x32 = x.astype(jnp.float32)
    out = x32 * cos[:, None, :] + _rot_half(x32) * sin[:, None, :]
    return out.astype(x.dtype)


@partial(jax.jit, static_argnames=("cfg",))
def qwen25vl_vision_forward(params: Mapping, patches: jnp.ndarray,
                            cos: jnp.ndarray, sin: jnp.ndarray,
                            window_cells: jnp.ndarray,
                            cfg: Qwen25VLVisionConfig) -> jnp.ndarray:
    """[S, patch_dim] pixel patches -> [S/merge_unit, out_hidden] features.

    S must be cell-major (processor order); ``window_cells`` from
    ``_vision_layout``.  One jit trace per (S, n_windows) shape.
    """
    S = patches.shape[0]
    D, H, hd = cfg.hidden, cfg.heads, cfg.head_dim
    mu = cfg.merge_unit
    n_cells = S // mu
    nW, wc = window_cells.shape                      # windows x cells/window

    x = patches.astype(params["patch_kernel"].dtype) @ params["patch_kernel"]

    win_valid = window_cells >= 0                                # [nW, wc]
    cells_safe = jnp.where(win_valid, window_cells, 0)
    key_ok = jnp.repeat(win_valid, mu, axis=1)                   # [nW, wc*mu]

    def gather_windows(t):  # [S, ...] -> [nW, wc*mu, ...]
        tc = t.reshape(n_cells, mu, *t.shape[1:])
        return tc[cells_safe].reshape(nW, wc * mu, *t.shape[1:])

    cos_w = gather_windows(cos)
    sin_w = gather_windows(sin)

    def attn(h_in, lp, full: bool):
        qkv = h_in @ lp["qkv"]["kernel"] + lp["qkv"]["bias"]     # [S, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(-1, H, hd)
        k = k.reshape(-1, H, hd)
        v = v.reshape(-1, H, hd)
        if full:
            q = _apply_rope_vis(q, cos, sin)
            k = _apply_rope_vis(k, cos, sin)
            if jax.default_backend() == "tpu":
                # Pallas flash (bf16 MXU + fp32 accumulate); hd=80 is legal
                # because the head-dim block equals the full array dim
                from ..ops.pallas_attention import pallas_flash_attention
                ctx = pallas_flash_attention(q[None], k[None], v[None],
                                             blk_q=1024, blk_k=1024)[0]
            else:
                ctx = flash_attention(q[None], k[None], v[None],
                                      q_chunk=2048, k_chunk=2048)[0]
            ctx = ctx.reshape(S, D)
        else:
            qw = gather_windows(q)                                # [nW, wcmu, H, hd]
            kw = gather_windows(k)
            vw = gather_windows(v)
            qw = jax.vmap(_apply_rope_vis)(qw, cos_w, sin_w)
            kw = jax.vmap(_apply_rope_vis)(kw, cos_w, sin_w)
            s = jnp.einsum("nqhd,nkhd->nhqk", qw, kw).astype(jnp.float32)
            s = s / np.sqrt(hd)
            s = jnp.where(key_ok[:, None, None, :], s, -1e30)
            a = jax.nn.softmax(s, axis=-1).astype(h_in.dtype)
            ow = jnp.einsum("nhqk,nkhd->nqhd", a, vw).reshape(nW, wc, mu, D)
            # scatter back to cell-major order (pads dropped)
            flat = jnp.zeros((n_cells + 1, mu, D), h_in.dtype)
            idx = jnp.where(win_valid, window_cells, n_cells)
            ctx = flat.at[idx].set(ow)[:n_cells].reshape(S, D)
        return ctx @ lp["proj"]["kernel"] + lp["proj"]["bias"]

    full_set = frozenset(cfg.fullatt_block_indexes)
    h = x
    # Per-layer python loop (not scan): window vs full attention alternates by
    # static layer index; 32 small blocks compile fine.
    for li in range(cfg.depth):
        lp = jax.tree_util.tree_map(lambda a: a[li], params["layers"])
        h = h + attn(_rms(h, lp["norm1"], cfg.rms_eps), lp, li in full_set)
        z = _rms(h, lp["norm2"], cfg.rms_eps)
        gate = jax.nn.silu(z @ lp["gate"]["kernel"] + lp["gate"]["bias"])
        up = z @ lp["up"]["kernel"] + lp["up"]["bias"]
        h = h + (gate * up) @ lp["down"]["kernel"] + lp["down"]["bias"]

    # Patch merger: RMSNorm then 2x2 cell concat -> MLP -> out_hidden
    mp = params["merger"]
    h = _rms(h, mp["ln_q"], cfg.rms_eps).reshape(n_cells, mu * D)
    h = jax.nn.gelu(h @ mp["fc1"]["kernel"] + mp["fc1"]["bias"], approximate=False)
    return h @ mp["fc2"]["kernel"] + mp["fc2"]["bias"]


# ---------------------------------------------------------------------------
# M-RoPE position ids (single text-video-text sequence)
# ---------------------------------------------------------------------------

def rope_index_for_video(n_pre: int, grid_thw, n_post: int, merge: int,
                         tokens_per_second: float, second_per_grid_t: float):
    """3D position ids [3, S] for [text video text] and the decode start
    position (HF get_rope_index single-video case)."""
    gt, gh, gw = grid_thw
    Hm, Wm = gh // merge, gw // merge
    pre = np.tile(np.arange(n_pre), (3, 1))
    t_idx = np.repeat(np.arange(gt), Hm * Wm)
    t_idx = (t_idx * second_per_grid_t * tokens_per_second).astype(np.int64)
    h_idx = np.tile(np.repeat(np.arange(Hm), Wm), gt)
    w_idx = np.tile(np.arange(Wm), gt * Hm)
    vid = np.stack([t_idx, h_idx, w_idx]) + n_pre
    post_start = vid.max() + 1
    post = np.tile(np.arange(n_post), (3, 1)) + post_start
    pos = np.concatenate([pre, vid, post], axis=1)
    return pos, int(pos.max()) + 1


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

QWEN25_SYSTEM = "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"


class Qwen25VLConversationState:
    """Prefix-KV conversation state for Qwen2.5-VL multi-round chat — the
    m-rope analog of llava_video.ConversationState.  Holds the encoded
    video (feats + grid, encoded once per conversation), the covered token
    ids (1:1 with embed indices — the video placeholder ids are explicit
    here), the KV cache, and the position ``meta`` (idx_post0, post_start)
    mapping post-video cache indices to rope positions (linear:
    pos(j) = post_start + j - idx_post0)."""

    def __init__(self, headroom: int = 2048):
        self.headroom = int(headroom)
        self.video = None            # (feats [n_vid, D], grid_thw)
        self.ids: list = []
        self.covered = 0
        self.cache = None
        self.meta = None             # (idx_post0, post_start)

    def reset(self):
        """Drop the cache (capacity overflow / divergence in the prefix):
        the next round re-prefills fully.  Video features stay."""
        self.ids, self.covered, self.cache = [], 0, None


@dataclass
class Qwen25VLModel:
    """Host orchestrator for the Qwen2.5-VL backbone."""

    params: dict
    cfg: Qwen25VLConfig = field(default_factory=Qwen25VLConfig)
    encode: Callable | None = None
    decode: Callable | None = None
    max_new_tokens: int = 256
    max_pixels: int = 235200        # TSPO eval budget (TSPO_qwen25_vl.sh:25)
    second_per_grid_t: float = 2.0  # temporal_patch_size / fps with the
                                    # nominal 1-fps frames TSPO feeds
                                    # (qwen_vl_utils video metadata convention)
    # prompt-lookup speculative decoding (qwen2.greedy_decode_speculative):
    # exact greedy, fewer weight passes; drafts come from the prompt's text
    # ids (the video-token span carries no ids)
    speculative: bool = False
    draft_len: int = 8

    def encode_video(self, frames: np.ndarray):
        v = self.cfg.vision
        patches, grid = preprocess_video(frames, v, max_pixels=self.max_pixels)
        pos_hw, window_cells = _vision_layout(*grid, v.spatial_merge_size,
                                              v.merger_window)
        cos, sin = _vision_rope(pos_hw, v.head_dim)
        feats = qwen25vl_vision_forward(
            self.params["visual"], jnp.asarray(patches), jnp.asarray(cos),
            jnp.asarray(sin), jnp.asarray(window_cells), v)
        return feats, grid                                   # [n_merged, out]

    def build_prompt_ids(self, question: str, n_video_tokens: int,
                         post_text: str | None = None):
        """Prompt ids around the video block; ``post_text`` overrides the
        single-turn question rendering (the multi-round path passes the
        fully rendered conversation remainder)."""
        c = self.cfg
        pre_text = QWEN25_SYSTEM + "<|im_start|>user\n"
        if post_text is None:
            post_text = question + "<|im_end|>\n<|im_start|>assistant\n"
        pre_ids = list(self.encode(pre_text)) + [c.vision_start_token_id]
        vid_ids = [c.video_token_id] * n_video_tokens
        post_ids = [c.vision_end_token_id] + list(self.encode(post_text))
        return pre_ids, vid_ids, post_ids

    @staticmethod
    def _render_rounds(turns) -> str:
        """Render multi-turn history into the post-video text of the
        Qwen2.5 chat template.  ``turns``: [(q, a), ..., (q_last, None)];
        a single (q, None) renders byte-identically to generate()'s own
        post text, so one-round conversations match generate exactly."""
        turns = list(turns)
        if not turns or turns[-1][1] is not None:
            raise ValueError("turns must end with an unanswered (q, None)")
        parts = []
        for i, (q, a) in enumerate(turns):
            if i > 0:
                parts.append("<|im_start|>user\n")
            parts.append(q + "<|im_end|>\n<|im_start|>assistant\n")
            if a is not None:
                parts.append(a + "<|im_end|>\n")
            elif i != len(turns) - 1:
                raise ValueError("only the last turn may be unanswered")
        return "".join(parts)

    def _prepare_generate(self, frames, question, max_new_tokens,
                          raw_post: bool = False):
        """Shared front half of generate/generate_stream: prompt ids, video
        feature splice, m-rope tables, and the max_context headroom clamp.
        Returns (emb [S, D], ids, rope_kwargs, clamped max_new).
        ``raw_post``: ``question`` is already the fully rendered post-video
        template text (the multi-round path) — don't append the
        single-turn assistant header."""
        if self.encode is None or self.decode is None:
            raise ValueError("needs encode/decode tokenizer callables")
        c = self.cfg
        lm = self.params["lm"]
        post = (question if raw_post
                else question + "<|im_end|>\n<|im_start|>assistant\n")
        if frames is None or len(frames) == 0:
            # text-only path (LLM-judge LocalBackboneProvider): no vision
            # markers; with no video, mrope positions coincide on all three
            # axes so the decoder's standard 1-D rope is exact
            ids = np.asarray(list(self.encode(
                QWEN25_SYSTEM + "<|im_start|>user\n" + post)))
            emb = embed_tokens(lm, jnp.asarray(ids))
            rope_kwargs = {}
        else:
            feats, grid = self.encode_video(frames)
            n_vid = feats.shape[0]
            pre_ids, vid_ids, post_ids = self.build_prompt_ids(
                "", n_vid, post_text=post)
            ids = np.asarray(pre_ids + vid_ids + post_ids)

            emb = embed_tokens(lm, jnp.asarray(ids))
            p = len(pre_ids)
            emb = emb.at[p:p + n_vid].set(feats.astype(emb.dtype))

            pos3, decode_start = rope_index_for_video(
                len(pre_ids), grid, len(post_ids), c.vision.spatial_merge_size,
                c.vision.tokens_per_second, self.second_per_grid_t)
            cos, sin = mrope_cos_sin(jnp.asarray(pos3), c.lm.head_dim,
                                     c.lm.rope_theta, c.mrope_section)
            rope_kwargs = dict(prompt_rope_cos_sin=(cos, sin),
                               decode_pos_start=decode_start)

        S = emb.shape[0]
        max_new = self.max_new_tokens if max_new_tokens is None \
            else max_new_tokens
        if max_new < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new}")
        # same capacity handling as llava_video.generate: decode writes past
        # max_context would silently clamp onto the last cache slot, so
        # refuse a full prompt and truncate the generation budget; then
        # shrink the speculative draft to the residual headroom (plain
        # greedy at zero residual)
        headroom = c.max_context - S
        if headroom < 1:
            raise ValueError(
                f"prompt is {S} tokens but max_context={c.max_context}: no "
                "cache slot left to generate into (fewer frames, or raise "
                "max_context)")
        return emb, ids, rope_kwargs, min(max_new, headroom)

    def generate(self, frames: np.ndarray, question: str,
                 max_new_tokens: int | None = None,
                 temperature: float = 0.0, top_p: float = 1.0,
                 seed: int | None = None, raw_post: bool = False) -> str:
        """TSPO transfer path (demo/qwen25vl_tspo.py:53-95): frames are the
        TSPO-selected subset; greedy decode by default, ``temperature > 0``
        routes to nucleus sampling (same surface as llava_video.generate —
        the m-rope prompt tables thread through sample_decode)."""
        c = self.cfg
        lm = self.params["lm"]
        emb, ids, rope_kwargs, max_new = self._prepare_generate(
            frames, question, max_new_tokens, raw_post=raw_post)
        S = emb.shape[0]
        if temperature and temperature > 0:
            from .llava_video import _sampling_seed
            from .qwen2 import sample_decode
            cache = KVCache.create(c.lm, 1,
                                   min(c.max_context, S + max_new + 8),
                                   emb.dtype)
            toks, n = sample_decode(
                lm, emb[None], jnp.ones((1, S), bool), cache, c.lm,
                max_new, jax.random.PRNGKey(_sampling_seed(seed)),
                float(temperature), float(top_p), **rope_kwargs)
            toks = np.asarray(toks)[: int(n)]
            toks = toks[toks != c.lm.eos_token_id]
            return self.decode(toks.tolist())
        d = min(self.draft_len, c.max_context - S - max_new)
        if self.speculative and d >= 1:
            from .qwen2 import build_spec_lookup, greedy_decode_speculative
            lookup, lvalid = build_spec_lookup(
                t for t in ids if t != c.video_token_id)
            cache = KVCache.create(
                c.lm, 1, min(c.max_context, S + max_new + d + 10), emb.dtype)
            toks, n, _ = greedy_decode_speculative(
                lm, emb[None], jnp.ones((1, S), bool), cache, c.lm, max_new,
                lookup, lvalid, draft_len=d, **rope_kwargs)
        else:
            cache = KVCache.create(c.lm, 1,
                                   min(c.max_context, S + max_new + 8),
                                   emb.dtype)
            toks, n = greedy_decode(lm, emb[None], jnp.ones((1, S), bool),
                                    cache, c.lm, max_new, **rope_kwargs)
        toks = np.asarray(toks)[: int(n)]
        toks = toks[toks != c.lm.eos_token_id]
        return self.decode(toks.tolist())

    def prepare_engine_request(self, frames, question: str,
                               max_new_tokens: int | None = None) -> dict:
        """Submit-kwargs for the continuous batching engine
        (serve/continuous.py) — threads the m-rope prompt tables and the
        decode-position delta through the engine's admission prefill.
        ``prefix_len`` marks the question-independent shareable prefix
        (system + vision_start + spliced video block) for the engine's
        prefix cache; the (video, mtime, frames) key the serve layer uses
        pins both the embeds prefix and the rope-table prefix, so stored
        KV (with its mrope rotations baked in) transfers exactly."""
        emb, ids, rope_kwargs, max_new = self._prepare_generate(
            frames, question, max_new_tokens)
        out = {"embeds": emb[None], "max_new_tokens": max_new}
        if "prompt_rope_cos_sin" in rope_kwargs:
            out["rope_cos_sin"] = rope_kwargs["prompt_rope_cos_sin"]
        if "decode_pos_start" in rope_kwargs:
            out["decode_pos_start"] = rope_kwargs["decode_pos_start"]
        if frames is not None and len(frames):
            vid = np.asarray(ids) == self.cfg.video_token_id
            # video placeholder ids are one contiguous block: the prefix
            # runs through its last token (system + vision_start + video)
            plen = int(np.argmax(vid)) + int(vid.sum())
            if 0 < plen < int(emb.shape[0]):
                out["prefix_len"] = plen
        return out

    def generate_stream(self, frames: np.ndarray, question: str,
                        max_new_tokens: int | None = None, chunk: int = 8,
                        temperature: float = 0.0, top_p: float = 1.0,
                        seed: int | None = None, raw_post: bool = False):
        """Streaming generate (text deltas; join == generate()'s output) —
        same chunked-decode + prefix-detokenization contract as
        llava_video.generate_stream, with the m-rope prompt tables threaded
        through decode_prefill.  ``temperature > 0`` routes to
        sample_decode_stream (token-exact vs the fused sampled decode at
        equal seed).  Trailing U+FFFD is held back until the straddling
        character completes."""
        from .qwen2 import (greedy_decode_stream, sample_decode_stream,
                            stream_detokenize)
        c = self.cfg
        emb, _, rope_kwargs, max_new = self._prepare_generate(
            frames, question, max_new_tokens, raw_post=raw_post)
        S = emb.shape[0]
        n_chunks = -(-max_new // chunk)
        cache = KVCache.create(c.lm, 1, S + n_chunks * chunk, emb.dtype)
        if temperature and temperature > 0:
            from .llava_video import _sampling_seed
            blocks = sample_decode_stream(
                self.params["lm"], emb[None], jnp.ones((1, S), bool), cache,
                c.lm, max_new, jax.random.PRNGKey(_sampling_seed(seed)),
                float(temperature), float(top_p), chunk=chunk, **rope_kwargs)
        else:
            blocks = greedy_decode_stream(
                self.params["lm"], emb[None], jnp.ones((1, S), bool), cache,
                c.lm, max_new, chunk=chunk, **rope_kwargs)
        yield from stream_detokenize(blocks, self.decode, c.lm.eos_token_id)

    def new_conversation_state(self, headroom: int = 2048
                               ) -> "Qwen25VLConversationState":
        """Fresh per-conversation prefix-KV state for
        :meth:`generate_multi_round` — the m-rope analog of
        llava_video.ConversationState."""
        return Qwen25VLConversationState(headroom)

    def generate_multi_round(self, frames, turns,
                             max_new_tokens: int | None = None,
                             temperature: float = 0.0, top_p: float = 1.0,
                             seed: int | None = None, state=None) -> str:
        """Multi-turn chat through the real Qwen2.5 chat template.  The
        reference's own Qwen2.5-VL adapters leave this
        ``NotImplementedError``
        (lmms-eval/lmms_eval/models/simple/qwen2_5_vl_tspo.py:366-367).
        ``turns``: [(q, a), ..., (q_last, None)]; the video splices into
        the FIRST user turn only, and a one-round conversation is
        byte-identical to :meth:`generate`.  With ``state`` the round
        rides prefix-KV reuse: the video encodes once and follow-up
        rounds prefill only the new turn, with the m-rope position shift
        carried through extension prefill and decode (token-exact vs the
        stateless path, tests/test_qwen25vl.py)."""
        if state is not None:
            if temperature and temperature > 0:
                raise ValueError("sampled conversation rounds don't ride "
                                 "prefix-KV state: pass state=None (full "
                                 "re-prefill) or temperature=0")
            return self._multi_round_stateful(
                frames, self._render_rounds(turns), max_new_tokens, state)
        return self.generate(frames, self._render_rounds(turns),
                             max_new_tokens=max_new_tokens,
                             temperature=temperature, top_p=top_p,
                             seed=seed, raw_post=True)

    def generate_multi_round_stream(self, frames, turns,
                                    max_new_tokens: int | None = None,
                                    chunk: int = 8,
                                    temperature: float = 0.0,
                                    top_p: float = 1.0,
                                    seed: int | None = None, state=None):
        """Streaming :meth:`generate_multi_round` (text deltas; join ==
        the non-stream call token-for-token).  With ``state`` the round
        rides prefix-KV reuse and commits only once the stream is fully
        consumed (abandoned streams leave the state checked-out/reset)."""
        if state is not None:
            if temperature and temperature > 0:
                raise ValueError("sampled conversation rounds don't ride "
                                 "prefix-KV state: pass state=None (full "
                                 "re-prefill) or temperature=0")
            from .qwen2 import (greedy_decode_continue_stream,
                                stream_detokenize)
            post = self._render_rounds(turns)
            ids, first_tok, cache, CH, max_new, dec_pos = \
                self._multi_round_prefill(frames, post, max_new_tokens,
                                          state, chunk=chunk)
            final: dict = {}
            blocks = greedy_decode_continue_stream(
                self.params["lm"], first_tok, cache, self.cfg.lm, max_new,
                chunk=CH, final=final, decode_pos_start=dec_pos)
            yield from stream_detokenize(blocks, self.decode,
                                         self.cfg.lm.eos_token_id)
            for _ in blocks:      # drain so ``final`` fills (no device work)
                pass
            self._commit_conversation(state, ids, final["tokens"],
                                      final["cache"])
            return
        yield from self.generate_stream(frames, self._render_rounds(turns),
                                        max_new_tokens=max_new_tokens,
                                        chunk=chunk, temperature=temperature,
                                        top_p=top_p, seed=seed,
                                        raw_post=True)

    def _multi_round_stateful(self, frames, post: str, max_new_tokens,
                              state) -> str:
        from .qwen2 import greedy_decode_continue
        ids, first_tok, cache, CH, max_new, dec_pos = \
            self._multi_round_prefill(frames, post, max_new_tokens, state)
        toks, cache = greedy_decode_continue(
            self.params["lm"], first_tok, cache, self.cfg.lm, max_new,
            chunk=CH, decode_pos_start=dec_pos)
        self._commit_conversation(state, ids, toks, cache)
        return self.decode([int(t) for t in toks])

    def _commit_conversation(self, state, ids, toks, cache) -> None:
        state.cache = KVCache(cache.k, cache.v,
                              jnp.int32(len(ids) + len(toks)))
        state.ids = list(ids) + [int(t) for t in toks]
        state.covered = len(ids) + len(toks)

    def _multi_round_prefill(self, frames, post: str, max_new_tokens,
                             state, chunk: int = 32):
        """Prefix match + incremental prefill for the stateful multi-round
        paths.  ids here map 1:1 to embed indices (the video placeholder
        ids are explicit, unlike llava's single <image> sentinel), so the
        common-token-prefix IS the common embed prefix.  Post-video rope
        positions are linear — pos(j) = post_start + (j - idx_post0) —
        so extension chunks and decode need only the stored
        (idx_post0, post_start) meta to continue the m-rope sequence
        exactly.  Divergence before the end of the video block (system
        prompt change) falls back to a full prefill.  Returns
        (ids, first_tok, cache, CH, max_new, decode_pos_start) with the
        cache checked OUT of the state."""
        from .qwen2 import decode_prefill, prefill_extend
        if self.encode is None or self.decode is None:
            raise ValueError("needs encode/decode tokenizer callables")
        c_ = self.cfg
        lm = self.params["lm"]
        dtype = lm["embedding"].dtype
        if state.video is None and frames is not None and len(frames):
            state.video = self.encode_video(frames)
        if state.video is not None:
            feats, grid = state.video
            n_vid = int(feats.shape[0])
            pre_ids, vid_ids, post_ids = self.build_prompt_ids(
                "", n_vid, post_text=post)
            ids = pre_ids + vid_ids + post_ids
            idx_post0 = len(pre_ids) + n_vid
        else:
            ids = list(self.encode(QWEN25_SYSTEM + "<|im_start|>user\n"
                                   + post))
            pre_ids, feats, grid, n_vid, idx_post0 = [], None, None, 0, 0
        S = len(ids)
        max_new = self.max_new_tokens if max_new_tokens is None \
            else max_new_tokens
        if max_new < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new}")
        headroom = c_.max_context - S
        if headroom < 1:
            raise ValueError(
                f"conversation is {S} tokens but max_context="
                f"{c_.max_context}: no cache slot left to generate into")
        max_new = min(max_new, headroom)
        CH = chunk
        if (-(-max_new // CH)) * CH > headroom:
            CH = max_new
        EXT_PAD = 256
        n_dec = (-(-max_new // CH)) * CH
        need = S + max(n_dec, EXT_PAD)
        if state.cache is not None and need > state.cache.k.shape[2]:
            state.reset()            # conversation outgrew the cache
        c = 0
        for a, b in zip(ids, state.ids):
            if a != b:
                break
            c += 1
        c = min(c, S - 1)            # always prefill >= 1 new token
        if state.cache is None or c < idx_post0:
            # full prefill (first use, capacity reset, or divergence
            # inside the system/video prefix)
            state.reset()
            emb = embed_tokens(lm, jnp.asarray(ids))
            rope, dec_pos = None, None
            if state.video is not None:
                emb = emb.at[len(pre_ids):len(pre_ids) + n_vid].set(
                    feats.astype(emb.dtype))
                pos3, decode_start = rope_index_for_video(
                    len(pre_ids), grid, len(post_ids),
                    c_.vision.spatial_merge_size,
                    c_.vision.tokens_per_second, self.second_per_grid_t)
                state.meta = (idx_post0, decode_start - len(post_ids))
                dec_pos = decode_start
            else:
                state.meta = (0, 0)
            cap = min(c_.max_context, need + state.headroom)
            cache = KVCache.create(c_.lm, 1, cap, dtype)
            Sb = min(cap, -(-S // 256) * 256)
            embp = jnp.pad(emb[None].astype(dtype),
                           ((0, 0), (0, Sb - S), (0, 0)))
            valid = jnp.zeros((1, Sb), bool).at[:, :S].set(True)
            if state.video is not None:
                cos, sin = mrope_cos_sin(jnp.asarray(pos3), c_.lm.head_dim,
                                         c_.lm.rope_theta, c_.mrope_section)
                rope = (jnp.pad(cos, ((0, Sb - S), (0, 0))),
                        jnp.pad(sin, ((0, Sb - S), (0, 0))))
            first_tok, cache, _ = decode_prefill(
                lm, embp, valid, cache, c_.lm, prompt_rope_cos_sin=rope,
                decode_pos_start=dec_pos)
        else:
            idx_post0, post_start = state.meta
            # check the cache OUT before any donating call (llava's
            # exception-safety contract)
            cache = KVCache(state.cache.k, state.cache.v, jnp.int32(c))
            state.cache = None
            state.ids, state.covered = [], 0
            sfx = embed_tokens(lm, jnp.asarray(ids[c:]))[None].astype(dtype)
            S_sfx = S - c
            first_tok = None
            off = 0
            while off < S_sfx:
                n = min(256, S_sfx - off)
                nb = 64 if n <= 64 else 256     # two chunk programs only
                piece = jnp.pad(sfx[:, off:off + n],
                                ((0, 0), (0, nb - n), (0, 0)))
                # the extension is post-video text: positions continue
                # linearly on all three mrope axes, so the tables reduce
                # to equal-axis rotations at the shifted positions
                pos = (post_start + (c + off - idx_post0)
                       + np.arange(nb))
                pos3 = jnp.asarray(np.tile(pos, (3, 1)))
                cos, sin = mrope_cos_sin(pos3, c_.lm.head_dim,
                                         c_.lm.rope_theta, c_.mrope_section)
                first_tok, cache = prefill_extend(
                    lm, piece, jnp.int32(n), cache, c_.lm,
                    rope_cos_sin=(cos, sin))
                off += n
                cache = KVCache(cache.k, cache.v, jnp.int32(c + off))
        cache = KVCache(cache.k, cache.v, jnp.int32(S))
        idx_post0, post_start = state.meta
        dec_pos = post_start + (S - idx_post0)
        return ids, first_tok, cache, CH, max_new, dec_pos

    def _continuation_log_softmax(self, frames, question: str,
                                  continuation: str,
                                  prompt: str | None = None):
        """Teacher-forced single forward over prompt+continuation: returns
        (cont_ids, log_softmax rows at the continuation positions) — the
        shared core of :meth:`loglikelihood` /
        :meth:`continuation_logprobs`.  ``prompt`` overrides the rendered
        post-video text verbatim (the chat-history logprobs path)."""
        from .qwen2 import lm_logits, qwen2_forward
        c = self.cfg
        lm = self.params["lm"]
        post = (prompt if prompt is not None
                else question + "<|im_end|>\n<|im_start|>assistant\n")
        cont_ids = list(self.encode(continuation))
        if frames is None or len(frames) == 0:
            ids = np.asarray(list(self.encode(
                QWEN25_SYSTEM + "<|im_start|>user\n" + post)) + cont_ids)
            emb = embed_tokens(lm, jnp.asarray(ids))
            rope = None
        else:
            feats, grid = self.encode_video(frames)
            n_vid = int(feats.shape[0])
            pre_ids, vid_ids, post_ids = self.build_prompt_ids(
                "", n_vid, post_text=post)
            ids = np.asarray(pre_ids + vid_ids + post_ids + cont_ids)
            emb = embed_tokens(lm, jnp.asarray(ids))
            p = len(pre_ids)
            emb = emb.at[p:p + n_vid].set(feats.astype(emb.dtype))
            pos3, _ = rope_index_for_video(
                len(pre_ids), grid, len(post_ids) + len(cont_ids),
                c.vision.spatial_merge_size, c.vision.tokens_per_second,
                self.second_per_grid_t)
            rope = mrope_cos_sin(jnp.asarray(pos3), c.lm.head_dim,
                                 c.lm.rope_theta, c.mrope_section)
        S = len(ids)
        cache = KVCache.create(c.lm, 1, S, emb.dtype)
        h, _ = qwen2_forward(lm, emb[None], cache, jnp.arange(S),
                             jnp.ones((1, S), bool), c.lm,
                             rope_cos_sin=rope)
        n = len(cont_ids)
        logits = lm_logits(lm, h[0, -n - 1:-1], c.lm)
        return cont_ids, jax.nn.log_softmax(logits, axis=-1)

    def render_chat_prompt(self, turns) -> str:
        """The rendered conversation text :meth:`generate_multi_round`
        uses for ``turns`` — in the form
        :meth:`continuation_logprobs`'s ``prompt`` param expects (the
        post-video template text)."""
        return self._render_rounds(turns)

    def loglikelihood(self, frames: np.ndarray, question: str,
                      continuation: str):
        """(logprob, is_greedy) of ``continuation`` after the video prompt —
        the lmms-eval loglikelihood request type for the qwen adapter."""
        cont_ids, lp = self._continuation_log_softmax(frames, question,
                                                      continuation)
        targets = jnp.asarray(cont_ids)
        token_lp = lp[jnp.arange(len(cont_ids)), targets]
        greedy = jnp.argmax(lp, axis=-1) == targets
        return float(token_lp.sum()), bool(jnp.all(greedy))

    def continuation_logprobs(self, frames, question: str,
                              continuation: str,
                              prompt: str | None = None, top_k: int = 0):
        """Per-token log-probabilities of ``continuation`` — the OpenAI
        ``logprobs`` payload (same contract as
        llava_video.continuation_logprobs)."""
        cont_ids, lp = self._continuation_log_softmax(frames, question,
                                                      continuation, prompt)
        n = len(cont_ids)
        token_lp = np.asarray(lp[jnp.arange(n), jnp.asarray(cont_ids)],
                              np.float64)
        if top_k > 0:
            top_lps, top_ids = jax.lax.top_k(lp, top_k)
            return (cont_ids, token_lp, np.asarray(top_ids),
                    np.asarray(top_lps, np.float64))
        return (cont_ids, token_lp, np.zeros((n, 0), np.int32),
                np.zeros((n, 0), np.float64))

    def quantize_lm(self) -> "Qwen25VLModel":
        """Weight-only int8 for the decoder (see qwen2.quantize_qwen2_params)."""
        from .qwen2 import quantize_qwen2_params
        self.params = {**self.params,
                       "lm": quantize_qwen2_params(self.params["lm"])}
        return self

    # -- checkpoint interop -------------------------------------------------

    @classmethod
    def from_torch_checkpoint(cls, model_or_sd, cfg: Qwen25VLConfig,
                              dtype=jnp.bfloat16, **kw) -> "Qwen25VLModel":
        """Port an HF ``Qwen2_5_VLForConditionalGeneration`` state dict
        (keys: model.visual.*, model.language_model.*, lm_head.*)."""
        sd = state_dict_of(model_or_sd)
        v = cfg.vision

        def vk(name):
            for prefix in ("model.visual.", "visual."):
                if prefix + name in sd:
                    return sd[prefix + name]
            raise KeyError(name)

        L = v.depth
        def vis_lin(field_, bias=True):
            stacked = {"kernel": np.stack(
                [vk(f"blocks.{i}.{field_}.weight") for i in range(L)]
            ).transpose(0, 2, 1)}
            if bias:
                stacked["bias"] = np.stack(
                    [vk(f"blocks.{i}.{field_}.bias") for i in range(L)])
            return stacked

        visual = {
            "patch_kernel": vk("patch_embed.proj.weight").reshape(v.hidden, -1).T,
            "layers": {
                "norm1": np.stack([vk(f"blocks.{i}.norm1.weight") for i in range(L)]),
                "norm2": np.stack([vk(f"blocks.{i}.norm2.weight") for i in range(L)]),
                "qkv": vis_lin("attn.qkv"),
                "proj": vis_lin("attn.proj"),
                "gate": vis_lin("mlp.gate_proj"),
                "up": vis_lin("mlp.up_proj"),
                "down": vis_lin("mlp.down_proj"),
            },
            "merger": {
                "ln_q": vk("merger.ln_q.weight"),
                "fc1": {"kernel": vk("merger.mlp.0.weight").T,
                        "bias": vk("merger.mlp.0.bias")},
                "fc2": {"kernel": vk("merger.mlp.2.weight").T,
                        "bias": vk("merger.mlp.2.bias")},
            },
        }
        lm_prefix = "model.language_model." if any(
            k.startswith("model.language_model.") for k in sd) else "model."
        lm_sd = {k: v_ for k, v_ in sd.items() if k.startswith(lm_prefix)
                 or k.startswith("lm_head")}
        params = {
            "visual": jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), visual),
            "lm": qwen2_params_from_torch(lm_sd, cfg.lm, dtype, prefix=lm_prefix),
        }
        return cls(params=params, cfg=cfg, **kw)

    @classmethod
    def random_init(cls, seed: int, cfg: Qwen25VLConfig, dtype=jnp.float32,
                    **kw) -> "Qwen25VLModel":
        v = cfg.vision
        keys = iter(jax.random.split(jax.random.PRNGKey(seed), 24))
        L, D, I = v.depth, v.hidden, v.intermediate

        def lin(n, fi, fo):
            return {"kernel": jax.random.normal(next(keys), (n, fi, fo), dtype) * 0.02,
                    "bias": jnp.zeros((n, fo), dtype)}

        visual = {
            "patch_kernel": jax.random.normal(next(keys), (v.patch_dim, D), dtype) * 0.02,
            "layers": {
                "norm1": jnp.ones((L, D), dtype), "norm2": jnp.ones((L, D), dtype),
                "qkv": lin(L, D, 3 * D), "proj": lin(L, D, D),
                "gate": lin(L, D, I), "up": lin(L, D, I), "down": lin(L, I, D),
            },
            "merger": {
                "ln_q": jnp.ones(D, dtype),
                "fc1": {"kernel": jax.random.normal(next(keys),
                        (v.merge_unit * D, v.merge_unit * D), dtype) * 0.02,
                        "bias": jnp.zeros(v.merge_unit * D, dtype)},
                "fc2": {"kernel": jax.random.normal(next(keys),
                        (v.merge_unit * D, v.out_hidden), dtype) * 0.02,
                        "bias": jnp.zeros(v.out_hidden, dtype)},
            },
        }
        return cls(params={"visual": visual,
                           "lm": init_qwen2_params(jax.random.PRNGKey(seed + 1),
                                                   cfg.lm, dtype)},
                   cfg=cfg, **kw)


def qwen25vl_visual_shardings(visual_params, mesh):
    """TP specs for the vision tower.  The fused qkv kernel [L, D, 3D] cannot
    be column-sharded without splitting across the q|k|v boundary, so every
    projection row-shards the contraction dim (each device computes a partial
    product; XLA inserts one psum per GEMM).  Norms/merger stay replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(path):
        keys = [str(getattr(p, "key", p)) for p in path]
        leaf = keys[-1]
        if "layers" in keys and keys[1] in ("qkv", "proj", "gate", "up", "down"):
            if leaf == "kernel":
                return P(None, "model", None)
            return P()  # biases applied after the psum
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path)), visual_params)


def qwen25vl_param_shardings(params, mesh):
    """Full-model TP specs: Megatron rules for the Qwen2 LM
    (:func:`~tspo_tpu.models.qwen2.qwen2_param_shardings`), row-sharded
    contraction dims for the windowed ViT
    (:func:`qwen25vl_visual_shardings`); anything else replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .qwen2 import qwen2_param_shardings
    repl = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()),
        {k: v for k, v in params.items() if k not in ("lm", "visual")})
    return {"lm": qwen2_param_shardings(params["lm"], mesh),
            "visual": qwen25vl_visual_shardings(params["visual"], mesh),
            **repl}


def load_qwen25vl_adapter(model_path: str, dtype=jnp.bfloat16, **kw):
    """CLI factory: HF checkpoint dir -> Qwen25VLModel with HF tokenizer."""
    import glob
    import os
    from transformers import AutoTokenizer
    sd = {}
    st_files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open
        for fname in st_files:
            with safe_open(fname, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
    else:
        import torch
        for fname in sorted(glob.glob(os.path.join(model_path, "pytorch_model*.bin"))):
            sd.update(torch.load(fname, map_location="cpu", weights_only=True))
    tok = AutoTokenizer.from_pretrained(model_path)
    cfg_path = os.path.join(model_path, "config.json")
    if os.path.exists(cfg_path):
        import json
        cfg = Qwen25VLConfig.from_hf_config(json.load(open(cfg_path)))
    else:
        cfg = Qwen25VLConfig()
    model = Qwen25VLModel.from_torch_checkpoint(sd, cfg, dtype, **kw)
    model.encode = lambda s: tok(s).input_ids
    model.decode = lambda toks: tok.decode(toks, skip_special_tokens=True)
    return model
