"""TSPO merged model: CLIP-L/14 towers + MultiModalAlign selector + selection.

TPU counterpart of the reference ``TSPOModel(CLIPModel)``
(model/temporal_agent.py:146-231) and the standalone TSPO-0.4B checkpoint
produced by ``scripts/merge_weights.py``.  The scoring pipeline per video:

  host frames [T, H, W, 3] u8
    -> device preprocess (fused resize/crop/normalize, models/clip.py)
    -> CLIP vision tower in fixed-size frame chunks (one compiled program,
       reused across videos; last chunk padded)
    -> CLIP text tower (question)
    -> selector logits over a padded frame bucket
    -> top-k / bin-max on device, AKS on host

Chunked encoding + bucketed selector scoring mean exactly two compiled
programs cover any video length — the reference re-traces nothing because
torch is eager, while naive jit would recompile per video length
(SURVEY.md §7.3 item 2).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CLIPConfig, SelectorConfig
from ..ops.masking import bucket_for, pad_to_bucket
from ..ops.selection import aks_select, bin_max_select, topk_select
from .clip import (
    clip_params_from_torch,
    cosine_scores,
    encode_images,
    encode_text,
    preprocess_frames,
)
from .selector import (
    init_selector_params,
    score_frames,
    selector_params_from_torch,
    selector_params_to_torch,
)


@partial(jax.jit, static_argnames=("vision_cfg", "dtype", "quantized"))
def _encode_chunk(clip_params, frames_u8, vision_cfg, dtype, quantized=False):
    pixels = preprocess_frames(frames_u8, vision_cfg.image_size, dtype)
    if quantized:
        from .clip import encode_images_quantized
        return encode_images_quantized(clip_params["vision"], pixels, vision_cfg)
    return encode_images(clip_params, pixels, vision_cfg)


@partial(jax.jit, static_argnames=("vision_cfg", "dtype", "quantized"))
def _encode_chunk_square(clip_params, frames_u8_sq, vision_cfg, dtype,
                         quantized=False):
    from .clip import normalize_frames
    pixels = normalize_frames(frames_u8_sq, vision_cfg.image_size, dtype)
    if quantized:
        from .clip import encode_images_quantized
        return encode_images_quantized(clip_params["vision"], pixels, vision_cfg)
    return encode_images(clip_params, pixels, vision_cfg)


@partial(jax.jit, static_argnames=("selector_cfg", "window_size"))
def _score_bucket(selector_params, image_feat, text_feat, clip_sc, valid,
                  selector_cfg, window_size, score_tau):
    logits, _ = score_frames(selector_params, image_feat, text_feat, clip_sc,
                             cfg=selector_cfg, window_size=window_size,
                             score_tau=score_tau, valid=valid)
    return logits


@partial(jax.jit, static_argnames=("vision_cfg", "text_cfg", "selector_cfg",
                                   "chunk", "window_size", "sample_num",
                                   "dtype", "quantized"))
def fused_score_program(clip_params, selector_params, frames_u8, text_ids,
                        valid, score_tau, *, vision_cfg, text_cfg,
                        selector_cfg, chunk, window_size, sample_num, dtype,
                        quantized=False):
    """ONE compiled program for a whole frame bucket: text encode +
    lax.map-chunked (preprocess -> CLIP) + selector + top-k.

    Single dispatch instead of ~10 — worth ~25 ms/call of launch overhead on
    remote/tunneled backends (+6% end-to-end measured).  frames_u8 must be
    [bucket, H, W, 3] with bucket % chunk == 0; invalid tail masked by
    ``valid``.  Returns (sorted top-k indices, selector logits).
    """
    T = frames_u8.shape[0]
    txt = encode_text(clip_params, text_ids, cfg=text_cfg)

    def enc(chunk_frames):
        pixels = preprocess_frames(chunk_frames, vision_cfg.image_size, dtype)
        if quantized:
            from .clip import encode_images_quantized
            return encode_images_quantized(clip_params["vision"], pixels,
                                           vision_cfg)
        return encode_images(clip_params, pixels, vision_cfg)

    img = jax.lax.map(enc, frames_u8.reshape(T // chunk, chunk,
                                             *frames_u8.shape[1:]))
    img = img.reshape(T, -1)
    csc = cosine_scores(img, txt)
    logits, _ = score_frames(selector_params, img.astype(jnp.float32), txt,
                             csc, cfg=selector_cfg, window_size=window_size,
                             score_tau=score_tau, valid=valid)
    idx, count = topk_select(jnp.where(valid, logits, -1e30), sample_num,
                             valid)
    return idx, count, logits


@partial(jax.jit, static_argnames=("text_cfg", "selector_cfg", "window_size",
                                   "sample_num"))
def fused_question_program(clip_params, selector_params, image_feat, text_ids,
                           valid, score_tau, *, text_cfg, selector_cfg,
                           window_size, sample_num):
    """Per-question scoring against PRECOMPUTED image features: text encode +
    cosine + selector + top-k in one dispatch — the warm path of the
    video-level feature cache (phase-1 sharing / serve LRU), where the
    vision tower already ran once for the video.  Same math as the tail of
    ``fused_score_program``."""
    txt = encode_text(clip_params, text_ids, cfg=text_cfg)
    csc = cosine_scores(image_feat, txt)
    logits, _ = score_frames(selector_params, image_feat.astype(jnp.float32),
                             txt, csc, cfg=selector_cfg,
                             window_size=window_size, score_tau=score_tau,
                             valid=valid)
    idx, count = topk_select(jnp.where(valid, logits, -1e30), sample_num,
                             valid)
    return idx, count, logits


@dataclass
class TSPOScorer:
    """Host-side orchestrator around the jitted scoring pipeline.

    ``tokenize``: callable str -> (input_ids [1, L], attention_mask [1, L]);
    supply one bound to a local CLIP tokenizer for real checkpoints, tests use
    a stub.  ``batch_frames`` is the CLIP chunk size (device batch).
    """

    clip_params: dict
    selector_params: dict
    clip_cfg: CLIPConfig = CLIPConfig()
    selector_cfg: SelectorConfig = SelectorConfig()
    tokenize: Callable | None = None
    batch_frames: int = 256
    dtype: object = jnp.bfloat16
    frame_buckets: tuple = (64, 128, 256, 512, 1024, 2048, 4096, 8192)
    preprocess: str = "device"   # "device": fused resize on chip (one compile
                                 # per resolution); "host": cv2 resize+crop on
                                 # CPU -> single compiled shape, 4x fewer
                                 # host->device bytes (mixed-resolution sets)
    quantized: bool = False      # int8 vision tower (call .quantize());
                                 # ~12% faster, feature cosine >= 0.999

    def quantize(self) -> "TSPOScorer":
        """Switch the vision tower to int8 (idempotent)."""
        if not self.quantized:
            from .clip import quantize_vision_params
            self.clip_params = {**self.clip_params,
                                "vision": quantize_vision_params(
                                    self.clip_params["vision"])}
            self.quantized = True
        return self

    # -- feature extraction -------------------------------------------------

    def _pad_ids(self, ids, mask=None):
        """Right-pad token ids (and mask) to the text tower's max_positions
        so every jitted consumer traces ONCE instead of once per question
        token length (a tokenizer padding only to the longest-in-batch gives
        a distinct length per question).  Exact: the tower is causal and
        pools at the first EOS, so positions after it contribute nothing."""
        ids = np.atleast_2d(np.asarray(ids))
        if mask is not None:
            mask = np.atleast_2d(np.asarray(mask))
        L = self.clip_cfg.text.max_positions
        if ids.shape[-1] < L:
            pad = [(0, 0), (0, L - ids.shape[-1])]
            ids = np.pad(ids, pad)
            if mask is not None:
                mask = np.pad(mask, pad)
        return ids[:, :L], (None if mask is None else mask[:, :L])

    def encode_text_features(self, problem: str | np.ndarray) -> jnp.ndarray:
        if isinstance(problem, str):
            if self.tokenize is None:
                raise ValueError("TSPOScorer needs a tokenize fn for raw text")
            ids, mask = self.tokenize(problem)
        else:
            ids, mask = problem, None
        ids, mask = self._pad_ids(ids, mask)
        return encode_text(self.clip_params, jnp.asarray(ids),
                           None if mask is None else jnp.asarray(mask),
                           self.clip_cfg.text)

    def encode_frame_features(self, frames: np.ndarray) -> jnp.ndarray:
        """[T, H, W, 3] uint8 -> [T, proj] image features (chunked)."""
        if self.preprocess == "host":
            from .clip import host_resize_crop
            frames = host_resize_crop(np.asarray(frames),
                                      self.clip_cfg.vision.image_size)
            encode = _encode_chunk_square
        else:
            encode = _encode_chunk
        T = frames.shape[0]
        B = self.batch_frames
        outs = []
        for start in range(0, T, B):
            chunk = frames[start:start + B]
            n = chunk.shape[0]
            if n < B:  # pad the tail chunk so the jitted program is reused
                chunk = np.concatenate(
                    [chunk, np.zeros((B - n, *chunk.shape[1:]), chunk.dtype)])
            feats = encode(self.clip_params, jnp.asarray(chunk),
                           self.clip_cfg.vision, self.dtype,
                           quantized=self.quantized)
            outs.append(feats[:n])
        return jnp.concatenate(outs, axis=0)

    def extract_features(self, frames: np.ndarray, problem):
        """Mirror of reference ``TSPOModel.extract_feature``
        (temporal_agent.py:151-169): returns (image_feat [T, P],
        text_feat [1, P], clip_scores [T])."""
        image_feat = self.encode_frame_features(frames)
        text_feat = self.encode_text_features(problem)
        clip_sc = cosine_scores(image_feat, text_feat)
        return image_feat, text_feat, clip_sc

    # -- scoring + selection ------------------------------------------------

    def score(self, image_feat, text_feat, clip_sc, *, window_size=None,
              score_tau=None) -> np.ndarray:
        """Selector logits for the true length T (bucket-padded internally)."""
        T = int(image_feat.shape[0])
        bucket = bucket_for(T, self.frame_buckets)
        feat_p, valid = pad_to_bucket(np.asarray(image_feat, np.float32), bucket)
        sc_p, _ = pad_to_bucket(np.asarray(clip_sc, np.float32), bucket)
        ws = self.selector_cfg.window_size if window_size is None else window_size
        tau = self.selector_cfg.score_tau if score_tau is None else score_tau
        logits = _score_bucket(self.selector_params, jnp.asarray(feat_p),
                               jnp.asarray(text_feat), jnp.asarray(sc_p),
                               jnp.asarray(valid), self.selector_cfg, ws,
                               jnp.float32(tau))
        return np.asarray(logits)[:T]

    def score_features_fused(self, image_feat, problem, *, sample_num=64,
                             window_size=None, score_tau=None,
                             method: str = "topk", **method_kwargs):
        """Single-dispatch per-question scoring of PRECOMPUTED image
        features (fused_question_program): the warm path of the video-level
        feature cache.  Returns (indices, logits[:T]) like
        ``score_video_fused``; non-topk methods select host-side from the
        same logits."""
        if isinstance(problem, str):
            ids, _ = self.tokenize(problem)
        else:
            ids = problem
        ids, _ = self._pad_ids(ids)
        T = int(image_feat.shape[0])
        bucket = bucket_for(T, self.frame_buckets)
        feat_p, valid = pad_to_bucket(np.asarray(image_feat, np.float32),
                                      bucket)
        ws = self.selector_cfg.window_size if window_size is None \
            else window_size
        tau = self.selector_cfg.score_tau if score_tau is None else score_tau
        # lax.top_k needs k <= bucket; the valid-count in the program already
        # truncates short videos, so clamping is lossless
        k = min(int(sample_num), int(feat_p.shape[0]))
        idx, count, logits = fused_question_program(
            self.clip_params, self.selector_params, jnp.asarray(feat_p),
            jnp.asarray(ids), jnp.asarray(valid), jnp.float32(tau),
            text_cfg=self.clip_cfg.text, selector_cfg=self.selector_cfg,
            window_size=ws, sample_num=k)
        logits_t = np.asarray(logits)[:T]
        if method == "topk":
            return np.asarray(idx)[: int(count)], logits_t
        return (self.select(logits_t, sample_num, method, **method_kwargs),
                logits_t)

    def select(self, logits: np.ndarray, sample_num: int,
               method: str = "topk", **method_kwargs) -> np.ndarray:
        """Dispatch matching reference ``inference_ts`` (llava_qwen.py:146-176).

        Small-video degenerate cases resolve host-side: topk with
        T <= k selects everything; bin-max with T <= k yields one bin per
        frame, i.e. also everything.
        """
        T = len(logits)
        if T <= sample_num:
            return np.arange(T)
        if method == "topk":
            idx, count = topk_select(jnp.asarray(logits), sample_num)
            return np.asarray(idx)[: int(count)]
        if method == "bin-max":
            idx, count = bin_max_select(jnp.asarray(logits), sample_num)
            return np.asarray(idx)[: int(count)]
        if method == "aks":
            # method_kwargs: t1 / all_depth (per-dataset, utils.py:131-133)
            return np.asarray(aks_select(np.asarray(logits), sample_num,
                                         **method_kwargs))
        raise ValueError(f"unknown selection method: {method}")

    def temporal_sampling(self, image_feat, text_feat, clip_sc, *,
                          method="topk", window_size=None, sample_num=64,
                          **method_kwargs):
        logits = self.score(image_feat, text_feat, clip_sc,
                            window_size=window_size)
        return self.select(logits, sample_num, method, **method_kwargs), logits

    def __call__(self, frames: np.ndarray, problem, *, sample_num=64,
                 window_size=12, method="topk"):
        """Full reference ``TSPOModel.forward`` (temporal_agent.py:177-184)."""
        image_feat, text_feat, clip_sc = self.extract_features(frames, problem)
        return self.temporal_sampling(image_feat, text_feat, clip_sc,
                                      method=method, window_size=window_size,
                                      sample_num=sample_num)

    def score_video_fused(self, frames: np.ndarray, problem, *, sample_num=64,
                          window_size=None, score_tau=None):
        """Single-dispatch scoring of one video (fused_score_program): best
        production path for top-k selection; falls back to the chunked path
        for non-topk methods.  Returns (indices, logits[:T])."""
        if isinstance(problem, str):
            ids, _ = self.tokenize(problem)
        else:
            ids = problem
        ids, _ = self._pad_ids(ids)
        T = frames.shape[0]
        bucket = bucket_for(T, self.frame_buckets)
        bucket = -(-bucket // self.batch_frames) * self.batch_frames
        fpad, valid = pad_to_bucket(np.asarray(frames), bucket)
        ws = self.selector_cfg.window_size if window_size is None else window_size
        tau = self.selector_cfg.score_tau if score_tau is None else score_tau
        # lax.top_k needs k <= bucket (same clamp as score_features_fused);
        # the valid-count already truncates short videos, so this is lossless
        k = min(int(sample_num), int(fpad.shape[0]))
        idx, count, logits = fused_score_program(
            self.clip_params, self.selector_params, jnp.asarray(fpad),
            jnp.asarray(ids), jnp.asarray(valid), jnp.float32(tau),
            vision_cfg=self.clip_cfg.vision, text_cfg=self.clip_cfg.text,
            selector_cfg=self.selector_cfg, chunk=self.batch_frames,
            window_size=ws, sample_num=k, dtype=self.dtype,
            quantized=self.quantized)
        return (np.asarray(idx)[: int(count)], np.asarray(logits)[:T])

    # -- checkpoint interop -------------------------------------------------

    def save(self, directory: str):
        """Save merged checkpoint: one npz of flattened params + config json.

        Checkpoints are always float: quantization is a load-time transform
        (``load(...).quantize()``), so a quantized scorer refuses to save
        rather than persist int8 tensors that the loader would miscast."""
        if self.quantized:
            raise ValueError("save the float checkpoint before quantize(); "
                             "re-quantize after load")
        os.makedirs(directory, exist_ok=True)
        flat = {}
        for tree, name in ((self.clip_params, "clip"), (self.selector_params, "selector")):
            leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
            for path, leaf in leaves:
                key = name + "/" + "/".join(str(getattr(p, "key", p)) for p in path)
                flat[key] = np.asarray(leaf, np.float32)
        np.savez(os.path.join(directory, "tspo_params.npz"), **flat)
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump({"format": "tspo_tpu-merged-v1",
                       "selector": {"dim": self.selector_cfg.dim,
                                    "num_heads": self.selector_cfg.num_heads}}, f)

    @classmethod
    def load(cls, directory: str, clip_cfg=CLIPConfig(),
             selector_cfg=SelectorConfig(), dtype=jnp.bfloat16, **kw):
        """Load a ``save()`` checkpoint.  The selector subtree stays FLOAT32
        regardless of ``dtype`` — every other construction path keeps the
        selector fp32 (reference trains it fp32; bf16 rounding flips frame
        ranks near ties).  ``config.json`` written by save() overrides the
        selector geometry so a non-default head count cannot silently load
        under the default config (all selector params are dim x dim, so no
        shape error would catch it)."""
        data = np.load(os.path.join(directory, "tspo_params.npz"))
        cfg_path = os.path.join(directory, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                saved = json.load(f).get("selector", {})
            if saved:
                import dataclasses
                selector_cfg = dataclasses.replace(selector_cfg, **saved)

        def unflatten(prefix, leaf_dtype):
            out = {}
            for key in data.files:
                if not key.startswith(prefix + "/"):
                    continue
                parts = key[len(prefix) + 1:].split("/")
                d = out
                for p in parts[:-1]:
                    d = d.setdefault(p, {})
                d[parts[-1]] = jnp.asarray(data[key], leaf_dtype)
            return out

        return cls(clip_params=unflatten("clip", dtype),
                   selector_params=unflatten("selector", jnp.float32),
                   clip_cfg=clip_cfg, selector_cfg=selector_cfg, dtype=dtype,
                   **kw)

    @classmethod
    def from_torch_merged(cls, model_or_sd, clip_cfg=CLIPConfig(),
                          selector_cfg=SelectorConfig(), dtype=jnp.bfloat16, **kw):
        """Load a reference merged TSPO-0.4B checkpoint: an HF CLIPModel state
        dict plus ``selector.*`` keys (scripts/merge_weights.py:31-58)."""
        from ..utils.hf_port import state_dict_of
        sd = state_dict_of(model_or_sd)
        sel_sd = {k[len("selector."):]: v for k, v in sd.items()
                  if k.startswith("selector.")}
        clip_sd = {k: v for k, v in sd.items() if not k.startswith("selector.")}
        return cls(
            clip_params=clip_params_from_torch(clip_sd, clip_cfg, dtype),
            selector_params=selector_params_from_torch(sel_sd, jnp.float32),
            clip_cfg=clip_cfg, selector_cfg=selector_cfg, dtype=dtype, **kw)

    def selector_state_dict_torch(self) -> dict:
        """Export the selector in torch MultiModal_Align key layout."""
        return selector_params_to_torch(self.selector_params)


def build_random_scorer(seed: int = 0, clip_cfg=CLIPConfig(),
                        selector_cfg=SelectorConfig(), dtype=jnp.float32,
                        **kw) -> TSPOScorer:
    """Random-weight scorer (tests, benchmarks)."""
    from .clip import init_clip_params
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return TSPOScorer(
        clip_params=init_clip_params(k1, clip_cfg, dtype),
        selector_params=init_selector_params(k2, selector_cfg),
        clip_cfg=clip_cfg, selector_cfg=selector_cfg, dtype=dtype, **kw)
