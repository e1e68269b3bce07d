"""Benchmark: frames scored per second per chip (BASELINE.json metric).

Measures the TSPO scoring hot path end-to-end on device — fused uint8
preprocess (resize/crop/normalize) -> CLIP-ViT-L/14 vision tower (bf16) ->
selector -> top-k — the pipeline of SURVEY.md §3.3 (mp_tools precompute),
which dominates both training feature extraction and evaluation phase 1.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference scores frames with a per-frame PIL preprocessing
loop + HF torch CLIP on one GPU (gen_id_tspo.py:68-73).  No throughput number
is published (BASELINE.md), so we use a documented estimate of 250 frames/s
per GPU for that pipeline; BASELINE.json's target is >=5x => vs_baseline >= 5.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tspo_tpu.configs import CLIPConfig, SelectorConfig
    from tspo_tpu.models.clip import (encode_images, encode_text, cosine_scores,
                                      init_clip_params, preprocess_frames)
    from tspo_tpu.models.selector import init_selector_params, score_frames
    from tspo_tpu.ops.selection import topk_select

    clip_cfg = CLIPConfig()
    sel_cfg = SelectorConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    clip_params = init_clip_params(k1, clip_cfg, jnp.bfloat16)
    sel_params = init_selector_params(k2, sel_cfg)

    CHUNK = 256          # frames per device batch
    BUCKET = 2048        # selector bucket (one long video)
    H, W = 480, 640      # typical 1-fps decode resolution

    @jax.jit
    def encode_chunk(clip_params, frames_u8):
        pixels = preprocess_frames(frames_u8, clip_cfg.vision.image_size)
        return encode_images(clip_params, pixels, clip_cfg.vision)

    encode_text_j = jax.jit(
        lambda p, i: encode_text(p, i, cfg=clip_cfg.text))

    @jax.jit
    def score_and_select(sel_params, img, txt, valid):
        csc = cosine_scores(img, txt)
        logits, _ = score_frames(sel_params, img.astype(jnp.float32), txt, csc,
                                 cfg=sel_cfg, valid=valid)
        idx, _ = topk_select(jnp.where(valid, logits, -1e30), 64)
        return idx, logits

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (CHUNK, H, W, 3), dtype=np.uint8))
    ids = jnp.asarray(rng.integers(1, 49000, (1, 77)), jnp.int32)
    ids = ids.at[0, -1].set(clip_cfg.text.eos_token_id)
    valid = jnp.ones(BUCKET, bool)

    # Warmup / compile
    txt = encode_text_j(clip_params, ids)
    feat = encode_chunk(clip_params, frames)
    img_bucket = jnp.tile(feat, (BUCKET // CHUNK, 1))
    jax.block_until_ready(score_and_select(sel_params, img_bucket, txt, valid))

    # Timed: one "video" = BUCKET frames -> 8 encode chunks + text + selector.
    # Each iteration fetches the selected indices to host: a true round-trip
    # sync (block_until_ready can return early on tunneled PJRT backends) and
    # exactly what the precompute pipeline consumes.
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        txt = encode_text_j(clip_params, ids)
        chunks = [encode_chunk(clip_params, frames) for _ in range(BUCKET // CHUNK)]
        img_bucket = jnp.concatenate(chunks, axis=0)
        idx, logits = score_and_select(sel_params, img_bucket, txt, valid)
        np.asarray(idx)
    dt = time.perf_counter() - t0

    frames_per_sec = n_iters * BUCKET / dt
    ref_estimate = 250.0  # documented estimate, see module docstring
    print(json.dumps({
        "metric": "frames_scored_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / ref_estimate, 2),
    }))


if __name__ == "__main__":
    main()
