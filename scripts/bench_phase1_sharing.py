"""Measure the phase-1 video-feature-sharing win on chip.

k questions over one 2048-frame video, through the PRODUCTION paths:
  - reference-style (share off): TSPOScorer.score_video_fused per question
    (preprocess + vision tower + text tower + selector, single dispatch)
  - shared: TSPOScorer.encode_frame_features once, then per-question
    encode_text_features + cosine + temporal_sampling — exactly what
    eval/precompute.py::_compute_features and serve's feature LRU run.

Run detached on the TPU (one process at a time):
  nohup python scripts/bench_phase1_sharing.py > /tmp/share_bench.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(k: int = 3, bucket: int = 2048):
    from tspo_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from tspo_tpu.configs import CLIPConfig, SelectorConfig
    from tspo_tpu.models.clip import cosine_scores
    from tspo_tpu.models.tspo_model import build_random_scorer

    clip_cfg = CLIPConfig()
    sel_cfg = SelectorConfig()
    rng = np.random.default_rng(0)

    def tokenize(problem: str):
        ids = rng.integers(1, 49000, (1, 77)).astype(np.int32)
        ids[0, -1] = clip_cfg.text.eos_token_id
        return ids, np.ones((1, 77), np.int32)

    scorer = build_random_scorer(seed=0, clip_cfg=clip_cfg,
                                 selector_cfg=sel_cfg, dtype=jnp.bfloat16,
                                 tokenize=tokenize, batch_frames=512,
                                 frame_buckets=(2048,))
    frames = rng.integers(0, 256, (bucket, 480, 640, 3), dtype=np.uint8)
    questions = [f"question {i} about the video" for i in range(k)]

    def full(q):
        idx, _ = scorer.score_video_fused(frames, q, sample_num=64,
                                          window_size=12)
        return np.asarray(idx)

    def encode_video():
        return np.asarray(scorer.encode_frame_features(frames), np.float32)

    def per_question(img, q):
        txt = scorer.encode_text_features(q)
        csc = cosine_scores(jnp.asarray(img), txt)
        (idx), _ = scorer.temporal_sampling(img, txt, csc, method="topk",
                                            window_size=12, sample_num=64)
        return np.asarray(idx)

    # warmup/compile both paths
    full(questions[0])
    img = encode_video()
    per_question(img, questions[0])

    t0 = time.perf_counter()
    for q in questions:
        full(q)
    t_ref = time.perf_counter() - t0

    t0 = time.perf_counter()
    img = encode_video()
    t_encode = time.perf_counter() - t0
    for q in questions:
        per_question(img, q)
    t_shared = time.perf_counter() - t0

    print({"k_questions": k, "bucket": bucket,
           "per_question_full_s": round(t_ref / k, 3),
           "total_reference_style_s": round(t_ref, 3),
           "encode_once_s": round(t_encode, 3),
           "per_question_warm_s": round((t_shared - t_encode) / k, 4),
           "total_shared_s": round(t_shared, 3),
           "speedup_at_k": round(t_ref / t_shared, 2)})


if __name__ == "__main__":
    main()
