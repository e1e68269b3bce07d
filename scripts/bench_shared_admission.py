"""Shared-prompt admission cost (serve/continuous.py _admit_shared): n
multi-choice tenants of ONE prompt (the /v1/answer n>1 self-consistency
path) vs the same n as DISTINCT same-length prompts (normal ragged group
prefill).  Shared admits off one B=1 prefill + n logit draws; the control
pays a B=n prefill of the same token count per row.

Submit→all-answers wall at the 7B/64-frame geometry (random int8 weights,
random embeds — decoder economics depend only on shapes).

  nohup python scripts/bench_shared_admission.py &      # chip
  python scripts/bench_shared_admission.py --tiny       # CPU smoke
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_decode_batched import init_qwen2_int8_on_device  # noqa: E402


def main():
    from tspo_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    from tspo_tpu.models.qwen2 import Qwen2Config, init_qwen2_params
    from tspo_tpu.serve.continuous import ContinuousEngine

    tiny = "--tiny" in sys.argv
    N = 4
    if tiny:
        cfg = Qwen2Config.tiny()
        params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        S, max_new = 40, 6
        eng_kw = dict(slots=N, chunk=4, max_prompt=64, decode_slots=16,
                      prompt_bucket=64, dtype=jnp.float32, prefix_slots=1)
    else:
        # 32-frame geometry (~5.9k tokens): the largest where a 4-row
        # ragged group prefill fits one 16 GB chip next to the 4-slot
        # engine cache + int8 params (B=4 at the 64-frame 11.9k geometry
        # exhausts HBM — the engine's max_group_tokens cap exists for
        # exactly that; phase-2 roofline found the same B=4x32f wall)
        cfg = Qwen2Config.llava_video_7b()
        params = init_qwen2_int8_on_device(cfg)
        S, max_new = 5900, 32
        eng_kw = dict(slots=N, chunk=8, max_prompt=6144, decode_slots=64,
                      prompt_bucket=2048, dtype=jnp.bfloat16, prefix_slots=1)
    rng = np.random.default_rng(0)

    def prompt(seed):
        return jnp.asarray(
            np.random.default_rng(seed).normal(
                size=(1, S, cfg.hidden_size)) * 0.02, eng_kw["dtype"])

    eng = ContinuousEngine(params, cfg, **eng_kw)
    try:
        def run_shared(emb, seed0):
            jax.block_until_ready(emb)
            t0 = time.perf_counter()
            reqs = eng.submit_group(
                emb, [{"max_new_tokens": max_new, "temperature": 0.8,
                       "top_p": 0.95, "seed": seed0 + i}
                      for i in range(N)])
            for r in reqs:
                r.result(timeout=1800)
            return round(time.perf_counter() - t0, 3)

        def run_distinct(seeds):
            embs = [prompt(s) for s in seeds]
            jax.block_until_ready(embs)
            t0 = time.perf_counter()
            with eng._device_lock:      # queue all before one admission
                reqs = [eng.submit(e, max_new_tokens=max_new,
                                   temperature=0.8, top_p=0.95, seed=7)
                        for e in embs]
            for r in reqs:
                r.result(timeout=1800)
            return round(time.perf_counter() - t0, 3)

        P = S - (8 if tiny else 150)    # video-block prefix, ~150-token Qs

        def run_warm_prefix(emb, seed0):
            """The warm-video n>1 route (server.py _engine_submit_n):
            per-choice prefix HITS — n suffix-only prefills + draws."""
            jax.block_until_ready(emb)
            t0 = time.perf_counter()
            reqs = [eng.submit(emb, max_new_tokens=max_new,
                               temperature=0.8, top_p=0.95,
                               seed=seed0 + i, prefix_key="warmvid",
                               prefix_len=P)
                    for i in range(N)]
            for r in reqs:
                r.result(timeout=1800)
            return round(time.perf_counter() - t0, 3)

        run_shared(prompt(1), 100)          # warm both paths' programs
        run_distinct([10, 11, 12, 13])
        run_warm_prefix(prompt(4), 400)     # first call = miss + store
        run_warm_prefix(prompt(4), 410)     # warms the hit programs
        shared_s = min(run_shared(prompt(2), 200),
                       run_shared(prompt(3), 300))
        distinct_s = min(run_distinct([20, 21, 22, 23]),
                         run_distinct([30, 31, 32, 33]))
        warm_s = min(run_warm_prefix(prompt(4), 420),
                     run_warm_prefix(prompt(4), 430))
        print(json.dumps({
            "geometry": {"prompt_tokens": S, "prefix_len": P, "n": N,
                         "max_new": max_new, "tiny": tiny},
            "shared_prompt_s": shared_s,
            "distinct_prompts_s": distinct_s,
            "warm_prefix_hits_s": warm_s,
            "speedup_shared": round(distinct_s / shared_s, 2),
            "speedup_warm": round(distinct_s / warm_s, 2),
            "stats": dict(eng.stats),
        }), flush=True)
    finally:
        eng.shutdown()


if __name__ == "__main__":
    main()
