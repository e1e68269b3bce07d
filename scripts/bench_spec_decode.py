"""Measure prompt-lookup speculative decoding at the phase-2 answer shape.

Single-row decode is weight-read-bound (docs/KERNELS.md: B=1 int8 decode at
95% of the HBM roofline) — speculation is the only remaining lever: ONE
weight pass verifies draft_len+1 positions, so tokens/pass scales with the
acceptance rate.  Acceptance depends on the real checkpoint's behavior
(multiple-choice answers largely restate option text from the prompt), which
this zero-egress container can't measure, so the bench brackets the win:

  floor   — adversarial lookup (acceptance ~0): measures pure overhead of
            the (d+1)-position verify pass vs the 1-token step;
  ceiling — oracle lookup (the plain decode's own output appended to the
            lookup corpus): acceptance ~1, the d+1-tokens-per-pass limit.

Run detached: nohup python scripts/bench_spec_decode.py &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from bench_decode_batched import init_qwen2_int8_on_device  # noqa: E402
    from tspo_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    from tspo_tpu.models.qwen2 import (KVCache, Qwen2Config, greedy_decode,
                                       greedy_decode_speculative)

    cfg = Qwen2Config.llava_video_7b()
    params = init_qwen2_int8_on_device(cfg)
    jax.block_until_ready(params)

    P, NEW, D = 3200, 64, 8
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, P, cfg.hidden_size)) * 0.02,
                      jnp.bfloat16)
    valid = jnp.ones((1, P), bool)
    T = P + NEW + D + 4

    def run_plain():
        cache = KVCache.create(cfg, 1, T, jnp.bfloat16)
        out, n = greedy_decode(params, emb, valid, cache, cfg,
                               max_new_tokens=NEW, eos_token_id=-1)
        return np.asarray(out), int(n)

    def run_spec(lookup, lvalid):
        cache = KVCache.create(cfg, 1, T, jnp.bfloat16)
        out, n, nf = greedy_decode_speculative(
            params, emb, valid, cache, cfg, NEW,
            lookup, lvalid, eos_token_id=-1, draft_len=D)
        return np.asarray(out), int(n), int(nf)

    def timeit(fn, iters=3):
        fn()                                   # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters

    plain_out, _ = run_plain()
    t_plain = timeit(run_plain)

    # floor: drafts from an unrelated corpus -> ~0 acceptance
    bad_lookup = jnp.asarray(rng.integers(0, cfg.vocab_size, 512), jnp.int32)
    bad_valid = jnp.ones(512, bool)
    out_f, n_f, nf_f = run_spec(bad_lookup, bad_valid)
    assert list(out_f) == list(plain_out), "speculative output diverged"
    t_floor = timeit(lambda: run_spec(bad_lookup, bad_valid))

    # ceiling: the answer itself sits in the lookup corpus
    oracle = jnp.asarray(
        np.concatenate([np.asarray(bad_lookup[:256]), plain_out]), jnp.int32)
    ov = jnp.ones(oracle.shape[0], bool)
    out_c, n_c, nf_c = run_spec(oracle, ov)
    assert list(out_c) == list(plain_out), "oracle speculative diverged"
    t_ceil = timeit(lambda: run_spec(oracle, ov))

    print(json.dumps({
        "prompt": P, "new_tokens": NEW, "draft_len": D,
        "plain_s": round(t_plain, 3),
        "spec_floor_s": round(t_floor, 3),
        "spec_floor_overhead_x": round(t_floor / t_plain, 3),
        "spec_floor_fwd_passes": nf_f,
        "spec_ceiling_s": round(t_ceil, 3),
        "spec_ceiling_speedup_x": round(t_plain / t_ceil, 2),
        "spec_ceiling_fwd_passes": nf_c,
    }), flush=True)


if __name__ == "__main__":
    main()
