"""Engine-level prefix caching cost (serve/continuous.py prefix_slots):
cold admission (full ~11.9k-token prefill) vs warm prefix hit (import the
pooled video-prefix KV + prefill only the question suffix), measured as
submit→result wall for a 32-token answer at the 7B/64-frame geometry —
and the warm hit again while another tenant is mid-decode (the
continuous-batching case the solo --prefix-cache path cannot serve).

Random int8 weights; prompt embeds are random (decoder economics depend
only on shapes).  Run detached on the chip:
  nohup python scripts/bench_engine_prefix.py &
CPU smoke: python scripts/bench_engine_prefix.py --tiny
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
    if tiny:
        cfg = Qwen2Config.tiny()
        params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        S, P, max_new = 48, 40, 8
        eng_kw = dict(slots=2, chunk=4, max_prompt=64, decode_slots=16,
                      prompt_bucket=64, dtype=jnp.float32, prefix_slots=1)
    else:
        cfg = Qwen2Config.llava_video_7b()
        params = init_qwen2_int8_on_device(cfg)
        # 64-frame LLaVA prompt: ~11.7k video tokens + ~200 text
        S, P, max_new = 11900, 11700, 32
        eng_kw = dict(slots=2, chunk=8, max_prompt=12288, decode_slots=64,
                      prompt_bucket=2048, dtype=jnp.bfloat16,
                      prefill_chunk=2048, prefix_slots=1)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.normal(size=(1, S, cfg.hidden_size)) * 0.02,
                       eng_kw["dtype"])
    jax.block_until_ready(base)

    def prompt(seed):
        """Same prefix, different question suffix."""
        sfx = jnp.asarray(
            np.random.default_rng(seed).normal(
                size=(1, S - P, cfg.hidden_size)) * 0.02, eng_kw["dtype"])
        return jnp.concatenate([base[:, :P], sfx], axis=1)

    eng = ContinuousEngine(params, cfg, **eng_kw)
    try:
        def timed(seed, **kw):
            e = prompt(seed)
            jax.block_until_ready(e)
            t0 = time.perf_counter()
            toks = eng.submit(e, max_new_tokens=max_new, **kw).result(
                timeout=1200)
            return round(time.perf_counter() - t0, 3), toks

        # warm the compiled programs (miss + hit paths), then time
        timed(1, prefix_key="warmup", prefix_len=P)
        timed(2, prefix_key="warmup", prefix_len=P)
        cold_s, _ = timed(3, prefix_key="video", prefix_len=P)   # miss+store
        warm_s, _ = timed(4, prefix_key="video", prefix_len=P)   # hit, idle
        warm2_s, _ = timed(5, prefix_key="video", prefix_len=P)
        # hit while another tenant decodes
        bg = eng.submit(prompt(6), max_new_tokens=eng.D - 1)
        time.sleep(0.2 if tiny else 1.0)     # let it get into decode
        busy_s, _ = timed(7, prefix_key="video", prefix_len=P)
        bg.result(timeout=1200)
        print(json.dumps({
            "geometry": {"prompt_tokens": S, "prefix_len": P,
                         "max_new": max_new, "tiny": tiny},
            "cold_admission_s": cold_s,
            "warm_hit_s": min(warm_s, warm2_s),
            "warm_hit_while_decoding_s": busy_s,
            "speedup_cold_over_warm": round(cold_s / min(warm_s, warm2_s),
                                            2),
            "stats": dict(eng.stats),
        }), flush=True)
    finally:
        eng.shutdown()


if __name__ == "__main__":
    main()
