"""Chunked-streaming decode overhead vs the fused while_loop, on chip.

greedy_decode_stream trades one host round-trip per chunk for time-to-first-
token; this bench quantifies the trade at the production shape (int8 7B,
P=3200, 64 new tokens): fused tok/s vs streamed tok/s at chunk 4/8/16, plus
time-to-first-chunk.  Run detached, one TPU process at a time.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def main():
    from bench_decode_batched import init_qwen2_int8_on_device
    from tspo_tpu.cli.common import enable_compilation_cache
    from tspo_tpu.models.qwen2 import (KVCache, Qwen2Config, greedy_decode,
                                       greedy_decode_stream)
    enable_compilation_cache()
    P, NEW = 3200, 64
    cfg = Qwen2Config.llava_video_7b()
    params = init_qwen2_int8_on_device(cfg)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, P, cfg.hidden_size)) * 0.02,
                      jnp.bfloat16)
    valid = jnp.ones((1, P), bool)

    def run_plain():
        cache = KVCache.create(cfg, 1, P + NEW + 8, jnp.bfloat16)
        out, n = greedy_decode(params, emb, valid, cache, cfg, NEW,
                               eos_token_id=-1)
        return np.asarray(out)

    def run_stream(chunk):
        n_chunks = -(-NEW // chunk)
        cache = KVCache.create(cfg, 1, P + n_chunks * chunk, jnp.bfloat16)
        t0 = time.perf_counter()
        first = None
        blocks = []
        for b in greedy_decode_stream(params, emb, valid, cache, cfg, NEW,
                                      eos_token_id=-1, chunk=chunk):
            if first is None:
                first = time.perf_counter() - t0
            blocks.append(b)
        return np.concatenate(blocks, axis=1)[0], first

    def timeit(fn, iters=3):
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        _ = np.asarray(r[0] if isinstance(r, tuple) else r)
        return (time.perf_counter() - t0) / iters

    plain = run_plain()
    t_plain = timeit(run_plain)
    rec = {"prompt": P, "new_tokens": NEW,
           "plain_s": round(t_plain, 3),
           "plain_tok_s": round(NEW / t_plain, 1)}
    for chunk in (4, 8, 16):
        out, _ = run_stream(chunk)
        rec[f"chunk{chunk}_exact"] = bool((out == plain).all())
        t = timeit(lambda: run_stream(chunk))
        _, ttfc = run_stream(chunk)
        rec[f"chunk{chunk}_s"] = round(t, 3)
        rec[f"chunk{chunk}_tok_s"] = round(NEW / t, 1)
        rec[f"chunk{chunk}_overhead_x"] = round(t / t_plain, 3)
        rec[f"chunk{chunk}_first_block_s"] = round(ttfc, 3)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
