"""Serving-discipline benchmark: continuous batching vs window micro-batch
vs serial B=1 under a Poisson arrival process (7B int8 decoder, random
weights on device — serving economics depend only on shapes).

Workload: N requests, every prompt padded to one 3200-token bucket (the
64-frame answer shape class), per-request max_new drawn from {16, 32, 64}
(MC answers vs caption-length answers — the straggler mix), exponential
inter-arrival times at ``--rate`` req/s.  All three disciplines replay the
SAME arrivals and prompts:

  serial      FIFO, one greedy_decode(B=1) per request (tspo-serve default)
  window      the server's _answer_batched discipline: when idle, take every
              arrived request (<= max_batch, grouped by max_new cap) and run
              one ragged greedy_decode; members wait for the whole batch
  continuous  serve/continuous.py engine: slots decode together in chunked
              blocks; requests join at the next chunk boundary and retire
              individually (no straggler holds, no window wait)

Reported per discipline: completion-latency mean/p50/p99 (arrival ->
answer), time-to-first-token p50 (engine streams; batch paths = completion),
makespan, and aggregate decoded tok/s.

Run detached on the chip: nohup python scripts/bench_continuous.py &
CPU smoke: python scripts/bench_continuous.py --tiny

IMPORTANT on 1-core dev hosts: the disciplines are host-loop-driven
(arrival sleeps, per-chunk dispatch), so ANY concurrent CPU work skews the
comparison — continuous suffers most (it pays host work every chunk).
Run with an idle host; a contended run measured 3-6x inflated latencies.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_decode_batched import init_qwen2_int8_on_device  # noqa: E402


def _percentiles(xs):
    xs = np.asarray(xs)
    return {"mean": round(float(xs.mean()), 3),
            "p50": round(float(np.percentile(xs, 50)), 3),
            "p99": round(float(np.percentile(xs, 99)), 3)}


def _lat_stats(pairs):
    """pairs: [(cap, latency_s)] -> overall + per-cap percentiles (the
    long-tail question is specifically the SHORT requests' latency)."""
    out = _percentiles([v for _, v in pairs])
    for cap in sorted({c for c, _ in pairs}):
        out[f"cap{cap}"] = _percentiles([v for c, v in pairs if c == cap])
    return out


def build_workload(n, rate, prompt, hidden, caps, seed=0, p_long=None):
    """p_long: probability of the LAST (longest) cap — the long-tail mix
    (--longtail: 25% long caption decodes among short MC answers, where a
    short request arriving behind a long batch shows the discipline gap)."""
    rng = np.random.default_rng(seed)
    arrivals = np.cumsum(rng.exponential(1.0 / rate, size=n))
    arrivals -= arrivals[0]
    probs = None
    if p_long is not None:
        probs = [(1 - p_long) / (len(caps) - 1)] * (len(caps) - 1) + [p_long]
    reqs = []
    for i in range(n):
        emb = jnp.asarray(rng.normal(size=(1, prompt, hidden)) * 0.02,
                          jnp.bfloat16)
        reqs.append({"emb": emb, "max_new": int(rng.choice(caps, p=probs)),
                     "arrival": float(arrivals[i])})
    return reqs


def run_serial(params, cfg, reqs, prompt):
    from tspo_tpu.models.qwen2 import KVCache, greedy_decode
    valid = jnp.ones((1, prompt), bool)
    lat, toks = [], 0
    t0 = time.perf_counter()
    for r in reqs:
        now = time.perf_counter() - t0
        if now < r["arrival"]:
            time.sleep(r["arrival"] - now)
        cache = KVCache.create(cfg, 1, prompt + max(CAPS) + 8, jnp.bfloat16)
        out, n = greedy_decode(params, r["emb"], valid, cache, cfg,
                               max_new_tokens=r["max_new"], eos_token_id=-1)
        np.asarray(out)                      # host-fetch sync (KERNELS.md)
        lat.append((r["max_new"],
                    time.perf_counter() - t0 - r["arrival"]))
        toks += r["max_new"]
    return lat, lat, toks, time.perf_counter() - t0


def run_window(params, cfg, reqs, prompt, max_batch=4):
    """The server's micro-batch discipline: group every arrived request by
    its max_new cap (per-request budgets are honored by cap grouping,
    server.py::_answer_batched), decode up to max_batch as one batch."""
    from tspo_tpu.models.qwen2 import KVCache, greedy_decode
    lat = []
    toks = 0
    pending = sorted(reqs, key=lambda r: r["arrival"])
    t0 = time.perf_counter()
    while pending:
        now = time.perf_counter() - t0
        if now < pending[0]["arrival"]:
            time.sleep(pending[0]["arrival"] - now)
            now = time.perf_counter() - t0
        arrived = [r for r in pending if r["arrival"] <= now]
        cap = arrived[0]["max_new"]        # server: leader's cap groups
        batch = [r for r in arrived if r["max_new"] == cap][:max_batch]
        B = len(batch)
        emb = jnp.concatenate([r["emb"] for r in batch], axis=0)
        valid = jnp.ones((B, prompt), bool)
        cache = KVCache.create(cfg, B, prompt + cap + 8, jnp.bfloat16)
        out, n = greedy_decode(params, emb, valid, cache, cfg,
                               max_new_tokens=cap, eos_token_id=-1)
        np.asarray(out)
        done = time.perf_counter() - t0
        taken = {id(r) for r in batch}
        for r in batch:
            lat.append((cap, done - r["arrival"]))
            toks += cap
        pending = [r for r in pending if id(r) not in taken]
    return lat, lat, toks, time.perf_counter() - t0


def run_continuous(params, cfg, reqs, prompt, slots, chunk,
                   prefill_chunk=0):
    from tspo_tpu.serve.continuous import ContinuousEngine
    eng = ContinuousEngine(params, cfg, slots=slots, chunk=chunk,
                           max_prompt=prompt, decode_slots=max(CAPS) + chunk,
                           prompt_bucket=prompt, dtype=jnp.bfloat16,
                           eos_token_id=-1, prefill_chunk=prefill_chunk)
    lat, ttft, toks = [], [], 0
    t0 = time.perf_counter()
    handles = []
    try:
        for r in reqs:
            now = time.perf_counter() - t0
            if now < r["arrival"]:
                time.sleep(r["arrival"] - now)
            first = {"t": None}

            def cb(piece, first=first):
                if first["t"] is None:
                    first["t"] = time.perf_counter() - t0

            h = eng.submit(r["emb"], max_new_tokens=r["max_new"],
                           stream_cb=cb)
            handles.append((r, h, first))
        for r, h, first in handles:
            h.result(timeout=600)
    finally:
        wall = time.perf_counter() - t0
        eng.shutdown()
    for r, h, first in handles:
        toks += len(h.tokens)
        lat.append((r["max_new"], h.finished_at - t0 - r["arrival"]))
        ttft.append((r["max_new"],
                     first["t"] - r["arrival"] if first["t"] else wall))
    return lat, ttft, toks, wall, eng.stats


# two answer-length classes (MC letter vs caption): enough for the straggler
# mix while keeping the compile surface small through the tunneled backend
# (every (B, cap) pair is its own greedy_decode program)
CAPS = (16, 64)


def main():
    from tspo_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    from tspo_tpu.models.qwen2 import Qwen2Config, init_qwen2_params

    tiny = "--tiny" in sys.argv
    global CAPS
    longtail = "--longtail" in sys.argv
    if longtail:
        CAPS = (16, 256)          # short MC answers + long caption decodes
    if tiny:
        cfg = Qwen2Config.tiny()
        params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        n, rate, prompt, slots, chunk = 6, 4.0, 64, 2, 4
    else:
        cfg = Qwen2Config.llava_video_7b()
        params = init_qwen2_int8_on_device(cfg)
        n = int(next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                      if a == "--n"), 24))
        rate = float(next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                           if a == "--rate"), 1.2))
        # chunk=16: this dev box pays ~70 ms tunneled round-trip per chunk
        # boundary (KERNELS.md streaming section); production hosts at
        # ~1-2 ms could run chunk=8 for finer admission granularity
        prompt, slots, chunk = 3200, 4, 16
    jax.block_until_ready(params)
    print(json.dumps({"config": {"n": n, "rate_req_s": rate,
                                 "prompt": prompt, "caps": CAPS,
                                 "slots": slots, "chunk": chunk}}),
          flush=True)

    reqs = build_workload(n, rate, prompt, cfg.hidden_size, CAPS,
                          p_long=0.25 if longtail else None)

    # warm compiles OUTSIDE the timed runs (every B the window path can form)
    from tspo_tpu.models.qwen2 import KVCache, decode_prefill, greedy_decode
    max_b = 5 if not tiny else 3
    for B in range(1, max_b):
        for cap in CAPS:
            emb = jnp.concatenate([reqs[0]["emb"]] * B, axis=0)
            cache = KVCache.create(cfg, B, prompt + cap + 8, jnp.bfloat16)
            out, _ = greedy_decode(params, emb, jnp.ones((B, prompt), bool),
                                   cache, cfg, max_new_tokens=cap,
                                   eos_token_id=-1)
            np.asarray(out)
    # engine programs: chunk + insert + B=1 admission via a throwaway
    # engine, then the batched-admission prefills at every group size
    from tspo_tpu.serve.continuous import ContinuousEngine
    weng = ContinuousEngine(params, cfg, slots=slots, chunk=chunk,
                            max_prompt=prompt,
                            decode_slots=max(CAPS) + chunk,
                            prompt_bucket=prompt, dtype=jnp.bfloat16,
                            eos_token_id=-1)
    weng.submit(reqs[0]["emb"], max_new_tokens=chunk).result(timeout=None)
    weng.shutdown()
    for B in range(2, (slots if not tiny else 2) + 1):
        emb = jnp.concatenate([reqs[0]["emb"]] * B, axis=0)
        cache = KVCache.create(cfg, B, prompt, jnp.bfloat16)
        t, _c, _p = decode_prefill(params, emb, jnp.ones((B, prompt), bool),
                                   cache, cfg)
        np.asarray(t)

    results = {}
    lat, _, toks, wall = run_serial(params, cfg,
                                    [dict(r) for r in reqs], prompt)
    results["serial"] = {"latency_s": _lat_stats(lat),
                         "tok_s": round(toks / wall, 1),
                         "makespan_s": round(wall, 2)}
    print(json.dumps({"serial": results["serial"]}), flush=True)

    lat, _, toks, wall = run_window(params, cfg,
                                    [dict(r) for r in reqs], prompt)
    results["window"] = {"latency_s": _lat_stats(lat),
                         "tok_s": round(toks / wall, 1),
                         "makespan_s": round(wall, 2)}
    print(json.dumps({"window": results["window"]}), flush=True)

    lat, ttft, toks, wall, stats = run_continuous(
        params, cfg, [dict(r) for r in reqs], prompt, slots, chunk)
    results["continuous"] = {"latency_s": _lat_stats(lat),
                             "ttft_s": _lat_stats(ttft),
                             "tok_s": round(toks / wall, 1),
                             "makespan_s": round(wall, 2),
                             "engine_stats": stats}
    print(json.dumps({"continuous": results["continuous"]}), flush=True)

    # chunked admission: bounded decode stalls while a new prompt prefills
    pfc = 2048 if not tiny else 16
    from tspo_tpu.models.qwen2 import prefill_extend
    Wb = -(-prompt // pfc) * pfc
    row = KVCache.create(cfg, 1, Wb, jnp.bfloat16)
    for off in range(0, prompt, pfc):          # warm the chunk programs
        real = min(pfc, prompt - off)
        t, row = prefill_extend(params, reqs[0]["emb"][:, :pfc],
                                jnp.int32(real), row, cfg)
        np.asarray(t)
    lat, ttft, toks, wall, stats = run_continuous(
        params, cfg, [dict(r) for r in reqs], prompt, slots, chunk,
        prefill_chunk=pfc)
    results["continuous_chunked_prefill"] = {
        "latency_s": _lat_stats(lat), "ttft_s": _lat_stats(ttft),
        "tok_s": round(toks / wall, 1), "makespan_s": round(wall, 2),
        "engine_stats": stats}
    print(json.dumps(
        {"continuous_chunked_prefill":
         results["continuous_chunked_prefill"]}), flush=True)


if __name__ == "__main__":
    main()
