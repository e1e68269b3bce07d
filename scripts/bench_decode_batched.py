"""Measure 7B decode throughput: single-row vs batched G-rollout decode.

The GRPO training hot loop answers the same question once per Gumbel subset
(G=8 rollouts; reference loops generate() G times, tspo_trainer.py:508-537).
Decode on one v5e chip is weight-bandwidth-bound (STATUS.md: bs=1 int8 decode
= 89 tok/s = 83% of the 819 GB/s HBM roofline), so batching the G rollouts
into one decode amortizes the 7.6 GB of weight reads per step across G rows;
the marginal cost per extra row is only its KV-cache traffic.

Expected from the roofline at prompt P=3200 (16-frame training rollout):
  weights 7.6 GB + KV 0.19 GB/row
  B=1: 7.8 GB/token  -> ~105 tok/s ceiling
  B=8: 9.1 GB/step   -> ~718 tok/s aggregate ceiling (6.8x)

This script measures it: greedy_decode (models/qwen2.py) at B=1 and B=8,
int8 weights initialized ON DEVICE (no 7.6 GB host->device tunnel transfer),
decode cost isolated as t(80 new tokens) - t(16 new tokens) over 64 tokens.

Run detached: nohup python scripts/bench_decode_batched.py &
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


def init_qwen2_int8_on_device(cfg):
    """Random weight-only-int8 params with the exact quantize_qwen2_params
    layout (kernel_q [L, fi, fo] int8 + scale [L, fo] f32), built on device."""
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 16))

    def make(key, fi, fo):
        return jax.random.randint(key, (L, fi, fo), -127, 128, jnp.int8)

    def lin(fi, fo, bias):
        out = {"kernel_q": make(next(keys), fi, fo),
               "scale": jnp.full((L, fo), 0.02 / 127.0, jnp.float32)}
        if bias:
            out["bias"] = jnp.zeros((L, fo), jnp.bfloat16)
        return out

    params = {
        "embedding": (jax.random.normal(next(keys), (cfg.vocab_size, D),
                                        jnp.bfloat16) * 0.02),
        "layers": {
            "ln1": jnp.ones((L, D), jnp.bfloat16),
            "ln2": jnp.ones((L, D), jnp.bfloat16),
            "q": lin(D, qd, True), "k": lin(D, kvd, True),
            "v": lin(D, kvd, True), "o": lin(qd, D, False),
            "gate": lin(D, I, False), "up": lin(D, I, False),
            "down": lin(I, D, False),
        },
        "final_ln": jnp.ones(D, jnp.bfloat16),
    }
    params["lm_head_q"] = jax.random.randint(next(keys), (cfg.vocab_size, D),
                                             -127, 128, jnp.int8)
    params["lm_head_scale"] = jnp.full((cfg.vocab_size,), 0.02 / 127.0,
                                       jnp.float32)
    return params


def weight_bytes(params) -> float:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))


def main():
    from tspo_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    from tspo_tpu.models.qwen2 import KVCache, Qwen2Config, greedy_decode

    cfg = Qwen2Config.llava_video_7b()
    params = init_qwen2_int8_on_device(cfg)
    jax.block_until_ready(params)
    wb = weight_bytes(params)
    NEW_LO, NEW_HI = 16, 80
    print(json.dumps({"weights_gb": round(wb / 1e9, 2)}), flush=True)

    shapes = [(1, 3200), (8, 3200)]
    if "--sweep" in sys.argv:
        # attribution: P=64 isolates the weight-read cost from KV/attention
        shapes = [(8, 64), (8, 3200), (1, 3200)]
    if "--cross" in sys.argv:
        # cross-sample rollout batching (cfg.cross_batch_rollouts): two
        # samples' G=8 rollouts decode as ONE B=16 ragged batch (extends,
        # so --sweep --cross keeps the sweep points)
        shapes = shapes + [(16, 3200)]
    rng = np.random.default_rng(0)
    results = {}
    for B, P in shapes:
        T = P + NEW_HI + 1
        kv_row = (2 * cfg.num_layers * T * cfg.num_kv_heads
                  * cfg.head_dim * 2)
        emb = jnp.asarray(rng.normal(size=(B, P, cfg.hidden_size)) * 0.02,
                          jnp.bfloat16)
        valid = jnp.ones((B, P), bool)

        def run(max_new):
            cache = KVCache.create(cfg, B, T, jnp.bfloat16)
            out, n = greedy_decode(params, emb, valid, cache, cfg,
                                   max_new_tokens=max_new,
                                   eos_token_id=-1)   # never fires: full run
            return np.asarray(out)

        ts = {}
        for max_new in (NEW_LO, NEW_HI):
            run(max_new)                       # compile + warm
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                run(max_new)
            ts[max_new] = (time.perf_counter() - t0) / iters
        decode_s = ts[NEW_HI] - ts[NEW_LO]
        n_tok = NEW_HI - NEW_LO
        tok_s_row = n_tok / decode_s
        agg = tok_s_row * B
        step_bytes = wb + B * kv_row
        sol = 819e9 / step_bytes               # v5e HBM peak tokens/s bound
        row = {"B": B, "prompt": P,
               "t_prefill_plus16": round(ts[NEW_LO], 3),
               "t_prefill_plus80": round(ts[NEW_HI], 3),
               "tok_s_per_row": round(tok_s_row, 1),
               "tok_s_aggregate": round(agg, 1),
               "hbm_sol_tok_s": round(sol * B, 1),
               "sol_frac": round(agg / (sol * B), 3)}
        results[(B, P)] = row
        print(json.dumps(row), flush=True)

    if (1, 3200) in results and (8, 3200) in results:
        gain = (results[(8, 3200)]["tok_s_aggregate"]
                / results[(1, 3200)]["tok_s_aggregate"])
        print(json.dumps({"batched_gain_x": round(gain, 2)}), flush=True)
    if (8, 3200) in results and (16, 3200) in results:
        gain = (results[(16, 3200)]["tok_s_aggregate"]
                / results[(8, 3200)]["tok_s_aggregate"])
        print(json.dumps({"cross_batch_gain_x_over_B8": round(gain, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
