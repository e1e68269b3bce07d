"""Attribute the 7B prefill gap: B=8 P=3200 prefill runs ~43% MFU
(bench_decode_batched: 4.57s for ~389 TFLOP of GEMMs).

Suspects, measured independently at the real layer shapes
([B*P, 3584] x qkv/o/mlp weights, 28 layers amortized in one jit):
  gemm_bf16     pure bf16 weights (the MFU ceiling for this stack)
  gemm_int8     int8 weights dequantized (w.astype(bf16) * scale) per use —
                the decode-optimal weight format paying dequant at prefill
  gemm_int8_mm  int8 weights fed to the matmul directly with fp32 accum and
                per-channel rescale AFTER (native int8 MXU path)
  flash         the prefill flash-attention + GQA repeat at [8, 3200]
Run detached: nohup python scripts/bench_prefill_attribution.py &
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # host sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from tspo_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    B, P, D = 8, 3200, 3584
    L = 28
    FF = 18944
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B * P, D)) * 0.02, jnp.bfloat16)

    # one layer's big GEMMs: qkv (D -> D + 2*kvD ~ here approx D+1024),
    # o (D -> D), gate/up (D -> 2FF), down (FF -> D).  Model them as the
    # dominant [D, FF] pair amortized L times.
    w_bf = jnp.asarray(rng.normal(size=(D, FF)) * 0.02, jnp.bfloat16)
    w_i8 = jnp.asarray(rng.integers(-127, 128, size=(D, FF)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, size=(FF,)), jnp.float32)
    flops_per = 2.0 * B * P * D * FF * L

    @jax.jit
    def gemm_bf16(x):
        def step(h, _):
            y = jnp.dot(h, w_bf, preferred_element_type=jnp.bfloat16)
            return h + y[:, :D] * 1e-3, None
        h, _ = lax.scan(step, x, None, length=L)
        return h.mean()

    @jax.jit
    def gemm_int8(x):
        def step(h, _):
            w = w_i8.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
            y = jnp.dot(h, w, preferred_element_type=jnp.bfloat16)
            return h + y[:, :D] * 1e-3, None
        h, _ = lax.scan(step, x, None, length=L)
        return h.mean()

    @jax.jit
    def gemm_int8_mm(x):
        def step(h, _):
            # activation int8 quantization (per-row absmax) + int8 MXU matmul
            amax = jnp.max(jnp.abs(h), axis=1, keepdims=True) + 1e-6
            hq = jnp.clip(jnp.round(h / amax * 127.0), -127, 127).astype(jnp.int8)
            y32 = jax.lax.dot_general(hq, w_i8, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = (y32.astype(jnp.float32) * (amax.astype(jnp.float32) / 127.0)
                 * scale[None, :]).astype(jnp.bfloat16)
            return h + y[:, :D] * 1e-3, None
        h, _ = lax.scan(step, x, None, length=L)
        return h.mean()

    for name, fn in (("gemm_bf16", gemm_bf16), ("gemm_int8", gemm_int8),
                     ("gemm_int8_mm", gemm_int8_mm)):
        try:
            dt = timeit(fn, x)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 1),
                          "tflops": round(flops_per / dt / 1e12, 1),
                          "mfu_bf16peak": round(flops_per / dt / 197e12, 3)}),
              flush=True)

    # prefill flash attention at the real shape, 28 layers
    from tspo_tpu.ops.flash_attention import flash_attention
    H, KV, hd = 28, 4, 128
    q = jnp.asarray(rng.normal(size=(B, P, H, hd)) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, P, KV, hd)) * 0.05, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, P, KV, hd)) * 0.05, jnp.bfloat16)
    valid = jnp.ones((B, P), bool)

    @jax.jit
    def flash(q, k, v):
        def step(qc, _):
            k_rep = jnp.repeat(k, H // KV, axis=2)
            v_rep = jnp.repeat(v, H // KV, axis=2)
            o = flash_attention(qc, k_rep, v_rep, valid, causal=True)
            return (qc + o.reshape(qc.shape) * 1e-3).astype(qc.dtype), None
        h, _ = lax.scan(step, q, None, length=L)
        return h.mean()

    try:
        dt = timeit(flash, q, k, v, iters=3)
        print(json.dumps({"variant": "flash_28l", "ms": round(dt * 1e3, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": "flash_28l", "error": str(e)[:200]}),
              flush=True)


if __name__ == "__main__":
    main()
