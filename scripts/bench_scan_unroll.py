"""Sweep lax.scan `unroll` for the CLIP tower's weight-stacked layers at the
production fused-program shape (bucket 2048, chunk 512, bf16, Pallas lane
attention).

Hypothesis (docs/KERNELS.md attribution ledger): ~170 ms/bucket sits in
LN/residual fusion boundaries + scan step overhead; unrolling k layers per
scan step lets XLA fuse the residual add of layer i with layer i+1's
layernorm.  Cost: compile time grows ~linearly in k.

Prints one json line per unroll value; host-fetch timing like the other
bench scripts.  Run alone (one TPU process at a time).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from tspo_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    import tspo_tpu.models.clip as clip_mod
    from tspo_tpu.configs import CLIPConfig, SelectorConfig
    from tspo_tpu.models.clip import init_clip_params
    from tspo_tpu.models.selector import init_selector_params
    from tspo_tpu.models.tspo_model import fused_score_program

    clip_cfg = CLIPConfig()
    sel_cfg = SelectorConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    clip_params = init_clip_params(k1, clip_cfg, jnp.bfloat16)
    sel_params = init_selector_params(k2, sel_cfg)
    BUCKET, CHUNK = 2048, 512
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (BUCKET, 480, 640, 3),
                                      dtype=np.uint8))
    ids = jnp.asarray(rng.integers(1, 49000, (1, 77)), jnp.int32)
    ids = ids.at[0, -1].set(clip_cfg.text.eos_token_id)
    valid = jnp.ones(BUCKET, bool)

    baseline_idx = None
    for unroll in (1, 2, 4, 8):
        clip_mod.SCAN_UNROLL = unroll
        jax.clear_caches()  # force retrace: SCAN_UNROLL is read at trace time

        def run():
            idx, _, _ = fused_score_program(
                clip_params, sel_params, frames, ids, valid,
                jnp.float32(0.025), vision_cfg=clip_cfg.vision,
                text_cfg=clip_cfg.text, selector_cfg=sel_cfg, chunk=CHUNK,
                window_size=12, sample_num=64, dtype=jnp.bfloat16)
            return np.asarray(idx)

        try:
            t0 = time.perf_counter()
            idx = run()
            first_call_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"unroll": unroll, "error": str(e)[:200]}),
                  flush=True)
            continue
        if baseline_idx is None:
            baseline_idx = idx
        t0 = time.perf_counter()
        for _ in range(5):
            run()
        dt = (time.perf_counter() - t0) / 5
        # first_call includes one device execution + host fetch; subtracting
        # a steady-state run isolates (approximate) compile time
        print(json.dumps({"unroll": unroll,
                          "frames_per_sec": round(BUCKET / dt, 1),
                          "first_call_s": round(first_call_s, 1),
                          "compile_s_approx": round(first_call_s - dt, 1),
                          # unrolling reorders fusions/reductions, so
                          # near-tied bf16 logits may legitimately swap
                          # top-k order — a False here can be a tie artifact,
                          # not a wrong result
                          "idx_match": bool((idx == baseline_idx).all()),
                          "idx_overlap": int(
                              len(np.intersect1d(idx, baseline_idx)))}),
              flush=True)
    clip_mod.SCAN_UNROLL = 1


if __name__ == "__main__":
    main()
