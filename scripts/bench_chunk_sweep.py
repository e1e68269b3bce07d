"""Sweep fused_score_program chunk size for the current bf16 + Pallas-lane
configuration (the committed chunk=512 was tuned on the older int8 tower).
Prints one json line per chunk; host-fetch timing."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from tspo_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    from tspo_tpu.configs import CLIPConfig, SelectorConfig
    from tspo_tpu.models.clip import init_clip_params
    from tspo_tpu.models.selector import init_selector_params
    from tspo_tpu.models.tspo_model import fused_score_program

    clip_cfg = CLIPConfig()
    sel_cfg = SelectorConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    clip_params = init_clip_params(k1, clip_cfg, jnp.bfloat16)
    sel_params = init_selector_params(k2, sel_cfg)
    BUCKET = 2048
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (BUCKET, 480, 640, 3),
                                      dtype=np.uint8))
    ids = jnp.asarray(rng.integers(1, 49000, (1, 77)), jnp.int32)
    ids = ids.at[0, -1].set(clip_cfg.text.eos_token_id)
    valid = jnp.ones(BUCKET, bool)

    for chunk in (256, 512, 1024, 2048):
        def run():
            idx, _, _ = fused_score_program(
                clip_params, sel_params, frames, ids, valid,
                jnp.float32(0.025), vision_cfg=clip_cfg.vision,
                text_cfg=clip_cfg.text, selector_cfg=sel_cfg, chunk=chunk,
                window_size=12, sample_num=64, dtype=jnp.bfloat16)
            return np.asarray(idx)

        try:
            run()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"chunk": chunk, "error": str(e)[:200]}),
                  flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(5):
            run()
        dt = (time.perf_counter() - t0) / 5
        print(json.dumps({"chunk": chunk,
                          "frames_per_sec": round(BUCKET / dt, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
