"""Attribution: device-preprocess share of the fused scoring program.

Times fused_score_program on (a) raw 480x640 uint8 frames (production: the
decode resolution; resize+crop+normalize on device) vs (b) pre-sized 224x224
uint8 frames (preprocess reduced to normalize).  The difference is the
resize/crop cost — if material, a fused Pallas preprocess kernel is the next
lever; if not, the roofline story in docs/KERNELS.md stands.

Run detached; host-fetch timing.
"""

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
    BUCKET, CHUNK = 2048, 512
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 49000, (1, 77)), jnp.int32)
    ids = ids.at[0, -1].set(clip_cfg.text.eos_token_id)
    valid = jnp.ones(BUCKET, bool)

    for H, W in ((480, 640), (224, 224)):
        frames = jnp.asarray(rng.integers(0, 256, (BUCKET, H, W, 3),
                                          dtype=np.uint8))

        def run():
            idx, count, logits = fused_score_program(
                clip_params, sel_params, frames, ids, valid,
                jnp.float32(0.025), vision_cfg=clip_cfg.vision,
                text_cfg=clip_cfg.text, selector_cfg=sel_cfg, chunk=CHUNK,
                window_size=12, sample_num=64, dtype=jnp.bfloat16)
            return np.asarray(idx)

        run()
        t0 = time.perf_counter()
        for _ in range(5):
            run()
        dt = (time.perf_counter() - t0) / 5
        print(json.dumps({"input": f"{H}x{W}",
                          "frames_per_sec": round(BUCKET / dt, 1),
                          "us_per_frame": round(dt / BUCKET * 1e6, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
