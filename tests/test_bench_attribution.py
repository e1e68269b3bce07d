"""bench.py --attribution smoke: the per-stage breakdown runs end-to-end on
tiny configs (the real measurement runs on the chip; this pins the code path
so the driver's bench invocation can't rot)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_measure_attribution_smoke():
    import jax
    import jax.numpy as jnp

    import bench
    from tspo_tpu.configs import CLIPConfig, SelectorConfig
    from tspo_tpu.models.clip import init_clip_params
    from tspo_tpu.models.selector import init_selector_params

    clip_cfg = CLIPConfig.tiny()
    sel_cfg = SelectorConfig(dim=clip_cfg.text.projection_dim, num_heads=4,
                             window_size=8)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cp = init_clip_params(k1, clip_cfg, jnp.float32)
    sp = init_selector_params(k2, sel_cfg)
    BUCKET, CHUNK = 16, 8
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (BUCKET, 64, 64, 3),
                                      dtype=np.uint8))
    ids = jnp.asarray(rng.integers(1, clip_cfg.text.vocab_size - 1, (1, 16)),
                      jnp.int32).at[0, -1].set(clip_cfg.text.eos_token_id)
    valid = jnp.ones(BUCKET, bool)
    # consistency, not timing precision: under full-suite CPU load a stage's
    # wall clock can be starved for tens of ms on this 1-core host (flaked
    # at abs=0.2, then at abs=5.0 with concurrent heavy jobs) — retry the
    # measurement a few times; any contention-free pass pins the property
    last_err = None
    for _ in range(3):
        out = bench.measure_attribution(cp, sp, clip_cfg, sel_cfg, frames,
                                        ids, valid, CHUNK, BUCKET, n_iters=1)
        for key in ("preprocess_ms", "text_tower_ms", "vision_tower_ms",
                    "attention_only_ms", "selector_topk_ms", "unfused_sum_ms",
                    "vision_matmul_ms"):
            assert key in out and np.isfinite(out[key]) and out[key] >= 0, key
        try:
            assert out["unfused_sum_ms"] == pytest.approx(
                out["preprocess_ms"] + out["text_tower_ms"]
                + out["vision_tower_ms"] + out["selector_topk_ms"],
                rel=0.5, abs=5.0)
            return
        except AssertionError as e:
            last_err = e
    raise last_err
