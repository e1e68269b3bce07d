"""Pallas flash-attention kernel vs the pure-JAX reference (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tspo_tpu.ops.flash_attention import flash_attention
from tspo_tpu.ops.pallas_attention import pallas_flash_attention


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [(1, 64, 2, 16), (2, 100, 3, 8)])
def test_pallas_matches_reference(causal, shape):
    B, S, H, hd = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    # contiguous-prefix validity (right-padded sequences), per kernel contract
    lens = rng.integers(S // 2, S + 1, size=B)
    valid = jnp.asarray(np.arange(S)[None, :] < lens[:, None])

    want = flash_attention(q, k, v, valid, causal=causal)
    got = pallas_flash_attention(q, k, v, valid, causal=causal, blk_q=32,
                                 blk_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-4)
