"""Pallas flash-attention kernel vs the pure-JAX reference (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tspo_tpu.ops.flash_attention import flash_attention
from tspo_tpu.ops.pallas_attention import pallas_flash_attention


def test_flash_causal_aligns_sequence_ends():
    """Sq < Sk causal: queries are a SUFFIX of the sequence (incremental
    decode against a longer key prefix).  Query i must attend to keys
    [0, i + Sk - Sq], i.e. slicing the self-attention output — q positions
    used to start at 0, letting the suffix see only key 0."""
    B, Sk, H, hd, Sq = 2, 48, 2, 8, 5
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, Sk, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Sk, H, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Sk, H, hd)), jnp.float32)
    want = flash_attention(q, k, v, causal=True)[:, -Sq:]
    got = flash_attention(q[:, -Sq:], k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


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


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_gqa_matches_repeated_reference(causal):
    """KV < H: the kernel's h//group indexing must equal an explicit repeat."""
    B, S, H, KV, hd = 2, 96, 6, 2, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, KV, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, KV, hd)), jnp.float32)
    lens = rng.integers(S // 2, S + 1, size=B)
    valid = jnp.asarray(np.arange(S)[None, :] < lens[:, None])

    k_rep = jnp.repeat(k, H // KV, axis=2)
    v_rep = jnp.repeat(v, H // KV, axis=2)
    want = flash_attention(q, k_rep, v_rep, valid, causal=causal)
    got = pallas_flash_attention(q, k, v, valid, causal=causal, blk_q=32,
                                 blk_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-4)


def test_pallas_bf16_inputs():
    """bf16 inputs (the TPU fast path: bf16 MXU + fp32 accumulate) stay
    close to the fp32 oracle."""
    B, S, H, hd = 1, 128, 2, 32
    rng = np.random.default_rng(2)
    q32 = rng.normal(size=(B, S, H, hd)).astype(np.float32)
    k32 = rng.normal(size=(B, S, H, hd)).astype(np.float32)
    v32 = rng.normal(size=(B, S, H, hd)).astype(np.float32)
    want = np.asarray(flash_attention(jnp.asarray(q32), jnp.asarray(k32),
                                      jnp.asarray(v32), causal=True))
    got = np.asarray(pallas_flash_attention(
        jnp.asarray(q32, jnp.bfloat16), jnp.asarray(k32, jnp.bfloat16),
        jnp.asarray(v32, jnp.bfloat16), causal=True, blk_q=32, blk_k=32,
        interpret=True)).astype(np.float32)
    cos = (want.ravel() @ got.ravel()) / (
        np.linalg.norm(want) * np.linalg.norm(got) + 1e-9)
    assert cos > 0.999


def test_pallas_q_offset_suffix_prefill():
    """q rows placed at key positions [off, off + Sq) over a longer key
    window — the suffix-prefill form (conversation extension, chunked
    engine admission).  Reference: full-sequence causal attention sliced
    at those rows."""
    B, T, Sq, H, KV, hd = 2, 96, 32, 4, 2, 16
    off = 40                 # 40-token real prefix, then the 32 new rows
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, KV, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, KV, hd)), jnp.float32)
    valid = jnp.asarray(np.arange(T)[None, :] < off + Sq).repeat(B, 0)
    k_rep = jnp.repeat(k, H // KV, axis=2)
    v_rep = jnp.repeat(v, H // KV, axis=2)
    want = flash_attention(q, k_rep, v_rep, valid,
                           causal=True)[:, off:off + Sq]
    got = pallas_flash_attention(q[:, off:off + Sq], k, v, valid,
                                 causal=True, blk_q=16, blk_k=32,
                                 interpret=True, q_offset=off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
