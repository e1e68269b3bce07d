"""Interpret-mode parity for the dormant manual double-buffered DMA
attention kernel (scripts/bench_vit_attention_variants.py::manual_dma).

The kernel is AOT-rejected by the current TPU compile stack (docs/KERNELS.md
"Manual double-buffered DMA") but modeled at ~+25% e2e if a toolchain update
ever accepts it — bench.py re-probes AOT compilation every run
(probe_manual_dma) so that flip gets noticed.  This test keeps the kernel
MATH from rotting in the meantime: exact match vs the XLA einsum oracle in
interpret mode, including the 2-slot buffer rotation and the out-DMA
retirement lag across odd/even frame counts.
"""

import importlib.util
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_variants():
    spec = importlib.util.spec_from_file_location(
        "bench_vit_attention_variants",
        os.path.join(REPO, "scripts", "bench_vit_attention_variants.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("B", [3, 4])   # odd B exercises the final-slot wait
def test_manual_dma_matches_xla_interpret(B):
    mod = _load_variants()
    S, W, heads = 64, 128, 2
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, W)) * 0.3, jnp.bfloat16)
               for _ in range(3))
    want = np.asarray(mod.make_variant("xla", B, S, W, heads)(q, k, v),
                      np.float32)
    got = np.asarray(mod.make_variant("manual_dma", B, S, W, heads)(q, k, v),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    cos = float(got.ravel() @ want.ravel()
                / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-9))
    assert cos > 0.999


def test_manual_dma_copy_probe_roundtrips():
    """The copy-only skeleton (heads=0) must pass inputs through unchanged —
    it is the compile/DMA attribution control the KERNELS.md verdict cites."""
    mod = _load_variants()
    B, S, W = 4, 64, 128
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, W)) * 0.3, jnp.bfloat16)
               for _ in range(3))
    got = np.asarray(mod.make_variant("manual_dma_copy", B, S, W, 2)(q, k, v))
    np.testing.assert_array_equal(got, np.asarray(q))
