"""Pin the host-side speculative-acceptance simulator to the device kernel.

scripts/bench_spec_decode.py::simulate_acceptance claims to replay
greedy_decode_speculative's accounting exactly (given the model's greedy
output as the target).  These tests verify that claim on a tiny Qwen2 —
same emitted-token count AND same forward-pass count across lookup corpora
with wildly different acceptance — then sanity-check the realistic-corpus
acceptance measurement itself (round-3 VERDICT next-step #7).
"""

import importlib.util
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tspo_tpu.models.qwen2 import (KVCache, Qwen2Config, embed_tokens,  # noqa: E402
                                   greedy_decode, greedy_decode_speculative,
                                   init_qwen2_params)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = Qwen2Config.tiny()


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_spec_decode", os.path.join(REPO, "scripts",
                                          "bench_spec_decode.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def params():
    return init_qwen2_params(jax.random.PRNGKey(2), CFG, jnp.float32)


@pytest.mark.parametrize("seed,lookup_kind", [
    (3, "prompt"),          # arbitrary ids: mostly rejected
    (4, "oracle"),          # contains the exact continuation: ~full accept
    (5, "half"),            # first half of the continuation only
])
def test_simulator_matches_kernel_pass_count(params, seed, lookup_kind):
    mod = _load_bench()
    S, max_new, d = 9, 12, 4
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, CFG.vocab_size - 2, size=(1, S))
    embeds = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    valid = jnp.ones((1, S), bool)
    T = S + max_new + d + 2
    mk_cache = lambda: KVCache.create(CFG, 1, T, jnp.float32)

    want, _ = greedy_decode(params, embeds, valid, mk_cache(), CFG,
                            max_new, eos_token_id=-7)
    target = [int(t) for t in np.asarray(want)]
    base = [int(t) for t in ids[0]]
    lookup = {"prompt": base,
              "oracle": base + target,
              "half": base + target[: max_new // 2]}[lookup_kind]

    lk = jnp.asarray(lookup, jnp.int32)
    toks, n, n_fwd = greedy_decode_speculative(
        params, embeds, valid, mk_cache(), CFG, max_new,
        lk, jnp.ones_like(lk, bool), eos_token_id=-7, draft_len=d)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(want))

    sim_n, sim_nf = mod.simulate_acceptance(lookup, target, d,
                                            max_new_tokens=max_new)
    assert sim_n == int(n)
    assert sim_nf == int(n_fwd), (lookup_kind, sim_nf, int(n_fwd))


def test_realistic_corpus_acceptance_is_measurable():
    """The in-image-trained HF tokenizer + MC corpus yields acceptance
    clearly above 1 token/pass at d=8 (restate-heavy answers) with
    letter-only answers near 1 — the shape the near-ceiling claim needs."""
    mod = _load_bench()
    acc = mod.measure_acceptance(draft_lens=(8,), n_docs=60, seed=0)
    d8 = acc["d8"]
    assert d8["tokens_per_pass"] > 1.5, acc
    styles = d8["per_style"]
    assert styles.get("restate", 0) > styles.get("letter", 9), acc
    assert styles.get("letter", 0) <= 1.6, acc
