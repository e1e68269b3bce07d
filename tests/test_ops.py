"""Selection-op parity vs independent numpy oracles of the reference math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tspo_tpu.ops import (
    sinusoidal_positional_encoding,
    window_mask,
    pad_to_bucket,
    bucket_for,
    topk_select,
    bin_max_select,
    aks_select,
    gumbel_topk,
    uniform_sample_indices,
    generate_uniform_integers,
)


# ---------------- numpy oracles (independent formulations) ----------------

def oracle_pe(T, C):
    pos = np.arange(T)[:, None] / T
    div = np.exp(np.arange(0, C, 2) * (-np.log(10000.0) / C))
    pe = np.zeros((T, C))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def oracle_window_mask(T, w):
    m = np.zeros((T, T))
    for j in range(T):
        for k in range(w):
            m[j, min(max(j - w // 2 + k, 0), T - 1)] = 1.0
    return m


def oracle_bin_max(scores, k):
    T = len(scores)
    step = (T - 1) / (k - 1)
    proposals = np.array([round(i * step) for i in range(k)])
    slot = np.array([np.argmin(np.abs(x - proposals)) for x in range(T)])
    sel = []
    for b in np.unique(slot):
        members = np.where(slot == b)[0]
        sel.append(members[np.argmax(scores[members])])
    return np.sort(np.array(sel))


def test_positional_encoding_matches_oracle():
    T, C = 37, 768
    got = np.asarray(sinusoidal_positional_encoding(T, C))
    np.testing.assert_allclose(got, oracle_pe(T, C), atol=1e-5)  # fp32 sin/cos


def test_positional_encoding_odd_channels():
    # odd C used to shape-mismatch on the cos lane (floor(C/2) columns vs
    # ceil(C/2) angle columns); must build and keep the sin/cos split
    pe = np.asarray(sinusoidal_positional_encoding(8, 5))
    assert pe.shape == (8, 5)
    assert np.isfinite(pe).all()
    # column 0 is sin of freq-0 angles, column 1 the matching cos
    pos = np.arange(8, dtype=np.float32) / 8.0
    np.testing.assert_allclose(pe[:, 0], np.sin(pos), atol=1e-6)
    np.testing.assert_allclose(pe[:, 1], np.cos(pos), atol=1e-6)


def test_positional_encoding_padded_prefix():
    # Padded bucket with true_len normalization: the valid prefix must equal
    # the unpadded encoding.
    T, C, bucket = 37, 64, 64
    full = np.asarray(sinusoidal_positional_encoding(bucket, C, true_len=T))
    ref = np.asarray(sinusoidal_positional_encoding(T, C))
    np.testing.assert_allclose(full[:T], ref, atol=1e-6)


@pytest.mark.parametrize("T,w", [(1, 12), (5, 12), (37, 12), (64, 8), (100, 24)])
def test_window_mask_matches_reference_loop(T, w):
    got = np.asarray(window_mask(T, w)).astype(float)
    np.testing.assert_array_equal(got, oracle_window_mask(T, w))


def test_topk_select_sorted_indices():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=100).astype(np.float32)
    idx, count = topk_select(jnp.asarray(scores), 16)
    assert int(count) == 16
    expect = np.sort(np.argsort(-scores)[:16])
    np.testing.assert_array_equal(np.asarray(idx), expect)


def test_topk_select_with_padding():
    rng = np.random.default_rng(1)
    true_n = 50
    scores = rng.normal(size=true_n).astype(np.float32)
    padded, valid = pad_to_bucket(scores, 128)
    idx, count = topk_select(jnp.asarray(padded), 16, jnp.asarray(valid))
    expect = np.sort(np.argsort(-scores)[:16])
    np.testing.assert_array_equal(np.asarray(idx)[: int(count)], expect)


def test_topk_select_fewer_valid_than_k():
    scores = np.array([3.0, 1.0, 2.0], np.float32)
    padded, valid = pad_to_bucket(scores, 8)
    idx, count = topk_select(jnp.asarray(padded), 5, jnp.asarray(valid))
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(idx)[:3], [0, 1, 2])


@pytest.mark.parametrize("T,k", [(100, 16), (550, 64), (64, 64), (130, 64)])
def test_bin_max_matches_oracle(T, k):
    rng = np.random.default_rng(T * 1000 + k)
    scores = rng.normal(size=T).astype(np.float32)
    idx, count = bin_max_select(jnp.asarray(scores), k)
    expect = oracle_bin_max(scores, k)
    assert int(count) == len(expect)
    np.testing.assert_array_equal(np.asarray(idx), expect)


def test_bin_max_with_padding():
    rng = np.random.default_rng(7)
    true_n = 200
    scores = rng.normal(size=true_n).astype(np.float32)
    padded, valid = pad_to_bucket(scores, 256)
    idx, _ = bin_max_select(jnp.asarray(padded), 64, jnp.asarray(valid))
    expect = oracle_bin_max(scores, 64)
    np.testing.assert_array_equal(np.asarray(idx), expect)


def test_aks_short_video_returns_all():
    assert aks_select(np.ones(10), 64) == list(range(10))


def test_aks_budget_and_sorted():
    rng = np.random.default_rng(3)
    scores = rng.uniform(size=500)
    out = aks_select(scores, 64)
    assert out == sorted(out)
    assert len(out) <= 64 and len(out) > 0
    assert all(0 <= i < 500 for i in out)


def test_aks_peaked_scores_concentrate():
    # A strong peak should dominate the selection (flat elsewhere).
    scores = np.zeros(512)
    scores[100:120] = 1.0
    out = aks_select(scores, 16)
    assert all(100 <= i < 120 for i in out[:16])


def test_gumbel_topk_shapes_and_determinism():
    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.normal(size=128).astype(np.float32))
    key = jax.random.PRNGKey(0)
    idx1, probs1, lp1 = gumbel_topk(key, logits, 16)
    idx2, probs2, lp2 = gumbel_topk(key, logits, 16)
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
    assert np.asarray(idx1).tolist() == sorted(np.asarray(idx1).tolist())
    # log_probs are noise-free log_softmax of the logits (utils.py:78)
    np.testing.assert_allclose(np.asarray(lp1),
                               np.asarray(jax.nn.log_softmax(logits)), atol=1e-6)
    # straight-through probs: value == one-hot at the selected indices
    p = np.asarray(probs1)
    one_hot = np.zeros(128)
    one_hot[np.asarray(idx1)] = 1.0
    np.testing.assert_allclose(p, one_hot, atol=1e-6)


def test_gumbel_topk_straight_through_gradient():
    # Gradient of sum(st_probs) wrt logits must equal gradient through the
    # softmax sample (the one-hot detach trick, utils.py:75).
    logits = jnp.asarray(np.random.default_rng(5).normal(size=32), jnp.float32)
    key = jax.random.PRNGKey(2)

    def through_st(lg):
        _, probs, _ = gumbel_topk(key, lg, 4)
        return jnp.sum(probs * jnp.arange(32.0))

    def through_softmax(lg):
        g = jax.random.gumbel(key, (32,), lg.dtype)
        y = jax.nn.softmax(lg + g)
        return jnp.sum(y * jnp.arange(32.0))

    g1 = jax.grad(through_st)(logits)
    g2 = jax.grad(through_softmax)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_gumbel_topk_excludes_padding():
    logits = jnp.zeros(64)
    valid = jnp.arange(64) < 20
    for seed in range(5):
        idx, _, _ = gumbel_topk(jax.random.PRNGKey(seed), logits, 8, valid)
        assert np.asarray(idx).max() < 20


def test_uniform_helpers():
    assert generate_uniform_integers(99, 1) == [99]
    assert generate_uniform_integers(9, 5) == [0, 2, 4, 7, 9]
    # stride sampler: first index always 0, strictly increasing, right length
    out = uniform_sample_indices(100, 7)
    assert len(out) == 7 and out[0] == 0 and out == sorted(set(out))
    assert uniform_sample_indices(5, 10) == []


def test_bucket_for():
    assert bucket_for(50) == 64
    assert bucket_for(64) == 64
    assert bucket_for(65) == 128
    assert bucket_for(9000) == 16384


def test_gumbel_topk_sampling_statistics():
    """Stochastic selection follows the softmax distribution: the highest-
    logit frame should be selected most often across seeds (utils.py:69-80
    samples WITH Gumbel noise even though log-probs are noise-free)."""
    logits = jnp.asarray(np.linspace(-2, 2, 32), jnp.float32)
    counts = np.zeros(32)
    for seed in range(200):
        idx, _, _ = gumbel_topk(jax.random.PRNGKey(seed), logits, 4)
        counts[np.asarray(idx)] += 1
    # uniform selection would give 200*4/32 = 25 per frame; the Gumbel noise
    # (std ~1.28) keeps it diffuse but clearly preference-ordered
    assert counts[-1] > 70
    assert counts[0] < 15
    assert counts[-8:].sum() > 3 * counts[:8].sum()


def test_gumbel_topk_k_len_matches_static_k():
    """gumbel_topk(k_max, k_len=kl) == gumbel_topk(k=kl) in the first kl
    entries, 0-padded after (the mixed-type-batch contract)."""
    key = jax.random.PRNGKey(7)
    logits = jax.random.normal(jax.random.PRNGKey(1), (64,))
    for kl in (4, 8, 12):
        idx_static, _, lp_s = gumbel_topk(key, logits, kl)
        idx_dyn, _, lp_d = gumbel_topk(key, logits, 16,
                                       k_len=jnp.asarray(kl))
        assert np.array_equal(np.asarray(idx_dyn[:kl]), np.asarray(idx_static))
        assert np.all(np.asarray(idx_dyn[kl:]) == 0)
        assert np.allclose(np.asarray(lp_s), np.asarray(lp_d))
