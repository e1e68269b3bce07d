"""Selector-head tests: banded-vs-dense equivalence, padding invariance,
numpy oracle of the reference score math, torch round-trip, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tspo_tpu.configs import SelectorConfig
from tspo_tpu.models.selector import (
    init_selector_params,
    score_frames,
    score_frames_dense,
    selector_param_count,
    selector_params_from_torch,
    selector_params_to_torch,
)

CFG = SelectorConfig()


def _rand_inputs(T, D=768, M=1, seed=0):
    rng = np.random.default_rng(seed)
    frame = rng.normal(size=(T, D)).astype(np.float32)
    text = rng.normal(size=(M, D)).astype(np.float32)
    clip_scores = rng.normal(scale=0.1, size=T).astype(np.float32)
    return jnp.asarray(frame), jnp.asarray(text), jnp.asarray(clip_scores)


@pytest.fixture(scope="module")
def params():
    return init_selector_params(jax.random.PRNGKey(0))


def test_param_count_matches_reference(params):
    # 6 active 768x768 linears + biases = ~3.5M (SURVEY.md C3; ffn_o included
    # in checkpoints too). 6*(768*768+768) = 3,544,320.
    assert selector_param_count(params) == 6 * (768 * 768 + 768)


@pytest.mark.parametrize("T,w", [(40, 12), (128, 12), (100, 8), (13, 12)])
def test_banded_equals_dense(params, T, w):
    frame, text, cs = _rand_inputs(T)
    lb, cb = score_frames(params, frame, text, cs, cfg=CFG, window_size=w)
    ld, cd = score_frames_dense(params, frame, text, cs, cfg=CFG, window_size=w)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(ld), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cb), np.asarray(cd), rtol=1e-5, atol=1e-5)


def test_padding_invariance(params):
    # Scores on the valid prefix of a padded bucket must match the unpadded run.
    T, bucket = 50, 128
    frame, text, cs = _rand_inputs(T)
    ref, _ = score_frames(params, frame, text, cs, cfg=CFG)

    fpad = jnp.zeros((bucket, 768)).at[:T].set(frame)
    cpad = jnp.zeros(bucket).at[:T].set(cs)
    valid = jnp.arange(bucket) < T
    got, _ = score_frames(params, fpad, text, cpad, cfg=CFG, valid=valid)
    np.testing.assert_allclose(np.asarray(got)[:T], np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_score_math_oracle(params):
    """Full numpy re-derivation of the reference forward
    (temporal_agent.py:116-143) against the jax implementation."""
    T, D, H, w = 30, 768, 8, 12
    hd = D // H
    frame, text, cs = _rand_inputs(T, D)
    f, tx, c = map(np.asarray, (frame, text, cs))

    def lin(p, x):
        return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    # PE with normalized positions
    pos = np.arange(T)[:, None] / T
    div = np.exp(np.arange(0, D, 2) * (-np.log(1e4) / D))
    pe = np.zeros((T, D))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    x = f + pe

    q = lin(params["temporal"]["q"], x).reshape(T, H, hd).transpose(1, 0, 2)
    k = lin(params["temporal"]["k"], x).reshape(T, H, hd).transpose(1, 0, 2)
    v = lin(params["temporal"]["v"], x).reshape(T, H, hd).transpose(1, 0, 2)

    m = np.zeros((T, T))
    for j in range(T):
        for kk in range(w):
            m[j, min(max(j - w // 2 + kk, 0), T - 1)] = 1.0
    scores = q @ k.transpose(0, 2, 1) / np.sqrt(hd)
    scores = np.where(m[None] == 0, -1e6, scores)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    ctx = (attn @ v).transpose(1, 0, 2).reshape(T, D)

    h = np.maximum(lin(params["mlp"]["fc1"], ctx), 0)
    out = lin(params["mlp"]["fc2"], h) + f

    dots = out @ tx.T
    an = np.sqrt((out ** 2).sum(-1))[:, None]
    bn = np.sqrt((tx ** 2).sum(-1))[None, :]
    sim = (dots / (an * bn + 1e-6)).mean(-1)
    expect = (sim + c) / CFG.score_tau

    got, _ = score_frames(params, frame, text, cs, cfg=CFG, window_size=w)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-4)


def test_traced_tau_and_gradients(params):
    frame, text, cs = _rand_inputs(64)

    def loss(p, tau):
        logits, _ = score_frames(p, frame, text, cs, cfg=CFG, score_tau=tau)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(lp[:16])

    g = jax.grad(loss)(params, jnp.float32(0.02))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in flat)


def test_torch_state_dict_round_trip(params):
    sd = selector_params_to_torch(params)
    assert set(sd) == {
        f"{k}.{s}" for k in ["temporal.Self_q", "temporal.Self_k", "temporal.Self_v",
                             "temporal.ffn_o", "mlp.0", "mlp.2"] for s in ["weight", "bias"]
    }
    back = selector_params_from_torch(sd)
    for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(params),
                              jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b), atol=1e-7)


def test_torch_linear_layout():
    """Kernel transpose convention matches torch nn.Linear (y = x W^T + b)."""
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(8, 8)
    x = torch.randn(3, 8)
    want = lin(x).detach().numpy()
    p = {"kernel": jnp.asarray(lin.weight.detach().numpy().T),
         "bias": jnp.asarray(lin.bias.detach().numpy())}
    got = np.asarray(x.numpy() @ np.asarray(p["kernel"]) + np.asarray(p["bias"]))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_large_bucket_scoring(params):
    """Precompute-scale bucket (T=8192, window 12): the banded attention stays
    O(T*w) — this would be a 64k x 64k mask in the reference formulation."""
    T = 8192
    rng = np.random.default_rng(21)
    frame = jnp.asarray(rng.normal(size=(T, 768)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, 768)), jnp.float32)
    cs = jnp.asarray(rng.normal(scale=0.1, size=T), jnp.float32)
    valid = jnp.arange(T) < 7000
    logits, _ = score_frames(params, frame, text, cs, cfg=CFG, valid=valid,
                             window_size=12)
    out = np.asarray(logits)
    assert np.all(np.isfinite(out[:7000]))
    # prefix result equals an unpadded run on the true length
    ref, _ = score_frames(params, frame[:7000], text, cs[:7000], cfg=CFG,
                          window_size=12)
    np.testing.assert_allclose(out[:7000], np.asarray(ref), rtol=2e-4,
                               atol=2e-4)
