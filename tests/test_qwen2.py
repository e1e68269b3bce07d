"""Qwen2 decoder parity vs torch transformers (tiny random config) and
KV-cache / greedy-decode invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tspo_tpu.models.qwen2 import (  # noqa: E402
    KVCache,
    Qwen2Config,
    embed_tokens,
    greedy_decode,
    init_qwen2_params,
    lm_logits,
    qwen2_forward,
    qwen2_params_from_torch,
)

CFG = Qwen2Config.tiny()


@pytest.fixture(scope="module")
def torch_model():
    hf_cfg = transformers.Qwen2Config(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers, num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads, head_dim=CFG.head_dim,
        rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_eps,
        max_position_embeddings=CFG.max_position_embeddings,
        tie_word_embeddings=CFG.tie_word_embeddings,
        attention_dropout=0.0, use_cache=True,
    )
    torch.manual_seed(0)
    return transformers.Qwen2ForCausalLM(hf_cfg).eval()


@pytest.fixture(scope="module")
def params(torch_model):
    return qwen2_params_from_torch(torch_model, CFG, dtype=jnp.float32)


def _forward_full(params, ids, cfg=CFG, max_len=None):
    B, S = ids.shape
    max_len = max_len or S
    cache = KVCache.create(cfg, B, max_len, jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids))
    valid = jnp.zeros((B, max_len), bool).at[:, :S].set(True)
    hidden, cache = qwen2_forward(params, embeds, cache, jnp.arange(S),
                                  valid, cfg)
    return lm_logits(params, hidden, cfg), cache


def test_logits_parity(torch_model, params):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 11))
    with torch.no_grad():
        want = torch_model(input_ids=torch.from_numpy(ids)).logits.numpy()
    got, _ = _forward_full(params, ids)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_greedy_matches_torch_generate(torch_model, params):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size - 2, size=(1, 7))
    with torch.no_grad():
        want = torch_model.generate(
            torch.from_numpy(ids), max_new_tokens=8, do_sample=False,
            eos_token_id=-1, pad_token_id=0).numpy()[0, 7:]
    cache = KVCache.create(CFG, 1, 64, jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    valid = jnp.ones((1, 7), bool)
    toks, n = greedy_decode(params, embeds, valid, cache, CFG, 8,
                            eos_token_id=-7)  # unreachable eos
    assert int(n) == 8
    np.testing.assert_array_equal(np.asarray(toks), want)


def test_incremental_cache_matches_full(params):
    """Prefill(0:5) + steps 5,6 == full forward on 7 tokens."""
    rng = np.random.default_rng(2)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 7))
    full, _ = _forward_full(params, ids, max_len=16)

    cache = KVCache.create(CFG, 1, 16, jnp.float32)
    e = embed_tokens(params, jnp.asarray(ids))
    valid = jnp.zeros((1, 16), bool).at[:, :5].set(True)
    h, cache = qwen2_forward(params, e[:, :5], cache, jnp.arange(5), valid, CFG)
    np.testing.assert_allclose(np.asarray(lm_logits(params, h, CFG)),
                               np.asarray(full[:, :5]), rtol=2e-3, atol=2e-3)
    for i in (5, 6):
        valid = jnp.zeros((1, 16), bool).at[:, :i + 1].set(True)
        h, cache = qwen2_forward(params, e[:, i:i + 1], cache,
                                 jnp.asarray([i]), valid, CFG)
        np.testing.assert_allclose(np.asarray(lm_logits(params, h[:, 0], CFG)),
                                   np.asarray(full[:, i]), rtol=2e-3, atol=2e-3)


def test_padded_prompt_equivalence(params):
    """Right-padded prompt gives the same first generated token as unpadded."""
    rng = np.random.default_rng(3)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 6))
    cache = KVCache.create(CFG, 1, 32, jnp.float32)
    e = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    toks_a, _ = greedy_decode(params, e, jnp.ones((1, 6), bool), cache, CFG, 4,
                              eos_token_id=-7)

    padded = np.concatenate([ids, np.zeros((1, 4), ids.dtype)], axis=1)
    ep = embed_tokens(params, jnp.asarray(padded)).astype(jnp.float32)
    vp = jnp.zeros((1, 10), bool).at[:, :6].set(True)
    cache = KVCache.create(CFG, 1, 32, jnp.float32)
    toks_b, _ = greedy_decode(params, ep, vp, cache, CFG, 4, eos_token_id=-7)
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))


def test_ragged_batch_decode_matches_per_row(params):
    """A batch of right-padded prompts with DIFFERENT valid lengths decodes
    token-for-token like each row alone — per-row rope positions + padded-key
    masking (the cross-sample G x B rollout batching path)."""
    rng = np.random.default_rng(11)
    lens = [3, 6, 5]
    S = max(lens)
    ids = rng.integers(0, CFG.vocab_size, size=(len(lens), S))
    valid = np.zeros((len(lens), S), bool)
    for b, n in enumerate(lens):
        valid[b, :n] = True
        ids[b, n:] = 0
    e = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)

    cache = KVCache.create(CFG, len(lens), 32, jnp.float32)
    batch_toks, _ = greedy_decode(params, e, jnp.asarray(valid), cache, CFG,
                                  5, eos_token_id=-7)
    batch_toks = np.asarray(batch_toks)

    for b, n in enumerate(lens):
        row = embed_tokens(params,
                           jnp.asarray(ids[b:b + 1, :n])).astype(jnp.float32)
        cache = KVCache.create(CFG, 1, 32, jnp.float32)
        want, _ = greedy_decode(params, row, jnp.ones((1, n), bool), cache,
                                CFG, 5, eos_token_id=-7)
        np.testing.assert_array_equal(batch_toks[b], np.asarray(want),
                                      err_msg=f"row {b} (len {n})")


def test_ragged_batch_decode_sliding_window_matches_per_row():
    """Mistral-style sliding window + ragged right-padded batch: window
    distance must be LOGICAL token distance, not cache-slot distance —
    slot-based masking spends window budget on the padding gap (round-3
    review finding)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, sliding_window=4)
    params = init_qwen2_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    rng = np.random.default_rng(12)
    lens = [3, 8, 6]
    S = max(lens)
    ids = rng.integers(0, cfg.vocab_size, size=(len(lens), S))
    valid = np.zeros((len(lens), S), bool)
    for b, n in enumerate(lens):
        valid[b, :n] = True
        ids[b, n:] = 0
    e = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    cache = KVCache.create(cfg, len(lens), 32, jnp.float32)
    batch_toks, _ = greedy_decode(params, e, jnp.asarray(valid), cache, cfg,
                                  6, eos_token_id=-7)
    batch_toks = np.asarray(batch_toks)
    for b, n in enumerate(lens):
        row = embed_tokens(params,
                           jnp.asarray(ids[b:b + 1, :n])).astype(jnp.float32)
        cache = KVCache.create(cfg, 1, 32, jnp.float32)
        want, _ = greedy_decode(params, row, jnp.ones((1, n), bool), cache,
                                cfg, 6, eos_token_id=-7)
        np.testing.assert_array_equal(batch_toks[b], np.asarray(want),
                                      err_msg=f"row {b} (len {n})")


def test_eos_stops_decode(params):
    rng = np.random.default_rng(4)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 5))
    cache = KVCache.create(CFG, 1, 32, jnp.float32)
    e = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    # first find what greedy produces, then set eos to the 2nd token
    toks, _ = greedy_decode(params, e, jnp.ones((1, 5), bool), cache, CFG, 6,
                            eos_token_id=-7)
    second = int(np.asarray(toks)[1])
    cache = KVCache.create(CFG, 1, 32, jnp.float32)
    toks2, n2 = greedy_decode(params, e, jnp.ones((1, 5), bool), cache, CFG, 6,
                              eos_token_id=second)
    assert int(n2) == 2
    assert np.all(np.asarray(toks2)[1:] == second)


def test_bf16_decode_runs(params):
    p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    ids = np.random.default_rng(5).integers(0, CFG.vocab_size, size=(1, 4))
    cache = KVCache.create(CFG, 1, 16, jnp.bfloat16)
    e = embed_tokens(p16, jnp.asarray(ids))
    toks, n = greedy_decode(p16, e, jnp.ones((1, 4), bool), cache, CFG, 4,
                            eos_token_id=-7)
    assert int(n) == 4


def test_flash_prefill_matches_dense(params):
    """Long-prompt prefill via flash attention == dense path (same logits)."""
    rng = np.random.default_rng(9)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 40))
    embeds = embed_tokens(params, jnp.asarray(ids))
    valid = jnp.ones((1, 48), bool).at[:, 40:].set(False)

    def run(threshold):
        cache = KVCache.create(CFG, 1, 48, jnp.float32)
        h, _ = qwen2_forward(params, embeds, cache, jnp.arange(40),
                             valid, CFG, flash_threshold=threshold)
        return np.asarray(lm_logits(params, h, CFG))

    dense = run(10_000)   # S=40 < threshold -> dense
    flash = run(8)        # S=40 >= threshold -> flash
    np.testing.assert_allclose(flash, dense, rtol=2e-4, atol=2e-4)


def test_weight_only_int8_decode(params):
    """Quantized decoder: logits close to float, greedy decode matches on the
    tiny model (weight-only int8; decode is weight-bandwidth-bound on 7B)."""
    from tspo_tpu.models.qwen2 import quantize_qwen2_params
    qparams = quantize_qwen2_params(params)
    rng = np.random.default_rng(12)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 9))

    full, _ = _forward_full(params, ids)
    cache = KVCache.create(CFG, 1, 9, jnp.float32)
    emb = embed_tokens(qparams, jnp.asarray(ids))
    hq, _ = qwen2_forward(qparams, emb, cache, jnp.arange(9),
                          jnp.ones((1, 9), bool), CFG)
    ql = np.asarray(lm_logits(qparams, hq, CFG))
    fl = np.asarray(full)
    # per-position top-1 agreement
    assert (ql.argmax(-1) == fl.argmax(-1)).mean() >= 0.8
    corr = np.corrcoef(ql.ravel(), fl.ravel())[0, 1]
    assert corr > 0.999

    cache = KVCache.create(CFG, 1, 32, jnp.float32)
    toks_q, _ = greedy_decode(qparams, emb.astype(jnp.float32),
                              jnp.ones((1, 9), bool), cache, CFG, 4,
                              eos_token_id=-7)
    assert np.all(np.isfinite(np.asarray(toks_q)))


def test_quantized_tp_shardings_resolve(params):
    """Sharding specs cover the quantized param tree too."""
    import jax
    from tspo_tpu.models.qwen2 import (quantize_qwen2_params,
                                       qwen2_param_shardings)
    from tspo_tpu.parallel import create_mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    qparams = quantize_qwen2_params(params)
    mesh = create_mesh(data=4, model=2)
    sh = qwen2_param_shardings(qparams, mesh)
    placed = jax.device_put(qparams, sh)
    assert len(jax.tree_util.tree_leaves(placed)) == \
        len(jax.tree_util.tree_leaves(qparams))


# ---------------------------------------------------------------------------
# Prompt-lookup speculative decode
# ---------------------------------------------------------------------------

def _spec_setup(params, seed, S=9, max_new=12, d=4):
    from tspo_tpu.models.qwen2 import greedy_decode_speculative
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, CFG.vocab_size - 2, size=(1, S))
    embeds = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    valid = jnp.ones((1, S), bool)
    T = S + max_new + d + 2
    base_cache = lambda: KVCache.create(CFG, 1, T, jnp.float32)
    return greedy_decode_speculative, ids, embeds, valid, base_cache, max_new


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_speculative_matches_greedy_random_lookup(params, seed):
    """Arbitrary lookup ids (drafts mostly rejected): token-for-token equal."""
    spec, ids, embeds, valid, mk_cache, max_new = _spec_setup(params, seed)
    want, n_want = greedy_decode(params, embeds, valid, mk_cache(), CFG,
                                 max_new, eos_token_id=-7)
    lookup = jnp.asarray(ids[0], jnp.int32)
    toks, n, n_fwd = spec(params, embeds, valid, mk_cache(), CFG, max_new,
                          lookup, jnp.ones_like(lookup, bool),
                          eos_token_id=-7, draft_len=4)
    assert int(n) == int(n_want)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(want))
    assert int(n_fwd) <= int(n)


def test_speculative_accepts_on_oracle_lookup(params):
    """Lookup containing the exact continuation (greedy's own output):
    near-total acceptance -> far fewer forward passes, identical tokens."""
    spec, ids, embeds, valid, mk_cache, max_new = _spec_setup(params, 6)
    want, n_want = greedy_decode(params, embeds, valid, mk_cache(), CFG,
                                 max_new, eos_token_id=-7)
    lookup = jnp.concatenate([jnp.asarray(ids[0], jnp.int32),
                              np.asarray(want, np.int32)])
    toks, n, n_fwd = spec(params, embeds, valid, mk_cache(), CFG, max_new,
                          lookup, jnp.ones_like(lookup, bool),
                          eos_token_id=-7, draft_len=4)
    assert int(n) == int(n_want) == max_new
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(want))
    # 12 tokens with draft_len=4 and a perfect corpus: the first token is
    # free (prefill argmax), then ceil(11/5)=3 passes suffice; allow slack
    # for the warmup steps before a 2-gram exists
    assert int(n_fwd) <= 6, int(n_fwd)


def test_speculative_eos_parity(params):
    """EOS mid-stream: same early stop, same EOS padding after it."""
    spec, ids, embeds, valid, mk_cache, max_new = _spec_setup(params, 7)
    free, _ = greedy_decode(params, embeds, valid, mk_cache(), CFG,
                            max_new, eos_token_id=-7)
    eos = int(np.asarray(free)[min(5, max_new - 1)])  # a token it does emit
    want, n_want = greedy_decode(params, embeds, valid, mk_cache(), CFG,
                                 max_new, eos_token_id=eos)
    lookup = jnp.concatenate([jnp.asarray(ids[0], jnp.int32),
                              np.asarray(free, np.int32)])
    toks, n, n_fwd = spec(params, embeds, valid, mk_cache(), CFG, max_new,
                          lookup, jnp.ones_like(lookup, bool),
                          eos_token_id=eos, draft_len=4)
    assert int(n) == int(n_want)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(want))


def test_speculative_ragged_prompt_and_empty_lookup(params):
    """Right-padded prompt + all-invalid lookup: drafts never match, output
    still exact."""
    from tspo_tpu.models.qwen2 import greedy_decode_speculative
    rng = np.random.default_rng(8)
    S, pad, max_new, d = 6, 3, 7, 3
    ids = rng.integers(0, CFG.vocab_size - 2, size=(1, S))
    ids_p = np.concatenate([ids, np.zeros((1, pad), np.int64)], axis=1)
    embeds = embed_tokens(params, jnp.asarray(ids_p)).astype(jnp.float32)
    valid = jnp.asarray([[True] * S + [False] * pad])
    T = S + pad + max_new + d + 2
    want, n_want = greedy_decode(params, embeds, valid,
                                 KVCache.create(CFG, 1, T, jnp.float32),
                                 CFG, max_new, eos_token_id=-7)
    lookup = jnp.zeros(5, jnp.int32)
    toks, n, n_fwd = greedy_decode_speculative(
        params, embeds, valid, KVCache.create(CFG, 1, T, jnp.float32), CFG,
        max_new, lookup, jnp.zeros(5, bool), eos_token_id=-7, draft_len=d)
    assert int(n) == int(n_want)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(want))


def test_speculative_eos_in_lookup_corpus(params):
    """A lookup corpus laced with EOS tokens: drafted EOS must never be
    falsely emitted (verification gates every draft)."""
    from tspo_tpu.models.qwen2 import greedy_decode_speculative
    spec, ids, embeds, valid, mk_cache, max_new = _spec_setup(params, 9)
    eos = -7
    want, n_want = greedy_decode(params, embeds, valid, mk_cache(), CFG,
                                 max_new, eos_token_id=eos)
    # corpus laced with a constant token so 2-gram matches abound but the
    # drafted continuations are wrong; out-of-range masked drafts use the
    # eos sentinel (-7 here), which argmax can never produce -> always
    # rejected, never falsely emitted
    base = np.asarray(ids[0], np.int32)
    lookup = np.empty(base.size * 2, np.int32)
    lookup[0::2] = base
    lookup[1::2] = 0
    toks, n, n_fwd = greedy_decode_speculative(
        params, embeds, valid, mk_cache(), CFG, max_new,
        jnp.asarray(lookup), jnp.ones(lookup.size, bool),
        eos_token_id=eos, draft_len=4)
    assert int(n) == int(n_want)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(want))


def test_speculative_match_at_corpus_end(params):
    """The 2-gram match lands at the very end of the corpus: drafts run off
    the end (masked to eos) and must not corrupt the output."""
    from tspo_tpu.models.qwen2 import greedy_decode_speculative
    spec, ids, embeds, valid, mk_cache, max_new = _spec_setup(params, 10)
    want, n_want = greedy_decode(params, embeds, valid, mk_cache(), CFG,
                                 max_new, eos_token_id=-7)
    first_two = np.asarray(want, np.int32)[:2]
    # corpus ENDS exactly at the first generated 2-gram: p_best+2 == len
    lookup = np.concatenate([np.asarray(ids[0], np.int32), first_two])
    toks, n, _ = greedy_decode_speculative(
        params, embeds, valid, mk_cache(), CFG, max_new,
        jnp.asarray(lookup), jnp.ones(lookup.size, bool),
        eos_token_id=-7, draft_len=4)
    assert int(n) == int(n_want)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(want))


def test_speculative_rejects_small_cache(params):
    from tspo_tpu.models.qwen2 import greedy_decode_speculative
    _, ids, embeds, valid, _, _ = _spec_setup(params, 11)
    small = KVCache.create(CFG, 1, embeds.shape[1] + 4, jnp.float32)
    with pytest.raises(ValueError, match="cache too small"):
        greedy_decode_speculative(params, embeds, valid, small, CFG, 12,
                                  jnp.zeros(8, jnp.int32),
                                  jnp.zeros(8, bool), draft_len=4)


# ---------------------------------------------------------------------------
# Chunked streaming decode
# ---------------------------------------------------------------------------

def _stream_setup(params, seed, S=9, max_new=12, chunk=4):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, CFG.vocab_size - 2, size=(1, S))
    embeds = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    valid = jnp.ones((1, S), bool)
    n_chunks = -(-max_new // chunk)
    mk = lambda extra=0: KVCache.create(CFG, 1,
                                        S + n_chunks * chunk + extra,
                                        jnp.float32)
    return ids, embeds, valid, mk, max_new


@pytest.mark.parametrize("seed,chunk", [(3, 1), (4, 4), (5, 8), (6, 5)])
def test_stream_matches_greedy(params, seed, chunk):
    """Concatenated stream chunks are token-exact vs the fused while_loop,
    across chunk sizes incl. non-divisors of max_new_tokens."""
    from tspo_tpu.models.qwen2 import greedy_decode_stream
    ids, embeds, valid, mk, max_new = _stream_setup(params, seed,
                                                    chunk=chunk)
    want, n_want = greedy_decode(params, embeds, valid, mk(8), CFG,
                                 max_new, eos_token_id=-7)
    got = np.concatenate(list(greedy_decode_stream(
        params, embeds, valid, mk(), CFG, max_new, eos_token_id=-7,
        chunk=chunk)), axis=1)
    assert got.shape == (1, max_new)
    np.testing.assert_array_equal(got[0], np.asarray(want))


def test_stream_eos_early_stop(params):
    """EOS mid-stream: identical eos-padding semantics, and the generator
    stops issuing device chunks once every row is done."""
    from tspo_tpu.models.qwen2 import greedy_decode_stream
    ids, embeds, valid, mk, max_new = _stream_setup(params, 7, chunk=2)
    free, _ = greedy_decode(params, embeds, valid, mk(8), CFG, max_new,
                            eos_token_id=-7)
    eos = int(np.asarray(free)[3])            # a token it does emit
    want, n_want = greedy_decode(params, embeds, valid, mk(8), CFG,
                                 max_new, eos_token_id=eos)
    chunks = list(greedy_decode_stream(params, embeds, valid, mk(), CFG,
                                       max_new, eos_token_id=eos, chunk=2))
    got = np.concatenate(chunks, axis=1)
    np.testing.assert_array_equal(got[0, : got.shape[1]],
                                  np.asarray(want)[: got.shape[1]])
    # everything past the eos that WAS emitted is eos padding
    assert (got[0, int(n_want):] == eos).all()
    # early stop: needs ceil((n_want)/2) chunks, not max_new/2
    assert len(chunks) <= -(-int(n_want) // 2) + 1


def test_stream_rejects_small_cache(params):
    from tspo_tpu.models.qwen2 import greedy_decode_stream
    ids, embeds, valid, _, max_new = _stream_setup(params, 8, chunk=4)
    small = KVCache.create(CFG, 1, embeds.shape[1] + max_new - 1,
                           jnp.float32)
    with pytest.raises(ValueError, match="stream cache"):
        next(iter(greedy_decode_stream(params, embeds, valid, small, CFG,
                                       max_new, chunk=4)))


# ---------------------------------------------------------------------------
# Sampled decode (temperature / top-p)
# ---------------------------------------------------------------------------

def _sample(params, ids, max_new, key, temperature, top_p):
    from tspo_tpu.models.qwen2 import sample_decode
    cache = KVCache.create(CFG, 1, 64, jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    valid = jnp.ones((1, ids.shape[1]), bool)
    toks, n = sample_decode(params, embeds, valid, cache, CFG, max_new,
                            key, temperature, top_p, eos_token_id=-7)
    return np.asarray(toks)[: int(n)]


def test_sample_top_p_one_token_equals_greedy(params):
    """A vanishing nucleus keeps only the argmax token -> sampling at any
    temperature reproduces greedy exactly."""
    rng = np.random.default_rng(3)
    ids = rng.integers(0, CFG.vocab_size - 2, size=(1, 7))
    cache = KVCache.create(CFG, 1, 64, jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    valid = jnp.ones((1, 7), bool)
    want, n = greedy_decode(params, embeds, valid, cache, CFG, 8,
                            eos_token_id=-7)
    got = _sample(params, ids, 8, jax.random.PRNGKey(42),
                  temperature=5.0, top_p=1e-9)
    np.testing.assert_array_equal(got, np.asarray(want)[: int(n)])


def test_sample_low_temperature_equals_greedy(params):
    rng = np.random.default_rng(4)
    ids = rng.integers(0, CFG.vocab_size - 2, size=(1, 6))
    cache = KVCache.create(CFG, 1, 64, jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    valid = jnp.ones((1, 6), bool)
    want, n = greedy_decode(params, embeds, valid, cache, CFG, 8,
                            eos_token_id=-7)
    got = _sample(params, ids, 8, jax.random.PRNGKey(0),
                  temperature=1e-5, top_p=1.0)
    np.testing.assert_array_equal(got, np.asarray(want)[: int(n)])


def test_sample_seed_reproducible_and_varies(params):
    rng = np.random.default_rng(5)
    ids = rng.integers(0, CFG.vocab_size - 2, size=(1, 6))
    a1 = _sample(params, ids, 12, jax.random.PRNGKey(7), 3.0, 1.0)
    a2 = _sample(params, ids, 12, jax.random.PRNGKey(7), 3.0, 1.0)
    np.testing.assert_array_equal(a1, a2)        # same seed -> same tokens
    # at high temperature some of several seeds must diverge (vocab 256,
    # 12 draws: collision probability is negligible)
    others = [_sample(params, ids, 12, jax.random.PRNGKey(s), 3.0, 1.0)
              for s in (8, 9, 10)]
    assert any(len(o) != len(a1) or not np.array_equal(o, a1)
               for o in others)


def test_sample_tokens_in_vocab_and_eos_pads(params):
    """Sampled ids stay in-vocab; a reachable EOS stops the decode and the
    returned length excludes the pads."""
    rng = np.random.default_rng(6)
    ids = rng.integers(0, CFG.vocab_size - 2, size=(1, 5))
    from tspo_tpu.models.qwen2 import sample_decode
    cache = KVCache.create(CFG, 1, 64, jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    valid = jnp.ones((1, 5), bool)
    toks, n = sample_decode(params, embeds, valid, cache, CFG, 16,
                            jax.random.PRNGKey(1), 4.0, 1.0)
    toks = np.asarray(toks)
    assert ((toks >= 0) & (toks < CFG.vocab_size)).all()
    eos = CFG.eos_token_id
    if eos in toks[: int(n)]:
        pytest.fail("returned n should exclude post-eos pads")
    assert (toks[int(n):] == eos).all() or int(n) == 16


@pytest.mark.parametrize("seed,chunk", [(3, 1), (4, 4), (5, 5)])
def test_sample_stream_matches_fused(params, seed, chunk):
    """Concatenated sample-stream chunks are token-exact vs the fused
    sample_decode at equal key/temperature/top_p — the key-split order per
    emitted token is identical across both paths, across chunk sizes incl.
    non-divisors of max_new_tokens."""
    from tspo_tpu.models.qwen2 import sample_decode, sample_decode_stream
    ids, embeds, valid, mk, max_new = _stream_setup(params, seed,
                                                    chunk=chunk)
    want, n_want = sample_decode(params, embeds, valid, mk(8), CFG,
                                 max_new, jax.random.PRNGKey(seed),
                                 2.0, 0.9, eos_token_id=-7)
    got = np.concatenate(list(sample_decode_stream(
        params, embeds, valid, mk(), CFG, max_new, jax.random.PRNGKey(seed),
        2.0, 0.9, eos_token_id=-7, chunk=chunk)), axis=1)
    assert got.shape == (1, max_new)
    np.testing.assert_array_equal(got[0], np.asarray(want))


def test_sample_stream_eos_early_stop(params):
    """EOS mid-sample-stream: eos-padding parity with the fused loop and an
    early generator stop once the row is done."""
    from tspo_tpu.models.qwen2 import sample_decode, sample_decode_stream
    ids, embeds, valid, mk, max_new = _stream_setup(params, 7, chunk=2)
    key = jax.random.PRNGKey(11)
    free, _ = sample_decode(params, embeds, valid, mk(8), CFG, max_new,
                            key, 2.0, 1.0, eos_token_id=-7)
    eos = int(np.asarray(free)[3])            # a token it does emit
    want, n_want = sample_decode(params, embeds, valid, mk(8), CFG,
                                 max_new, key, 2.0, 1.0, eos_token_id=eos)
    chunks = list(sample_decode_stream(params, embeds, valid, mk(), CFG,
                                       max_new, key, 2.0, 1.0,
                                       eos_token_id=eos, chunk=2))
    got = np.concatenate(chunks, axis=1)
    np.testing.assert_array_equal(got[0, : got.shape[1]],
                                  np.asarray(want)[: got.shape[1]])
    assert (got[0, int(n_want):] == eos).all()
    assert len(chunks) <= -(-int(n_want) // 2) + 1


def test_sample_stream_rejects_small_cache(params):
    from tspo_tpu.models.qwen2 import sample_decode_stream
    ids, embeds, valid, _, max_new = _stream_setup(params, 8, chunk=4)
    small = KVCache.create(CFG, 1, embeds.shape[1] + max_new - 1,
                           jnp.float32)
    with pytest.raises(ValueError, match="stream cache"):
        next(iter(sample_decode_stream(params, embeds, valid, small, CFG,
                                       max_new, jax.random.PRNGKey(0),
                                       1.0, 1.0, chunk=4)))
