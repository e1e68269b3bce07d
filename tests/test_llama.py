"""Llama-family LMs (vicuna/Llama, Mistral) on the qwen2 core — parity vs
torch transformers at tiny random configs, incl. sliding-window attention
and linear rope scaling."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tspo_tpu.models.llama import (llama3_8b_config, llama_params_from_torch,
                                   mistral_7b_config, vicuna_7b_config)
from tspo_tpu.models.qwen2 import (KVCache, Qwen2Config, embed_tokens,
                                   greedy_decode, lm_logits, qwen2_forward)

LLAMA_TINY = Qwen2Config(
    vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=10_000.0,
    rms_eps=1e-5, max_position_embeddings=128, eos_token_id=511,
    qkv_bias=False)
MISTRAL_TINY = Qwen2Config(
    vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=10_000.0,
    rms_eps=1e-5, max_position_embeddings=128, eos_token_id=511,
    qkv_bias=False, sliding_window=5)


def _full_logits(params, ids, cfg, max_len=None):
    B, S = ids.shape
    max_len = max_len or S
    cache = KVCache.create(cfg, B, max_len, jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids))
    valid = jnp.zeros((B, max_len), bool).at[:, :S].set(True)
    hidden, cache = qwen2_forward(params, embeds, cache, jnp.arange(S),
                                  valid, cfg)
    return lm_logits(params, hidden, cfg), cache


@pytest.fixture(scope="module")
def torch_llama():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10_000.0, rms_norm_eps=1e-5,
        max_position_embeddings=128, tie_word_embeddings=False,
        attention_dropout=0.0, attention_bias=False, mlp_bias=False)
    torch.manual_seed(7)
    return transformers.LlamaForCausalLM(hf_cfg).eval()


@pytest.fixture(scope="module")
def torch_mistral():
    hf_cfg = transformers.MistralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10_000.0, rms_norm_eps=1e-5,
        max_position_embeddings=128, tie_word_embeddings=False,
        attention_dropout=0.0, sliding_window=5)
    torch.manual_seed(8)
    return transformers.MistralForCausalLM(hf_cfg).eval()


def test_llama_logits_parity(torch_llama):
    params = llama_params_from_torch(torch_llama, LLAMA_TINY,
                                     dtype=jnp.float32)
    assert "bias" not in params["layers"]["q"]          # bias-free load
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 512, size=(2, 9))
    ours, _ = _full_logits(params, ids, LLAMA_TINY)
    with torch.no_grad():
        want = torch_llama(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-3, atol=2e-3)


def test_llama_greedy_parity(torch_llama):
    params = llama_params_from_torch(torch_llama, LLAMA_TINY,
                                     dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 510, size=(1, 6))
    with torch.no_grad():
        want = torch_llama.generate(
            torch.from_numpy(ids), max_new_tokens=8, do_sample=False,
            eos_token_id=-1, pad_token_id=0).numpy()[0, 6:]
    cache = KVCache.create(LLAMA_TINY, 1, 64, jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    toks, n = greedy_decode(params, embeds, jnp.ones((1, 6), bool), cache,
                            LLAMA_TINY, 8, eos_token_id=-7)
    assert int(n) == 8
    np.testing.assert_array_equal(np.asarray(toks), want)


def test_mistral_sliding_window_parity(torch_mistral):
    """Window=5 over a 24-token prompt: the dense-mask path must match HF's
    windowed attention exactly."""
    params = llama_params_from_torch(torch_mistral, MISTRAL_TINY,
                                     dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 512, size=(1, 24))
    ours, _ = _full_logits(params, ids, MISTRAL_TINY)
    with torch.no_grad():
        want = torch_mistral(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), want, rtol=3e-3, atol=3e-3)
    # sanity: the window genuinely changes the result
    nowin, _ = _full_logits(params, ids,
                            Qwen2Config(**{**MISTRAL_TINY.__dict__,
                                           "sliding_window": None}))
    assert not np.allclose(np.asarray(ours), np.asarray(nowin), atol=1e-3)


def test_sliding_window_flash_matches_dense(torch_mistral):
    """The flash path (flash_threshold hit) with a window must equal the
    dense-mask path."""
    params = llama_params_from_torch(torch_mistral, MISTRAL_TINY,
                                     dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 512, size=(1, 24))
    dense, _ = _full_logits(params, ids, MISTRAL_TINY)
    B, S = ids.shape
    cache = KVCache.create(MISTRAL_TINY, B, S, jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids))
    valid = jnp.ones((B, S), bool)
    hidden, _ = qwen2_forward(params, embeds, cache, jnp.arange(S), valid,
                              MISTRAL_TINY, flash_threshold=8)  # force flash
    flash = lm_logits(params, hidden, MISTRAL_TINY)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=2e-3, atol=2e-3)


def test_rope_linear_scaling_matches_torch():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10_000.0, rms_norm_eps=1e-5,
        max_position_embeddings=128, tie_word_embeddings=False,
        attention_dropout=0.0, attention_bias=False, mlp_bias=False,
        rope_scaling={"rope_type": "linear", "factor": 2.0})
    torch.manual_seed(9)
    tm = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = Qwen2Config(**{**LLAMA_TINY.__dict__, "rope_scaling_factor": 2.0})
    params = llama_params_from_torch(tm, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 512, size=(1, 12))
    ours, _ = _full_logits(params, ids, cfg)
    with torch.no_grad():
        want = tm(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-3, atol=2e-3)


def test_production_configs_geometry():
    assert vicuna_7b_config().num_kv_heads == 32          # MHA llama-2
    assert vicuna_7b_config(2.0).rope_scaling_factor == 2.0
    assert llama3_8b_config().vocab_size == 128256
    assert mistral_7b_config().sliding_window == 4096
    for cfg in (vicuna_7b_config(), llama3_8b_config(), mistral_7b_config()):
        assert not cfg.qkv_bias


def test_sliding_window_padded_rows_stay_finite(torch_mistral):
    """A right-padded batch row whose padded query positions fall entirely
    outside the sliding window must not produce NaN logits for its VALID
    tokens (code-review r2 batch-3 finding #1: softmax over an all--inf row
    poisons the whole row through the kv cache)."""
    params = llama_params_from_torch(torch_mistral, MISTRAL_TINY,
                                     dtype=jnp.float32)
    B, S, valid_len = 2, 10, 3
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 512, size=(B, S))
    cache = KVCache.create(MISTRAL_TINY, B, S, jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids))
    valid = jnp.zeros((B, S), bool).at[0].set(True).at[1, :valid_len].set(True)
    hidden, _ = qwen2_forward(params, embeds, cache, jnp.arange(S), valid,
                              MISTRAL_TINY)
    logits = lm_logits(params, hidden, MISTRAL_TINY)
    assert bool(jnp.isfinite(logits[1, :valid_len]).all())
    assert bool(jnp.isfinite(logits[0]).all())
