"""Audio tower: log-mel frontend + WhisperEncoder numerics parity vs
transformers (offline — configs instantiate without downloads)."""

import numpy as np
import pytest

from tspo_tpu.models.audio import (AudioConfig, AudioTower, encode_audio,
                                   init_audio_params, log_mel_spectrogram,
                                   mel_filter_bank)

torch = pytest.importorskip("torch")


def _rand_audio(seconds=2.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(len(t))).astype(np.float32)


def test_mel_filter_bank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank as hf_fb
    ours = mel_filter_bank(201, 80, 0.0, 8000.0, 16000)
    theirs = hf_fb(num_frequency_bins=201, num_mel_filters=80,
                   min_frequency=0.0, max_frequency=8000.0,
                   sampling_rate=16000, norm="slaney", mel_scale="slaney")
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor
    audio = _rand_audio()
    cfg = AudioConfig(n_mels=80)
    ours = log_mel_spectrogram(audio, cfg)
    fe = WhisperFeatureExtractor(feature_size=80)
    theirs = fe(audio, sampling_rate=16000,
                return_tensors="np").input_features[0]
    assert ours.shape == theirs.shape == (80, 3000)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_encoder_matches_hf_whisper_random_weights():
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder
    cfg = AudioConfig.tiny()
    hf_cfg = WhisperConfig(d_model=cfg.d_model, encoder_layers=cfg.num_layers,
                           encoder_attention_heads=cfg.num_heads,
                           encoder_ffn_dim=cfg.ffn_dim,
                           num_mel_bins=cfg.n_mels,
                           max_source_positions=cfg.max_positions)
    torch.manual_seed(0)
    enc = WhisperEncoder(hf_cfg).eval()
    from tspo_tpu.models.audio import audio_params_from_torch
    params = audio_params_from_torch(enc, cfg)

    mel = log_mel_spectrogram(_rand_audio(), cfg)[None]
    with torch.no_grad():
        theirs = enc(torch.tensor(mel)).last_hidden_state.numpy()
    import jax.numpy as jnp
    ours = np.asarray(encode_audio(params, jnp.asarray(mel), cfg))
    assert ours.shape == theirs.shape == (1, 1500, cfg.d_model)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_audio_tower_chunks_long_audio():
    cfg = AudioConfig.tiny()
    import jax
    tower = AudioTower(params=init_audio_params(jax.random.PRNGKey(0), cfg),
                       cfg=cfg)
    # 35 s -> two 30 s chunks -> 2 * 1500 frames
    feats = tower.encode(_rand_audio(seconds=35.0))
    assert feats.shape == (3000, cfg.d_model)
    assert np.isfinite(feats).all()


def test_init_and_port_geometries_agree():
    """init_audio_params produces the same tree structure/shapes as the HF
    port (a checkpoint therefore drops in without code changes)."""
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder
    import jax
    from tspo_tpu.models.audio import audio_params_from_torch
    cfg = AudioConfig.tiny()
    hf_cfg = WhisperConfig(d_model=cfg.d_model, encoder_layers=cfg.num_layers,
                           encoder_attention_heads=cfg.num_heads,
                           encoder_ffn_dim=cfg.ffn_dim,
                           num_mel_bins=cfg.n_mels,
                           max_source_positions=cfg.max_positions)
    ported = audio_params_from_torch(WhisperEncoder(hf_cfg), cfg)
    inited = init_audio_params(jax.random.PRNGKey(0), cfg)
    ps = jax.tree_util.tree_map(lambda x: tuple(x.shape), ported)
    is_ = jax.tree_util.tree_map(lambda x: tuple(x.shape), inited)
    assert ps == is_
