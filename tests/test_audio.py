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
    # 35 s -> one full 30 s chunk (1500) + a 5 s chunk trimmed to its real
    # length: 5 s = 500 mel frames -> (500 - 1) // 2 + 1 = 250 features
    feats = tower.encode(_rand_audio(seconds=35.0))
    assert feats.shape == (1750, cfg.d_model)
    assert np.isfinite(feats).all()
    # exact multiple keeps full chunks
    assert tower.encode(_rand_audio(seconds=30.0)).shape[0] == 1500


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


def test_audio_visual_generate_end_to_end():
    """Tiny LLaVA-style backbone + AudioTower: generate() with an audio
    waveform splices projected audio tokens at the <audio> sentinel and
    decodes — the audio-visual path the audio-LLM checkpoints drop into."""
    import jax
    import jax.numpy as jnp
    from tspo_tpu.models.llava_video import (AUDIO_TOKEN_INDEX,
                                             IMAGE_TOKEN_INDEX,
                                             LLaVAVideoConfig,
                                             LLaVAVideoModel,
                                             tokenize_with_image)

    import dataclasses
    cfg = dataclasses.replace(LLaVAVideoConfig.tiny(), max_context=2048)
    acfg = AudioConfig.tiny()
    key = jax.random.PRNGKey(0)
    tower = AudioTower(params=init_audio_params(key, acfg), cfg=acfg)

    # random tiny backbone via the same torch route the llava tests use
    import torch as _torch
    import transformers
    lm = cfg.lm
    hf_cfg = transformers.Qwen2Config(
        vocab_size=lm.vocab_size, hidden_size=lm.hidden_size,
        intermediate_size=lm.intermediate_size,
        num_hidden_layers=lm.num_layers, num_attention_heads=lm.num_heads,
        num_key_value_heads=lm.num_kv_heads, head_dim=lm.head_dim,
        rope_theta=lm.rope_theta, rms_norm_eps=lm.rms_eps,
        tie_word_embeddings=False, attention_dropout=0.0)
    v = cfg.vision
    sig_cfg = transformers.SiglipVisionConfig(
        hidden_size=v.width, intermediate_size=v.intermediate,
        num_hidden_layers=v.layers + 1, num_attention_heads=v.heads,
        image_size=v.image_size, patch_size=v.patch_size,
        layer_norm_eps=v.layer_norm_eps, hidden_act="gelu_pytorch_tanh")
    _torch.manual_seed(0)
    sd = {k: p for k, p in
          transformers.Qwen2ForCausalLM(hf_cfg).state_dict().items()}
    for k, p in transformers.SiglipVisionModel(sig_cfg).state_dict().items():
        sd["model.vision_tower.vision_tower." + k] = p
    proj0 = _torch.nn.Linear(v.width, lm.hidden_size)
    proj2 = _torch.nn.Linear(lm.hidden_size, lm.hidden_size)
    sd["model.mm_projector.0.weight"] = proj0.weight
    sd["model.mm_projector.0.bias"] = proj0.bias
    sd["model.mm_projector.2.weight"] = proj2.weight
    sd["model.mm_projector.2.bias"] = proj2.bias
    sd["model.image_newline"] = _torch.randn(lm.hidden_size) * 0.1
    enc = lambda s: [ord(c) % lm.vocab_size for c in s]
    dec = lambda toks: " ".join(str(t) for t in toks)
    model = LLaVAVideoModel.from_torch_checkpoint(
        sd, cfg, dtype=jnp.float32, encode=enc, decode=dec, batch_frames=4,
        max_new_tokens=4)
    model.audio_tower = tower
    k1, k2 = jax.random.split(key)
    model.params["audio_projector"] = {
        "fc1": {"kernel": jax.random.normal(k1, (acfg.d_model,
                                                 lm.hidden_size)) * 0.02,
                "bias": jnp.zeros(lm.hidden_size)},
        "fc2": {"kernel": jax.random.normal(k2, (lm.hidden_size,
                                                 lm.hidden_size)) * 0.02,
                "bias": jnp.zeros(lm.hidden_size)},
    }

    frames = np.random.default_rng(0).integers(
        0, 256, (4, 48, 48, 3), dtype=np.uint8)
    audio = _rand_audio(seconds=1.0)
    out_av = model.generate(frames, "what do you hear?", audio=audio)
    assert isinstance(out_av, str) and out_av
    # audio must change the context vs video-only (tokens really spliced)
    out_v = model.generate(frames, "what do you hear?")
    assert isinstance(out_v, str)

    # sentinel tokenization: both media sentinels land exactly once
    ids = tokenize_with_image("<image>\n<audio>\nq", enc, None)
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert ids.count(AUDIO_TOKEN_INDEX) == 1

    # splice accounting: S = text + video + audio token counts
    vid = model.encode_video(frames)
    aud = model.encode_audio_tokens(audio)
    emb = model.splice_embeddings(ids, vid, aud)
    n_text = len([i for i in ids if i >= 0])
    assert emb.shape[1] == n_text + vid.shape[0] + aud.shape[0]


# ---------------------------------------------------------------------------
# Native audio decode (native/audio.cpp)
# ---------------------------------------------------------------------------

def _write_wav(path, sr=8000, seconds=2.0, hz=440.0):
    import wave
    t = np.arange(int(seconds * sr)) / sr
    tone = (0.5 * np.sin(2 * np.pi * hz * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())


def test_native_audio_decode_and_resample(tmp_path):
    from tspo_tpu.video import native
    if not native.audio_available():
        pytest.skip("native audio decode unavailable")
    p = tmp_path / "tone.wav"
    _write_wav(p, sr=8000, seconds=2.0, hz=440.0)
    a = native.load_audio(str(p), 16000)
    assert a.dtype == np.float32
    assert abs(len(a) - 32000) <= 64          # 2 s at 16 kHz
    spec = np.abs(np.fft.rfft(a))
    freq = np.fft.rfftfreq(len(a), 1 / 16000)
    assert abs(freq[spec.argmax()] - 440.0) < 2.0


def test_native_audio_no_stream_raises(tmp_path):
    from tspo_tpu.video import native
    if not native.audio_available():
        pytest.skip("native audio decode unavailable")
    import cv2
    p = str(tmp_path / "mute.mp4")   # cv2 writes video-only containers
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (32, 32))
    for i in range(10):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    with pytest.raises(IOError):
        native.load_audio(p, 16000)


def test_audio_tower_encode_file(tmp_path):
    from tspo_tpu.video import native
    if not native.audio_available():
        pytest.skip("native audio decode unavailable")
    import jax
    cfg = AudioConfig.tiny()
    tower = AudioTower(params=init_audio_params(jax.random.PRNGKey(0), cfg),
                       cfg=cfg)
    p = tmp_path / "tone.wav"
    _write_wav(p, sr=16000, seconds=1.0)
    feats = tower.encode_file(str(p))
    # 1 s of real audio -> 100 mel frames -> 50 features (padding trimmed)
    assert feats.shape == (50, cfg.d_model)
    assert np.isfinite(feats).all()


# ---------------------------------------------------------------------------
# Audio-LLM checkpoint loader (audio_llm_from_torch / attach_audio_from_torch)
# ---------------------------------------------------------------------------

def _tiny_backbone_sd(cfg):
    """Random llava_qwen-layout state dict at cfg's tiny geometry (same
    torch route as test_audio_visual_generate_end_to_end)."""
    import transformers
    lm, v = cfg.lm, cfg.vision
    hf_cfg = transformers.Qwen2Config(
        vocab_size=lm.vocab_size, hidden_size=lm.hidden_size,
        intermediate_size=lm.intermediate_size,
        num_hidden_layers=lm.num_layers, num_attention_heads=lm.num_heads,
        num_key_value_heads=lm.num_kv_heads, head_dim=lm.head_dim,
        rope_theta=lm.rope_theta, rms_norm_eps=lm.rms_eps,
        tie_word_embeddings=False, attention_dropout=0.0)
    sig_cfg = transformers.SiglipVisionConfig(
        hidden_size=v.width, intermediate_size=v.intermediate,
        num_hidden_layers=v.layers + 1, num_attention_heads=v.heads,
        image_size=v.image_size, patch_size=v.patch_size,
        layer_norm_eps=v.layer_norm_eps, hidden_act="gelu_pytorch_tanh")
    torch.manual_seed(0)
    sd = dict(transformers.Qwen2ForCausalLM(hf_cfg).state_dict())
    for k, p in transformers.SiglipVisionModel(sig_cfg).state_dict().items():
        sd["model.vision_tower.vision_tower." + k] = p
    proj0 = torch.nn.Linear(v.width, lm.hidden_size)
    proj2 = torch.nn.Linear(lm.hidden_size, lm.hidden_size)
    sd["model.mm_projector.0.weight"] = proj0.weight
    sd["model.mm_projector.0.bias"] = proj0.bias
    sd["model.mm_projector.2.weight"] = proj2.weight
    sd["model.mm_projector.2.bias"] = proj2.bias
    sd["model.image_newline"] = torch.randn(lm.hidden_size) * 0.1
    return sd


def test_audio_llm_checkpoint_attach_and_generate(tmp_path):
    """A synthetic Qwen2-Audio-layout checkpoint (built by the assets
    script) flows through attach_audio_from_torch end-to-end: tower loads,
    single-linear projector loads, generate(audio=...) runs — the rehearsal
    for VERDICT missing #4 (no real audio-LLM checkpoint in this
    container)."""
    import dataclasses
    import os
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.make_synthetic_assets import build_audio_llm
    from tspo_tpu.models.llava_video import LLaVAVideoConfig, LLaVAVideoModel

    cfg = dataclasses.replace(LLaVAVideoConfig.tiny(), max_context=2048)
    path = build_audio_llm(str(tmp_path), seed=0, tiny=True,
                           lm_hidden=cfg.lm.hidden_size)
    sd = torch.load(path, weights_only=True)

    enc = lambda s: [ord(c) % cfg.lm.vocab_size for c in s]  # noqa: E731
    dec = lambda toks: " ".join(str(t) for t in toks)        # noqa: E731
    model = LLaVAVideoModel.from_torch_checkpoint(
        _tiny_backbone_sd(cfg), cfg, dtype=jnp.float32, encode=enc,
        decode=dec, batch_frames=4, max_new_tokens=4)
    assert not model.supports_audio
    model.attach_audio_from_torch(sd, AudioConfig.tiny())
    assert model.supports_audio

    audio = _rand_audio(seconds=1.0)
    toks = np.asarray(model.encode_audio_tokens(audio), np.float32)
    assert toks.shape[1] == cfg.lm.hidden_size and np.isfinite(toks).all()

    # projector parity: pooled tower features through torch's linear
    feats = model.audio_tower.encode(audio)
    s = model.audio_pool_stride
    n = (feats.shape[0] // s) * s
    pooled = feats[:n].reshape(n // s, s, -1).mean(axis=1)
    w = sd["multi_modal_projector.linear.weight"].detach().numpy()
    b = sd["multi_modal_projector.linear.bias"].detach().numpy()
    theirs = pooled @ w.astype(np.float32).T + b.astype(np.float32)
    # projector weights ride the LM dtype (fp32 here) — exact-ish
    np.testing.assert_allclose(toks, theirs, atol=2e-3, rtol=1e-2)

    frames = np.random.default_rng(0).integers(
        0, 256, (4, 48, 48, 3), dtype=np.uint8)
    out = model.generate(frames, "what do you hear?", audio=audio)
    assert isinstance(out, str) and out


def test_audio_llm_wrong_hidden_raises(tmp_path):
    import dataclasses
    import os
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.make_synthetic_assets import build_audio_llm
    from tspo_tpu.models.llava_video import LLaVAVideoConfig, LLaVAVideoModel

    cfg = dataclasses.replace(LLaVAVideoConfig.tiny(), max_context=2048)
    path = build_audio_llm(str(tmp_path), seed=0, tiny=True,
                           lm_hidden=cfg.lm.hidden_size + 8)
    sd = torch.load(path, weights_only=True)
    enc = lambda s: [ord(c) % cfg.lm.vocab_size for c in s]  # noqa: E731
    model = LLaVAVideoModel.from_torch_checkpoint(
        _tiny_backbone_sd(cfg), cfg, dtype=jnp.float32, encode=enc,
        decode=str, batch_frames=4, max_new_tokens=4)
    with pytest.raises(ValueError, match="projector output dim"):
        model.attach_audio_from_torch(sd, AudioConfig.tiny())
    assert not model.supports_audio   # failed attach leaves model clean


def test_audio_llm_missing_tower_raises():
    from tspo_tpu.models.audio import audio_llm_from_torch
    with pytest.raises(KeyError, match="audio_tower"):
        audio_llm_from_torch({"lm.weight": np.zeros((2, 2), np.float32)})


@pytest.mark.skipif(
    not __import__("os").environ.get("TSPO_RUN_SLOW"),
    reason="full Whisper-large-v3 geometry is slow; set TSPO_RUN_SLOW=1")
def test_audio_llm_full_geometry_parity(tmp_path):
    """FULL Qwen2-Audio tower geometry (Whisper-large-v3: 32 layers,
    d=1280, 128 mels) through the checkpoint loader, parity vs
    transformers' WhisperEncoder on the same synthetic checkpoint — the
    maximal no-download risk reduction for the audio-LLM path."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.make_synthetic_assets import build_audio_llm
    from tspo_tpu.models.audio import audio_llm_from_torch

    path = build_audio_llm(str(tmp_path), seed=0, tiny=False)
    sd = torch.load(path, weights_only=True)
    cfg = AudioConfig()
    tower, proj = audio_llm_from_torch(sd, cfg)
    assert "linear" in proj
    assert tower.params["layers"]["attn"]["q"]["kernel"].shape == (
        cfg.num_layers, cfg.d_model, cfg.d_model)

    audio = _rand_audio(seconds=3.0)
    ours = tower.encode(audio)

    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder
    hf_cfg = WhisperConfig(d_model=cfg.d_model, encoder_layers=cfg.num_layers,
                           encoder_attention_heads=cfg.num_heads,
                           encoder_ffn_dim=cfg.ffn_dim,
                           num_mel_bins=cfg.n_mels,
                           max_source_positions=cfg.max_positions)
    enc = WhisperEncoder(hf_cfg).eval()
    enc.load_state_dict({k[len("audio_tower."):]: v for k, v in sd.items()
                         if k.startswith("audio_tower.")})
    mel = log_mel_spectrogram(audio, cfg)[None]
    with torch.no_grad():
        theirs = enc(torch.tensor(mel)).last_hidden_state.numpy()[0]
    # tower.encode trims to real audio length; compare that prefix
    t_real = ours.shape[0]
    np.testing.assert_allclose(ours, theirs[:t_real], atol=5e-3, rtol=1e-2)
