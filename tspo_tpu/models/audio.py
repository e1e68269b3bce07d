"""Whisper-geometry audio encoder, rebuilt for TPU.

Closes the audio-modality gap the video-side rebuild left open
(docs/STATUS.md): WorldSense / AV-Odyssey carry audio tracks that need an
audio-capable backbone.  The de-facto audio tower of that model family
(Qwen2-Audio / Qwen2.5-Omni use a Whisper-large-v3-style encoder) is a
log-mel frontend + conv downsampler + pre-LN transformer — rebuilt here the
same way as the CLIP towers (models/clip.py): weight-stacked ``lax.scan``
layers, bf16 matmuls with fp32 layernorm/softmax, one jitted program.

Surface:
  - :func:`log_mel_spectrogram` — host frontend, byte-compatible with HF's
    ``WhisperFeatureExtractor`` (hann/400, hop 160, slaney mel filters,
    log10 + dynamic-range clamp; parity-tested).
  - :func:`encode_audio` — jitted encoder forward, [B, n_mels, F] mel ->
    [B, F//2, d] features (conv stride-2, sinusoidal positions,
    transformer, final LN), numerically parity-tested against
    ``transformers``' ``WhisperEncoder`` with shared random weights.
  - :func:`audio_params_from_torch` — port an HF Whisper(-family) encoder
    state dict; :class:`AudioTower` — waveform -> features convenience.

Checkpoints remain download-gated in this zero-egress build; geometry,
loading, and numerics are fully tested (tests/test_audio.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.hf_port import state_dict_of, stack_layers
from .clip import _layer_norm


@dataclass(frozen=True)
class AudioConfig:
    """WhisperEncoder geometry (HF WhisperConfig names in comments)."""

    n_mels: int = 128                 # num_mel_bins (80 for v2, 128 for v3)
    d_model: int = 1280               # d_model (whisper-large)
    num_layers: int = 32              # encoder_layers
    num_heads: int = 20               # encoder_attention_heads
    ffn_dim: int = 5120               # encoder_ffn_dim
    max_positions: int = 1500         # max_source_positions (30 s / 20 ms)
    layer_norm_eps: float = 1e-5
    # frontend
    sampling_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160
    chunk_length_s: int = 30

    @classmethod
    def tiny(cls):
        return cls(n_mels=80, d_model=64, num_layers=2, num_heads=4,
                   ffn_dim=128, max_positions=1500)


# ---------------------------------------------------------------------------
# Host frontend: log-mel spectrogram (WhisperFeatureExtractor parity)
# ---------------------------------------------------------------------------

def _hertz_to_mel(freq):
    """Slaney mel scale (transformers/audio_utils.py hertz_to_mel)."""
    freq = np.asarray(freq, np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    with np.errstate(divide="ignore"):  # log(0) on the not-taken branch
        log_branch = min_log_mel + np.log(freq / min_log_hertz) * logstep
    return np.where(freq >= min_log_hertz, log_branch, mels)


def _mel_to_hertz(mels):
    mels = np.asarray(mels, np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(mels >= min_log_mel,
                    1000.0 * np.exp(logstep * (mels - min_log_mel)), freq)


def mel_filter_bank(num_frequency_bins: int, num_mel_filters: int,
                    min_frequency: float, max_frequency: float,
                    sampling_rate: int) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filters
    [num_frequency_bins, num_mel_filters] (transformers audio_utils
    mel_filter_bank with norm="slaney", mel_scale="slaney")."""
    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)
    mel_min = _hertz_to_mel(min_frequency)
    mel_max = _hertz_to_mel(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hertz(mel_freqs)
    # triangular filters (audio_utils._create_triangular_filter_bank)
    fdiff = np.diff(filter_freqs)
    slopes = np.expand_dims(filter_freqs, 0) - np.expand_dims(fft_freqs, 1)
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0, np.minimum(down, up))
    # slaney energy normalization
    enorm = 2.0 / (filter_freqs[2:] - filter_freqs[:-2])
    return (fb * np.expand_dims(enorm, 0)).astype(np.float64)


def log_mel_spectrogram(audio: np.ndarray, cfg: AudioConfig = AudioConfig()
                        ) -> np.ndarray:
    """waveform [T] float -> log-mel [n_mels, 3000] float32, replicating
    WhisperFeatureExtractor._np_extract_fbank_features: pad/trim to 30 s,
    centered reflect-padded hann STFT (power 2), slaney mel, log10 with
    1e-10 floor, (max - 8) dynamic-range clamp, (x + 4) / 4 scaling."""
    n_samples = cfg.chunk_length_s * cfg.sampling_rate
    audio = np.asarray(audio, np.float64)[:n_samples]
    if len(audio) < n_samples:
        audio = np.pad(audio, (0, n_samples - len(audio)))
    window = np.hanning(cfg.n_fft + 1)[:-1]      # periodic hann
    pad = cfg.n_fft // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(padded) - cfg.n_fft) // cfg.hop_length
    idx = (np.arange(cfg.n_fft)[None, :]
           + cfg.hop_length * np.arange(n_frames)[:, None])
    frames = padded[idx] * window
    stft = np.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    power = np.abs(stft).astype(np.float64) ** 2          # [frames, bins]
    filters = mel_filter_bank(cfg.n_fft // 2 + 1, cfg.n_mels, 0.0,
                              cfg.sampling_rate / 2.0, cfg.sampling_rate)
    mel = power @ filters                                  # [frames, n_mels]
    log_spec = np.log10(np.maximum(mel, 1e-10)).T          # [n_mels, frames]
    log_spec = log_spec[:, :-1]                            # drop last frame
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Encoder forward
# ---------------------------------------------------------------------------

def _conv1d(x, kernel, bias, stride):
    """[B, C_in, L] x [C_out, C_in, K] -> [B, C_out, L'] (pad 1)."""
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out + bias[None, :, None]


def _audio_encoder_layers(x, layers_params, heads, eps):
    """Pre-LN transformer with standard GELU and q-scaled attention
    (k_proj carries no bias in Whisper)."""
    hd_scale = 1.0 / np.sqrt(x.shape[-1] // heads)

    def block(h, lp):
        B, S, W = h.shape
        hd = W // heads
        r = h
        h = _layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
        q = (h @ lp["attn"]["q"]["kernel"] + lp["attn"]["q"]["bias"]) * hd_scale
        k = h @ lp["attn"]["k"]["kernel"]
        v = h @ lp["attn"]["v"]["kernel"] + lp["attn"]["v"]["bias"]
        qh = q.reshape(B, S, heads, hd)
        kh = k.reshape(B, S, heads, hd)
        vh = v.reshape(B, S, heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
        attn = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, S, W)
        h = r + (ctx @ lp["attn"]["o"]["kernel"] + lp["attn"]["o"]["bias"])
        r = h
        h = _layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        h = jax.nn.gelu(h @ lp["mlp"]["fc1"]["kernel"]
                        + lp["mlp"]["fc1"]["bias"], approximate=False)
        h = h @ lp["mlp"]["fc2"]["kernel"] + lp["mlp"]["fc2"]["bias"]
        return r + h, None

    out, _ = jax.lax.scan(block, x, layers_params)
    return out


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def encode_audio(params: Mapping, mel: jnp.ndarray, cfg: AudioConfig,
                 dtype=jnp.float32) -> jnp.ndarray:
    """[B, n_mels, F] log-mel -> [B, F//2, d_model] encoder features
    (WhisperEncoder.forward)."""
    x = mel.astype(dtype)
    x = jax.nn.gelu(_conv1d(x, params["conv1"]["kernel"].astype(dtype),
                            params["conv1"]["bias"].astype(dtype), 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["conv2"]["kernel"].astype(dtype),
                            params["conv2"]["bias"].astype(dtype), 2),
                    approximate=False)
    x = x.transpose(0, 2, 1)                       # [B, S, d]
    S = x.shape[1]
    x = x + params["positions"][:S].astype(dtype)
    x = _audio_encoder_layers(x, params["layers"], cfg.num_heads,
                              cfg.layer_norm_eps)
    return _layer_norm(x, params["ln_post"]["scale"],
                       params["ln_post"]["bias"], cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# Params: init + HF port
# ---------------------------------------------------------------------------

def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal positions (modeling_whisper sinusoids)."""
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)


def init_audio_params(key, cfg: AudioConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    d, f = cfg.d_model, cfg.ffn_dim

    def lin(k, i, o, bias=True):
        p = {"kernel": (jax.random.normal(k, (i, o)) * 0.02).astype(dtype)}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    n = cfg.num_layers

    def stackit(maker):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[maker(i) for i in range(n)])

    lk = jax.random.split(ks[0], n * 6).reshape(n, 6, -1)

    def layer(i):
        return {
            "ln1": ln(), "ln2": ln(),
            "attn": {"q": lin(lk[i, 0], d, d), "k": lin(lk[i, 1], d, d,
                                                        bias=False),
                     "v": lin(lk[i, 2], d, d), "o": lin(lk[i, 3], d, d)},
            "mlp": {"fc1": lin(lk[i, 4], d, f), "fc2": lin(lk[i, 5], f, d)},
        }

    return {
        "conv1": {"kernel": (jax.random.normal(ks[1], (d, cfg.n_mels, 3))
                             * 0.02).astype(dtype),
                  "bias": jnp.zeros((d,), dtype)},
        "conv2": {"kernel": (jax.random.normal(ks[2], (d, d, 3))
                             * 0.02).astype(dtype),
                  "bias": jnp.zeros((d,), dtype)},
        "positions": jnp.asarray(_sinusoids(cfg.max_positions, d), dtype),
        "layers": stackit(layer),
        "ln_post": ln(),
    }


def audio_params_from_torch(model_or_sd, cfg: AudioConfig,
                            dtype=jnp.float32) -> dict:
    """Port an HF ``WhisperEncoder`` state dict (keys conv1/conv2,
    embed_positions, layers.N.self_attn.{q,k,v,out}_proj,
    layers.N.{self_attn_layer_norm,final_layer_norm,fc1,fc2}, layer_norm)."""
    sd = state_dict_of(model_or_sd)
    n = cfg.num_layers

    def lin(fmt, bias=True):
        p = {"kernel": jnp.asarray(
            stack_layers(sd, n, fmt + ".weight").transpose(0, 2, 1), dtype)}
        if bias:
            p["bias"] = jnp.asarray(stack_layers(sd, n, fmt + ".bias"), dtype)
        return p

    def lnorm(fmt):
        return {"scale": jnp.asarray(stack_layers(sd, n, fmt + ".weight"),
                                     dtype),
                "bias": jnp.asarray(stack_layers(sd, n, fmt + ".bias"),
                                    dtype)}

    return {
        "conv1": {"kernel": jnp.asarray(sd["conv1.weight"], dtype),
                  "bias": jnp.asarray(sd["conv1.bias"], dtype)},
        "conv2": {"kernel": jnp.asarray(sd["conv2.weight"], dtype),
                  "bias": jnp.asarray(sd["conv2.bias"], dtype)},
        "positions": jnp.asarray(sd["embed_positions.weight"], dtype),
        "layers": {
            "ln1": lnorm("layers.{i}.self_attn_layer_norm"),
            "ln2": lnorm("layers.{i}.final_layer_norm"),
            "attn": {"q": lin("layers.{i}.self_attn.q_proj"),
                     "k": lin("layers.{i}.self_attn.k_proj", bias=False),
                     "v": lin("layers.{i}.self_attn.v_proj"),
                     "o": lin("layers.{i}.self_attn.out_proj")},
            "mlp": {"fc1": lin("layers.{i}.fc1"),
                    "fc2": lin("layers.{i}.fc2")},
        },
        "ln_post": {"scale": jnp.asarray(sd["layer_norm.weight"], dtype),
                    "bias": jnp.asarray(sd["layer_norm.bias"], dtype)},
    }


# ---------------------------------------------------------------------------
# Convenience wrapper
# ---------------------------------------------------------------------------

@dataclass
class AudioTower:
    """waveform -> encoder features; the audio analogue of the vision
    towers.  An audio-capable backbone projects these into its embedding
    space and splices them like video tokens (llava_arch-style); the
    projector weights ride the backbone checkpoint."""

    params: dict
    cfg: AudioConfig = AudioConfig()
    dtype: object = jnp.float32

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """[T] waveform (16 kHz) -> [frames, d_model] float32; long audio is
        processed in 30 s chunks and concatenated.

        Features are TRIMMED to the real audio length per chunk (the conv
        stride-2 output-length rule ``(mel_frames - 1) // 2 + 1`` the
        audio-LLM checkpoints use, e.g. Qwen2-Audio's
        _get_feat_extract_output_lengths) — the 30 s zero-padding never
        reaches the LM context."""
        n = self.cfg.chunk_length_s * self.cfg.sampling_rate
        audio = np.asarray(audio, np.float32)
        chunks = [audio[i:i + n] for i in range(0, max(len(audio), 1), n)]
        outs = []
        for c in chunks:
            mel = log_mel_spectrogram(c, self.cfg)[None]
            feats = encode_audio(self.params, jnp.asarray(mel), self.cfg,
                                 self.dtype)
            mel_frames = min(mel.shape[-1],
                             max(len(c) // self.cfg.hop_length, 1))
            t_real = (mel_frames - 1) // 2 + 1
            outs.append(np.asarray(feats[0][:t_real], np.float32))
        return np.concatenate(outs, axis=0)

    def encode_file(self, path: str) -> np.ndarray:
        """Media file (wav/mp4/mkv/...) -> features, via the native ffmpeg
        audio decoder (native/audio.cpp: demux + decode + resample to mono
        float32 at the tower's sampling rate)."""
        from ..video.native import load_audio
        return self.encode(load_audio(path, self.cfg.sampling_rate))

    @classmethod
    def from_torch(cls, model_or_sd, cfg: AudioConfig, dtype=jnp.float32):
        return cls(params=audio_params_from_torch(model_or_sd, cfg, dtype),
                   cfg=cfg, dtype=dtype)


# ---------------------------------------------------------------------------
# Audio-LLM checkpoint loader (tower + feature->LM projector in one dict)
# ---------------------------------------------------------------------------

def audio_llm_from_torch(model_or_sd, cfg: AudioConfig | None = None,
                         dtype=jnp.float32, proj_dtype=jnp.bfloat16):
    """Port the audio stack of an audio-LLM checkpoint.

    Accepts the Qwen2-Audio layout (HF ``modeling_qwen2_audio.py``):
    WhisperEncoder weights under ``audio_tower.`` and a single-linear
    projector ``multi_modal_projector.linear.{weight,bias}``; also accepts
    an mlp2x_gelu projector ``audio_projector.{0,2}.{weight,bias}``
    (mm_projector-style, the layout LLaVA-family audio forks use).

    Returns ``(AudioTower, projector_params)`` — attach via
    :meth:`LLaVAVideoModel.attach_audio_from_torch`.  The tower runs in
    ``dtype`` (fp32 by default, like the vision towers' frontends); the
    projector weights are cast to ``proj_dtype`` to match the LM compute
    dtype.
    """
    sd = state_dict_of(model_or_sd)
    cfg = cfg or AudioConfig()
    tower_sd = {k[len("audio_tower."):]: v for k, v in sd.items()
                if k.startswith("audio_tower.")}
    if not tower_sd:
        raise KeyError(
            "no 'audio_tower.*' keys in the checkpoint — expected a "
            "Qwen2-Audio-style audio-LLM state dict (WhisperEncoder under "
            "'audio_tower.', projector 'multi_modal_projector.linear' or "
            "'audio_projector.{0,2}')")
    tower = AudioTower(params=audio_params_from_torch(tower_sd, cfg, dtype),
                       cfg=cfg, dtype=dtype)
    if "multi_modal_projector.linear.weight" in sd:
        proj = {"linear": {
            "kernel": jnp.asarray(
                np.asarray(sd["multi_modal_projector.linear.weight"]).T,
                proj_dtype),
            "bias": jnp.asarray(
                np.asarray(sd["multi_modal_projector.linear.bias"]),
                proj_dtype)}}
    elif "audio_projector.0.weight" in sd:
        def lin(i):
            return {"kernel": jnp.asarray(
                        np.asarray(sd[f"audio_projector.{i}.weight"]).T,
                        proj_dtype),
                    "bias": jnp.asarray(
                        np.asarray(sd[f"audio_projector.{i}.bias"]),
                        proj_dtype)}
        proj = {"fc1": lin(0), "fc2": lin(2)}
    else:
        raise KeyError(
            "audio-LLM checkpoint has an audio_tower but no recognized "
            "projector ('multi_modal_projector.linear' or "
            "'audio_projector.{0,2}')")
    return tower, proj
