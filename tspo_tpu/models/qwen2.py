"""Qwen2 decoder in JAX — the language model of LLaVA-Video-7B-Qwen2.

Replaces the reference's torch ``Qwen2ForCausalLM`` + flash-attn backbone
(llava/model/language_model/llava_qwen.py:52-129).  TPU-first:

  - weight-stacked layers + ``lax.scan`` (one compiled block, 28 iterations);
  - preallocated static-shape KV cache, greedy decode as ``lax.while_loop``
    with donated cache (no per-token retrace, no host sync in the loop);
  - fp32 RMSNorm/softmax/rope on bf16 weights & activations;
  - Megatron TP sharding rules (q/k/v/gate/up column-, o/down row-sharded)
    for a 'model' mesh axis — collectives inserted by XLA.

The model consumes *embeddings*, not token ids, at the top level, because
LLaVA splices projected visual tokens into the text embedding sequence
(llava_arch.py:251-556); ``embed_tokens``/``lm_head`` are exposed separately.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Mapping, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.hf_port import state_dict_of, stack_layers


@dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    eos_token_id: int = 151645  # <|im_end|> for chat models
    # Llama-family knobs (models/llama.py): bias-free attention projections,
    # linear rope position scaling (old vicuna checkpoints,
    # llava_vid_tspo.py:159-174), Mistral sliding-window attention
    qkv_bias: bool = True
    rope_scaling_factor: float = 1.0
    sliding_window: int | None = None

    @classmethod
    def tiny(cls) -> "Qwen2Config":
        return cls(vocab_size=512, hidden_size=64, intermediate_size=128,
                   num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                   rope_theta=10_000.0, max_position_embeddings=128,
                   eos_token_id=511)

    @classmethod
    def llava_video_7b(cls) -> "Qwen2Config":
        return cls()  # Qwen2-7B-Instruct geometry

    @classmethod
    def llava_video_72b(cls) -> "Qwen2Config":
        """LLaVA-Video-72B-Qwen2 (TSPO_llava_72B.sh) — where the reference
        resorts to HF device_map=auto layer placement, this geometry runs
        under the same Megatron TP shardings over a larger 'model' axis."""
        return cls(hidden_size=8192, intermediate_size=29568, num_layers=80,
                   num_heads=64, num_kv_heads=8)


class KVCache(NamedTuple):
    """Static-shape cache: k/v are [L, B, max_len, kv_heads, head_dim];
    ``length`` is the number of valid positions."""

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, cfg: Qwen2Config, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=jnp.zeros((), jnp.int32))


def _linear(p, x):
    """Linear supporting bf16 kernels, weight-only int8 (kernel_q + scale),
    and LoRA adapters (lora_a/lora_b/lora_scale — see add_lora).

    int8 path: convert fuses into the dot operand read (weights stream from
    HBM at half the bytes — decode is weight-bandwidth-bound, +27% measured on
    the 7B MLP GEMV shape); per-output-channel scale applied on the output.
    """
    if "kernel_q" in p:
        y = x @ p["kernel_q"].astype(x.dtype)
        y = y * p["scale"].astype(x.dtype)
    else:
        y = x @ p["kernel"]
    if "lora_a" in p:
        y = y + ((x @ p["lora_a"].astype(x.dtype))
                 @ p["lora_b"].astype(x.dtype)) * p["lora_scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def quantize_qwen2_params(params) -> dict:
    """Weight-only int8 quantization of the seven per-layer GEMMs + lm_head
    (per-output-channel scales); embeddings and norms stay as-is."""

    def quant(kernel, axis=-2):
        k = np.asarray(kernel, np.float32)
        s = np.abs(k).max(axis=axis, keepdims=True) / 127.0 + 1e-12
        q = np.clip(np.round(k / s), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(np.squeeze(s, axis), jnp.float32)

    layers = dict(params["layers"])
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        p = dict(layers[name])
        kq, s = quant(p.pop("kernel"))
        layers[name] = {"kernel_q": kq, "scale": s, **p}
    out = {**params, "layers": layers}
    if "lm_head" in params:
        # lm_head stored [V, D]: quantize over D (per-vocab-row scale)
        kq, s = quant(params["lm_head"], axis=-1)
        out["lm_head_q"] = kq
        out["lm_head_scale"] = s
        out.pop("lm_head")
    return out


LORA_DEFAULT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def add_lora(params, rng, rank: int = 16, alpha: float = 32.0,
             targets=LORA_DEFAULT_TARGETS) -> dict:
    """Attach LoRA adapters to the per-layer GEMMs (the reference finetunes
    with peft LoRA over all linear names, train.py:226-240
    ``find_all_linear_names`` + lora_enable).  A ~ N(0, 1/r) [L, fi, r],
    B = 0 [L, r, fo] so the initial model is unchanged; y += (x A) B * α/r."""
    layers = dict(params["layers"])
    keys = jax.random.split(rng, len(targets))
    for key, name in zip(keys, targets):
        p = dict(layers[name])
        kern = p.get("kernel", p.get("kernel_q"))
        L, fi, fo = kern.shape
        p["lora_a"] = (jax.random.normal(key, (L, fi, rank), jnp.float32)
                       / np.sqrt(rank))
        p["lora_b"] = jnp.zeros((L, rank, fo), jnp.float32)
        # [L] (not scalar): every leaf under "layers" is scanned with a
        # leading layer dim (qwen2_forward's lax.scan xs)
        p["lora_scale"] = jnp.full((L,), alpha / rank, jnp.float32)
        layers[name] = p
    return {**params, "layers": layers}


def merge_lora(params) -> dict:
    """Fold adapters into the base kernels (peft merge_and_unload).

    Works on float kernels and on int8 weight-only layers (add_lora
    supports both): a quantized base is dequantized (kernel_q * scale),
    the delta folded in, and the result requantized with the same
    per-output-channel scheme — the merged model stays int8."""
    layers = dict(params["layers"])
    for name, p in list(layers.items()):
        if isinstance(p, dict) and "lora_a" in p:
            p = dict(p)
            a, b = p.pop("lora_a"), p.pop("lora_b")
            scale = p.pop("lora_scale")
            delta = jnp.einsum("lir,lro->lio", a, b) * scale[:, None, None]
            if "kernel" in p:
                p["kernel"] = (p["kernel"].astype(jnp.float32)
                               + delta).astype(p["kernel"].dtype)
            else:
                deq = (p.pop("kernel_q").astype(jnp.float32)
                       * p.pop("scale")[:, None, :]) + delta   # [L, fi, fo]
                s = jnp.abs(deq).max(axis=-2, keepdims=True) / 127.0 + 1e-12
                p["kernel_q"] = jnp.clip(jnp.round(deq / s),
                                         -127, 127).astype(jnp.int8)
                p["scale"] = jnp.squeeze(s, -2)
            layers[name] = p
    return {**params, "layers": layers}


def lora_param_mask(params) -> dict:
    """Pytree bool mask (True = trainable) for the LoRA optimizer — only the
    A/B adapter matrices train; base weights AND lora_scale stay frozen
    (alpha/r is a hyperparameter in peft, never a trained value)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: any(str(getattr(k, "key", k)) in
                               ("lora_a", "lora_b") for k in path), params)


def _rms_norm(x, weight, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def _rope(positions, head_dim, theta):
    """[S] (or per-row [B, S]) positions -> (cos, sin) [..., head_dim] fp32,
    HF half-rotation layout.  The batched form carries ragged-prompt decode:
    each row's new token continues from ITS OWN valid prompt length."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def mrope_cos_sin(positions3: jnp.ndarray, head_dim: int, theta: float,
                  sections) -> tuple:
    """Multimodal 3D rope (Qwen2.5-VL): positions3 [3, S] (t, h, w); channel
    dim split into ``sections`` (summing to head_dim//2), section i drawing
    from position dim i%3 after the half-duplication — matching HF
    ``apply_multimodal_rotary_pos_emb``."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    freqs = positions3.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)          # [3, S, head_dim]
    cos3, sin3 = jnp.cos(emb), jnp.sin(emb)
    doubled = list(sections) * 2
    starts = np.cumsum([0] + doubled[:-1])
    cos = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(cos3[i % 3], int(s), int(d), axis=-1)
         for i, (s, d) in enumerate(zip(starts, doubled))], axis=-1)
    sin = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(sin3[i % 3], int(s), int(d), axis=-1)
         for i, (s, d) in enumerate(zip(starts, doubled))], axis=-1)
    return cos, sin                                          # [S, head_dim]


def _apply_rope(x, cos, sin):
    """x [B, S, H, hd]; rotate_half convention matching HF Qwen2.  cos/sin
    are [S, hd] (shared) or [B, S, hd] (per-row ragged decode positions)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    if cos.ndim == 3:
        c = cos[:, :, None, :].astype(jnp.float32)
        s = sin[:, :, None, :].astype(jnp.float32)
    else:
        c = cos[None, :, None, :].astype(jnp.float32)
        s = sin[None, :, None, :].astype(jnp.float32)
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(x.dtype)


def _attention(q, k, v, mask_bias):
    """q [B,S,H,hd], k/v [B,T,KV,hd] -> [B,S,H,hd]; GQA via reshape-grouping.

    fp32 logits+softmax; mask_bias is additive fp32 [B, 1, S, T]."""
    B, S, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV
    q = q.reshape(B, S, KV, G, hd)
    scores = jnp.einsum("bskgd,btkd->bkgst", q, k).astype(jnp.float32)
    scores = scores / np.sqrt(hd) + mask_bias[:, :, None, :, :]
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bkgst,btkd->bskgd", attn, v)
    return ctx.reshape(B, S, H, hd)


def qwen2_forward(params: Mapping, embeds: jnp.ndarray, cache: KVCache,
                  positions: jnp.ndarray, attn_valid: jnp.ndarray,
                  cfg: Qwen2Config, rope_cos_sin: tuple | None = None,
                  flash_threshold: int = 512, flash_impl: str = "auto",
                  flash_q_offset=None):
    """Run the decoder over ``embeds`` [B, S, D] appended after the cache.

    positions:  [S] rope positions of the new tokens.
    attn_valid: [B, total] validity of cache+new key positions (True=attend),
                where total = cache max_len; new tokens are written at
                [cache.length, cache.length+S).
    rope_cos_sin: optional precomputed ([S, head_dim], [S, head_dim])
                overriding ``positions`` for rope (multimodal 3D rope).
    Returns (hidden [B, S, D], new cache).  Causality within the appended
    block is enforced internally.

    Long-prompt prefill (S >= ``flash_threshold``, which only happens at
    start == 0) switches to chunked flash attention — a 64-frame LLaVA-Video
    prompt is ~12k tokens, where dense [H, S, T] scores would cost ~16 GB.
    ``flash_impl``: "auto" picks the Pallas kernel on TPU (inference-only:
    pallas_call has no differentiation rule); "jax" pins the pure-JAX
    online-softmax flash, which autodiff handles — training losses that may
    cross flash_threshold (SFT/DPO length buckets >= 512) must use it.
    ``flash_q_offset``: traced scalar placing the S new rows at key
    positions [offset, offset + S) over the FULL cache window (suffix
    prefill after an existing prefix — conversation extension, chunked
    admission).  None = the ordinary start-of-cache prefill, which attends
    only the first S cache slots.  Pallas-path only.
    """
    B, S, D = embeds.shape
    T = cache.k.shape[2]
    start = cache.length
    use_flash = S >= flash_threshold  # static: S is a trace-time constant

    if not use_flash:
        # Additive mask: key j attendable by query i (global pos start+i) iff
        # attn_valid[j] and j <= start+i (and within the sliding window when
        # the config sets one — Mistral).
        key_pos = jnp.arange(T)[None, :]                   # [1, T]
        q_glob = start + jnp.arange(S)[:, None]            # [S, 1]
        causal_ok = key_pos[None] <= q_glob[None]          # [1, S, T]
        if cfg.sliding_window is not None:
            # window distance must be measured in LOGICAL token positions,
            # not cache slots: ragged right-padded rows (cross-sample rollout
            # batching) have a padding gap between slot S and logical n_b, so
            # slot distance would wrongly spend window budget on padding.
            # A valid slot's logical position is its rank among valid slots
            # (decode slots appended in order); the query's logical position
            # is its rope position.
            key_logical = jnp.cumsum(attn_valid.astype(jnp.int32),
                                     axis=1) - 1           # [B, T]
            q_logical = jnp.broadcast_to(
                jnp.asarray(positions).reshape(-1, S), (B, S))
            causal_ok = causal_ok & \
                (key_logical[:, None, :]
                 > q_logical[..., None] - cfg.sliding_window)
        ok = causal_ok & attn_valid[:, None, :]            # [B, S, T]
        # finite sentinel (like the flash kernels), NOT -inf: a padded query
        # row past the sliding window can have EVERY key masked, and
        # softmax(all -inf) = NaN which poisons the whole row's k/v for the
        # next layer; with -1e30 such rows get a harmless uniform garbage
        # that the validity mask discards downstream
        mask_bias = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[:, None]

    if rope_cos_sin is None:
        rope_pos = positions if cfg.rope_scaling_factor == 1.0 else \
            positions / cfg.rope_scaling_factor   # HF "linear" rope scaling
        cos, sin = _rope(rope_pos, cfg.head_dim, cfg.rope_theta)
    else:
        cos, sin = rope_cos_sin
    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def block(h, xs):
        lp, k_l, v_l = xs                                   # cache slices [B,T,KV,hd]
        x = _rms_norm(h, lp["ln1"], cfg.rms_eps)
        q = _linear(lp["q"], x).reshape(B, S, H, hd)
        k = _linear(lp["k"], x).reshape(B, S, KV, hd)
        v = _linear(lp["v"], x).reshape(B, S, KV, hd)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        k_l = jax.lax.dynamic_update_slice(k_l, k.astype(k_l.dtype),
                                           (0, start, 0, 0))
        v_l = jax.lax.dynamic_update_slice(v_l, v.astype(v_l.dtype),
                                           (0, start, 0, 0))

        if use_flash:
            if flash_impl == "auto" and jax.default_backend() == "tpu":
                # Pallas GQA flash: no KV repeat, bf16 MXU + fp32 accumulate,
                # causal block skip — 6.2x over the XLA flash at the B=8
                # P=3200 rollout shape (368 vs 2271 ms/28 layers,
                # docs/KERNELS.md)
                from ..ops.pallas_attention import pallas_flash_attention
                if flash_q_offset is not None:
                    # suffix prefill: keys are the whole cache window (the
                    # prefix below ``start`` + this block), q rows offset
                    ctx = pallas_flash_attention(
                        q, k_l, v_l, attn_valid,
                        causal=True, blk_q=1024, blk_k=1024,
                        window=cfg.sliding_window,
                        q_offset=flash_q_offset).reshape(B, S, D)
                else:
                    ctx = pallas_flash_attention(
                        q, k_l[:, :S], v_l[:, :S], attn_valid[:, :S],
                        causal=True, blk_q=1024, blk_k=1024,
                        window=cfg.sliding_window).reshape(B, S, D)
            else:
                if flash_q_offset is not None:
                    raise NotImplementedError(
                        "flash_q_offset needs the Pallas path; callers pin "
                        "flash_threshold high off-TPU (prefill_extend)")
                from ..ops.flash_attention import flash_attention
                G = H // KV
                k_rep = jnp.repeat(k_l[:, :S], G, axis=2)  # [B, S, H, hd]
                v_rep = jnp.repeat(v_l[:, :S], G, axis=2)
                ctx = flash_attention(q, k_rep, v_rep, attn_valid[:, :S],
                                      causal=True,
                                      window=cfg.sliding_window
                                      ).reshape(B, S, D)
        else:
            ctx = _attention(q, k_l, v_l, mask_bias).reshape(B, S, D)
        h = h + _linear(lp["o"], ctx)

        x = _rms_norm(h, lp["ln2"], cfg.rms_eps)
        gate = jax.nn.silu(_linear(lp["gate"], x))
        up = _linear(lp["up"], x)
        h = h + _linear(lp["down"], gate * up)
        return h, (k_l, v_l)

    h, (k_new, v_new) = jax.lax.scan(
        block, embeds, (params["layers"], cache.k, cache.v))
    h = _rms_norm(h, params["final_ln"], cfg.rms_eps)
    new_cache = KVCache(k=k_new, v=v_new, length=start + S)
    return h, new_cache


def embed_tokens(params, input_ids):
    return params["embedding"][input_ids]


def lm_logits(params, hidden, cfg: Qwen2Config):
    if "lm_head_q" in params:
        y = hidden @ params["lm_head_q"].T.astype(hidden.dtype)
        return (y.astype(jnp.float32) * params["lm_head_scale"])
    w = params["embedding"] if cfg.tie_word_embeddings else params["lm_head"]
    return (hidden @ w.T.astype(hidden.dtype)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Greedy decode
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "max_new_tokens"),
         donate_argnames=("cache",))
def greedy_decode(params, prompt_embeds, prompt_valid, cache: KVCache,
                  cfg: Qwen2Config, max_new_tokens: int,
                  eos_token_id: int | None = None,
                  prompt_rope_cos_sin: tuple | None = None,
                  decode_pos_start=None):
    """Greedy generation (reference GenerationConfig do_sample=False,
    tspo_trainer.py:310-319).

    prompt_embeds: [1, S, D] (right-padded); prompt_valid: [1, S] bool.
    ``prompt_rope_cos_sin`` enables multimodal rope prefill (Qwen2.5-VL);
    ``decode_pos_start`` sets the first decode rope position (mrope delta —
    max prompt position + 1), defaulting to the valid prompt length.
    Returns (tokens [max_new_tokens] int32, n_valid) — tokens after the first
    EOS are padded with EOS.
    """
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    B, S, D = prompt_embeds.shape
    T = cache.k.shape[2]
    # per-row valid prompt lengths: rows may carry RAGGED right-padded
    # prompts (cross-sample rollout batching, mixed-question serving); each
    # row's decode rope positions continue from its own length while cache
    # slots stay row-aligned at [S, S+i] with padding masked by attn_valid
    n_prompt = jnp.sum(prompt_valid.astype(jnp.int32), axis=1)       # [B]
    pos0 = n_prompt if decode_pos_start is None else \
        jnp.broadcast_to(jnp.asarray(decode_pos_start), (B,))

    # Prefill. Key validity over the whole cache window: prompt positions
    # use prompt_valid; future positions are enabled as they are written.
    attn_valid = jnp.zeros((B, T), bool).at[:, :S].set(prompt_valid)
    positions = jnp.arange(S)
    hidden, cache = qwen2_forward(params, prompt_embeds, cache, positions,
                                  attn_valid, cfg,
                                  rope_cos_sin=prompt_rope_cos_sin)
    # Last *valid* prompt token predicts the first output token.
    last_h = hidden[jnp.arange(B), n_prompt - 1]
    first_tok = jnp.argmax(lm_logits(params, last_h, cfg), axis=-1)  # [B]

    # The cache was written at [0, S); decode appends at S, S+1, ... but
    # rope positions follow pos0[b] + i PER ROW (decode positions are 1D:
    # equal t/h/w make mrope collapse to standard rope).  B > 1 supports
    # both the equal-prompt rollout case (G generations of one question,
    # tspo_trainer.py:508-537) and RAGGED right-padded prompts (cross-sample
    # G x B rollout batching, mixed-question serving): padding slots are
    # masked keys, and each row's logical position continues from its own
    # valid length.
    def cond(state):
        i, tok, cache, out, done = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, tok, cache, out, done = state
        out = out.at[:, i].set(jnp.where(done, eos, tok))
        done = done | (tok == eos)
        emb = embed_tokens(params, tok)[:, None, :].astype(prompt_embeds.dtype)
        pos = (pos0 + i)[:, None]                         # [B, 1] per-row
        av = (jnp.arange(T)[None, :] < cache.length + 1) & \
             jnp.concatenate([prompt_valid,
                              jnp.ones((B, T - S), bool)], axis=1)
        h, cache = qwen2_forward(params, emb, cache, pos, av, cfg)
        nxt = jnp.argmax(lm_logits(params, h[:, -1], cfg), axis=-1)
        return i + 1, nxt, cache, out, done

    out = jnp.full((B, max_new_tokens), eos, jnp.int32)
    state = (jnp.int32(0), first_tok.astype(jnp.int32), cache, out,
             jnp.zeros((B,), bool))
    i, tok, cache, out, done = jax.lax.while_loop(cond, body, state)
    if B == 1:
        return out[0], i
    return out, i


# ---------------------------------------------------------------------------
# Sampled decode (temperature / nucleus top-p)
# ---------------------------------------------------------------------------

def sample_token(logits, key, temperature, top_p):
    """Nucleus sampling over [B, V] fp32 logits: temperature-scale, keep the
    smallest prefix of descending-probability tokens whose mass reaches
    ``top_p`` (the top-1 token always survives), sample from the renorm.

    temperature/top_p are traced scalars — one compiled program serves every
    setting.  temperature -> 0 converges to argmax (greedy); callers wanting
    exact do_sample=False semantics should use the greedy functions instead
    (HF GenerationConfig routes the same way)."""
    scaled = logits / jnp.maximum(temperature, 1e-6)
    order = jnp.argsort(scaled, axis=-1)[..., ::-1]           # desc
    sorted_logits = jnp.take_along_axis(scaled, order, axis=-1)
    sorted_p = jax.nn.softmax(sorted_logits, axis=-1)
    prefix_mass = jnp.cumsum(sorted_p, axis=-1) - sorted_p    # exclusive
    keep = prefix_mass < top_p                                # top-1 always
    masked = jnp.where(keep, sorted_logits, -jnp.inf)
    choice = jax.random.categorical(key, masked, axis=-1)     # [B]
    return jnp.take_along_axis(order, choice[..., None],
                               axis=-1)[..., 0].astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens"),
         donate_argnames=("cache",))
def sample_decode(params, prompt_embeds, prompt_valid, cache: KVCache,
                  cfg: Qwen2Config, max_new_tokens: int, key,
                  temperature, top_p, eos_token_id: int | None = None,
                  prompt_rope_cos_sin: tuple | None = None,
                  decode_pos_start=None):
    """Sampled generation — :func:`greedy_decode`'s loop with the argmax
    replaced by :func:`sample_token` and a PRNG key threaded through the
    carry (one split per step; same stream for every row of a batch step,
    distinct draws per row via the [B, V] categorical).  Mirrors the
    reference backbone's ``do_sample=True, temperature=...`` generate
    surface (llava_vid.py:515-516 routes temperature > 0 here); the video
    benchmarks all pin temperature 0, so the greedy paths stay the
    production default."""
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    B, S, D = prompt_embeds.shape
    T = cache.k.shape[2]
    n_prompt = jnp.sum(prompt_valid.astype(jnp.int32), axis=1)
    pos0 = n_prompt if decode_pos_start is None else \
        jnp.broadcast_to(jnp.asarray(decode_pos_start), (B,))
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)

    attn_valid = jnp.zeros((B, T), bool).at[:, :S].set(prompt_valid)
    positions = jnp.arange(S)
    hidden, cache = qwen2_forward(params, prompt_embeds, cache, positions,
                                  attn_valid, cfg,
                                  rope_cos_sin=prompt_rope_cos_sin)
    last_h = hidden[jnp.arange(B), n_prompt - 1]
    key, sub = jax.random.split(key)
    first_tok = sample_token(lm_logits(params, last_h, cfg), sub,
                             temperature, top_p)

    def cond(state):
        i, tok, cache, out, done, key = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, tok, cache, out, done, key = state
        out = out.at[:, i].set(jnp.where(done, eos, tok))
        done = done | (tok == eos)
        emb = embed_tokens(params, tok)[:, None, :].astype(prompt_embeds.dtype)
        pos = (pos0 + i)[:, None]
        av = (jnp.arange(T)[None, :] < cache.length + 1) & \
             jnp.concatenate([prompt_valid,
                              jnp.ones((B, T - S), bool)], axis=1)
        h, cache = qwen2_forward(params, emb, cache, pos, av, cfg)
        key, sub = jax.random.split(key)
        nxt = sample_token(lm_logits(params, h[:, -1], cfg), sub,
                           temperature, top_p)
        return i + 1, nxt, cache, out, done, key

    out = jnp.full((B, max_new_tokens), eos, jnp.int32)
    state = (jnp.int32(0), first_tok, cache, out, jnp.zeros((B,), bool), key)
    i, tok, cache, out, done, key = jax.lax.while_loop(cond, body, state)
    if B == 1:
        return out[0], i
    return out, i


# ---------------------------------------------------------------------------
# Chunked streaming decode (token-exact vs greedy_decode)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def decode_prefill(params, prompt_embeds, prompt_valid, cache: KVCache,
                   cfg: Qwen2Config, prompt_rope_cos_sin: tuple | None = None,
                   decode_pos_start=None):
    """The prefill half of :func:`greedy_decode`, split out so decode can
    proceed in host-visible chunks (streaming).  Returns
    (first_tok [B] int32, cache, pos0 [B])."""
    B, S, _ = prompt_embeds.shape
    T = cache.k.shape[2]
    n_prompt = jnp.sum(prompt_valid.astype(jnp.int32), axis=1)
    pos0 = n_prompt if decode_pos_start is None else \
        jnp.broadcast_to(jnp.asarray(decode_pos_start), (B,))
    attn_valid = jnp.zeros((B, T), bool).at[:, :S].set(prompt_valid)
    hidden, cache = qwen2_forward(params, prompt_embeds, cache,
                                  jnp.arange(S), attn_valid, cfg,
                                  rope_cos_sin=prompt_rope_cos_sin)
    last_h = hidden[jnp.arange(B), n_prompt - 1]
    first_tok = jnp.argmax(lm_logits(params, last_h, cfg),
                           axis=-1).astype(jnp.int32)
    return first_tok, cache, pos0


@partial(jax.jit, static_argnames=("cfg", "chunk"),
         donate_argnames=("cache",))
def decode_chunk(params, tok, cache: KVCache, pos0, i0, prompt_valid, done,
                 cfg: Qwen2Config, chunk: int, eos):
    """``chunk`` greedy decode steps continuing from (tok, cache) — the
    loop body is step-for-step :func:`greedy_decode`'s, so concatenated
    chunks are token-exact vs the fused while_loop (pinned by
    tests/test_qwen2.py::test_stream_matches_greedy).  ``i0`` is the global
    decode step of ``tok``; rows already ``done`` keep emitting eos."""
    B = tok.shape[0]
    T = cache.k.shape[2]
    S = prompt_valid.shape[1]
    dtype = cache.k.dtype

    def body(j, state):
        tok, cache, out, done = state
        out = out.at[:, j].set(jnp.where(done, eos, tok))
        done = done | (tok == eos)
        emb = embed_tokens(params, tok)[:, None, :].astype(dtype)
        pos = (pos0 + i0 + j)[:, None]
        av = (jnp.arange(T)[None, :] < cache.length + 1) & \
            jnp.concatenate([prompt_valid,
                             jnp.ones((B, T - S), bool)], axis=1)
        h, cache = qwen2_forward(params, emb, cache, pos, av, cfg)
        nxt = jnp.argmax(lm_logits(params, h[:, -1], cfg),
                         axis=-1).astype(jnp.int32)
        return nxt, cache, out, done

    out = jnp.full((B, chunk), eos, jnp.int32)
    tok, cache, out, done = jax.lax.fori_loop(
        0, chunk, body, (tok, cache, out, done))
    return out, tok, cache, done


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def prefill_extend(params, embeds, valid_len, cache: KVCache,
                   cfg: Qwen2Config, rope_cos_sin: tuple | None = None):
    """Append a prompt-suffix chunk after an already-prefilled cache — the
    incremental half of conversation prefix reuse and of chunked engine
    admission (only the new tokens need a forward pass).

    embeds [1, S, D] right-padded, first ``valid_len`` real; appended at
    [cache.length, cache.length + S) with rope positions continuing from
    cache.length (or from ``rope_cos_sin`` tables for mrope prompts).  The
    cache below cache.length must be hole-free (every slot real).  Pads are
    masked as keys and their garbage K/V slots are reclaimed by the caller
    rewinding cache.length to ``cache.length + valid_len`` (the next append
    overwrites them).  Attention: the Pallas suffix flash (q_offset) on
    TPU for blocks >= 512; dense otherwise (the pure-JAX flash has no
    offset form).  Returns (last_tok [B], cache) where last_tok is the
    greedy next token after the final REAL suffix position."""
    B, S, _ = embeds.shape
    T = cache.k.shape[2]
    start = cache.length
    attn_valid = jnp.arange(T)[None, :] < start + valid_len
    tpu = jax.default_backend() == "tpu"
    hidden, cache = qwen2_forward(params, embeds, cache,
                                  start + jnp.arange(S), attn_valid, cfg,
                                  rope_cos_sin=rope_cos_sin,
                                  flash_threshold=512 if tpu else 10**9,
                                  flash_q_offset=start if tpu else None)
    last = hidden[jnp.arange(B), valid_len - 1]
    tok = jnp.argmax(lm_logits(params, last, cfg), axis=-1).astype(jnp.int32)
    return tok, cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def prefill_extend_sampled(params, embeds, valid_len, cache: KVCache,
                           cfg: Qwen2Config, key, temperature, top_p,
                           rope_cos_sin: tuple | None = None):
    """:func:`prefill_extend` with a SAMPLED last token: identical forward
    pass, but the token after the final real suffix position is drawn via
    :func:`sample_token` with one key split first — the same key-split
    order as :func:`sample_prefill`, so an extension-prefilled sampled
    request (engine prefix-cache hit) reproduces its solo
    :func:`sample_decode` chain exactly.  Returns (tok [B], cache, key)."""
    B, S, _ = embeds.shape
    T = cache.k.shape[2]
    start = cache.length
    attn_valid = jnp.arange(T)[None, :] < start + valid_len
    tpu = jax.default_backend() == "tpu"
    hidden, cache = qwen2_forward(params, embeds, cache,
                                  start + jnp.arange(S), attn_valid, cfg,
                                  rope_cos_sin=rope_cos_sin,
                                  flash_threshold=512 if tpu else 10**9,
                                  flash_q_offset=start if tpu else None)
    last = hidden[jnp.arange(B), valid_len - 1]
    key, sub = jax.random.split(key)
    tok = sample_token(lm_logits(params, last, cfg), sub,
                       jnp.asarray(temperature, jnp.float32),
                       jnp.asarray(top_p, jnp.float32))
    return tok, cache, key


def greedy_decode_continue(params, first_tok, cache: KVCache,
                           cfg: Qwen2Config, max_new_tokens: int,
                           eos_token_id: int | None = None, chunk: int = 32,
                           decode_pos_start=None):
    """Greedy decode continuing from a hole-free prefilled cache (every slot
    below cache.length real — the conversation-reuse invariant).  Reuses
    :func:`decode_chunk` with an all-ones width-1 prompt mask: validity
    reduces to ``slot < cache.length + 1``, so ONE compiled program serves
    every conversation length at a given cache capacity.  Returns
    (tokens np[<= max_new] eos-trimmed, cache) — the final chunk may run
    garbage steps past eos; the caller rewinds cache.length over them."""
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    T = cache.k.shape[2]
    L = int(cache.length)
    n_chunks = -(-max_new_tokens // chunk)
    if L + n_chunks * chunk > T:
        raise ValueError(
            f"conversation cache needs >= {L + n_chunks * chunk} slots "
            f"(L={L} + {n_chunks}x{chunk}), got {T}")
    tok = jnp.asarray(first_tok, jnp.int32).reshape(1)
    pv = jnp.ones((1, 1), bool)
    # decode_pos_start: rope position of the first decoded token when it
    # differs from the cache index (Qwen2.5-VL mrope: video tokens
    # compress the position space) — None keeps the standard pos == index
    pos0 = jnp.full((1,), L if decode_pos_start is None
                    else int(decode_pos_start), jnp.int32)
    done = jnp.zeros((1,), bool)
    outs = []
    for c in range(n_chunks):
        out, tok, cache, done = decode_chunk(
            params, tok, cache, pos0, jnp.int32(c * chunk), pv, done,
            cfg, chunk, jnp.int32(eos))
        outs.append(np.asarray(out)[0])
        if bool(np.asarray(done)[0]):
            break
    toks = (np.concatenate(outs)[:max_new_tokens] if outs
            else np.zeros(0, np.int32))
    if eos in toks:
        toks = toks[: int(np.argmax(toks == eos))]
    return toks, cache


def greedy_decode_continue_stream(params, first_tok, cache: KVCache,
                                  cfg: Qwen2Config, max_new_tokens: int,
                                  eos_token_id: int | None = None,
                                  chunk: int = 8, final: dict | None = None,
                                  decode_pos_start=None):
    """Generator variant of :func:`greedy_decode_continue`: yields np.int32
    [1, <=chunk] blocks of fresh tokens as they land (eos-padded past the
    answer like :func:`greedy_decode_stream`, so :func:`stream_detokenize`
    consumes them directly), token-exact vs the non-stream function — the
    streaming side of conversation prefix-KV reuse.

    When ``final`` (a dict) is given it is filled with
    ``{"tokens": eos-trimmed np array, "cache": cache}`` once the generator
    is exhausted — the conversation state-commit needs both, and a consumer
    abandoning the stream early simply never commits (the caller's state
    stays checked-out/reset, the contract generate_multi_round_stream
    documents)."""
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    T = cache.k.shape[2]
    L = int(cache.length)
    n_chunks = -(-max_new_tokens // chunk)
    if L + n_chunks * chunk > T:
        raise ValueError(
            f"conversation cache needs >= {L + n_chunks * chunk} slots "
            f"(L={L} + {n_chunks}x{chunk}), got {T}")
    tok = jnp.asarray(first_tok, jnp.int32).reshape(1)
    pv = jnp.ones((1, 1), bool)
    pos0 = jnp.full((1,), L if decode_pos_start is None
                    else int(decode_pos_start), jnp.int32)
    done = jnp.zeros((1,), bool)
    outs = []
    for c in range(n_chunks):
        out, tok, cache, done = decode_chunk(
            params, tok, cache, pos0, jnp.int32(c * chunk), pv, done,
            cfg, chunk, jnp.int32(eos))
        n = min(chunk, max_new_tokens - c * chunk)
        blk = np.asarray(out)[:, :n]
        outs.append(blk[0])
        yield blk
        if bool(np.asarray(done)[0]):
            break
    toks = np.concatenate(outs) if outs else np.zeros(0, np.int32)
    if eos in toks:
        toks = toks[: int(np.argmax(toks == eos))]
    if final is not None:
        final["tokens"] = toks
        final["cache"] = cache


def greedy_decode_stream(params, prompt_embeds, prompt_valid, cache: KVCache,
                         cfg: Qwen2Config, max_new_tokens: int,
                         eos_token_id: int | None = None, chunk: int = 8,
                         prompt_rope_cos_sin: tuple | None = None,
                         decode_pos_start=None):
    """Generator over greedy decode: yields np.int32 [B, <=chunk] blocks of
    fresh tokens as they land, token-exact vs :func:`greedy_decode` (same
    eos-padding semantics).  The chip runs ``chunk`` fused steps per host
    round-trip, so throughput approaches the fused loop's while time-to-
    first-token drops to prefill + one chunk.

    The cache must have >= S + ceil(max_new_tokens/chunk)*chunk slots: the
    final chunk always executes ``chunk`` steps (one compiled program for
    every chunk) and trims host-side."""
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    S = prompt_embeds.shape[1]
    n_chunks = -(-max_new_tokens // chunk)
    if cache.k.shape[2] < S + n_chunks * chunk:
        raise ValueError(
            f"stream cache needs >= {S + n_chunks * chunk} slots "
            f"(S={S} + {n_chunks}x{chunk}), got {cache.k.shape[2]}")
    tok, cache, pos0 = decode_prefill(
        params, prompt_embeds, prompt_valid, cache, cfg,
        prompt_rope_cos_sin=prompt_rope_cos_sin,
        decode_pos_start=decode_pos_start)
    B = tok.shape[0]
    done = jnp.zeros((B,), bool)
    for c in range(n_chunks):
        if bool(jnp.all(done)):
            return
        out, tok, cache, done = decode_chunk(
            params, tok, cache, pos0, jnp.int32(c * chunk), prompt_valid,
            done, cfg, chunk, jnp.int32(eos))
        n = min(chunk, max_new_tokens - c * chunk)
        yield np.asarray(out)[:, :n]


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def sample_prefill(params, prompt_embeds, prompt_valid, cache: KVCache,
                   cfg: Qwen2Config, key, temperature, top_p,
                   prompt_rope_cos_sin: tuple | None = None,
                   decode_pos_start=None):
    """The prefill half of :func:`sample_decode`, split out for streaming:
    identical forward pass to :func:`decode_prefill` but the first token is
    drawn with :func:`sample_token`.  One key split per emitted token, same
    order as the fused loop, so a streamed decode from the same seed is
    token-exact vs :func:`sample_decode`.  Returns
    (first_tok [B], cache, pos0 [B], key)."""
    B, S, _ = prompt_embeds.shape
    T = cache.k.shape[2]
    n_prompt = jnp.sum(prompt_valid.astype(jnp.int32), axis=1)
    pos0 = n_prompt if decode_pos_start is None else \
        jnp.broadcast_to(jnp.asarray(decode_pos_start), (B,))
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    attn_valid = jnp.zeros((B, T), bool).at[:, :S].set(prompt_valid)
    hidden, cache = qwen2_forward(params, prompt_embeds, cache,
                                  jnp.arange(S), attn_valid, cfg,
                                  rope_cos_sin=prompt_rope_cos_sin)
    last_h = hidden[jnp.arange(B), n_prompt - 1]
    key, sub = jax.random.split(key)
    first_tok = sample_token(lm_logits(params, last_h, cfg), sub,
                             temperature, top_p)
    return first_tok, cache, pos0, key


@partial(jax.jit, static_argnames=("cfg", "chunk"),
         donate_argnames=("cache",))
def sample_chunk(params, tok, cache: KVCache, pos0, i0, prompt_valid, done,
                 key, cfg: Qwen2Config, chunk: int, eos, temperature, top_p):
    """``chunk`` sampled decode steps — :func:`decode_chunk` with the argmax
    replaced by :func:`sample_token` and the PRNG key in the carry (one
    split per step, matching :func:`sample_decode`'s body so concatenated
    chunks reproduce the fused loop token-for-token at equal seed)."""
    B = tok.shape[0]
    T = cache.k.shape[2]
    S = prompt_valid.shape[1]
    dtype = cache.k.dtype
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)

    def body(j, state):
        tok, cache, out, done, key = state
        out = out.at[:, j].set(jnp.where(done, eos, tok))
        done = done | (tok == eos)
        emb = embed_tokens(params, tok)[:, None, :].astype(dtype)
        pos = (pos0 + i0 + j)[:, None]
        av = (jnp.arange(T)[None, :] < cache.length + 1) & \
            jnp.concatenate([prompt_valid,
                             jnp.ones((B, T - S), bool)], axis=1)
        h, cache = qwen2_forward(params, emb, cache, pos, av, cfg)
        key, sub = jax.random.split(key)
        nxt = sample_token(lm_logits(params, h[:, -1], cfg), sub,
                           temperature, top_p)
        return nxt, cache, out, done, key

    out = jnp.full((B, chunk), eos, jnp.int32)
    tok, cache, out, done, key = jax.lax.fori_loop(
        0, chunk, body, (tok, cache, out, done, key))
    return out, tok, cache, done, key


def sample_decode_stream(params, prompt_embeds, prompt_valid, cache: KVCache,
                         cfg: Qwen2Config, max_new_tokens: int, key,
                         temperature, top_p, eos_token_id: int | None = None,
                         chunk: int = 8,
                         prompt_rope_cos_sin: tuple | None = None,
                         decode_pos_start=None):
    """Generator over sampled decode: yields np.int32 [B, <=chunk] blocks,
    token-exact vs :func:`sample_decode` at the same key/temperature/top_p
    (pinned by tests/test_qwen2.py::test_sample_stream_matches_fused) —
    the streaming side of the OpenAI ``stream: true, temperature > 0``
    surface.  Same cache-capacity contract as :func:`greedy_decode_stream`."""
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    S = prompt_embeds.shape[1]
    n_chunks = -(-max_new_tokens // chunk)
    if cache.k.shape[2] < S + n_chunks * chunk:
        raise ValueError(
            f"stream cache needs >= {S + n_chunks * chunk} slots "
            f"(S={S} + {n_chunks}x{chunk}), got {cache.k.shape[2]}")
    tok, cache, pos0, key = sample_prefill(
        params, prompt_embeds, prompt_valid, cache, cfg, key,
        temperature, top_p, prompt_rope_cos_sin=prompt_rope_cos_sin,
        decode_pos_start=decode_pos_start)
    B = tok.shape[0]
    done = jnp.zeros((B,), bool)
    for c in range(n_chunks):
        if bool(jnp.all(done)):
            return
        out, tok, cache, done, key = sample_chunk(
            params, tok, cache, pos0, jnp.int32(c * chunk), prompt_valid,
            done, key, cfg, chunk, jnp.int32(eos), temperature, top_p)
        n = min(chunk, max_new_tokens - c * chunk)
        yield np.asarray(out)[:, :n]


def stream_detokenize(blocks, decode, eos_id: int):
    """Turn a :func:`greedy_decode_stream` block iterator into TEXT DELTAS
    whose concatenation equals decoding the full token sequence at once —
    the shared state machine behind every backbone's ``generate_stream``.

    Detokenization is prefix-based: each block decodes the full emitted
    prefix and yields the new suffix, so BPE merges across chunk boundaries
    render correctly.  A trailing U+FFFD is held back — a multibyte
    character whose byte-level BPE tokens straddle the chunk boundary
    decodes as the replacement char NOW but completes next chunk, and the
    prefix-slice never re-sends emitted text — then a genuinely-invalid
    tail is flushed as-is at end of stream.  An all-eos block after any
    real token ends the stream (eos-padding semantics of the chunked
    decode)."""
    toks: list = []
    sent = ""
    text = ""
    for block in blocks:
        fresh = [int(t) for t in block[0] if int(t) != eos_id]
        if not fresh and toks:
            break               # eos padding only: stream is done
        toks.extend(fresh)
        text = decode(toks)
        stable = text
        while stable and stable[-1] == "�":
            stable = stable[:-1]
        if len(stable) > len(sent):
            yield stable[len(sent):]
            sent = stable
    if len(text) > len(sent):   # flush a genuinely-invalid tail as-is
        yield text[len(sent):]


# ---------------------------------------------------------------------------
# Prompt-lookup speculative decode (B=1, exact greedy)
# ---------------------------------------------------------------------------

def build_spec_lookup(text_ids):
    """Pad a prompt's text token ids into the lookup corpus for
    :func:`greedy_decode_speculative` — bucketed to 128 multiples so repeated
    calls with nearby prompt lengths share one compiled program.  ``text_ids``
    is the prompt's id sequence with media sentinels already filtered out.
    Returns (lookup_ids [Lb] int32, lookup_valid [Lb] bool)."""
    lk = np.asarray(list(text_ids), np.int32)
    Lb = max(128, -(-len(lk) // 128) * 128)
    lookup = np.zeros(Lb, np.int32)
    lookup[: len(lk)] = lk
    lvalid = np.arange(Lb) < len(lk)
    return jnp.asarray(lookup), jnp.asarray(lvalid)


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "draft_len"),
         donate_argnames=("cache",))
def greedy_decode_speculative(params, prompt_embeds, prompt_valid,
                              cache: KVCache, cfg: Qwen2Config,
                              max_new_tokens: int,
                              lookup_ids, lookup_valid,
                              eos_token_id: int | None = None,
                              draft_len: int = 8,
                              prompt_rope_cos_sin: tuple | None = None,
                              decode_pos_start=None):
    """Greedy decode with prompt-lookup speculation — exact same tokens as
    :func:`greedy_decode`, fewer weight passes.

    Single-row decode is weight-read-bound (docs/KERNELS.md: 95% of the HBM
    roofline), so the only remaining lever is emitting >1 token per weight
    pass.  Drafts are checkpoint-free: the most recent 2-gram match of the
    last two emitted tokens inside [``lookup_ids`` ++ generated-so-far]
    proposes the following ``draft_len`` tokens (answers to multiple-choice
    video questions largely restate option text from the prompt), and ONE
    forward over [current, draft_1..draft_d] verifies them — the longest
    prefix whose argmax agrees is accepted, so the output is greedy-exact by
    construction (token-for-token test vs greedy_decode).  Rejected draft
    positions are rewound by resetting ``cache.length``; their stale k/v
    slots are overwritten by the next verify block before ever becoming
    attendable.

    lookup_ids/lookup_valid: [L] int32 / bool — the prompt's TEXT token ids
    (the vision span has no ids; the question+options text is where answer
    tokens come from).  B must be 1 (per-question answering; batched rollout
    decode already amortizes weight reads across rows).  The cache must hold
    S + max_new_tokens + draft_len positions (the guard below).

    Returns (tokens [max_new_tokens], n_valid, n_forward_passes).
    """
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    B, S, D = prompt_embeds.shape
    if B != 1:
        raise ValueError("speculative decode is single-row (B=1)")
    T = cache.k.shape[2]
    d = draft_len
    if T < S + max_new_tokens + d:
        # the verify block writes d+1 kv slots at the running length; a
        # too-small cache would CLAMP the dynamic_update_slice offset and
        # silently corrupt earlier slots (all operands are static: fail now)
        raise ValueError(
            f"cache too small for speculation: need >= S+max_new+draft_len "
            f"= {S + max_new_tokens + d}, got {T}")
    n_prompt = jnp.sum(prompt_valid.astype(jnp.int32), axis=1)        # [1]
    # mrope prefill (Qwen2.5-VL): decode positions are 1-D from the mrope
    # delta, same convention as greedy_decode's decode_pos_start
    pos0 = n_prompt[0] if decode_pos_start is None else \
        jnp.asarray(decode_pos_start)

    attn_valid = jnp.zeros((B, T), bool).at[:, :S].set(prompt_valid)
    hidden, cache = qwen2_forward(params, prompt_embeds, cache,
                                  jnp.arange(S), attn_valid, cfg,
                                  rope_cos_sin=prompt_rope_cos_sin)
    last_h = hidden[0, n_prompt[0] - 1]
    first_tok = jnp.argmax(lm_logits(params, last_h[None], cfg),
                           axis=-1)[0].astype(jnp.int32)

    Lp = lookup_ids.shape[0]
    OUT = max_new_tokens + d + 2                  # slack: block writes never clamp
    lookup_ids = lookup_ids.astype(jnp.int32)
    lv_idx = jnp.max(jnp.where(lookup_valid, jnp.arange(Lp), -1))
    prev0 = jnp.where(lv_idx >= 0, lookup_ids[jnp.maximum(lv_idx, 0)], -1)

    key_valid_tail = jnp.concatenate(
        [prompt_valid, jnp.ones((B, T - S), bool)], axis=1)           # [1, T]

    def cond(state):
        i, tok, cache, out, done, nf = state
        return (i < max_new_tokens) & ~done

    def body(state):
        i, tok, cache, out, done, nf = state
        # ---- draft: most recent (prev, tok) 2-gram in lookup ++ out[:i] ----
        hist = jnp.concatenate([lookup_ids, out])                     # [H]
        hvalid = jnp.concatenate([lookup_valid, jnp.arange(OUT) < i])
        H = Lp + OUT
        prev = jnp.where(i > 0, out[jnp.maximum(i - 1, 0)], prev0)
        p = jnp.arange(H - 1)
        m = hvalid[:-1] & hvalid[1:] & (hist[:-1] == prev) & (hist[1:] == tok)
        p_best = jnp.max(jnp.where(m, p, -1))
        found = p_best >= 0
        didx = jnp.clip(p_best + 2 + jnp.arange(d), 0, H - 1)
        drafts = jnp.where(found & (p_best + 2 + jnp.arange(d) < H)
                           & hvalid[didx], hist[didx], eos)           # [d]

        # ---- one verify forward over [tok, drafts] ----
        emb = jnp.concatenate(
            [embed_tokens(params, tok[None]),
             embed_tokens(params, drafts)], axis=0)[None]             # [1, d+1, D]
        emb = emb.astype(prompt_embeds.dtype)
        pos = pos0 + i + jnp.arange(d + 1)
        av = (jnp.arange(T)[None, :] < cache.length + (d + 1)) & key_valid_tail
        h, cache2 = qwen2_forward(params, emb, cache, pos, av, cfg)
        nxt = jnp.argmax(lm_logits(params, h[0], cfg),
                         axis=-1).astype(jnp.int32)                   # [d+1]

        # ---- emit tok + the longest agreeing draft prefix ----
        # nxt[j] = model's token after consuming position j (0=tok, j=D_j);
        # accepted drafts D_1..D_a (D_j == nxt[j-1]) ARE the next outputs,
        # and the following round's tok is nxt[a] (not yet written).
        ok = (drafts == nxt[:-1]).astype(jnp.int32)                   # [d]
        acc = jnp.cumprod(ok)                                         # prefix
        done_tok = done | (tok == eos)
        is_eos_d = drafts == eos
        pre_eos = jnp.cumsum(is_eos_d.astype(jnp.int32)) - is_eos_d
        take = (acc == 1) & (pre_eos == 0) & ~done_tok                # [d]
        a_eff = jnp.sum(take.astype(jnp.int32))

        blk = jnp.concatenate([jnp.where(done, eos, tok)[None],
                               jnp.where(take, drafts, eos)])         # [d+1]
        out = jax.lax.dynamic_update_slice(out, blk, (i,))
        done2 = done_tok | jnp.any(take & is_eos_d)
        tok_next = jnp.where(done2, tok, nxt[a_eff])
        cache2 = cache2._replace(length=cache.length + 1 + a_eff)
        return i + 1 + a_eff, tok_next, cache2, out, done2, nf + 1

    out = jnp.full((OUT,), eos, jnp.int32)
    state = (jnp.int32(0), first_tok, cache, out, jnp.zeros((), bool),
             jnp.int32(0))
    i, tok, cache, out, done, n_fwd = jax.lax.while_loop(cond, body, state)
    return out[:max_new_tokens], jnp.minimum(i, max_new_tokens), n_fwd


# ---------------------------------------------------------------------------
# Weight port / init / sharding
# ---------------------------------------------------------------------------

def qwen2_params_from_torch(model_or_sd, cfg: Qwen2Config,
                            dtype=jnp.bfloat16, prefix: str = "model.") -> dict:
    """Port an HF ``Qwen2ForCausalLM`` state dict.  ``prefix`` handles nesting
    (e.g. LLaVA checkpoints keep the LM under ``model.``)."""
    sd = state_dict_of(model_or_sd)
    L = cfg.num_layers
    f = prefix + "layers.{i}"

    def lin(fmt, bias):
        out = {"kernel": stack_layers(sd, L, fmt + ".weight").transpose(0, 2, 1)}
        if bias:
            out["bias"] = stack_layers(sd, L, fmt + ".bias")
        return out

    params = {
        "embedding": sd[prefix + "embed_tokens.weight"],
        "layers": {
            "ln1": stack_layers(sd, L, f + ".input_layernorm.weight"),
            "ln2": stack_layers(sd, L, f + ".post_attention_layernorm.weight"),
            "q": lin(f + ".self_attn.q_proj", cfg.qkv_bias),
            "k": lin(f + ".self_attn.k_proj", cfg.qkv_bias),
            "v": lin(f + ".self_attn.v_proj", cfg.qkv_bias),
            "o": lin(f + ".self_attn.o_proj", False),
            "gate": lin(f + ".mlp.gate_proj", False),
            "up": lin(f + ".mlp.up_proj", False),
            "down": lin(f + ".mlp.down_proj", False),
        },
        "final_ln": sd[prefix + "norm.weight"],
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = sd["lm_head.weight"]
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)


def init_qwen2_params(rng, cfg: Qwen2Config, dtype=jnp.bfloat16) -> dict:
    keys = iter(jax.random.split(rng, 16))
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    qd, kvd = cfg.num_heads * cfg.head_dim, cfg.num_kv_heads * cfg.head_dim

    def lin(n, fi, fo, bias):
        out = {"kernel": jax.random.normal(next(keys), (n, fi, fo), dtype) * 0.02}
        if bias:
            out["bias"] = jnp.zeros((n, fo), dtype)
        return out

    params = {
        "embedding": jax.random.normal(next(keys), (cfg.vocab_size, D), dtype) * 0.02,
        "layers": {
            "ln1": jnp.ones((L, D), dtype), "ln2": jnp.ones((L, D), dtype),
            "q": lin(L, D, qd, cfg.qkv_bias),
            "k": lin(L, D, kvd, cfg.qkv_bias),
            "v": lin(L, D, kvd, cfg.qkv_bias), "o": lin(L, qd, D, False),
            "gate": lin(L, D, I, False), "up": lin(L, D, I, False),
            "down": lin(L, I, D, False),
        },
        "final_ln": jnp.ones(D, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jax.random.normal(next(keys), (cfg.vocab_size, D),
                                              dtype) * 0.02
    return params


def qwen2_param_shardings(params, mesh):
    """Megatron TP specs: q/k/v/gate/up column-sharded, o/down row-sharded,
    embeddings/lm_head vocab-sharded on 'model'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(path):
        keys = [str(getattr(p, "key", p)) for p in path]
        leaf = keys[-1]
        if keys[0] in ("embedding", "lm_head", "lm_head_q"):
            return P("model", None)
        if keys[0] == "lm_head_scale":
            return P("model")
        if "layers" in keys:
            which = keys[1]
            kernel = leaf in ("kernel", "kernel_q")
            if which in ("q", "k", "v", "gate", "up"):
                return P(None, None, "model") if kernel else P(None, "model")
            if which in ("o", "down"):
                # bias/scale of row-sharded GEMMs stay replicated (applied
                # after the psum)
                return P(None, "model", None) if kernel else P()
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path)), params)
