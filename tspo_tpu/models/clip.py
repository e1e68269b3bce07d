"""CLIP-ViT-L/14 text + vision towers, rebuilt for TPU.

Replaces the reference's HF ``CLIPModel`` usage (model/temporal_agent.py:146-169,
tspo_trainer.py:349-362): ``get_image_features`` over every 1-fps candidate
frame is the throughput wall of both training and precompute (SURVEY.md §3.3),
so this implementation is built to keep the MXU saturated:

  - transformer layers are weight-stacked and iterated with ``lax.scan`` —
    one compiled block regardless of depth, fast compiles, clean pipelining;
  - patch embedding is an unfolded matmul (not a conv) — one big MXU GEMM;
  - image preprocessing (resize/center-crop/normalize) runs **on device** over
    the whole frame batch, replacing the reference's per-frame PIL loop
    (temporal_agent.py:156-164);
  - bf16 params/activations with fp32 layernorm + attention softmax.

Weight layout matches ``openai/clip-vit-large-patch14``; ``clip_params_from_torch``
ports an HF checkpoint (or any state dict) directly.
"""

from __future__ import annotations

from functools import partial
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CLIPConfig, CLIPTextConfig, CLIPVisionConfig
from ..utils.hf_port import state_dict_of, stack_layers

# OpenAI CLIP normalization constants (HF CLIPProcessor defaults).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


# ---------------------------------------------------------------------------
# Core blocks
# ---------------------------------------------------------------------------

def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _mha(x, lp, heads, mask=None, attn_impl: str = "xla"):
    """Standard multi-head attention; [B, S, W] -> [B, S, W].

    ``mask`` is an additive fp32 bias [B, 1, S, S] (or broadcastable).
    ``attn_impl``: maskless callers (the vision tower) may pick
    "pallas"/"auto" to route through ops/vit_attention.py — the fused
    TPU kernel that skips the HBM score materialization (+16% tower
    throughput measured, bench.py)."""
    B, S, W = x.shape
    q = x @ lp["q"]["kernel"] + lp["q"]["bias"]
    k = x @ lp["k"]["kernel"] + lp["k"]["bias"]
    v = x @ lp["v"]["kernel"] + lp["v"]["bias"]
    if mask is None:
        from ..ops.vit_attention import vit_attention
        ctx = vit_attention(q, k, v, heads, impl=attn_impl)
    else:
        hd = W // heads
        qh = q.reshape(B, S, heads, hd)
        kh = k.reshape(B, S, heads, hd)
        vh = v.reshape(B, S, heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (1.0 / np.sqrt(hd))
        scores = scores.astype(jnp.float32) + mask
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, S, W)
    return ctx @ lp["o"]["kernel"] + lp["o"]["bias"]


# How many stacked layers lax.scan unrolls per step.  1 = one compiled
# block (fast compiles).  Benchmarked at the production fused-program shape
# (scripts/bench_scan_unroll.py): unrolling lets XLA fuse the residual add
# of layer i with layer i+1's layernorm, trimming the scan-step fusion
# boundary the attribution ledger attributes ~170 ms/bucket to.
# NOTE: read at TRACE time only — jit caches are keyed on args/statics, not
# module globals, so mutating it after a caller has compiled has no effect
# until that caller's cache is dropped (`jax.clear_caches()`, as
# bench_scan_unroll.py does between sweep points).
SCAN_UNROLL = 1


def _encoder(x, layers_params, heads, eps, mask=None, attn_impl: str = "xla"):
    """lax.scan over weight-stacked transformer layers (pre-LN, QuickGELU)."""

    def block(h, lp):
        r = h
        h = _layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
        h = r + _mha(h, lp["attn"], heads, mask, attn_impl)
        r = h
        h = _layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        h = _quick_gelu(h @ lp["mlp"]["fc1"]["kernel"] + lp["mlp"]["fc1"]["bias"])
        h = h @ lp["mlp"]["fc2"]["kernel"] + lp["mlp"]["fc2"]["bias"]
        return r + h, None

    out, _ = jax.lax.scan(block, x, layers_params, unroll=SCAN_UNROLL)
    return out


# ---------------------------------------------------------------------------
# Towers
# ---------------------------------------------------------------------------

def _cls_only_last_layer(x, lp, heads, eps):
    """Final vision encoder layer evaluated for the class token only.

    The scoring tower consumes ONLY the pooled class token (HF
    ``get_image_features`` = projection of the post-LN CLS state; reference
    temporal_agent.py:151-169), so in the LAST layer the q/o projections,
    attention rows, and MLP of the 256 patch tokens are dead compute —
    ~4% of tower FLOPs plus one full lane-attention dispatch.  K/V still
    cover every token (the CLS query attends to all of them), so this is
    algebraically the full layer's CLS row: same fp32 softmax / fp32
    matmul-accumulate numerics as the lane kernel (ops/vit_attention.py).
    """
    B, S, W = x.shape
    hd = W // heads
    a = lp["attn"]
    h = _layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
    q = h[:, :1] @ a["q"]["kernel"] + a["q"]["bias"]                  # [B, 1, W]
    k = h @ a["k"]["kernel"] + a["k"]["bias"]
    v = h @ a["v"]["kernel"] + a["v"]["bias"]
    qh = q.reshape(B, 1, heads, hd)
    kh = k.reshape(B, S, heads, hd)
    vh = v.reshape(B, S, heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * (1.0 / np.sqrt(hd))
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, vh,
                     preferred_element_type=jnp.float32)
    ctx = ctx.astype(x.dtype).reshape(B, 1, W)
    cls = x[:, :1] + (ctx @ a["o"]["kernel"] + a["o"]["bias"])
    r = cls
    cls = _layer_norm(cls, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
    cls = _quick_gelu(cls @ lp["mlp"]["fc1"]["kernel"] + lp["mlp"]["fc1"]["bias"])
    cls = cls @ lp["mlp"]["fc2"]["kernel"] + lp["mlp"]["fc2"]["bias"]
    return (r + cls)[:, 0]


def encode_images(params: Mapping, pixel_values: jnp.ndarray,
                  cfg: CLIPVisionConfig = CLIPVisionConfig(),
                  attn_impl: str = "auto", cls_fast: bool = True) -> jnp.ndarray:
    """[B, 3, H, W] preprocessed pixels -> [B, projection_dim] image features.

    Patchify-as-GEMM: unfold into [B, grid^2, 3*P*P] and hit the MXU once.
    ``attn_impl``: "auto" routes attention through the fused Pallas kernel on
    TPU (ops/vit_attention.py), XLA einsum elsewhere.  ``cls_fast`` (default)
    computes the last encoder layer for the class token only — an exact
    algebraic identity (only the pooled CLS state is consumed downstream);
    floating-point results can differ from the full path at reduction-order
    level, ~1e-5 in fp32 (tests/test_clip.py::test_cls_fast_matches_full_
    encoder), the same scale as the pre-existing lane-kernel-vs-einsum
    last-layer drift between TPU and CPU.  ~4% fewer tower FLOPs; pass False
    for the layer-by-layer oracle path.
    """
    vp = params["vision"]
    B = pixel_values.shape[0]
    P, g = cfg.patch_size, cfg.grid
    x = pixel_values.reshape(B, 3, g, P, g, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, 3 * P * P)
    x = x.astype(vp["patch_kernel"].dtype) @ vp["patch_kernel"]          # [B, g*g, W]

    cls = jnp.broadcast_to(vp["class_embedding"], (B, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + vp["position_embedding"]
    x = _layer_norm(x, vp["pre_ln"]["scale"], vp["pre_ln"]["bias"], cfg.layer_norm_eps)
    if cls_fast and cfg.layers > 1:
        head = jax.tree_util.tree_map(lambda a: a[:-1], vp["layers"])
        last = jax.tree_util.tree_map(lambda a: a[-1], vp["layers"])
        x = _encoder(x, head, cfg.heads, cfg.layer_norm_eps,
                     attn_impl=attn_impl)
        pooled = _cls_only_last_layer(x, last, cfg.heads, cfg.layer_norm_eps)
    else:
        x = _encoder(x, vp["layers"], cfg.heads, cfg.layer_norm_eps,
                     attn_impl=attn_impl)
        pooled = x[:, 0]                                                  # class token
    pooled = _layer_norm(pooled, vp["post_ln"]["scale"], vp["post_ln"]["bias"],
                         cfg.layer_norm_eps)
    return pooled @ vp["projection"]


def encode_text(params: Mapping, input_ids: jnp.ndarray,
                attention_mask: jnp.ndarray | None = None,
                cfg: CLIPTextConfig = CLIPTextConfig()) -> jnp.ndarray:
    """[B, L] token ids -> [B, projection_dim] text features.

    Pooled at the first EOS position, matching HF ``CLIPTextModel`` pooling.
    """
    tp = params["text"]
    B, L = input_ids.shape
    x = tp["token_embedding"][input_ids] + tp["position_embedding"][:L]

    causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)[None, None]
    mask = causal
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf)
        mask = causal + pad.astype(jnp.float32)

    x = _encoder(x, tp["layers"], cfg.heads, cfg.layer_norm_eps, mask)
    x = _layer_norm(x, tp["final_ln"]["scale"], tp["final_ln"]["bias"],
                    cfg.layer_norm_eps)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(B), eos_pos]
    return pooled @ tp["projection"]


def cosine_scores(image_features: jnp.ndarray, text_features: jnp.ndarray,
                  eps: float = 1e-8) -> jnp.ndarray:
    """Per-frame CLIP score: cosine(text, frame) (ref temporal_agent.py:167).

    image_features [T, P], text_features [1, P] or [P] -> [T] fp32.
    torch CosineSimilarity clamps each norm to eps before dividing.
    """
    if text_features.ndim == 1:
        text_features = text_features[None]
    a = image_features.astype(jnp.float32)
    b = text_features.astype(jnp.float32)
    an = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    bn = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (an * bn)


# ---------------------------------------------------------------------------
# On-device preprocessing
# ---------------------------------------------------------------------------

def host_resize_crop(frames: "np.ndarray", image_size: int = 224) -> "np.ndarray":
    """Host-side (cv2) shortest-edge resize + center crop -> [T, S, S, 3] u8.

    Same geometry as :func:`preprocess_frames` but on CPU: use when a dataset
    mixes video resolutions — the device path would recompile per (H, W),
    while this bounds everything to ONE compiled shape and cuts host->device
    bytes ~4x.  Overlaps with device compute via the decode prefetch thread.
    """
    import cv2
    T, H, W, _ = frames.shape
    if H < W:
        nh, nw = image_size, max(int(W * image_size / H), image_size)
    else:
        nw, nh = image_size, max(int(H * image_size / W), image_size)
    top, left = (nh - image_size) // 2, (nw - image_size) // 2
    out = np.empty((T, image_size, image_size, 3), np.uint8)
    for i in range(T):
        r = cv2.resize(frames[i], (nw, nh), interpolation=cv2.INTER_CUBIC)
        out[i] = r[top:top + image_size, left:left + image_size]
    return out


@partial(jax.jit, static_argnames=("image_size", "dtype"))
def normalize_frames(frames: jnp.ndarray, image_size: int = 224,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """[T, S, S, 3] uint8 (already resized+cropped) -> [T, 3, S, S] pixels."""
    x = frames.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(CLIP_IMAGE_MEAN)) / jnp.asarray(CLIP_IMAGE_STD)
    return x.transpose(0, 3, 1, 2).astype(dtype)


@partial(jax.jit, static_argnames=("image_size", "dtype"))
def preprocess_frames(frames: jnp.ndarray, image_size: int = 224,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """[T, H, W, 3] uint8 frames -> [T, 3, S, S] normalized pixels, on device.

    CLIPProcessor semantics (resize shortest edge -> center crop -> rescale ->
    normalize) in one fused jit program over the whole batch; bicubic resize
    like PIL (minor kernel differences are within score tolerance, see
    tests/test_clip.py).
    """
    T, H, W, _ = frames.shape
    x = frames.astype(jnp.float32) / 255.0
    # HF get_resize_output_image_size floors the long edge: int(S * long/short).
    if H < W:
        nh, nw = image_size, max(int(W * image_size / H), image_size)
    else:
        nw, nh = image_size, max(int(H * image_size / W), image_size)
    x = jax.image.resize(x, (T, nh, nw, 3), method="cubic")
    top, left = (nh - image_size) // 2, (nw - image_size) // 2
    x = x[:, top:top + image_size, left:left + image_size, :]
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2).astype(dtype)


# ---------------------------------------------------------------------------
# int8 quantized vision tower (opt-in)
# ---------------------------------------------------------------------------

def quantize_vision_params(vision_params) -> dict:
    """Per-output-channel int8 weight quantization of the six GEMMs per layer
    (qkv/o/fc1/fc2); everything else (embeddings, norms, projection) stays
    bf16.  v5e's int8 MXU path + halved weight traffic buy ~12% encode
    throughput at feature cosine >= 0.999 vs bf16 (measured)."""

    def quant(kernel):
        k = np.asarray(kernel, np.float32)
        s = np.abs(k).max(axis=-2, keepdims=True) / 127.0 + 1e-12
        q = np.clip(np.round(k / s), -127, 127).astype(np.int8)
        return {"kernel_q": jnp.asarray(q),
                "scale": jnp.asarray(np.squeeze(s, -2), jnp.float32)}

    lp = vision_params["layers"]
    qlayers = {"ln1": lp["ln1"], "ln2": lp["ln2"], "attn": {}, "mlp": {}}
    for grp, names in (("attn", ("q", "k", "v", "o")), ("mlp", ("fc1", "fc2"))):
        for n in names:
            qlayers[grp][n] = {**quant(lp[grp][n]["kernel"]),
                               "bias": lp[grp][n]["bias"]}
    return {**vision_params, "layers": qlayers}


def dynamic_int8_linear(p, x, out_dtype):
    """Dynamic per-tensor activation quant + int8 GEMM + rescale (+bias).
    Shared by the CLIP and SigLIP quantized towers — keep the quant
    numerics (1e-12 scale floor, symmetric clip) in this one place."""
    x32 = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32)) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, p["kernel_q"],
                            (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * p["scale"]) +
            p["bias"].astype(jnp.float32)).astype(out_dtype)


def _qlin(p, x):
    return dynamic_int8_linear(p, x, jnp.bfloat16)


def _mha_q(x, lp, heads):
    B, S, W = x.shape
    hd = W // heads
    q = _qlin(lp["q"], x).reshape(B, S, heads, hd)
    k = _qlin(lp["k"], x).reshape(B, S, heads, hd)
    v = _qlin(lp["v"], x).reshape(B, S, heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    attn = jax.nn.softmax(scores * (1.0 / np.sqrt(hd)), axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, W)
    return _qlin(lp["o"], ctx)


def encode_images_quantized(qvision: Mapping, pixel_values: jnp.ndarray,
                            cfg: CLIPVisionConfig = CLIPVisionConfig()) -> jnp.ndarray:
    """int8 variant of :func:`encode_images` over quantize_vision_params output."""
    B = pixel_values.shape[0]
    P, g = cfg.patch_size, cfg.grid
    x = pixel_values.reshape(B, 3, g, P, g, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, 3 * P * P)
    x = x.astype(qvision["patch_kernel"].dtype) @ qvision["patch_kernel"]
    cls = jnp.broadcast_to(qvision["class_embedding"], (B, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + qvision["position_embedding"]
    x = _layer_norm(x, qvision["pre_ln"]["scale"], qvision["pre_ln"]["bias"],
                    cfg.layer_norm_eps)

    def block(h, lp):
        r = h
        h = _layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"],
                        cfg.layer_norm_eps)
        h = r + _mha_q(h, lp["attn"], cfg.heads)
        r = h
        h = _layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"],
                        cfg.layer_norm_eps)
        h = _quick_gelu(_qlin(lp["mlp"]["fc1"], h))
        h = _qlin(lp["mlp"]["fc2"], h)
        return r + h, None

    x, _ = jax.lax.scan(block, x, qvision["layers"])
    pooled = _layer_norm(x[:, 0], qvision["post_ln"]["scale"],
                         qvision["post_ln"]["bias"], cfg.layer_norm_eps)
    return pooled @ qvision["projection"]


# ---------------------------------------------------------------------------
# Weight porting / init
# ---------------------------------------------------------------------------

def _lin(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _lin_stack(sd, n, fmt):
    return {
        "kernel": stack_layers(sd, n, fmt + ".weight").transpose(0, 2, 1),
        "bias": stack_layers(sd, n, fmt + ".bias"),
    }


def _ln_stack(sd, n, fmt):
    return {"scale": stack_layers(sd, n, fmt + ".weight"),
            "bias": stack_layers(sd, n, fmt + ".bias")}


def _encoder_params(sd, prefix, n_layers):
    f = prefix + ".encoder.layers.{i}"
    return {
        "ln1": _ln_stack(sd, n_layers, f + ".layer_norm1"),
        "ln2": _ln_stack(sd, n_layers, f + ".layer_norm2"),
        "attn": {
            "q": _lin_stack(sd, n_layers, f + ".self_attn.q_proj"),
            "k": _lin_stack(sd, n_layers, f + ".self_attn.k_proj"),
            "v": _lin_stack(sd, n_layers, f + ".self_attn.v_proj"),
            "o": _lin_stack(sd, n_layers, f + ".self_attn.out_proj"),
        },
        "mlp": {
            "fc1": _lin_stack(sd, n_layers, f + ".mlp.fc1"),
            "fc2": _lin_stack(sd, n_layers, f + ".mlp.fc2"),
        },
    }


def clip_config_from_state_dict(sd) -> CLIPConfig:
    """Infer the CLIPConfig from checkpoint tensor shapes — lets merged
    TSPO-0.4B directories load without a parsable config.json."""
    sd = {k: v for k, v in sd.items()}
    t_vocab, t_width = sd["text_model.embeddings.token_embedding.weight"].shape
    t_pos = sd["text_model.embeddings.position_embedding.weight"].shape[0]
    t_proj = sd["text_projection.weight"].shape[0]
    t_layers = 1 + max(int(k.split(".")[3]) for k in sd
                       if k.startswith("text_model.encoder.layers."))
    v_width = sd["vision_model.embeddings.class_embedding"].shape[0]
    patch = sd["vision_model.embeddings.patch_embedding.weight"]
    v_patch = patch.shape[-1]
    v_pos = sd["vision_model.embeddings.position_embedding.weight"].shape[0]
    v_grid = int(round((v_pos - 1) ** 0.5))
    v_proj = sd["visual_projection.weight"].shape[0]
    v_layers = 1 + max(int(k.split(".")[3]) for k in sd
                       if k.startswith("vision_model.encoder.layers."))
    # heads: keep defaults scaled by width (64-dim heads, the CLIP family rule)
    return CLIPConfig(
        text=CLIPTextConfig(vocab_size=t_vocab, width=t_width, layers=t_layers,
                            heads=max(t_width // 64, 1), max_positions=t_pos,
                            projection_dim=t_proj, eos_token_id=t_vocab - 1),
        vision=CLIPVisionConfig(width=v_width, layers=v_layers,
                                heads=max(v_width // 64, 1), patch_size=v_patch,
                                image_size=v_grid * v_patch,
                                projection_dim=v_proj),
    )


def clip_params_from_torch(model_or_sd, cfg: CLIPConfig = CLIPConfig(),
                           dtype=jnp.float32) -> dict:
    """Port an HF ``CLIPModel`` checkpoint to our pytree layout.

    Accepts a torch module or a state dict of tensors/ndarrays.  The vision
    patch conv [W, 3, P, P] becomes a [3*P*P, W] GEMM kernel whose input
    ordering matches the unfold in :func:`encode_images` (c, ph, pw).
    """
    sd = state_dict_of(model_or_sd)
    t, v = cfg.text, cfg.vision

    patch = sd["vision_model.embeddings.patch_embedding.weight"]  # [W, 3, P, P]
    patch_kernel = patch.reshape(v.width, -1).T                   # [3*P*P, W]

    params = {
        "text": {
            "token_embedding": sd["text_model.embeddings.token_embedding.weight"],
            "position_embedding": sd["text_model.embeddings.position_embedding.weight"],
            "layers": _encoder_params(sd, "text_model", t.layers),
            "final_ln": {"scale": sd["text_model.final_layer_norm.weight"],
                         "bias": sd["text_model.final_layer_norm.bias"]},
            "projection": sd["text_projection.weight"].T,
        },
        "vision": {
            "class_embedding": sd["vision_model.embeddings.class_embedding"],
            "position_embedding": sd["vision_model.embeddings.position_embedding.weight"],
            "patch_kernel": patch_kernel,
            "pre_ln": {"scale": sd["vision_model.pre_layrnorm.weight"],
                       "bias": sd["vision_model.pre_layrnorm.bias"]},
            "layers": _encoder_params(sd, "vision_model", v.layers),
            "post_ln": {"scale": sd["vision_model.post_layernorm.weight"],
                        "bias": sd["vision_model.post_layernorm.bias"]},
            "projection": sd["visual_projection.weight"].T,
        },
        "logit_scale": sd["logit_scale"],
    }
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)


def init_clip_params(rng: jax.Array, cfg: CLIPConfig = CLIPConfig(),
                     dtype=jnp.float32) -> dict:
    """Random init with HF-CLIP-like scales (for tests / de-novo training)."""
    t, v = cfg.text, cfg.vision
    keys = iter(jax.random.split(rng, 64))

    def lin_stack(n, fi, fo):
        return {
            "kernel": jax.random.normal(next(keys), (n, fi, fo), dtype) * 0.02,
            "bias": jnp.zeros((n, fo), dtype),
        }

    def ln_stack(n, w):
        return {"scale": jnp.ones((n, w), dtype), "bias": jnp.zeros((n, w), dtype)}

    def enc(n, w):
        return {
            "ln1": ln_stack(n, w), "ln2": ln_stack(n, w),
            "attn": {x: lin_stack(n, w, w) for x in ("q", "k", "v", "o")},
            "mlp": {"fc1": lin_stack(n, w, 4 * w), "fc2": lin_stack(n, 4 * w, w)},
        }

    return {
        "text": {
            "token_embedding": jax.random.normal(next(keys), (t.vocab_size, t.width), dtype) * 0.02,
            "position_embedding": jax.random.normal(next(keys), (t.max_positions, t.width), dtype) * 0.01,
            "layers": enc(t.layers, t.width),
            "final_ln": {"scale": jnp.ones(t.width, dtype), "bias": jnp.zeros(t.width, dtype)},
            "projection": jax.random.normal(next(keys), (t.width, t.projection_dim), dtype) * 0.02,
        },
        "vision": {
            "class_embedding": jax.random.normal(next(keys), (v.width,), dtype) * 0.02,
            "position_embedding": jax.random.normal(next(keys), (v.seq_len, v.width), dtype) * 0.01,
            "patch_kernel": jax.random.normal(next(keys), (3 * v.patch_size ** 2, v.width), dtype) * 0.02,
            "pre_ln": {"scale": jnp.ones(v.width, dtype), "bias": jnp.zeros(v.width, dtype)},
            "layers": enc(v.layers, v.width),
            "post_ln": {"scale": jnp.ones(v.width, dtype), "bias": jnp.zeros(v.width, dtype)},
            "projection": jax.random.normal(next(keys), (v.width, v.projection_dim), dtype) * 0.02,
        },
        "logit_scale": jnp.asarray(cfg.logit_scale_init, dtype),
    }
