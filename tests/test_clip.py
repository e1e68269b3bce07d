"""CLIP tower parity vs torch transformers (tiny random-init config — proves
numerics without downloading weights) and preprocessing checks."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tspo_tpu.configs import CLIPConfig  # noqa: E402
from tspo_tpu.models.clip import (  # noqa: E402
    clip_params_from_torch,
    cosine_scores,
    encode_images,
    encode_text,
    preprocess_frames,
)

CFG = CLIPConfig.tiny()


@pytest.fixture(scope="module")
def torch_clip():
    t, v = CFG.text, CFG.vision
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=t.vocab_size, hidden_size=t.width, intermediate_size=4 * t.width,
            num_hidden_layers=t.layers, num_attention_heads=t.heads,
            max_position_embeddings=t.max_positions, projection_dim=t.projection_dim,
            eos_token_id=t.eos_token_id, hidden_act="quick_gelu",
        ),
        vision_config=dict(
            hidden_size=v.width, intermediate_size=4 * v.width,
            num_hidden_layers=v.layers, num_attention_heads=v.heads,
            patch_size=v.patch_size, image_size=v.image_size,
            projection_dim=v.projection_dim, hidden_act="quick_gelu",
        ),
        projection_dim=t.projection_dim,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_params(torch_clip):
    return clip_params_from_torch(torch_clip, CFG)


def test_image_features_parity(torch_clip, jax_params):
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(5, 3, CFG.vision.image_size, CFG.vision.image_size))
    pixels = pixels.astype(np.float32)
    with torch.no_grad():
        want = torch_clip.get_image_features(pixel_values=torch.from_numpy(pixels)).numpy()
    got = np.asarray(encode_images(jax_params, jnp.asarray(pixels), CFG.vision))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_text_features_parity(torch_clip, jax_params):
    rng = np.random.default_rng(1)
    B, L = 3, 12
    ids = rng.integers(1, CFG.text.vocab_size - 1, size=(B, L))
    ids[:, -1] = CFG.text.eos_token_id
    with torch.no_grad():
        want = torch_clip.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    got = np.asarray(encode_text(jax_params, jnp.asarray(ids), cfg=CFG.text))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_text_features_parity_padded(torch_clip, jax_params):
    """Left-unpadded batch with attention_mask (CLIPProcessor padding=True)."""
    rng = np.random.default_rng(2)
    B, L = 2, 16
    ids = rng.integers(1, CFG.text.vocab_size - 1, size=(B, L))
    mask = np.ones((B, L), np.int64)
    ids[0, 8] = CFG.text.eos_token_id
    ids[0, 9:] = 0
    mask[0, 9:] = 0
    ids[1, -1] = CFG.text.eos_token_id
    with torch.no_grad():
        want = torch_clip.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()
    got = np.asarray(encode_text(jax_params, jnp.asarray(ids), jnp.asarray(mask),
                                 CFG.text))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cosine_scores_matches_torch():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(7, 48)).astype(np.float32)
    txt = rng.normal(size=(1, 48)).astype(np.float32)
    want = torch.nn.CosineSimilarity(dim=-1)(
        torch.from_numpy(txt), torch.from_numpy(img)).numpy()
    got = np.asarray(cosine_scores(jnp.asarray(img), jnp.asarray(txt)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_preprocess_matches_hf_processor():
    """Device preprocessing vs CLIPImageProcessor (PIL). Resize kernels differ
    slightly (PIL vs XLA bicubic), so compare with a loose elementwise bound
    and a tight mean bound."""
    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": 224}, crop_size={"height": 224, "width": 224},
        do_resize=True, do_center_crop=True, do_rescale=True, do_normalize=True,
    )
    rng = np.random.default_rng(4)
    # smooth image (random low-freq) so kernel differences stay small
    small = rng.uniform(0, 255, size=(2, 24, 32, 3))
    frames = np.stack([
        np.clip(np.kron(im, np.ones((20, 20, 1))), 0, 255) for im in small
    ]).astype(np.uint8)  # [2, 480, 640, 3]
    want = proc(images=[f for f in frames], return_tensors="np")["pixel_values"]
    got = np.asarray(preprocess_frames(jnp.asarray(frames), dtype=jnp.float32))
    assert got.shape == want.shape == (2, 3, 224, 224)
    assert np.mean(np.abs(got - want)) < 0.03
    assert np.max(np.abs(got - want)) < 0.5


def test_bf16_image_path_close_to_fp32(torch_clip, jax_params):
    """bf16 tower (production dtype) tracks fp32 within score tolerance."""
    import jax
    rng = np.random.default_rng(5)
    pixels = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)
    p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), jax_params)
    f32 = np.asarray(encode_images(jax_params, jnp.asarray(pixels), CFG.vision))
    f16 = np.asarray(encode_images(p16, jnp.asarray(pixels, jnp.bfloat16),
                                   CFG.vision)).astype(np.float32)
    cos = np.sum(f32 * f16, -1) / (np.linalg.norm(f32, axis=-1) *
                                   np.linalg.norm(f16, axis=-1))
    assert np.all(cos > 0.999)


def test_quantized_vision_close_to_fp(torch_clip, jax_params):
    """int8 tower tracks the float tower at cosine >= 0.995 (tiny config)."""
    from tspo_tpu.models.clip import (encode_images_quantized,
                                      quantize_vision_params)
    rng = np.random.default_rng(7)
    pixels = jnp.asarray(rng.normal(size=(5, 3, CFG.vision.image_size,
                                          CFG.vision.image_size)), jnp.float32)
    want = np.asarray(encode_images(jax_params, pixels, CFG.vision))
    qv = quantize_vision_params(jax_params["vision"])
    got = np.asarray(encode_images_quantized(qv, pixels, CFG.vision)
                     ).astype(np.float32)
    cos = np.sum(want * got, -1) / (np.linalg.norm(want, axis=-1) *
                                    np.linalg.norm(got, axis=-1))
    assert np.all(cos > 0.995), cos.min()


def test_vit_attention_pallas_matches_xla():
    """Fused lane-sliced attention kernel (interpret mode) == XLA einsum at
    the real CLIP-L vision geometry (S=257, hd=64)."""
    import jax
    from tspo_tpu.ops.vit_attention import vit_attention
    B, S, H, HD = 3, 257, 16, 64
    W = H * HD
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, S, W), jnp.float32) for kk in ks)
    ref = vit_attention(q, k, v, H, impl="xla")
    out = vit_attention(q, k, v, H, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_vit_attention_pallas_matches_xla_siglip_shape():
    """Same kernel at the SigLIP so400m geometry (S=729, hd=72) — wired into
    the SigLIP tower in round 3 (phase-2 roofline measured the einsum tower
    at 27% MFU); on-chip parity cos 0.99996."""
    import jax
    from tspo_tpu.ops.vit_attention import vit_attention
    B, S, H, HD = 2, 729, 16, 72
    W = H * HD
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, S, W), jnp.float32) for kk in ks)
    ref = vit_attention(q, k, v, H, impl="xla")
    out = vit_attention(q, k, v, H, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_vit_attention_rejects_bad_width():
    from tspo_tpu.ops.vit_attention import vit_attention
    q = jnp.zeros((1, 8, 100))
    with pytest.raises(ValueError):
        vit_attention(q, q, q, 16)


def test_cls_fast_matches_full_encoder(jax_params):
    """cls_fast (last layer computed for the class token only) is an exact
    algebraic identity of the full-encoder path — only the pooled CLS state
    is consumed downstream (ref temporal_agent.py:151-169)."""
    rng = np.random.default_rng(3)
    pixels = jnp.asarray(rng.normal(
        size=(4, 3, CFG.vision.image_size, CFG.vision.image_size)), jnp.float32)
    fast = np.asarray(encode_images(jax_params, pixels, CFG.vision,
                                    cls_fast=True))
    full = np.asarray(encode_images(jax_params, pixels, CFG.vision,
                                    cls_fast=False))
    np.testing.assert_allclose(fast, full, rtol=1e-5, atol=1e-5)


def test_cls_fast_single_layer_tower(jax_params):
    """layers == 1 falls back to the full path (no head layers to scan)."""
    import dataclasses
    import jax as _jax
    cfg1 = dataclasses.replace(CFG.vision, layers=1)
    p1 = {"vision": {**jax_params["vision"],
                     "layers": _jax.tree_util.tree_map(
                         lambda a: a[:1], jax_params["vision"]["layers"])}}
    rng = np.random.default_rng(4)
    pixels = jnp.asarray(rng.normal(
        size=(2, 3, cfg1.image_size, cfg1.image_size)), jnp.float32)
    fast = np.asarray(encode_images(p1, pixels, cfg1, cls_fast=True))
    full = np.asarray(encode_images(p1, pixels, cfg1, cls_fast=False))
    np.testing.assert_allclose(fast, full, rtol=1e-6, atol=1e-6)
