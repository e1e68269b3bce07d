"""End-to-end TSPOScorer tests on the tiny CLIP config."""

import numpy as np
import jax.numpy as jnp
import pytest

from tspo_tpu.configs import CLIPConfig, SelectorConfig
from tspo_tpu.models.tspo_model import TSPOScorer, build_random_scorer

CLIP_CFG = CLIPConfig.tiny()
SEL_CFG = SelectorConfig(dim=CLIP_CFG.text.projection_dim, num_heads=4)


def _tokenize(problem: str):
    ids = np.full((1, 8), 3, np.int32)
    ids[0, -1] = CLIP_CFG.text.eos_token_id
    return ids, np.ones((1, 8), np.int32)


@pytest.fixture(scope="module")
def scorer():
    return build_random_scorer(
        seed=0, clip_cfg=CLIP_CFG, selector_cfg=SEL_CFG, dtype=jnp.float32,
        tokenize=_tokenize, batch_frames=32, frame_buckets=(64, 128, 256))


def _frames(T, seed=0, hw=48):
    return np.random.default_rng(seed).integers(0, 256, size=(T, hw, hw, 3),
                                                dtype=np.uint8)


def test_chunked_encode_matches_single_batch(scorer):
    frames = _frames(70)  # crosses the 32-frame chunk boundary, pads the tail
    chunked = np.asarray(scorer.encode_frame_features(frames))
    one = TSPOScorer(**{**scorer.__dict__, "batch_frames": 128})
    whole = np.asarray(one.encode_frame_features(frames))
    np.testing.assert_allclose(chunked, whole, rtol=1e-4, atol=1e-4)


def test_full_pipeline_topk(scorer):
    frames = _frames(70)
    idx, logits = scorer(frames, "what happens?", sample_num=16, method="topk")
    assert logits.shape == (70,)
    assert len(idx) == 16
    assert list(idx) == sorted(idx)
    expect = np.sort(np.argsort(-logits)[:16])
    np.testing.assert_array_equal(idx, expect)


def test_full_pipeline_binmax_and_aks(scorer):
    frames = _frames(80, seed=1)
    feats = scorer.extract_features(frames, "q")
    for method in ("bin-max", "aks"):
        idx, logits = scorer.temporal_sampling(*feats, method=method,
                                               sample_num=16)
        assert len(idx) <= 16 and len(idx) > 0
        assert list(idx) == sorted(idx)
        assert max(idx) < 80


def test_small_video_returns_all(scorer):
    frames = _frames(10, seed=2)
    idx, _ = scorer(frames, "q", sample_num=64)
    np.testing.assert_array_equal(idx, np.arange(10))


def test_fused_video_sample_num_exceeds_bucket(scorer):
    """sample_num above the padded bucket used to crash lax.top_k inside the
    jitted fused program (reachable from POST /v1/score with a short video);
    it must clamp losslessly and return every frame."""
    frames = _frames(40, seed=4)
    idx, logits = scorer.score_video_fused(frames, "q", sample_num=512)
    assert logits.shape == (40,)
    np.testing.assert_array_equal(np.sort(idx), np.arange(40))


def test_fused_question_ids_padded_to_one_trace(scorer):
    """Question ids are right-padded to text.max_positions so the fused
    programs trace once per bucket, not once per question length — and the
    padding is exact (causal tower, first-EOS pooling)."""
    frames = _frames(40, seed=5)
    feats = np.asarray(scorer.encode_frame_features(frames))
    eos = CLIP_CFG.text.eos_token_id
    short = np.array([[3, 5, eos]], np.int32)
    L = CLIP_CFG.text.max_positions
    long = np.zeros((1, L), np.int32)
    long[0, :3] = short[0]
    idx_a, log_a = scorer.score_features_fused(feats, short, sample_num=8)
    idx_b, log_b = scorer.score_features_fused(feats, long, sample_num=8)
    np.testing.assert_array_equal(idx_a, idx_b)
    np.testing.assert_allclose(log_a, log_b, rtol=1e-5, atol=1e-6)


def test_bucket_padding_invariance(scorer):
    """Same video scored through different bucket sizes -> same logits."""
    frames = _frames(60, seed=3)
    feats = scorer.extract_features(frames, "q")
    a = scorer.score(*feats)
    wide = TSPOScorer(**{**scorer.__dict__, "frame_buckets": (256,)})
    b = wide.score(*feats)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_save_load_round_trip(tmp_path, scorer):
    frames = _frames(40, seed=4)
    feats = scorer.extract_features(frames, "q")
    before = scorer.score(*feats)
    scorer.save(str(tmp_path / "ckpt"))
    loaded = TSPOScorer.load(str(tmp_path / "ckpt"), clip_cfg=CLIP_CFG,
                             selector_cfg=SEL_CFG, dtype=jnp.float32,
                             tokenize=_tokenize, batch_frames=32,
                             frame_buckets=(64, 128, 256))
    feats2 = loaded.extract_features(frames, "q")
    after = loaded.score(*feats2)
    np.testing.assert_allclose(before, after, rtol=1e-4, atol=1e-4)


def test_load_keeps_selector_fp32_and_reads_config(tmp_path, scorer):
    """load() must keep the selector FLOAT32 under a bf16 dtype and honor
    the selector geometry save() wrote to config.json (round-3 review:
    bf16 selector rounding flips frame ranks near ties, and a wrong head
    count loads silently because all selector params are dim x dim)."""
    import dataclasses
    import jax
    scorer.save(str(tmp_path / "c2"))
    loaded = TSPOScorer.load(str(tmp_path / "c2"), clip_cfg=CLIP_CFG,
                             selector_cfg=dataclasses.replace(
                                 SEL_CFG, num_heads=SEL_CFG.num_heads * 2),
                             dtype=jnp.bfloat16, tokenize=_tokenize,
                             batch_frames=32, frame_buckets=(64,))
    for leaf in jax.tree_util.tree_leaves(loaded.selector_params):
        assert leaf.dtype == jnp.float32
    # config.json overrides the (wrong) passed-in head count
    assert loaded.selector_cfg.num_heads == SEL_CFG.num_heads
    assert loaded.selector_cfg.dim == SEL_CFG.dim


def test_from_torch_merged(tmp_path):
    """Reference merged-checkpoint layout (CLIP sd + selector.* keys) loads."""
    torch = pytest.importorskip("torch")
    import transformers

    t, v = CLIP_CFG.text, CLIP_CFG.vision
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(vocab_size=t.vocab_size, hidden_size=t.width,
                         intermediate_size=4 * t.width, num_hidden_layers=t.layers,
                         num_attention_heads=t.heads,
                         max_position_embeddings=t.max_positions,
                         projection_dim=t.projection_dim, eos_token_id=t.eos_token_id,
                         hidden_act="quick_gelu"),
        vision_config=dict(hidden_size=v.width, intermediate_size=4 * v.width,
                           num_hidden_layers=v.layers, num_attention_heads=v.heads,
                           patch_size=v.patch_size, image_size=v.image_size,
                           projection_dim=v.projection_dim, hidden_act="quick_gelu"),
        projection_dim=t.projection_dim)
    torch.manual_seed(1)
    clip = transformers.CLIPModel(hf_cfg)
    sd = {k: v_.detach() for k, v_ in clip.state_dict().items()}
    d = SEL_CFG.dim
    for name in ("temporal.Self_q", "temporal.Self_k", "temporal.Self_v",
                 "temporal.ffn_o", "mlp.0", "mlp.2"):
        sd[f"selector.{name}.weight"] = torch.randn(d, d) * 0.02
        sd[f"selector.{name}.bias"] = torch.zeros(d)

    scorer = TSPOScorer.from_torch_merged(sd, clip_cfg=CLIP_CFG,
                                          selector_cfg=SEL_CFG, dtype=jnp.float32,
                                          tokenize=_tokenize, batch_frames=32,
                                          frame_buckets=(64,))
    idx, logits = scorer(_frames(30, seed=5), "q", sample_num=8)
    assert np.all(np.isfinite(logits))
    assert len(idx) == 8


def test_host_preprocess_mode_close_to_device(scorer):
    """host (cv2) vs device (XLA) preprocessing give closely matching
    features: resize kernels differ slightly, scores must stay within the
    index-fidelity tolerance."""
    frames = _frames(20, seed=9, hw=72)  # non-square-free: 72 -> resize+crop
    dev = TSPOScorer(**{**scorer.__dict__, "preprocess": "device"})
    host = TSPOScorer(**{**scorer.__dict__, "preprocess": "host"})
    f_dev = np.asarray(dev.encode_frame_features(frames))
    f_host = np.asarray(host.encode_frame_features(frames))
    cos = np.sum(f_dev * f_host, -1) / (
        np.linalg.norm(f_dev, axis=-1) * np.linalg.norm(f_host, axis=-1))
    assert np.all(cos > 0.995), cos.min()


def test_fused_scoring_matches_chunked(scorer):
    frames = _frames(70, seed=11)
    idx_c, logits_c = scorer(frames, "q", sample_num=16)
    idx_f, logits_f = scorer.score_video_fused(frames, "q", sample_num=16)
    np.testing.assert_allclose(logits_f, logits_c, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(idx_f, idx_c)


def test_quantized_scorer_selects_same_frames(scorer):
    frames = _frames(70, seed=13)
    idx_fp, logits_fp = scorer(frames, "q", sample_num=16)
    q = TSPOScorer(**{k: v for k, v in scorer.__dict__.items()}).quantize()
    idx_q, logits_q = q(frames, "q", sample_num=16)
    # int8 may flip near-ties; demand high overlap and close logits
    overlap = len(set(map(int, idx_fp)) & set(map(int, idx_q))) / 16
    assert overlap >= 0.8, (idx_fp, idx_q)
    np.testing.assert_allclose(logits_q, logits_fp, rtol=0.2, atol=2.0)
    # fused path works quantized too
    idx_f, _ = q.score_video_fused(frames, "q", sample_num=16)
    np.testing.assert_array_equal(idx_f, idx_q)


def test_quantized_scorer_refuses_save(tmp_path, scorer):
    q = TSPOScorer(**{k: v for k, v in scorer.__dict__.items()}).quantize()
    with pytest.raises(ValueError):
        q.save(str(tmp_path / "bad"))


def test_fused_question_matches_full_paths(scorer):
    """score_features_fused (the warm video-cache path: text + cosine +
    selector + top-k in one dispatch) selects the same frames and logits as
    both the chunked path and score_video_fused."""
    frames = _frames(70, seed=17)
    img = np.asarray(scorer.encode_frame_features(frames), np.float32)
    idx_c, logits_c = scorer(frames, "q", sample_num=16)
    idx_q, logits_q = scorer.score_features_fused(img, "q", sample_num=16)
    np.testing.assert_allclose(logits_q, logits_c, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(idx_q, idx_c)
    # non-topk dispatch selects host-side from the same logits
    idx_b, _ = scorer.score_features_fused(img, "q", sample_num=16,
                                           method="bin-max")
    assert len(idx_b) == 16


def test_fused_question_short_video_large_sample_num(scorer):
    """sample_num larger than the frame bucket must not crash lax.top_k
    (serve default path regression): returns all frames, sorted."""
    frames = _frames(20, seed=19)
    img = np.asarray(scorer.encode_frame_features(frames), np.float32)
    idx, logits = scorer.score_features_fused(img, "q", sample_num=128)
    assert len(idx) == 20
    assert len(logits) == 20
