"""Evaluation pipeline tests: TSV datasets, phase-1 precompute with cache +
resume, frameIdx merge, phase-2 harness with a stub backbone, aggregators."""

import json
import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from tspo_tpu.configs import CLIPConfig, PrecomputeConfig, SelectorConfig
from tspo_tpu.eval.datasets import (VideoQuestionDataset, merge_frame_indices,
                                    load_json, dump_json)
from tspo_tpu.eval.harness import evaluate_task, merge_shards
from tspo_tpu.eval.precompute import FrameIndexPrecompute, select_method_for
from tspo_tpu.eval.tasks import (aggregate_mlvu_dev, aggregate_videomme,
                                 extract_answer_letter,
                                 parse_multi_choice_response, get_task)
from tspo_tpu.models.tspo_model import build_random_scorer
from tspo_tpu.video.cache import FeatureCache

cv2 = pytest.importorskip("cv2")

CLIP_CFG = CLIPConfig.tiny()
SEL_CFG = SelectorConfig(dim=CLIP_CFG.text.projection_dim, num_heads=4)


def _tokenize(problem: str):
    ids = np.full((1, 8), 3, np.int32)
    ids[0, -1] = CLIP_CFG.text.eos_token_id
    return ids, np.ones((1, 8), np.int32)


def _write_video(path, n_frames=120, fps=5.0, wh=(64, 48)):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, wh)
    for i in range(n_frames):
        w.write(np.full((wh[1], wh[0], 3), min(2 * i, 255), np.uint8))
    w.release()


@pytest.fixture(scope="module")
def bench_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("bench")
    (root / "videos").mkdir()
    rows = []
    for i in range(3):
        _write_video(root / "videos" / f"v{i}.mp4", n_frames=100 + 40 * i)
        rows.append(dict(index=str(i), task_name="TinyBench",
                         video_name=f"v{i}.mp4", question_id=f"q{i}",
                         question=f"What is shown {i}?",
                         answer_number="0",
                         candidates="['red', 'green', 'blue']", answer="A"))
    tsv = root / "TinyBench.tsv"
    with open(tsv, "w") as f:
        cols = list(rows[0])
        f.write("\t".join(cols) + "\n")
        for r in rows:
            f.write("\t".join(r[c] for c in cols) + "\n")
    return root


@pytest.fixture(scope="module")
def scorer():
    return build_random_scorer(seed=0, clip_cfg=CLIP_CFG, selector_cfg=SEL_CFG,
                               dtype=jnp.float32, tokenize=_tokenize,
                               batch_frames=32, frame_buckets=(64, 128, 256))


def test_dataset_prompt_format(bench_dir):
    ds = VideoQuestionDataset.from_tsv("TinyBench", str(bench_dir / "TinyBench.tsv"),
                                       str(bench_dir / "videos"))
    structs = list(ds.iter_structs())
    assert len(structs) == 3
    p = structs[0]["prompt"]
    assert p.startswith("Question: What is shown 0?\nOptions:\n(A):red (B):green")
    assert structs[0]["problem"] == "What is shown 0?"
    assert os.path.exists(structs[0]["video_path"])


def test_select_method_dispatch():
    cfg = PrecomputeConfig()
    assert select_method_for("LongVideoBench", cfg) == "topk"
    assert select_method_for("VideoMME", cfg) == "bin-max"


@pytest.fixture(scope="module")
def precompute_run(bench_dir, scorer, tmp_path_factory):
    work = tmp_path_factory.mktemp("work")
    ds = VideoQuestionDataset.from_tsv("TinyBench", str(bench_dir / "TinyBench.tsv"),
                                       str(bench_dir / "videos"))
    pre = FrameIndexPrecompute(
        scorer, FeatureCache(str(work / "cache")),
        PrecomputeConfig(sample_num=8, checkpoint_every=2, max_frames=512),
        work_dir=str(work), name="TEST")
    results = pre.run(ds)
    return pre, ds, results, work


def test_precompute_results(precompute_run):
    pre, ds, results, _ = precompute_run
    assert set(results) == {"q0", "q1", "q2"}
    for qid, ids in results.items():
        assert len(ids) == 8
        assert all(isinstance(x, float) for x in ids)
        assert ids == sorted(ids)
    # supp.pkl checkpoint written and loadable
    assert pre.load_results("TinyBench") == results


def test_precompute_cache_and_resume(precompute_run):
    pre, ds, results, work = precompute_run
    # all questions cached
    for i in range(3):
        assert pre.cache.has("TinyBench", str(i))
    # rerun with resume: returns same results without touching the scorer
    class Boom:
        def __getattr__(self, k):
            raise AssertionError("scorer must not be called on resume")
    pre2 = FrameIndexPrecompute(Boom(), pre.cache, pre.cfg,
                                work_dir=pre.work_dir, name="TEST")
    again = pre2.run(ds)
    assert again == results


def test_precompute_sharding(bench_dir, scorer, tmp_path):
    ds = VideoQuestionDataset.from_tsv("TinyBench", str(bench_dir / "TinyBench.tsv"),
                                       str(bench_dir / "videos"))
    cfg = PrecomputeConfig(sample_num=8, max_frames=512)
    shard_results = {}
    for rank in range(2):
        pre = FrameIndexPrecompute(scorer, FeatureCache(str(tmp_path / "c")),
                                   cfg, work_dir=str(tmp_path / f"w{rank}"),
                                   name="T")
        shard_results.update(pre.run(ds, shard=(rank, 2)))
    assert set(shard_results) == {"q0", "q1", "q2"}


def test_merge_frame_indices_schema(precompute_run):
    pre, ds, results, work = precompute_run
    anno = [{"question_id": f"q{i}", "question": f"What is shown {i}?",
             "answer": "A"} for i in range(3)] + [{"question_id": "missing"}]
    out_path = str(work / "jsons_idx" / "TEST_frameIdx.json")
    merged = pre.emit_frame_idx_json("TinyBench", anno, out_path)
    assert os.path.exists(out_path)
    reloaded = load_json(out_path)
    assert reloaded == merged
    assert merged[0]["frame_idx"] == results["q0"]
    assert "frame_idx" not in merged[3]  # missing entries pass through


def test_reference_frameidx_schema_compatibility():
    """Our merge reproduces the reference golden artifact byte-for-byte when
    fed the reference's own annotations + scores (LongVideoBench sample)."""
    ref = "/root/reference/evaluation"
    if not os.path.exists(f"{ref}/jsons_idx/TSPO_LongVideoBench_frameIdx.json"):
        pytest.skip("reference artifacts not mounted")
    golden = load_json(f"{ref}/jsons_idx/TSPO_LongVideoBench_frameIdx.json")[:20]
    anno = load_json(f"{ref}/jsons/lvb_val.json")[:20]
    scores = {g["id"]: g["frame_idx"] for g in golden}
    merged = merge_frame_indices(anno, scores, "LongVideoBench")
    assert merged == golden


# ---------------- phase 2 ----------------

class StubBackbone:
    """Deterministic fake MLLM: answers 'A' when mean pixel < 128 else 'B'."""

    def __init__(self):
        self.calls = []

    def generate(self, frames, prompt):
        self.calls.append((frames.shape, prompt))
        return "A" if frames.mean() < 128 else "The answer is B."


class BatchingBackbone(StubBackbone):
    """StubBackbone plus the ragged batched surface (llava_video layout)."""

    def __init__(self, fail_batches: bool = False):
        super().__init__()
        self.batch_calls = []
        self.fail_batches = fail_batches

    def generate_batch_multi(self, frames_list, questions):
        if self.fail_batches:
            raise RuntimeError("batched decode OOM")
        self.batch_calls.append((len(frames_list), list(questions)))
        return [self.generate(f, p) for f, p in zip(frames_list, questions)]


def _vmme_docs(n=5):
    return [{"question_id": f"q{i}", "question": f"What {i}?",
             "options": ["A. red", "B. green"], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": f"v{i % 3}.mp4",
             "frame_idx": list(range(8))} for i in range(n)]


def test_harness_batched_generate(bench_dir):
    """batch_size > 1 routes consecutive docs through generate_batch_multi
    and yields metrics/samples identical (incl. doc order) to sequential."""
    docs = _vmme_docs(5)
    seq = evaluate_task("VideoMME", docs, BatchingBackbone(),
                        video_root=str(bench_dir / "videos"),
                        max_frames_num=8, on_error="raise")
    bb = BatchingBackbone()
    bat = evaluate_task("VideoMME", docs, bb,
                        video_root=str(bench_dir / "videos"),
                        max_frames_num=8, on_error="raise", batch_size=2)
    assert bat.metrics == seq.metrics
    assert [s["doc_id"] for s in bat.samples] == \
        [s["doc_id"] for s in seq.samples]
    assert [s["response"] for s in bat.samples] == \
        [s["response"] for s in seq.samples]
    # 5 docs at B=2 -> two full batches + a 1-doc tail (flushed singly)
    assert [n for n, _ in bb.batch_calls] == [2, 2]


def test_harness_batched_degrades_on_batch_failure(bench_dir):
    """A failing batched call degrades to per-doc generates (on_error=skip),
    preserving every sample instead of killing the batch."""
    docs = _vmme_docs(4)
    bb = BatchingBackbone(fail_batches=True)
    res = evaluate_task("VideoMME", docs, bb,
                        video_root=str(bench_dir / "videos"),
                        max_frames_num=8, batch_size=4)
    assert len(res.samples) == 4
    assert not any(str(s["response"]).startswith("[error:")
                   for s in res.samples)


def test_harness_with_frame_idx(precompute_run):
    pre, ds, results, _ = precompute_run
    docs = [{"question_id": f"q{i}", "question": f"What is shown {i}?",
             "options": ["A. red", "B. green"], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": f"v{i}.mp4",
             "frame_idx": results[f"q{i}"]} for i in range(3)]
    backbone = StubBackbone()
    res = evaluate_task("VideoMME", docs, backbone,
                        video_root=str(ds.video_root), max_frames_num=8,
                        on_error="raise")
    assert len(res.results) == 3
    assert backbone.calls[0][0] == (8, 48, 64, 3)
    assert "overall" in res.metrics and "short" in res.metrics
    assert res.samples[0]["frame_idx"] == sorted(int(i) for i in results["q0"][:8])


def test_harness_uniform_baseline(precompute_run):
    pre, ds, results, _ = precompute_run
    docs = [{"question_id": "q0", "question": "?", "options": [], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": "v0.mp4"}]
    res = evaluate_task("VideoMME", docs, StubBackbone(),
                        video_root=str(ds.video_root), max_frames_num=8,
                        is_uniform=True, on_error="raise")
    assert len(res.results) == 1


def test_harness_shard_merge(precompute_run):
    pre, ds, results, _ = precompute_run
    docs = [{"question_id": f"q{i}", "question": "?", "options": [],
             "answer": "A", "duration": "short", "domain": "d",
             "sub_category": "s", "task_type": "t", "videoID": f"v{i}.mp4",
             "frame_idx": results[f"q{i}"]} for i in range(3)]
    shards = [evaluate_task("VideoMME", docs, StubBackbone(),
                            video_root=str(ds.video_root), max_frames_num=8,
                            shard=(r, 2), on_error="raise") for r in range(2)]
    merged = merge_shards("VideoMME", shards)
    assert len(merged.results) == 3


def test_harness_error_resilience(tmp_path):
    docs = [{"question_id": "q0", "question": "?", "options": [], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": "nope.mp4"}]
    res = evaluate_task("VideoMME", docs, StubBackbone(), video_root=str(tmp_path),
                        max_frames_num=4)
    assert len(res.results) == 1
    assert res.samples[0]["response"].startswith("[error:")


# ---------------- parsing + aggregation ----------------

def test_extract_answer_letter():
    assert extract_answer_letter("The best answer is C.") == "C"
    assert extract_answer_letter("(B) green") == "B"
    assert extract_answer_letter("I think the scene shows a long story about "
                                 "something with many words and no letter"
                                 " at all really truly nothing") == ""
    assert extract_answer_letter("b") == ""  # uppercase only, as reference


def test_parse_multi_choice_random_fallback():
    import random
    rng = random.Random(0)
    out = parse_multi_choice_response("no idea x y z w q r s t u v longer than ten words here",
                                      ["A", "B", "C"], rng)
    assert out in {"A", "B", "C"}
    assert parse_multi_choice_response("D. A book", list("ABCD")) == "D"


def test_mlvu_aggregate():
    results = ([{"task_type": "count", "pred_answer": "A", "answer": "A"}] * 3 +
               [{"task_type": "order", "pred_answer": "B", "answer": "A"}])
    out = aggregate_mlvu_dev(results)
    assert out["count"] == 100.0
    assert out["order"] == 0.0
    assert out["overall"] == 75.0


def test_videomme_aggregate():
    results = [
        {"duration": "short", "category": "c1", "pred_answer": "A", "answer": "A"},
        {"duration": "long", "category": "c1", "pred_answer": "B", "answer": "A"},
        {"duration": "long", "category": "c2", "pred_answer": "A", "answer": "A"},
    ]
    out = aggregate_videomme(results)
    assert out["short"] == 100.0
    assert out["long"] == 50.0
    assert out["overall"] == pytest.approx(200 / 3)
    assert out["categories"]["c1"] == 50.0


def test_harness_live_scoring(precompute_run, scorer):
    """Single-phase live scoring: no frame_idx in docs, the temporal agent
    selects frames on the fly (llava_vid_tspo.py load_video_sampled path)."""
    pre, ds, results, _ = precompute_run
    docs = [{"question_id": f"q{i}", "question": f"What is shown {i}?",
             "options": ["A. red", "B. green"], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": f"v{i}.mp4"} for i in range(2)]
    backbone = StubBackbone()
    res = evaluate_task("VideoMME", docs, backbone,
                        video_root=str(ds.video_root), max_frames_num=8,
                        scorer=scorer, on_error="raise")
    assert len(res.results) == 2
    # selected frames are absolute candidate indices, sorted
    fi = res.samples[0]["frame_idx"]
    assert len(fi) == 8 and fi == sorted(fi)
    assert backbone.calls[0][0][0] == 8


def test_live_clip_query_matches_precompute(bench_dir, tmp_path):
    """Live-scored frame_idx == precomputed frame_idx for docs whose question
    field embeds options text (round-3 VERDICT weak #5): the harness must
    strip at "\\nOptions" exactly like phase-1 (datasets.py::problem_text /
    gen_id_tspo.py:62-65), not hand the full option block to CLIP."""
    from tspo_tpu.cli.common import _stub_tokenizer
    from tspo_tpu.eval.tasks import clip_query_text
    # text-SENSITIVE tokenizer (char hash) — a query mismatch changes indices
    tok = _stub_tokenizer(eos=CLIP_CFG.text.eos_token_id, length=8,
                          vocab=CLIP_CFG.text.vocab_size)
    s = build_random_scorer(seed=0, clip_cfg=CLIP_CFG, selector_cfg=SEL_CFG,
                            dtype=jnp.float32, tokenize=tok, batch_frames=32,
                            frame_buckets=(64, 128, 256))
    ds = VideoQuestionDataset.from_tsv("TinyBench",
                                       str(bench_dir / "TinyBench.tsv"),
                                       str(bench_dir / "videos"))
    pre = FrameIndexPrecompute(s, FeatureCache(str(tmp_path / "c")),
                               PrecomputeConfig(sample_num=8, max_frames=256),
                               work_dir=str(tmp_path / "w"), name="Q")
    results = pre.run(ds)

    # live docs: question embeds the options block, as the TSV prompt does
    docs = [{"question_id": f"q{i}",
             "question": (f"What is shown {i}?\nOptions:\n(A):red (B):green "
                          "Please select the correct answer from the options "
                          "above. \n"),
             "options": ["A. red", "B. green"], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": f"v{i}.mp4"} for i in range(3)]
    assert clip_query_text(docs[0]) == "What is shown 0?"
    res = evaluate_task("VideoMME", docs, StubBackbone(),
                        video_root=str(ds.video_root), max_frames_num=8,
                        scorer=s, live_method="topk", live_max_candidates=256,
                        on_error="raise")
    live = {sm["doc_id"]: [float(x) for x in sm["frame_idx"]]
            for sm in res.samples}
    assert live == results


def test_aks_method_with_dataset_params(bench_dir, scorer, tmp_path):
    """AKS precompute with per-dataset thresholds runs end-to-end."""
    from tspo_tpu.eval.precompute import AKS_PARAMS
    assert AKS_PARAMS["VideoMME"] == {"t1": 0.8, "all_depth": 5}
    ds = VideoQuestionDataset.from_tsv("TinyBench", str(bench_dir / "TinyBench.tsv"),
                                       str(bench_dir / "videos"))
    pre = FrameIndexPrecompute(scorer, FeatureCache(str(tmp_path / "c")),
                               PrecomputeConfig(sample_num=8, max_frames=256,
                                                method="aks"),
                               work_dir=str(tmp_path / "w"), name="AKS")
    results = pre.run(ds)
    assert set(results) == {"q0", "q1", "q2"}
    for ids in results.values():
        assert 0 < len(ids) <= 8 and ids == sorted(ids)


def test_precompute_corrupt_video_recorded_not_retried(bench_dir, scorer,
                                                       tmp_path):
    """A permanently broken video is logged + recorded in the errors pkl and
    NOT re-decoded on resume (VERDICT r1 Weak #4: errors used to vanish)."""
    root = tmp_path / "bench"
    (root / "videos").mkdir(parents=True)
    _write_video(root / "videos" / "good.mp4")
    with open(root / "videos" / "bad.mp4", "wb") as f:
        f.write(b"not a video at all")
    with open(root / "B.tsv", "w") as f:
        f.write("index\ttask_name\tvideo_name\tquestion_id\tquestion\t"
                "answer_number\tcandidates\tanswer\n")
        f.write("0\tB\tgood.mp4\tqg\tWhat?\t0\t['x','y']\tA\n")
        f.write("1\tB\tbad.mp4\tqb\tWhat?\t0\t['x','y']\tA\n")
    ds = VideoQuestionDataset.from_tsv("B", str(root / "B.tsv"),
                                       str(root / "videos"))
    pre = FrameIndexPrecompute(scorer, FeatureCache(str(tmp_path / "c")),
                               PrecomputeConfig(sample_num=8, max_frames=512),
                               work_dir=str(tmp_path / "w"), name="T")
    results = pre.run(ds)
    assert set(results) == {"qg"}
    errors = pre.load_errors("B")
    assert set(errors) == {"qb"} and errors["qb"]  # visible, with a message

    # resume: the broken video must not be decoded again
    import tspo_tpu.eval.precompute as pc
    calls = []
    orig = pc.load_video_indices

    def counting_load(path, *a, **kw):
        calls.append(path)
        return orig(path, *a, **kw)

    pc.load_video_indices = counting_load
    try:
        again = pre.run(ds)
    finally:
        pc.load_video_indices = orig
    assert again == results
    assert not any("bad.mp4" in c for c in calls)


def test_precompute_multirank_no_clobber(bench_dir, scorer, tmp_path):
    """Two ranks sharing one work_dir must not clobber each other's supp.pkl
    (round-3 review finding: last-writer-wins dropped whole shards and
    phase-2 silently fell back to uniform sampling for them)."""
    ds = VideoQuestionDataset.from_tsv("TinyBench",
                                       str(bench_dir / "TinyBench.tsv"),
                                       str(bench_dir / "videos"))
    work = tmp_path / "w"
    pre = FrameIndexPrecompute(
        scorer, FeatureCache(str(tmp_path / "cache")),
        PrecomputeConfig(sample_num=8, max_frames=512),
        work_dir=str(work), name="MR")
    r0 = pre.run(ds, shard=(0, 2))
    r1 = pre.run(ds, shard=(1, 2))
    assert r0 and r1 and not (set(r0) & set(r1))
    merged = pre.load_results("TinyBench")          # merge view
    assert set(merged) == set(r0) | set(r1)
    assert len(merged) == 3
    # per-rank files both exist (no shared-file overwrite)
    import glob
    assert len(glob.glob(str(work / "MR_TinyBench_supp_rank*of2.pkl"))) == 2


def test_precompute_pooled_decode_matches_single(precompute_run, scorer,
                                                 bench_dir, tmp_path):
    """decode_workers>1 (native C++ pool) produces identical frame indices
    to the single-thread prefetch path."""
    from tspo_tpu.video import native
    if not native.pool_available():
        pytest.skip("native decode pool unavailable")
    _, ds, results, _ = precompute_run
    pre2 = FrameIndexPrecompute(
        scorer, FeatureCache(str(tmp_path / "cache2")),
        PrecomputeConfig(sample_num=8, checkpoint_every=2, max_frames=512),
        work_dir=str(tmp_path), name="POOL", decode_workers=3)
    results2 = pre2.run(ds)
    assert results2.keys() == results.keys()
    for qid in results:
        assert results2[qid] == results[qid]


def test_response_cache_not_poisoned_without_doc_ids(tmp_path):
    """Docs with NO unique id key must never share cache entries
    (code-review r2 finding #1: doc.get('question_id') -> None keyed every
    doc to the same cached response)."""
    from tspo_tpu.eval.caching import ResponseCache
    for i, shade in enumerate((30, 220)):           # dark -> "A", light -> "B"
        _write_video(tmp_path / f"v{i}.mp4", n_frames=30, wh=(48, 48))
        import cv2
        w = cv2.VideoWriter(str(tmp_path / f"v{i}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (48, 48))
        for _ in range(30):
            w.write(np.full((48, 48, 3), shade, np.uint8))
        w.release()
    # MVBench-style docs: no question_id/id/qid/video_idx/index/uid
    docs = [{"question": f"What {i}?", "candidates": ["x", "y"],
             "answer": "x", "video": f"v{i}.mp4", "frame_idx": [0, 3, 6]}
            for i in range(2)]
    cache = ResponseCache(str(tmp_path), "MVBench")
    backbone = StubBackbone()
    res = evaluate_task("MVBench", docs, backbone, video_root=str(tmp_path),
                        max_frames_num=3, response_cache=cache,
                        on_error="raise")
    responses = [s["response"] for s in res.samples]
    assert responses[0] != responses[1]          # each doc answered itself
    assert len(backbone.calls) == 2              # nothing served from cache
    assert cache.get(None) is None               # and None was never stored


def test_response_cache_resumes_via_fallback_id(tmp_path):
    """EgoSchema docs carry video_idx (a fallback id): second run must be
    served fully from cache."""
    from tspo_tpu.eval.caching import ResponseCache
    _write_video(tmp_path / "e0.mp4", n_frames=30, wh=(48, 48))
    docs = [{"video_idx": "e0", "question": "What?", "answer": 0,
             "option": ["A. x", "B. y", "C. z", "D. w", "E. v"],
             "frame_idx": [0, 3, 6]}]
    kw = dict(video_root=str(tmp_path), max_frames_num=3, on_error="raise")
    b1 = StubBackbone()
    evaluate_task("EgoSchema", docs, b1,
                  response_cache=ResponseCache(str(tmp_path), "Ego"), **kw)
    assert len(b1.calls) == 1
    b2 = StubBackbone()
    res2 = evaluate_task("EgoSchema", docs, b2,
                         response_cache=ResponseCache(str(tmp_path), "Ego"),
                         **kw)
    assert len(b2.calls) == 0                    # resume: no regeneration
    assert len(res2.results) == 1


def _shared_video_bench(root, n_questions=3):
    (root / "videos").mkdir(exist_ok=True)
    _write_video(root / "videos" / "shared.mp4", n_frames=120)
    rows = [dict(index=str(i), task_name="ShareBench",
                 video_name="shared.mp4", question_id=f"q{i}",
                 question=f"What is shown {i}?", answer_number="0",
                 candidates="['red', 'green', 'blue']", answer="A")
            for i in range(n_questions)]
    tsv = root / "ShareBench.tsv"
    with open(tsv, "w") as f:
        cols = list(rows[0])
        f.write("\t".join(cols) + "\n")
        for r in rows:
            f.write("\t".join(r[c] for c in cols) + "\n")
    return VideoQuestionDataset.from_tsv("ShareBench", str(tsv),
                                         str(root / "videos"))


def _counting_scorer():
    s = build_random_scorer(seed=0, clip_cfg=CLIP_CFG, selector_cfg=SEL_CFG,
                            dtype=jnp.float32, tokenize=_tokenize,
                            batch_frames=32, frame_buckets=(64, 128, 256))
    calls = []
    orig = s.encode_frame_features

    def counted(frames):
        calls.append(frames.shape[0])
        return orig(frames)

    s.encode_frame_features = counted
    return s, calls


def test_precompute_video_feature_sharing(tmp_path):
    """3 questions over ONE video: the vision tower runs once with
    share_video_features (the default) vs once per question without, and the
    emitted frame indices are identical."""
    ds = _shared_video_bench(tmp_path)
    s1, calls1 = _counting_scorer()
    pre1 = FrameIndexPrecompute(
        s1, FeatureCache(str(tmp_path / "c1")),
        PrecomputeConfig(sample_num=8, max_frames=512),
        work_dir=str(tmp_path / "w1"), name="T")
    res1 = pre1.run(ds)
    assert len(calls1) == 1, f"vision encode ran {len(calls1)}x, want 1"

    s2, calls2 = _counting_scorer()
    pre2 = FrameIndexPrecompute(
        s2, FeatureCache(str(tmp_path / "c2")),
        PrecomputeConfig(sample_num=8, max_frames=512,
                         share_video_features=False),
        work_dir=str(tmp_path / "w2"), name="T")
    res2 = pre2.run(ds)
    assert len(calls2) == 3
    assert res1 == res2
    # per-question blobs exist in the reference format either way
    for i in range(3):
        blob = pre1.cache.load("ShareBench", str(i))
        assert set(blob) >= {"image_features", "text_features",
                             "clip_scores", "sampled_idx"}


def test_precompute_vidhit_needs_no_decode(tmp_path):
    """A new question for an already-encoded video scores WITHOUT touching
    the video file (the vidhit path)."""
    ds = _shared_video_bench(tmp_path, n_questions=1)
    s, _ = _counting_scorer()
    cache = FeatureCache(str(tmp_path / "c"))
    pre = FrameIndexPrecompute(
        s, cache, PrecomputeConfig(sample_num=8, max_frames=512),
        work_dir=str(tmp_path / "w"), name="T")
    pre.run(ds)
    video_path = str(tmp_path / "videos" / "shared.mp4")
    os.remove(video_path)  # decode would now fail loudly
    new_q = {"index": "99", "question_id": "q99", "video_path": video_path,
             "problem": "Something new?"}
    ids = pre.frame_indices_for(new_q, "ShareBench")
    assert len(ids) == 8


def test_precompute_video_grouped_sharding(tmp_path):
    """With sharing on, a video's questions stay on ONE rank (exact cover,
    no overlap), so multi-host phase-1 keeps the one-encode-per-video
    economics; with sharing off the slicing is the reference's i%world."""
    ds = _shared_video_bench(tmp_path)  # 3 questions, one video
    s, calls = _counting_scorer()
    pre = FrameIndexPrecompute(
        s, FeatureCache(str(tmp_path / "c")),
        PrecomputeConfig(sample_num=8, max_frames=512),
        work_dir=str(tmp_path / "w"), name="T")
    structs = list(ds.iter_structs())
    shards = [pre._shard_structs(structs, r, 2) for r in range(2)]
    got = sorted(x["question_id"] for sh in shards for x in sh)
    assert got == sorted(x["question_id"] for x in structs)
    # all three land on the same rank (single video group)
    assert sorted(map(len, shards)) == [0, 3]
    # reference striping when sharing is disabled
    pre_off = FrameIndexPrecompute(
        s, FeatureCache(str(tmp_path / "c2")),
        PrecomputeConfig(sample_num=8, max_frames=512,
                         share_video_features=False),
        work_dir=str(tmp_path / "w2"), name="T")
    off = [pre_off._shard_structs(structs, r, 2) for r in range(2)]
    assert [len(x) for x in off] == [2, 1]


def test_precompute_video_grouped_sharding_balance():
    """Many single-question videos still balance across ranks."""
    from tspo_tpu.eval.precompute import FrameIndexPrecompute
    from tspo_tpu.video.cache import FeatureCache
    pre = FrameIndexPrecompute.__new__(FrameIndexPrecompute)
    pre.cfg = PrecomputeConfig(sample_num=8)
    structs = ([{"question_id": f"a{i}", "video_path": "big.mp4"}
                for i in range(4)]
               + [{"question_id": f"s{i}", "video_path": f"v{i}.mp4"}
                  for i in range(4)])
    shards = [pre._shard_structs(structs, r, 2) for r in range(2)]
    assert sorted(map(len, shards)) == [4, 4]
    got = sorted(x["question_id"] for sh in shards for x in sh)
    assert got == sorted(x["question_id"] for x in structs)


def test_precompute_producer_decodes_video_once(tmp_path):
    """The prefetch producer must not decode the same video once per
    question (the video blob is written by the consumer AFTER the producer
    has raced ahead) — the in-flight video set makes later questions
    vidhits."""
    ds = _shared_video_bench(tmp_path)
    s, _ = _counting_scorer()
    pre = FrameIndexPrecompute(
        s, FeatureCache(str(tmp_path / "c")),
        PrecomputeConfig(sample_num=8, max_frames=512),
        work_dir=str(tmp_path / "w"), name="T")
    decodes = []
    orig = pre._decode_candidates
    pre._decode_candidates = \
        lambda p: (decodes.append(p) or orig(p))
    pre.run(ds)
    assert len(decodes) == 1, decodes


def test_precompute_resume_across_shard_scheme_change(tmp_path):
    """Questions finished under i%world striping are not recomputed when
    the grouped sharding (or a different world size) re-assigns them."""
    ds = _shared_video_bench(tmp_path)
    s1, calls1 = _counting_scorer()
    work, cache = str(tmp_path / "w"), FeatureCache(str(tmp_path / "c"))
    cfg_off = PrecomputeConfig(sample_num=8, max_frames=512,
                               share_video_features=False)
    pre = FrameIndexPrecompute(s1, cache, cfg_off, work_dir=work, name="T")
    # old-style striping, rank 0 of 2 -> q0, q2 done and checkpointed
    pre.run(ds, shard=(0, 2))
    # new run, sharing on: grouped sharding puts ALL questions on one rank;
    # the merged-view filter must skip the two already-finished questions
    s2, calls2 = _counting_scorer()
    pre2 = FrameIndexPrecompute(
        s2, cache, PrecomputeConfig(sample_num=8, max_frames=512),
        work_dir=work, name="T")
    scored = []
    for r in range(2):
        res = pre2.run(ds, shard=(r, 2))
        scored.extend(res)
    done = pre2.load_results("ShareBench")
    assert sorted(done) == ["q0", "q1", "q2"]
    # only the one missing question was computed (its features via cache)
    assert len(calls2) <= 1


def test_harness_batched_emit_failure_drops_no_docs(bench_dir, monkeypatch):
    """A process_response exception for ONE doc mid-flush must not swallow
    the rest of the batch (review finding): the failing doc records an
    [error:] response, every other doc emits normally."""
    from tspo_tpu.eval.tasks import TASK_REGISTRY
    import dataclasses
    docs = _vmme_docs(4)
    real = TASK_REGISTRY["VideoMME"]

    def exploding(doc, response, rng=None):
        if doc["question_id"] == "q1":
            raise KeyError("malformed doc")
        return real.process_response(doc, response, rng)

    monkeypatch.setitem(TASK_REGISTRY, "VideoMME",
                        dataclasses.replace(real,
                                            process_response=exploding))
    res = evaluate_task("VideoMME", docs, BatchingBackbone(),
                        video_root=str(bench_dir / "videos"),
                        max_frames_num=8, batch_size=4)
    # q1 fails twice (the error-record retry also raises) -> loudly dropped;
    # q0/q2/q3 must all survive
    assert len(res.samples) == 3
    assert sorted(s["doc_id"] for s in res.samples) == ["q0", "q2", "q3"]


def test_clip_query_strips_mid_string_marker():
    """datasets.py:95 replaces "Question: " EVERYWHERE; a pre_prompt can
    push the marker mid-string (review finding)."""
    from tspo_tpu.eval.tasks import clip_query_text
    doc = {"question": ("Watch the video.\nQuestion: What happens?"
                        "\nOptions:\n(A) x")}
    assert clip_query_text(doc) == "Watch the video.\nWhat happens?"


def test_harness_emit_retry_never_double_counts(bench_dir, monkeypatch):
    """A failure AFTER process_response (non-mapping rec breaking the sample
    merge) must not leave the doc in results before the [error:] retry
    re-emits it — that would double-count it in every metric denominator
    (review finding)."""
    from tspo_tpu.eval.tasks import TASK_REGISTRY
    import dataclasses
    docs = _vmme_docs(4)
    real = TASK_REGISTRY["VideoMME"]

    def non_mapping(doc, response, rng=None):
        if doc["question_id"] == "q1" \
                and not str(response).startswith("[error:"):
            return ["not", "a", "mapping"]      # `**rec` merge raises
        return real.process_response(doc, response, rng)

    monkeypatch.setitem(TASK_REGISTRY, "VideoMME",
                        dataclasses.replace(real,
                                            process_response=non_mapping))
    res = evaluate_task("VideoMME", docs, BatchingBackbone(),
                        video_root=str(bench_dir / "videos"),
                        max_frames_num=8, batch_size=4)
    # exactly one record per doc: q1 re-emitted once with [error:], never two
    assert len(res.results) == 4
    assert len(res.samples) == 4
    assert sorted(s["doc_id"] for s in res.samples) == ["q0", "q1", "q2", "q3"]
    assert sum(str(s["response"]).startswith("[error:")
               for s in res.samples) == 1


def test_harness_progress_failure_never_double_counts(bench_dir):
    """A raising progress callback is display-only: the record is already
    emitted, so the harness must swallow it rather than let _emit_safe
    re-emit the doc (review finding)."""
    docs = _vmme_docs(3)

    def bad_progress(qid):
        raise RuntimeError("tracker write failed")

    res = evaluate_task("VideoMME", docs, BatchingBackbone(),
                        video_root=str(bench_dir / "videos"),
                        max_frames_num=8, batch_size=3,
                        progress=bad_progress)
    assert len(res.results) == 3
    assert sorted(s["doc_id"] for s in res.samples) == ["q0", "q1", "q2"]
    assert not any(str(s["response"]).startswith("[error:")
                   for s in res.samples)
