"""PLM-VideoBench: metric-primitive value parity vs the reference
plm_videobench/eval_utils.py (IoU, detection precision/recall, delta-segment
parsing, SODA dp matching, SODA_c), fgqa/rtloc rule parity, prompt bytes vs
the sub-task yamls, and judged-task behavior with a fake judge.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.plm_videobench import (
    CAPTION_JUDGE_SYS_PROMPT, FGQA_PROMPT, RCAP_PROMPT, RDCAP_PROMPT,
    RTLOC_PROMPT, SGQA_JUDGE_SYS_PROMPT, SGQA_PROMPT, calculate_iou,
    caption_judge_user_prompt, check_ans, draw_bounding_boxes,
    evaluate_detections, extract_delta_segments, fgqa_qa_template,
    load_stc_metadata, make_plm_tasks, monotone_assignment_score,
    sgqa_judge_user_prompt, sodac_llm_score)

REF_DIR = "/root/reference/lmms-eval/lmms_eval/tasks/plm_videobench"


class FakeJudge(JudgeProvider):
    def __init__(self, reply):
        super().__init__()
        self.reply = reply
        self.requests = []

    def complete(self, messages):
        self.requests.append(messages)
        return self.reply


def _load_ref_eval_utils():
    path = os.path.join(REF_DIR, "eval_utils.py")
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    stubs = {}
    specs = (("openai", {"RateLimitError": type("RateLimitError",
                                               (Exception,), {}),
                         "OpenAI": lambda **kw: object()}),
             ("huggingface_hub", {"hf_hub_download": lambda **kw: "/dev/null"}))
    for name, attrs in specs:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            stubs[name] = m
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location("ref_plm_eval_utils",
                                                      path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for name in stubs:
            sys.modules.pop(name, None)


def _load_ref_subtask(sub: str, metadata_entries=()):
    """Load e.g. fgqa/fgqa_utils.py with the lmms_eval package structure and
    the hub metadata download stubbed to a local jsonl."""
    path = os.path.join(REF_DIR, sub, f"{sub}_utils.py")
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    import tempfile
    meta_file = tempfile.NamedTemporaryFile("w", suffix=".jsonl",
                                            delete=False)
    for e in metadata_entries or [{"video": "v.mp4", "masklet_id": 0,
                                   "bbox": {}}]:
        meta_file.write(json.dumps(e) + "\n")
    meta_file.close()

    stubs = {}
    specs = [("openai", {"RateLimitError": type("RateLimitError",
                                                (Exception,), {}),
                         "OpenAI": lambda **kw: object()}),
             ("huggingface_hub",
              {"hf_hub_download": lambda **kw: meta_file.name}),
             ("lmms_eval", {}), ("lmms_eval.tasks", {}),
             ("lmms_eval.tasks.plm_videobench", {})]
    patched = []   # (module, attr, original) — for ALREADY-imported modules
    for name, attrs in specs:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            stubs[name] = m
        else:
            # a real module (e.g. huggingface_hub pulled in by an earlier
            # test) must still have its download hook neutered, else this
            # zero-egress run hangs on the network
            for k, v in attrs.items():
                mod = sys.modules[name]
                patched.append((mod, k, getattr(mod, k, None)))
                setattr(mod, k, v)
    sys.modules.update(stubs)
    try:
        # eval_utils must be importable as the package attribute the
        # sub-task's star-import resolves
        spec = importlib.util.spec_from_file_location(
            "lmms_eval.tasks.plm_videobench.eval_utils",
            os.path.join(REF_DIR, "eval_utils.py"))
        eval_utils = importlib.util.module_from_spec(spec)
        sys.modules["lmms_eval.tasks.plm_videobench.eval_utils"] = eval_utils
        stubs["lmms_eval.tasks.plm_videobench.eval_utils"] = eval_utils
        spec.loader.exec_module(eval_utils)
        spec2 = importlib.util.spec_from_file_location(f"ref_{sub}_utils",
                                                       path)
        mod = importlib.util.module_from_spec(spec2)
        spec2.loader.exec_module(mod)
        return mod
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
        for mod, k, orig in patched:
            if orig is None:
                delattr(mod, k)
            else:
                setattr(mod, k, orig)
        os.unlink(meta_file.name)


# ---------------------------------------------------------------------------
# metric primitives vs eval_utils.py
# ---------------------------------------------------------------------------

SEG_CASES = [([0, 10], [5, 15]), ([0, 10], [20, 30]), ([3, 7], [3, 7]),
             ([10, 0], [2, 8]), ([0, 100], [40, 60])]


@pytest.mark.parametrize("a,b", SEG_CASES)
def test_iou_matches_reference(a, b):
    ref = _load_ref_eval_utils()
    assert calculate_iou(a, b) == pytest.approx(ref.calculate_iou(a, b))


def test_evaluate_detections_matches_reference():
    ref = _load_ref_eval_utils()
    pred = np.array([[0, 10], [12, 20], [40, 50]])
    gt = np.array([[1, 9], [13, 22]])
    p1, r1, iou1, m1 = evaluate_detections(pred, gt)
    p2, r2, iou2, m2 = ref.evaluate_detections(pred, gt)
    assert p1 == pytest.approx(p2)
    assert r1 == pytest.approx(r2)
    np.testing.assert_allclose(iou1, iou2)
    for t in ("0.3", "0.5", "0.7", "0.9"):
        assert m1[t]["pred_covered"] == m2[t]["pred_covered"]
        assert m1[t]["gt_covered"] == m2[t]["gt_covered"]


def test_evaluate_detections_empty_pred_matches_reference():
    ref = _load_ref_eval_utils()
    gt = np.array([[1, 9]])
    pred = np.zeros((0, 2))
    p1, r1, iou1, _ = evaluate_detections(pred, gt)
    p2, r2, iou2, _ = ref.evaluate_detections(pred, gt)
    assert p1 == pytest.approx(p2) and r1 == pytest.approx(r2)
    assert iou1.shape == iou2.shape == (1, 1)


DELTA_CASES = [
    "[0, 5]: a man walks\n[6, 12]: he sits down",
    "[0,5] walking,\n[10, 20]\nFrame description here",
    "no segments at all",
    "[3, 9]: caption: with colons",
    "  [1, 2] x [4, 8] y",
]


@pytest.mark.parametrize("text", DELTA_CASES)
def test_extract_delta_segments_matches_reference(text):
    ref = _load_ref_eval_utils()
    seg1, cap1 = extract_delta_segments(text)
    seg2, cap2 = ref.extract_delta_segments(text)
    assert cap1 == cap2
    assert np.asarray(seg1).tolist() == np.asarray(seg2).tolist()


def test_dp_assignment_matches_reference():
    ref = _load_ref_eval_utils()
    rng = np.random.RandomState(0)
    for shape in [(1, 1), (2, 3), (3, 2), (4, 4), (5, 2), (1, 6)]:
        scores = rng.rand(*shape)
        ours = monotone_assignment_score(scores)
        theirs, _ = ref.chased_dp_assignment(scores.copy())
        assert ours == pytest.approx(theirs), shape


def test_sodac_matches_reference():
    ref = _load_ref_eval_utils()
    rng = np.random.RandomState(1)
    iou = rng.rand(3, 4)
    score = rng.rand(3, 4)
    preds = ["a", "b", "c", "d"]
    gts = ["x", "y", "z"]
    for thresholds in [(0.0,), (0.3, 0.5), (0.9,)]:
        assert sodac_llm_score(iou, score, preds, gts, thresholds) == \
            pytest.approx(ref.sodac_llm_score(iou, score, preds, gts,
                                              thresholds))
    assert sodac_llm_score(iou, score, [], gts) == 0


# ---------------------------------------------------------------------------
# judge prompts byte-parity
# ---------------------------------------------------------------------------

def test_judge_prompts_match_reference():
    ref = _load_ref_eval_utils()
    msgs = ref.get_caption_judge_prompt("GT CAP", "PRED CAP")
    assert msgs[0]["content"] == CAPTION_JUDGE_SYS_PROMPT
    assert msgs[1]["content"] == caption_judge_user_prompt("GT CAP",
                                                           "PRED CAP")
    msgs = ref.get_sgqa_judge_prompt("Q?", "pred ans", "gold ans")
    assert msgs[0]["content"] == SGQA_JUDGE_SYS_PROMPT
    assert msgs[1]["content"] == sgqa_judge_user_prompt("Q?", "pred ans",
                                                        "gold ans")


# ---------------------------------------------------------------------------
# fgqa
# ---------------------------------------------------------------------------

FGQA_DOC = {"uid": "u1", "qa_uid": "g1", "video": "v.mp4",
            "question": "What is the person holding?",
            "options": {"option_0": "a red cup", "option_1": "a phone",
                        "option_2": "a book"},
            "answer": "a phone"}


def test_fgqa_template_matches_reference():
    ref = _load_ref_subtask("fgqa")
    q1, a1 = fgqa_qa_template(FGQA_DOC)
    q2, a2 = ref.qa_template(dict(FGQA_DOC))
    assert (q1, a1) == (q2, a2)


def test_fgqa_prompt_matches_reference():
    ref = _load_ref_subtask("fgqa")
    ours = make_plm_tasks(FakeJudge("x"))["PLM-fgqa"]
    assert ours.doc_to_text(FGQA_DOC) == ref.plm_fgqa_doc_to_text(
        dict(FGQA_DOC), {"prompt": FGQA_PROMPT})


@pytest.mark.parametrize("pred", [
    "(B) a phone", "(B)", "B", "b.", "Answer: (B) a phone", "(A) a red cup",
    "(C)", "a phone", "The answer is (B).",
])
def test_fgqa_check_ans_matches_reference(pred):
    ref = _load_ref_subtask("fgqa")
    _, gt = fgqa_qa_template(FGQA_DOC)
    assert check_ans(pred, gt) == ref.check_ans(pred, gt)


def test_fgqa_multibinary_aggregate():
    tasks = make_plm_tasks(FakeJudge("x"))
    fg = tasks["PLM-fgqa"]
    docs = [dict(FGQA_DOC, uid=f"u{i}", qa_uid=g)
            for i, g in enumerate(["g1", "g1", "g2"])]
    results = [fg.process_response(d, p)
               for d, p in zip(docs, ["(B) a phone", "(A)", "(B) a phone"])]
    agg = fg.aggregate(results)
    # g1 has one wrong -> fails all-vs-one; g2 all right -> 1/2
    assert agg["multibinary_accuracy"] == pytest.approx(0.5)
    assert agg["num_instances"] == 3


# ---------------------------------------------------------------------------
# rtloc
# ---------------------------------------------------------------------------

RTLOC_DOC = {"uid": "r1", "video": "v.mp4", "masklet_id": 0,
             "caption": "the dog jumps", "start_frame": 24,
             "end_frame": 48, "total_frames": 96}


def test_rtloc_prompt_matches_reference():
    ref = _load_ref_subtask("rtloc")
    ours = make_plm_tasks(FakeJudge("x"))["PLM-rtloc"]
    assert ours.doc_to_text(RTLOC_DOC) == ref.plm_rtloc_doc_to_text(
        dict(RTLOC_DOC), {"prompt": RTLOC_PROMPT})


@pytest.mark.parametrize("pred", [
    "[8, 16]", "the event happens at [8, 16] roughly", "[8.5, 16.0]",
    "no window here", "[8 16]",
])
def test_rtloc_process_matches_reference(pred):
    ref = _load_ref_subtask("rtloc")
    ours = make_plm_tasks(FakeJudge("x"))["PLM-rtloc"]
    r1 = ours.process_response(RTLOC_DOC, pred)
    r2 = ref.plm_rtloc_process_results(dict(RTLOC_DOC), [pred])[
        "plm_rtloc_scores"]
    assert r1["parse_error"] == r2["parse_error"]
    assert r1["mean_precision"] == pytest.approx(r2["mean_precision"])
    assert r1["mean_recall"] == pytest.approx(r2["mean_recall"])
    assert r1["mIOU"] == pytest.approx(r2["mIOU"])


def test_rtloc_target_matches_reference():
    ref = _load_ref_subtask("rtloc")
    expected = ref.plm_rtloc_doc_to_target(dict(RTLOC_DOC))
    # gt rescale 96 -> 32 frames: [8, 16]
    assert expected.tolist() == [[8, 16]]


# ---------------------------------------------------------------------------
# judged sub-tasks with a fake judge
# ---------------------------------------------------------------------------

def test_rcap_prompt_and_scoring():
    judge = FakeJudge('{"score": 7, "explanation": "close"}')
    tasks = make_plm_tasks(judge)
    rcap = tasks["PLM-rcap"]
    doc = {"uid": "c1", "video": "v.mp4", "masklet_id": 1,
           "caption": "gt caption", "start_frame": 24, "end_frame": 48,
           "total_frames": 96}
    prompt = rcap.doc_to_text(doc)
    assert prompt == RCAP_PROMPT.format(start_frame=8, end_frame=16,
                                        total_frames=96)
    r = rcap.process_response(doc, "my caption")
    assert r["llm_judge_score"] == pytest.approx(0.7)
    assert r["success"] == 1
    agg = rcap.aggregate([r])
    assert agg["llm_judge_score"] == pytest.approx(0.7)
    assert agg["success_rate"] == 1.0
    # judge messages mirror get_caption_judge_prompt
    sys_msg = [m for m in judge.requests[0] if m["role"] == "system"][0]
    assert sys_msg["content"] == CAPTION_JUDGE_SYS_PROMPT


def test_rcap_judge_parse_failure_scores_zero():
    tasks = make_plm_tasks(FakeJudge("not json"))
    doc = {"uid": "c1", "video": "v.mp4", "caption": "g", "start_frame": 0,
           "end_frame": 4, "total_frames": 32}
    r = tasks["PLM-rcap"].process_response(doc, "p")
    assert r["llm_judge_score"] == 0 and r["success"] == 0


def test_sgqa_prompt_and_scoring():
    judge = FakeJudge('{"pred": "yes", "score": 4}')
    tasks = make_plm_tasks(judge)
    sgqa = tasks["PLM-sgqa"]
    doc = {"uid": "s1", "video": "v.mp4", "question": "What did I cook?",
           "answer": "pasta"}
    assert sgqa.doc_to_text(doc) == SGQA_PROMPT.format(
        question="What did I cook?", answer="{answer}")
    r = sgqa.process_response(doc, "you cooked pasta")
    assert r["success"] is True
    # fall back to substring scan on unparseable judge output
    tasks2 = make_plm_tasks(FakeJudge("Yes the answer matches"))
    assert tasks2["PLM-sgqa"].process_response(doc, "x")["success"] is True
    tasks3 = make_plm_tasks(FakeJudge("not a match"))
    assert tasks3["PLM-sgqa"].process_response(doc, "x")["success"] is False


def test_rdcap_end_to_end_sodac():
    judge = FakeJudge('{"score": 10, "explanation": "exact"}')
    tasks = make_plm_tasks(judge)
    rdcap = tasks["PLM-rdcap"]
    doc = {"uid": "d1", "video": "v.mp4", "total_frames": 64,
           "dense_captions": [
               {"start_frame": 0, "end_frame": 32, "caption": "walks"},
               {"start_frame": 32, "end_frame": 64, "caption": "sits"}]}
    assert rdcap.doc_to_text(doc) == RDCAP_PROMPT.format(
        start_frame=0, end_frame=31, total_frames=32)
    # perfect prediction: same rescaled windows, judged 10/10
    r = rdcap.process_response(doc, "[0, 16]: walks\n[16, 32]: sits")
    assert r["SODA_c"] == pytest.approx(1.0)
    # no parsable segments -> 0
    r0 = rdcap.process_response(doc, "nothing structured")
    assert r0["SODA_c"] == 0.0


# ---------------------------------------------------------------------------
# STC bbox overlay
# ---------------------------------------------------------------------------

def test_bbox_overlay_and_metadata(tmp_path):
    meta_path = tmp_path / "metadata_test.jsonl"
    entry = {"video": "v.mp4", "masklet_id": 2,
             "bbox": {"5": [2, 2, 10, 10], "9": None}}
    meta_path.write_text(json.dumps(entry) + "\n")
    meta = load_stc_metadata(str(meta_path))
    assert ("v.mp4", 2) in meta

    frames = np.zeros((2, 16, 16, 3), dtype=np.uint8)
    out = draw_bounding_boxes(frames, [5, 9],
                              {int(k): v for k, v in entry["bbox"].items()})
    assert out.shape == frames.shape
    assert out[0].sum() > 0          # rectangle drawn on frame at pos 5
    assert out[1].sum() == 0         # None bbox -> untouched

    tasks = make_plm_tasks(FakeJudge("x"), stc_metadata=meta)
    doc = {"video": "v.mp4", "masklet_id": 2}
    t = tasks["PLM-rcap"]
    transformed = t.transform_frames(doc, frames, [5, 9])
    assert transformed[0].sum() > 0
    # unknown masklet -> passthrough
    assert t.transform_frames({"video": "w.mp4", "masklet_id": 0},
                              frames, [5, 9]).sum() == 0
