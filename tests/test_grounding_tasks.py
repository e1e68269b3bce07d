"""Charades-STA + LSDBench: prompt bytes and scoring parity vs the reference
lmms-eval task functions (charades_sta/{utils,eval_tvg}.py, lsdbench/utils.py).
"""

import importlib.util
import os
import sys
import types

import pytest

from tspo_tpu.eval.grounding_tasks import (
    CHARADES_POST_PROMPT, CHARADES_PRE_PROMPT, aggregate_charades,
    extract_time, lsdbench_extract_characters, segment_iou)
from tspo_tpu.eval.tasks import get_task

REF_TASKS = "/root/reference/lmms-eval/lmms_eval/tasks"

CHARADES_DOC = {"video": "ABC123.mp4",
                "caption": "person turn a light on",
                "timestamp": [24.3, 30.4]}
LSD_DOC = {"video_id": "vid01", "question": "What happened first?",
           "options": {"A": "ate", "B": "slept", "C": "ran", "D": "sang"},
           "correct_answer": "C"}


def _load_ref(relpath: str, stubs=()):
    path = os.path.join(REF_TASKS, relpath)
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    mods = {}
    base = [("loguru", {"logger": __import__("logging").getLogger("stub")}),
            ("decord", {"VideoReader": object, "cpu": object}),
            ("lmms_eval", {}), ("lmms_eval.tasks", {}),
            ("lmms_eval.tasks._task_utils", {}),
            ("lmms_eval.tasks._task_utils.file_utils",
             {"generate_submission_file": lambda *a, **k: "/dev/null"})]
    for name, attrs in base + list(stubs):
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            mods[name] = m
    sys.modules.update(mods)
    old_hf = os.environ.get("HF_HOME")
    os.environ["HF_HOME"] = "/tmp"
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_" + relpath.replace("/", "_").replace(".py", ""), path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        os.environ.pop("HF_HOME", None)
        if old_hf is not None:
            os.environ["HF_HOME"] = old_hf
        for name in mods:
            sys.modules.pop(name, None)


# ---------------------------------------------------------------------------
# Charades-STA
# ---------------------------------------------------------------------------

def test_charades_prompt_bytes():
    out = get_task("Charades-STA").doc_to_text(CHARADES_DOC)
    assert out == (CHARADES_PRE_PROMPT + "person turn a light on. "
                   + CHARADES_POST_PROMPT)
    # the reference yaml's typo is part of the prompt the model sees
    assert "30.4 seonds" in out


def test_charades_prompt_matches_reference():
    ref = _load_ref("charades_sta/utils.py")
    kw = {"pre_prompt": CHARADES_PRE_PROMPT,
          "post_prompt": CHARADES_POST_PROMPT}
    assert get_task("Charades-STA").doc_to_text(CHARADES_DOC) == \
        ref.temporal_grounding_doc_to_text(dict(CHARADES_DOC), kw)


def test_charades_yaml_prompts_match_reference_yaml():
    import yaml
    path = os.path.join(REF_TASKS, "charades_sta/charades.yaml")
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    with open(path) as f:
        cfg = yaml.safe_load("".join(
            line for line in f if "!function" not in line))
    kw = cfg["lmms_eval_specific_kwargs"]["default"]
    assert CHARADES_PRE_PROMPT == kw["pre_prompt"]
    assert CHARADES_POST_PROMPT == kw["post_prompt"]


EXTRACT_TIME_CASES = [
    "The event happens in the 24.3 - 30.4 seconds",
    "The event 'person turn a light on' happens in the 24.3 - 30.4 seonds",
    "It starts at 3.5 seconds\nIt ends at 9.1 seconds",
    "Starting time: 0.8 seconds\nEnding time: 1.1 seconds",
    "The start time for this event is 0 seconds, and the end time is 12 "
    "seconds.",
    "The event starts at 00:00:18\nThe event ends at 00:00:23",
    "from 10 to 20 seconds",          # "to" -> "-" rewrite path
    "no times here at all",
    "",
    "the event happens in 30.0 - 20.8 seconds",   # reversed pair
    "5 - 8 and also 11 - 19",                     # multiple ranges -> first
    "A specific example is : 20.8 - 30.0 seconds. The event happens in the "
    "4.0 - 6.0 seconds",                          # example-snippet strip
    "start 7\nend 9",
    "happens between 14 and 22",  # "and" is not a separator
]


@pytest.mark.parametrize("text", EXTRACT_TIME_CASES)
def test_extract_time_matches_reference(text):
    ref = _load_ref("charades_sta/eval_tvg.py")
    assert [list(p) for p in extract_time(text)] == \
        [list(p) for p in ref.extract_time(text)]


@pytest.mark.parametrize("a,b", [
    ([24.3, 30.4], [24.0, 30.0]),
    ([0.0, 10.0], [20.0, 30.0]),
    ([5.0, 15.0], [10.0, 20.0]),
    ([1.0, 2.0], [1.0, 2.0]),
])
def test_iou_matches_reference(a, b):
    ref = _load_ref("charades_sta/eval_tvg.py")
    assert segment_iou(a, b) == pytest.approx(ref.iou(a, b))


def test_charades_scoring_end_to_end():
    """The aggregate reproduces eval_tvg.py:115-135 over a mixed batch,
    including the miss-penalty fallback window for unparseable answers."""
    task = get_task("Charades-STA")
    docs_preds = [
        ({"video": "a.mp4", "caption": "c1", "timestamp": [10.0, 20.0]},
         "The event happens in the 10.0 - 20.0 seconds"),   # IoU 1.0
        ({"video": "b.mp4", "caption": "c2", "timestamp": [10.0, 20.0]},
         "The event happens in the 12.0 - 18.0 seconds"),   # IoU 0.6
        ({"video": "c.mp4", "caption": "c3", "timestamp": [10.0, 20.0]},
         "I cannot tell"),                                   # fallback, IoU 0
    ]
    results = [task.process_response(d, p) for d, p in docs_preds]
    # reference-style manual check
    ref = _load_ref("charades_sta/eval_tvg.py")
    exp_ious = []
    for d, p in docs_preds:
        ts = ref.extract_time(p)
        if len(ts) != 1:
            ts = [[d["timestamp"][1] + 10, d["timestamp"][1] + 20]]
        exp_ious.append(ref.iou(d["timestamp"], ts[0]))
    agg = aggregate_charades(results)
    n = len(exp_ious)
    assert agg["mIoU"] == pytest.approx(100 * sum(exp_ious) / n)
    for t in (0.3, 0.5, 0.7):
        assert agg[f"R@{t}"] == pytest.approx(
            100 * sum(i >= t for i in exp_ious) / n)
    assert agg["parse_errors"] == 1
    # submission records mirror utils.py:78-80
    key = "a.mp4>>>c1>>>[10.0, 20.0]"
    assert agg["submission"][key] == docs_preds[0][1]


def test_charades_video_resolution():
    assert get_task("Charades-STA").resolve_video(CHARADES_DOC, "/root/hf") \
        == "/root/hf/Charades_v1_480/ABC123.mp4"


# ---------------------------------------------------------------------------
# LSDBench
# ---------------------------------------------------------------------------

def test_lsdbench_prompt_matches_reference():
    ref = _load_ref("lsdbench/utils.py")
    assert get_task("LSDBench").doc_to_text(LSD_DOC) == \
        ref.lsdbench_doc_to_text(dict(LSD_DOC))


@pytest.mark.parametrize("resp", [
    "C", "The answer is C.", "A, no wait, C", "cat", "abcd", "",
    "(B)", "Answer: D because...A", "bAd", "A B C D",
])
def test_lsdbench_parse_matches_reference(resp):
    ref = _load_ref("lsdbench/utils.py")
    assert lsdbench_extract_characters(resp) == \
        ref.extract_characters_regex(resp)


def test_lsdbench_process_and_aggregate_match_reference():
    ref = _load_ref("lsdbench/utils.py")
    task = get_task("LSDBench")
    preds = ["C", "B", "the answer is C"]
    ours = [task.process_response(LSD_DOC, p) for p in preds]
    theirs = [ref.lsdbench_process_results(dict(LSD_DOC), [p])["accuracy"]
              for p in preds]
    for o, t in zip(ours, theirs):
        assert o["pred_answer"] == t["pred_answer"]
        assert o["answer"] == t["answer"]
    assert task.aggregate(ours)["overall"] == \
        pytest.approx(ref.lsdbench_aggregate_accuracy_results(theirs))
