"""MMVU: prompt/template bytes, judge-request parity (including the
reference's rubric-only custom_prompt quirk), and category aggregation vs
lmms-eval/lmms_eval/tasks/mmvu/utils.py.
"""

import importlib.util
import os
import sys
import types

import pytest

from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.mmvu import (MC_JUDGE_PROMPT, OPEN_JUDGE_PROMPT, TASK_MAP,
                                construct_question_prompt, make_mmvu_task,
                                mmvu_doc_to_text, mmvu_doc_to_text_cot)

REF = "/root/reference/lmms-eval/lmms_eval/tasks/mmvu/utils.py"

MC_DOC = {"id": "q1", "question": "What reaction is shown?",
          "question_type": "multiple-choice",
          "choices": {"A": "combustion", "B": "oxidation", "C": "reduction",
                      "D": "fusion", "E": "none"},
          "answer": "B", "video_path": "videos/Chemistry/v001.mp4"}
OPEN_DOC = {"id": "q2", "question": "Name the organ shown.",
            "question_type": "open-ended", "answer": "liver",
            "video_path": "videos/Basic_Medicine/v002.mp4"}


class RecordingJudge(JudgeProvider):
    def __init__(self, reply="1"):
        super().__init__()
        self.reply = reply
        self.requests = []

    def complete(self, messages):
        self.requests.append(messages)
        return self.reply


def _load_ref():
    if not os.path.exists(REF):
        pytest.skip("reference checkout not available")
    captured = {}

    class _ServerConfig:
        def __init__(self, **kw):
            captured.update(kw)

    class _Server:
        def evaluate_binary(self, **kw):
            captured["binary_call"] = kw
            return {"success": True, "result": "1"}

    stubs = {}
    specs = (("loguru", {"logger": __import__("logging").getLogger("s")}),
             ("lmms_eval", {}),
             ("lmms_eval.llm_judge",
              {"ServerConfig": _ServerConfig,
               "get_server": lambda **kw: _Server()}),
             ("lmms_eval.tasks", {}), ("lmms_eval.tasks._task_utils", {}),
             ("lmms_eval.tasks._task_utils.file_utils",
              {"generate_submission_file": lambda *a, **k: "/dev/null"}))
    for name, attrs in specs:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            stubs[name] = m
    sys.modules.update(stubs)
    old_hf = os.environ.get("HF_HOME")
    os.environ["HF_HOME"] = "/tmp"
    try:
        spec = importlib.util.spec_from_file_location("ref_mmvu_utils", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod._captured = captured
        return mod
    finally:
        os.environ.pop("HF_HOME", None)
        if old_hf is not None:
            os.environ["HF_HOME"] = old_hf
        for name in stubs:
            sys.modules.pop(name, None)


def test_prompts_match_reference():
    ref = _load_ref()
    for doc in (MC_DOC, OPEN_DOC):
        assert mmvu_doc_to_text(doc) == ref.mmvu_doc_to_text(dict(doc))
        assert mmvu_doc_to_text_cot(doc) == \
            ref.mmvu_doc_to_text_cot(dict(doc))
        assert construct_question_prompt(doc) == \
            ref.construct_question_prompt(dict(doc))


def test_judge_rubrics_and_task_map_match_reference():
    ref = _load_ref()
    src = open(REF).read()
    assert MC_JUDGE_PROMPT in src
    assert OPEN_JUDGE_PROMPT in src
    assert TASK_MAP == {}.__class__(  # rebuild from the reference aggregate
        __import__("re").findall(r'"(\w+)": "(\w+)"', src[
            src.index("TASK_MAP"):src.index("TASK_TYPES")]))


def test_judge_request_is_rubric_only_like_reference():
    """The reference judge request body is custom_prompt.format(...) with no
    placeholders — i.e. the rubric alone (llm_judge/utils.py:17-18).  Our
    evaluate_binary path must produce the same user message."""
    ref = _load_ref()
    ref.evaluate_with_llm_judge(dict(MC_DOC), "The answer is B")
    ref_call = ref._captured["binary_call"]
    judge = RecordingJudge("1")
    task = make_mmvu_task("MMVU", judge)
    task.process_response(MC_DOC, "The answer is B")
    sent = judge.requests[0]
    user = [m for m in sent if m["role"] == "user"][0]["content"]
    assert user == ref_call["custom_prompt"]  # rubric text, nothing else
    assert ref_call["question"] == construct_question_prompt(MC_DOC)
    assert ref_call["answer"] == "B: oxidation"


def test_judge_scoring_rule():
    # exact "1" after strip counts; "1." or "yes" do not (utils.py:175-186)
    for reply, expect in (("1", 1), (" 1\n", 1), ("1.", 0), ("0", 0),
                          ("yes", 0)):
        task = make_mmvu_task("MMVU", RecordingJudge(reply))
        assert task.process_response(MC_DOC, "B")["correct"] == expect


def test_aggregate_matches_reference():
    ref = _load_ref()
    results = [
        {"category": "Chemistry", "correct": 1, "judge_success": True},
        {"category": "Chemistry", "correct": 0, "judge_success": True},
        {"category": "Law", "correct": 1, "judge_success": True},
        {"category": "Computer_Science", "correct": 1,
         "judge_success": True},
        {"category": "NotACategory", "correct": 1, "judge_success": True},
    ]
    task = make_mmvu_task("MMVU", RecordingJudge())
    ours = task.aggregate(results)
    theirs = ref.mmvu_aggregate_results_val(
        [dict(r) for r in results])
    assert ours["overall"] == pytest.approx(theirs)
    # unknown category dropped: 3 correct / 4 counted
    assert ours["overall"] == pytest.approx(75.0)
    assert ours["Science"] == pytest.approx(50.0)


def test_open_ended_judge_and_logging():
    judge = RecordingJudge("0")
    task = make_mmvu_task("MMVU", judge)
    long_pred = "x" * 150
    r = task.process_response(OPEN_DOC, long_pred)
    assert r["correct"] == 0
    assert r["pred_answer"] == "x" * 100 + "..."
    user = [m for m in judge.requests[0]
            if m["role"] == "user"][0]["content"]
    assert user == OPEN_JUDGE_PROMPT


def test_include_context_variant_carries_content():
    judge = RecordingJudge("1")
    task = make_mmvu_task("MMVU", judge, include_context=True)
    task.process_response(MC_DOC, "B")
    msgs = judge.requests[0]
    sys_msg = [m for m in msgs if m["role"] == "system"][0]["content"]
    user = [m for m in msgs if m["role"] == "user"][0]["content"]
    assert sys_msg == MC_JUDGE_PROMPT
    assert "What reaction is shown?" in user and "B: oxidation" in user


def test_registered_in_registry():
    from tspo_tpu.eval.tasks import TASK_REGISTRY
    assert "MMVU" in TASK_REGISTRY and "MMVU-cot" in TASK_REGISTRY
