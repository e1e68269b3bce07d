"""WorldQA + CVRR parity tests."""

import pytest

from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.worldqa_cvrr import (CVRR_SYSTEM_PROMPT,
                                        WORLDQA_EVAL_PROMPT,
                                        WORLDQA_MC_MATCH_PROMPT,
                                        can_infer_option, cvrr_user_prompt,
                                        make_cvrr_task, make_worldqa_task,
                                        parse_cvrr_review,
                                        parse_worldqa_gen_score,
                                        worldqa_doc_to_text)

GEN_DOC = {"question_idx": 1, "question": "What does the robot do?",
           "answer": "It picks up the red cube.", "video_idx": "w1"}
MC_DOC = {"question_idx": 2, "question": "What does the robot do?",
          "answer": "B. picks up a cube",
          "option": ["A. waves", "B. picks up a cube", "C. dances",
                     "D. sleeps"], "video_idx": "w2"}
CVRR_DOC = {"VideoID": "c1", "Q": "Is the door open?", "A": "Yes, fully.",
            "DimensionName": "unusual"}


class ReplyJudge(JudgeProvider):
    def __init__(self, reply):
        super().__init__()
        self.reply = reply
        self.calls = []

    def complete(self, messages):
        self.calls.append(messages)
        return self.reply


def test_worldqa_prompt():
    assert worldqa_doc_to_text(GEN_DOC) == "What does the robot do?"
    assert worldqa_doc_to_text(MC_DOC) == (
        "What does the robot do?\nA. waves\nB. picks up a cube\nC. dances"
        "\nD. sleeps")


def test_can_infer_option():
    assert can_infer_option("B", num_choice=4) == "B"
    assert can_infer_option("The answer is B.", num_choice=4) == "B"
    assert can_infer_option("(C)", num_choice=4) == "C"
    assert can_infer_option("it waves around a lot", num_choice=4) is False
    # the "A is a quantifier" guard: A in a long sentence does not match
    assert can_infer_option("A robot picks up a cube there",
                            num_choice=4) is False


def test_gen_score_parse():
    assert parse_worldqa_gen_score("Keypoint:\nx\nRationale:\ny\nPoint:\n0.5") \
        == 0.5
    assert parse_worldqa_gen_score("garbage") == 0.0


def test_worldqa_generation_flow():
    judge = ReplyJudge("Keypoint in the ground truth response:\nred cube\n"
                       "Rationale:\nmatches\nPoint:\n1")
    task = make_worldqa_task("generation", judge)
    rec = task.process_response(GEN_DOC, "the robot grabs the red cube")
    assert rec["score"] == 1.0
    prompt = judge.calls[0][-1]["content"]
    assert prompt == WORLDQA_EVAL_PROMPT.format(
        question=GEN_DOC["question"], answer=GEN_DOC["answer"],
        candidate="the robot grabs the red cube")
    assert task.aggregate([rec, dict(rec, score=0.5)])["gpt_eval"] == \
        pytest.approx(0.75)


def test_worldqa_mc_flow():
    judge = ReplyJudge("B")
    task = make_worldqa_task("mc", judge)
    # rule-matched: no judge call
    r1 = task.process_response(MC_DOC, "B.")
    # free-form: judge matches to an option letter
    r2 = task.process_response(MC_DOC, "it picks up a small cube")
    agg = task.aggregate([r1, r2])
    assert agg["overall"] == pytest.approx(100.0)
    assert len(judge.calls) == 1
    assert judge.calls[0][-1]["content"] == WORLDQA_MC_MATCH_PROMPT.format(
        MC_DOC["question"], "\n".join(MC_DOC["option"]),
        "it picks up a small cube")


def test_worldqa_mc_ppl_choices():
    task = make_worldqa_task("mc_ppl", ReplyJudge("A"))
    assert task.output_type == "loglikelihood" and task.ll_length_normalize
    assert task.doc_to_choices(MC_DOC) == ["waves", "picks up a cube",
                                           "dances", "sleeps"]


def test_cvrr_flow():
    judge = ReplyJudge('{"pred": "correct", "score": 4, "reason": "close"}')
    task = make_cvrr_task(judge)
    rec = task.process_response(CVRR_DOC, "yes it is open")
    assert rec["correctness"] == "correct" and rec["score"] == 4
    assert judge.calls[0][0]["content"] == CVRR_SYSTEM_PROMPT
    assert judge.calls[0][-1]["content"] == cvrr_user_prompt(
        CVRR_DOC["Q"], CVRR_DOC["A"], "yes it is open")
    agg = task.aggregate([rec, dict(rec, correctness="incorrect", score=1)])
    assert agg["average_score"] == pytest.approx(2.5)
    assert agg["accuracy"] == pytest.approx(50.0)
    assert agg["dimensions"]["unusual"] == pytest.approx(50.0)


def test_cvrr_parse():
    assert parse_cvrr_review('{"pred": "correct", "score": 5, "reason": "x"}') \
        == ("correct", 5, "x")
    assert parse_cvrr_review("junk") == ("incorrect", 0, "")


# ---------------------------------------------------------------------------
# dynamic parity vs reference
# ---------------------------------------------------------------------------

def _load(task_dir):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    return load_ref_utils_with_stubs(task_dir, (
        ("lmms_eval.filters", {}),
        ("lmms_eval.filters.extraction", {"ExtendedRegexFilter": object}),
        ("lmms_eval.tasks.worldqa", {}),
        ("lmms_eval.tasks.worldqa.worldqa_mc_evaluator",
         {"WorldQA_MC_Evaluator": object})))


def test_worldqa_matches_reference():
    ref = _load("worldqa")
    assert worldqa_doc_to_text(dict(GEN_DOC)) == \
        ref.worldqa_doc_to_text(dict(GEN_DOC), {})
    assert worldqa_doc_to_text(dict(MC_DOC)) == \
        ref.worldqa_doc_to_text(dict(MC_DOC), {})
    assert WORLDQA_EVAL_PROMPT == ref.eval_prompt
    assert make_worldqa_task("mc_ppl", ReplyJudge("A")).doc_to_choices(
        MC_DOC) == ref.worldqa_doc_to_choice(MC_DOC)


def test_worldqa_mc_evaluator_matches_reference():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "wqa_mc", "/root/reference/lmms-eval/lmms_eval/tasks/worldqa/"
        "worldqa_mc_evaluator.py")
    import os
    if not os.path.exists(spec.origin):
        pytest.skip("reference not available")
    import sys
    import types
    import logging
    stubs = {}
    for name in ("loguru", "pandas", "requests", "tqdm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "loguru":
                mod.logger = logging.getLogger("x")
            if name == "tqdm":
                mod.tqdm = lambda x, **k: x
            stubs[name] = mod
    sys.modules.update(stubs)
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
    ev = mod.WorldQA_MC_Evaluator()
    for resp in ("B", "The answer is B.", "(C)", "B or C", "A robot picks "
                 "up a cube there", "nothing here", "A"):
        assert can_infer_option(resp, 4) == ev.can_infer_option(resp, 4)
    assert WORLDQA_MC_MATCH_PROMPT.format("q", "opts", "pred") == \
        ev.build_prompt("q", "opts", "pred")


def test_cvrr_matches_reference(monkeypatch):
    ref = _load("cvrr")
    captured = {}

    class Resp:
        def raise_for_status(self):
            pass

        def json(self):
            return {"choices": [{"message": {"content":
                                             '{"pred": "correct", '
                                             '"score": 4, "reason": "r"}'}}],
                    "model": "m"}

    monkeypatch.setattr(
        ref.requests, "post",
        lambda url, headers=None, json=None, timeout=None:
        (captured.__setitem__("messages", json["messages"]), Resp())[1])
    ref.get_gpt_eval(CVRR_DOC["Q"], CVRR_DOC["A"], "a pred", 512)
    assert captured["messages"][0]["content"] == CVRR_SYSTEM_PROMPT
    assert captured["messages"][1]["content"] == \
        cvrr_user_prompt(CVRR_DOC["Q"], CVRR_DOC["A"], "a pred")
    for review in ('{"pred": "correct", "score": 4, "reason": "r"}', "junk"):
        assert parse_cvrr_review(review) == ref.parse_score(review)
