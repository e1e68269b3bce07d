"""VITATECS parity tests."""

import pytest

from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.tasks import get_task
from tspo_tpu.eval.vitatecs import (format_question_and_answer,
                                    make_vitatecs_task, vitatecs_judge_prompt,
                                    vitatecs_rule_rating)

DOC = {"video_name": "v7.mp4", "src_dataset": "MSRVTT", "aspect": "Direction",
       "caption": "a man walks up the stairs",
       "counterfactual": "a man walks down the stairs"}


class ReplyJudge(JudgeProvider):
    def __init__(self, reply):
        super().__init__()
        self.reply = reply
        self.calls = []

    def complete(self, messages):
        self.calls.append(messages)
        return self.reply


def test_deterministic_shuffle():
    q1, a1, o1 = format_question_and_answer(DOC)
    q2, a2, o2 = format_question_and_answer(dict(DOC))
    assert (q1, a1, o1) == (q2, a2, o2)
    assert a1[1] in "AB"
    assert o1 == ["a man walks up the stairs", "a man walks down the stairs"]


def test_rules():
    question, answer, options = format_question_and_answer(DOC)
    gold_letter = answer[1]
    # option-text substring wins (caption text == options[0] == correct)
    assert vitatecs_rule_rating("I see a man walks up the stairs here",
                                answer, options) == 1
    assert vitatecs_rule_rating("a man walks down the stairs", answer,
                                options) == 0
    assert vitatecs_rule_rating(gold_letter, answer, options) == 1
    assert vitatecs_rule_rating(f"({gold_letter}) sure", answer, options) == 1
    assert vitatecs_rule_rating("no clue", answer, options) is None


def test_flow_and_judge_fallback():
    judge = ReplyJudge("Correct")
    task = make_vitatecs_task(judge)
    rec = task.process_response(DOC, "no clue")
    assert rec["rating"] == 1 and rec["match_success"] is False
    assert judge.calls[0][-1]["content"] == vitatecs_judge_prompt(
        rec["question"], rec["answer"], "no clue")
    rec2 = task.process_response(DOC, rec["answer"][1])
    agg = task.aggregate([rec, rec2])
    assert agg["overall"] == pytest.approx(100.0)
    assert agg["aspects"]["Direction"] == pytest.approx(100.0)
    # rule-only registration scores unmatched as 0 and reports it
    rec3 = get_task("VITATECS").process_response(DOC, "no clue")
    assert rec3["rating"] == 0 and rec3["judge_unavailable"]


def test_matches_reference(monkeypatch):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    ref = load_ref_utils_with_stubs("vitatecs")
    rq, ra, ro = ref.format_question_and_answer(dict(DOC))
    q, a, o = format_question_and_answer(DOC)
    assert (q, a, o) == (rq, ra, ro)
    from tspo_tpu.eval.vitatecs import VITATECS_DEFAULT_KWARGS
    # our doc_to_text merges the yaml defaults; the reference run receives
    # them through lmms_eval_specific_kwargs
    assert get_task("VITATECS").doc_to_text(DOC, {}) == \
        ref.vitatecs_doc_to_text(dict(DOC), dict(VITATECS_DEFAULT_KWARGS))
    for resp in ("a man walks up the stairs", "A", "B.", "(A) yes",
                 "the man walks down"):
        theirs = ref.vitatecs_process_results(dict(DOC), [resp])["accuracy"]
        ours = make_vitatecs_task(ReplyJudge("Correct")).process_response(
            DOC, resp)
        if theirs["match_success"]:
            assert ours["rating"] == theirs["rating"]
            assert ours["match_success"]
