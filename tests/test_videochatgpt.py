"""VideoChatGPT judged-task parity tests (prompts, parse, pairing flow)."""

import os
import sys
import types

import pytest

from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.videochatgpt import (VCG_SYSTEM_PROMPTS,
                                        make_videochatgpt_task,
                                        parse_vcg_score,
                                        vcg_consistency_prompt,
                                        vcg_user_prompt,
                                        videochatgpt_doc_to_text,
                                        videochatgpt_doc_to_text_consistency)


class ScoreJudge(JudgeProvider):
    """Deterministic judge: returns the reference reply format, and records
    every (system, user) message pair it was asked."""

    def __init__(self, score=3):
        super().__init__()
        self.score = score
        self.calls = []

    def complete(self, messages):
        self.calls.append(messages)
        return "{'score': %d}" % self.score


DOC = {"video_name": "v_abc", "question": "What is the man doing?",
       "answer": "He is cooking pasta in a red pot."}
CDOC1 = {"video_name": "v_abc", "question_1": "What is the man doing?",
         "question_2": "None", "answer": "Cooking."}
CDOC2 = {"video_name": "v_abc", "question_1": "None",
         "question_2": "Describe the man's activity.", "answer": "Cooking."}


def test_parse_score():
    assert parse_vcg_score("{'score': 4}") == 4
    assert parse_vcg_score("{'score': 4.8}") == 4
    assert parse_vcg_score("sure! {'score': 4}") == 0   # reference: 0 on junk
    assert parse_vcg_score("") == 0


def test_doc_to_text():
    assert videochatgpt_doc_to_text(DOC) == "What is the man doing?"
    assert videochatgpt_doc_to_text_consistency(CDOC1) == \
        "What is the man doing?"
    assert videochatgpt_doc_to_text_consistency(CDOC2) == \
        "Describe the man's activity."


def test_generic_three_dimensions():
    judge = ScoreJudge(4)
    task = make_videochatgpt_task("generic", judge)
    rec = task.process_response(DOC, "He cooks pasta.")
    assert rec["correctness"] == rec["detailed_orientation"] == \
        rec["context"] == 4
    assert len(judge.calls) == 3
    systems = [c[0]["content"] for c in judge.calls]
    assert systems == [VCG_SYSTEM_PROMPTS["correctness"],
                       VCG_SYSTEM_PROMPTS["detailed_orientation"],
                       VCG_SYSTEM_PROMPTS["context"]]
    agg = task.aggregate([rec, dict(rec, correctness=2)])
    assert agg["correctness"] == pytest.approx(3.0)
    assert agg["context"] == pytest.approx(4.0)


def test_temporal_flow():
    judge = ScoreJudge(5)
    task = make_videochatgpt_task("temporal", judge)
    rec = task.process_response(DOC, "First he boils water, then he cooks.")
    assert rec["score"] == 5
    assert task.aggregate([rec, dict(rec, score=1)])["average_score"] == \
        pytest.approx(3.0)


def test_consistency_pairing_and_judging():
    judge = ScoreJudge(2)
    task = make_videochatgpt_task("consistency", judge)
    r1 = task.process_response(CDOC1, "cooking")
    r2 = task.process_response(CDOC2, "making food")
    assert r1 == {"video_name": "v_abc", "A": "Cooking.",
                  "Q1": "What is the man doing?", "pred1": "cooking"}
    agg = task.aggregate([r1, r2])
    assert agg == {"average_score": 2.0, "pairs_judged": 1}
    user = judge.calls[-1][-1]["content"]
    assert "Predicted Answer to Question 1: cooking" in user
    assert "Predicted Answer to Question 2: making food" in user
    assert judge.calls[-1][0]["content"] == VCG_SYSTEM_PROMPTS["consistency"]


def test_video_resolution():
    task = make_videochatgpt_task("generic", ScoreJudge())
    assert task.resolve_video(DOC, "/cache") == "/cache/v_abc.mp4"


# ---------------------------------------------------------------------------
# dynamic parity vs the reference utils
# ---------------------------------------------------------------------------

def _load_ref_vcg():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    return load_ref_utils_with_stubs("videochatgpt")


def test_prompts_match_reference():
    ref = _load_ref_vcg()
    assert videochatgpt_doc_to_text(DOC) == \
        ref.videochatgpt_doc_to_text(dict(DOC), {})
    assert videochatgpt_doc_to_text_consistency(CDOC1) == \
        ref.videochatgpt_doc_to_text_consistency(dict(CDOC1), {})
    assert videochatgpt_doc_to_text_consistency(CDOC2) == \
        ref.videochatgpt_doc_to_text_consistency(dict(CDOC2), {})


@pytest.mark.parametrize("review", ["{'score': 4}", "{'score': '3'}",
                                    "{'score': 4.8}", "no dict here", ""])
def test_parse_matches_reference(review):
    ref = _load_ref_vcg()
    assert parse_vcg_score(review) == ref.parse_score(review)


@pytest.mark.parametrize("dim", ["correctness", "detailed_orientation",
                                 "context", "temporal"])
def test_judge_messages_match_reference(dim, monkeypatch):
    """Capture the exact messages the reference would POST and compare both
    system and user content byte-for-byte."""
    ref = _load_ref_vcg()
    captured = {}

    class Resp:
        status_code = 200

        def raise_for_status(self):
            pass

        def json(self):
            return {"choices": [{"message": {"content": "{'score': 4}"}}],
                    "model": "m"}

    def fake_post(url, headers=None, json=None, timeout=None):
        captured["messages"] = json["messages"]
        return Resp()

    monkeypatch.setattr(ref.requests, "post", fake_post)
    ref.get_eval_generic(DOC["question"], DOC["answer"], "a pred", dim, 64)
    assert captured["messages"][0]["content"] == VCG_SYSTEM_PROMPTS[dim]
    assert captured["messages"][1]["content"] == \
        vcg_user_prompt(dim, DOC["question"], DOC["answer"], "a pred")


def test_consistency_messages_match_reference(monkeypatch):
    ref = _load_ref_vcg()
    captured = {}

    class Resp:
        status_code = 200

        def raise_for_status(self):
            pass

        def json(self):
            return {"choices": [{"message": {"content": "{'score': 4}"}}],
                    "model": "m"}

    monkeypatch.setattr(
        ref.requests, "post",
        lambda url, headers=None, json=None, timeout=None:
        (captured.__setitem__("messages", json["messages"]), Resp())[1])
    ref.get_eval_consistency("q1", "q2", "ans", "p1", "p2", 64)
    assert captured["messages"][0]["content"] == \
        VCG_SYSTEM_PROMPTS["consistency"]
    assert captured["messages"][1]["content"] == \
        vcg_consistency_prompt("q1", "q2", "ans", "p1", "p2")
