"""EgoThink parity tests."""

import pytest

from tspo_tpu.eval.egothink import (EGOTHINK_JUDGE_SYSTEM,
                                    egothink_judge_prompt, make_egothink_task,
                                    parse_rating)
from tspo_tpu.eval.llm_judge import JudgeProvider

DOC = {"id": "e1", "question": " What am I holding? ",
       "answer": "A red mug.", "image_path": "e1.jpg"}


class RatingJudge(JudgeProvider):
    def __init__(self, reply):
        super().__init__()
        self.reply = reply
        self.calls = []

    def complete(self, messages):
        self.calls.append(messages)
        return self.reply


def test_parse_rating():
    assert parse_rating("Good. Rating: [[1]]") == 1
    assert parse_rating("Rating: [[0.5]]") == 0.5
    assert parse_rating("close [0.5]") == 0.5
    assert parse_rating("no rating at all") == -1


def test_flow():
    judge = RatingJudge("The answer matches. Rating: [[1]]")
    task = make_egothink_task(judge)
    rec = task.process_response(DOC, "a red mug")
    assert rec["score"] == 1
    assert judge.calls[0][0]["content"] == EGOTHINK_JUDGE_SYSTEM
    # gold is lowercased + period-stripped before judging (utils.py:172)
    assert judge.calls[0][-1]["content"] == egothink_judge_prompt(
        DOC["question"], "a red mug", "a red mug")
    agg = task.aggregate([rec, dict(rec, score=0.5)])
    assert agg["overall"] == pytest.approx(0.75)
    assert task.doc_to_text(DOC) == "What am I holding?"


def test_prompt_matches_reference(monkeypatch):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    ref = load_ref_utils_with_stubs("egothink")
    captured = {}

    def fake_chat(model, messages, temperature, max_tokens):
        captured["messages"] = messages
        return "Rating: [[0.5]]", "m"

    monkeypatch.setattr(ref, "chat_compeletion_openai", fake_chat)
    rating, judgment, _ = ref.judge_single("Q?", "pred answer", "gold ref")
    assert rating == 0.5
    assert captured["messages"][0]["content"] == EGOTHINK_JUDGE_SYSTEM
    assert captured["messages"][1]["content"] == \
        egothink_judge_prompt("Q?", "pred answer", "gold ref")
    for j in ("Rating: [[1]]", "x [0.5] y", "none"):
        m = ref.re.search(ref.one_score_pattern, j) or \
            ref.re.search(ref.one_score_pattern_backup, j)
        want = ref.ast.literal_eval(m.groups()[0]) if m else -1
        assert parse_rating(j) == want
