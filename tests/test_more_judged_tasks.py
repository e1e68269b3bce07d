"""MovieChat + VideoDetailDescription parity tests."""

import pytest

from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.more_judged_tasks import (MOVIECHAT_SYSTEM_PROMPT,
                                             VDD_SYSTEM_PROMPT,
                                             make_moviechat_task,
                                             make_vdd_task,
                                             moviechat_user_prompt,
                                             parse_pred_score,
                                             parse_score_only,
                                             vdd_user_prompt)

DOC = {"video_name": "clip1.mp4", "question": "What happens at the end?",
       "answer": "The hero leaves town.", "time": 42}


class ReplyJudge(JudgeProvider):
    def __init__(self, reply):
        super().__init__()
        self.reply = reply
        self.calls = []

    def complete(self, messages):
        self.calls.append(messages)
        return self.reply


def test_parsers():
    assert parse_pred_score("{'pred': 'yes', 'score': 4}") == ["yes", 4]
    # raw literal_eval like the reference: surrounding text fails -> defaults
    assert parse_pred_score("ok {'pred': 'no', 'score': 1} done") == ["no", 0]
    assert parse_pred_score("junk") == ["no", 0]
    assert parse_score_only("{'score': 3}") == 3
    assert parse_score_only("junk") == 0


def test_moviechat_flow():
    judge = ReplyJudge("{'pred': 'yes', 'score': 5}")
    task = make_moviechat_task("global", judge)
    rec = task.process_response(DOC, "He rides away.")
    assert rec["Correctness"] == "yes" and rec["score"] == 5
    assert judge.calls[0][0]["content"] == MOVIECHAT_SYSTEM_PROMPT
    agg = task.aggregate([rec, dict(rec, Correctness="no", score=1)])
    assert agg["accuracy"] == pytest.approx(50.0)
    assert agg["average_score"] == pytest.approx(3.0)


def test_vdd_flow():
    judge = ReplyJudge("{'score': 2}")
    task = make_vdd_task(judge)
    rec = task.process_response(DOC, "a detailed description")
    assert rec["score"] == 2
    assert judge.calls[0][0]["content"] == VDD_SYSTEM_PROMPT
    assert task.aggregate([rec])["average_score"] == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# byte parity vs reference (mocked POST)
# ---------------------------------------------------------------------------

def _load_ref(task_dir):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    return load_ref_utils_with_stubs(task_dir, (
        ("moviepy", {}), ("moviepy.video", {}), ("moviepy.video.io", {}),
        ("moviepy.video.io.VideoFileClip", {"VideoFileClip": object})))


class _Resp:
    status_code = 200

    def raise_for_status(self):
        pass

    def json(self):
        return {"choices": [{"message": {"content": "{'pred': 'yes', "
                                                    "'score': 4}"}}],
                "model": "m"}


@pytest.mark.parametrize("task_dir,ours_system,ours_user", [
    ("moviechat", MOVIECHAT_SYSTEM_PROMPT, moviechat_user_prompt),
    ("video_detail_description", VDD_SYSTEM_PROMPT, vdd_user_prompt),
])
def test_prompts_match_reference(task_dir, ours_system, ours_user,
                                 monkeypatch):
    ref = _load_ref(task_dir)
    captured = {}

    def fake_post(url, headers=None, json=None, timeout=None, **kw):
        captured["messages"] = json["messages"]
        return _Resp()

    monkeypatch.setattr(ref.requests, "post", fake_post)
    ref.get_eval_generic(DOC["question"], DOC["answer"], "a pred", 64)
    assert captured["messages"][0]["content"] == ours_system
    assert captured["messages"][1]["content"] == \
        ours_user(DOC["question"], DOC["answer"], "a pred")


def test_parse_matches_reference():
    ref = _load_ref("moviechat")
    for review in ("{'pred': 'yes', 'score': 4}", "x {'pred': 'no', "
                   "'score': 0} y", "junk", "{'pred': 'Yes', 'score': '3'}"):
        ours = parse_pred_score(review)
        assert ours == [ref.parse_acc(review), ref.parse_score(review)]
