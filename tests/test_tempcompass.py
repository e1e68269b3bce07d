"""TempCompass parity tests: rules, prompts (mocked-POST byte diff), parse."""

import pytest

from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.tasks import get_task
from tspo_tpu.eval.tempcompass import (caption_matching_rule,
                                       captioning_judge_prompt,
                                       extract_yes_no, judge_fallback_prompt,
                                       make_tempcompass_task, mc_rule_rating,
                                       parse_captioning_reply,
                                       rating_from_judge_reply)

MC_DOC = {"video_id": "1001", "dim": "direction",
          "question": ("In which direction is the bird flying?\n"
                       "A. clockwise\nB. counter-clockwise"),
          "answer": "A. clockwise"}
YN_DOC = {"video_id": "1002", "dim": "speed",
          "question": "Is the video playing fast?", "answer": "yes"}
CM_DOC = {"video_id": "1003", "dim": "order",
          "question": ("Which caption matches the video?\n"
                       "Caption A: The cup falls.\nCaption B: The cup rises."),
          "answer": "Caption A: The cup falls."}
CAP_DOC = {"video_id": "1004", "dim": "action",
           "question": "Describe the video.",
           "mc_question": "What happens?\nA. falls\nB. rises",
           "mc_answer": "A. falls"}


def test_prompt_defaults():
    assert get_task("TempCompass-multi-choice").doc_to_text(MC_DOC) == \
        MC_DOC["question"] + "\nPlease directly give the best option:"
    assert get_task("TempCompass-yes_no").doc_to_text(YN_DOC) == \
        YN_DOC["question"] + "\nPlease answer yes or no:"
    assert get_task("TempCompass-captioning").doc_to_text(CAP_DOC) == \
        CAP_DOC["question"]


def test_mc_rules():
    assert mc_rule_rating("A. clockwise", "A. clockwise") == 1
    assert mc_rule_rating("A", "A. clockwise") == 1
    assert mc_rule_rating("B", "A. clockwise") == 0
    assert mc_rule_rating("B. counter-clockwise", "A. clockwise") == 0
    assert mc_rule_rating("A) clockwise", "A. clockwise") == 1
    assert mc_rule_rating("the bird flies clockwise", "A. clockwise") is None


def test_yes_no_rules():
    assert extract_yes_no("Yes, it is.") == "yes"
    assert extract_yes_no("no") == "no"
    assert extract_yes_no("maybe") is False


def test_caption_matching_rules():
    q, a = CM_DOC["question"], CM_DOC["answer"]
    assert caption_matching_rule("Caption A: The cup falls.", q, a) == 1
    assert caption_matching_rule("The cup falls.", q, a) == 1
    assert caption_matching_rule("Caption A", q, a) == 1
    assert caption_matching_rule("A", q, a) == 1
    assert caption_matching_rule("B.", q, a) == 0
    assert caption_matching_rule("something else", q, a) is None


def test_judge_reply_rating():
    assert rating_from_judge_reply("Correct") == 1
    assert rating_from_judge_reply("Incorrect") == 0
    assert rating_from_judge_reply("I think it is Correct") == 1
    assert rating_from_judge_reply("Incorrect, because...") == 0
    assert rating_from_judge_reply("no idea") == 0


def test_captioning_parse():
    out = parse_captioning_reply(
        "Reasoning: it falls\nAnswer: A. falls", "A. falls")
    assert out["rating"] == 1 and out["chatgpt-answer"] == "A. falls"
    out = parse_captioning_reply("Answer: B. rises", "A. falls")
    assert out["rating"] == 0
    assert parse_captioning_reply("", "A. falls")["rating"] == -1


class ReplyJudge(JudgeProvider):
    def __init__(self, reply):
        super().__init__()
        self.reply = reply
        self.calls = []

    def complete(self, messages):
        self.calls.append(messages)
        return self.reply


def test_judge_fallback_flow():
    judge = ReplyJudge("Correct")
    task = make_tempcompass_task("multi-choice", judge)
    rec = task.process_response(MC_DOC, "the bird flies clockwise")
    assert rec["rating"] == 1 and rec["match_success"] is False
    assert rec["chatgpt_response"] == "Correct"
    # rule-matched responses never touch the judge
    task.process_response(MC_DOC, "A")
    assert len(judge.calls) == 1


def test_no_judge_available():
    task = get_task("TempCompass-multi-choice")   # registered rule-only
    rec = task.process_response(MC_DOC, "something unmatchable")
    assert rec["rating"] == 0 and rec["judge_unavailable"]
    agg = task.aggregate([rec, task.process_response(MC_DOC, "A")])
    assert agg["overall"] == pytest.approx(50.0)
    assert agg["direction_accuracy"] == pytest.approx(50.0)
    assert agg["judge_unavailable"] == 1


def test_captioning_flow():
    judge = ReplyJudge("Reasoning: obvious\nAnswer: A. falls")
    task = make_tempcompass_task("captioning", judge)
    rec = task.process_response(CAP_DOC, "the cup falls down")
    assert rec["rating"] == 1 and rec["gt-answer"] == "A. falls"
    user = judge.calls[0][-1]["content"]
    assert user.endswith("\nVideo Description:the cup falls down"
                         "\nMulti-Choice Question:\n"
                         "What happens?\nA. falls\nB. rises\nAnswer:")


# ---------------------------------------------------------------------------
# dynamic parity vs the reference utils
# ---------------------------------------------------------------------------

def _load_ref_tc():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    return load_ref_utils_with_stubs("tempcompass")


def test_prompts_match_reference():
    ref = _load_ref_tc()
    kw = {"pre_prompt": "",
          "post_prompt": {"multi-choice":
                          "\nPlease directly give the best option:",
                          "yes_no": "\nPlease answer yes or no:",
                          "caption_matching":
                          "\nPlease directly give the best option:",
                          "captioning": ""}}
    assert get_task("TempCompass-multi-choice").doc_to_text(MC_DOC, kw) == \
        ref.tempcompass_doc_to_text_multi_choice(dict(MC_DOC), kw)
    assert get_task("TempCompass-yes_no").doc_to_text(YN_DOC, kw) == \
        ref.tempcompass_doc_to_text_yes_no(dict(YN_DOC), kw)
    assert get_task("TempCompass-captioning").doc_to_text(CAP_DOC, kw) == \
        ref.tempcompass_doc_to_text_captioning(dict(CAP_DOC), kw)


@pytest.mark.parametrize("pred,q,a", [
    ("Caption A: The cup falls.",) + (CM_DOC["question"], CM_DOC["answer"]),
    ("The cup falls.",) + (CM_DOC["question"], CM_DOC["answer"]),
    ("Caption A",) + (CM_DOC["question"], CM_DOC["answer"]),
    ("A.",) + (CM_DOC["question"], CM_DOC["answer"]),
    ("B",) + (CM_DOC["question"], CM_DOC["answer"]),
    ("A) The cup falls.",) + (CM_DOC["question"], CM_DOC["answer"]),
])
def test_caption_matching_matches_reference(pred, q, a):
    ref = _load_ref_tc()
    theirs = ref.eval_rule(pred, q, a)
    ours = caption_matching_rule(pred, q, a)
    assert (ours is None) == (theirs == "fail")
    if ours is not None:
        assert ours == theirs


def test_captioning_parse_matches_reference():
    ref = _load_ref_tc()
    for reply in ("Reasoning: x\nAnswer: A. falls", "Answer: B. rises",
                  "A. falls and B. rises", "None of the choices are correct"):
        ours = parse_captioning_reply(reply, "A. falls")
        theirs = ref.parse_llm_output_for_captioning(reply, "A. falls")
        assert ours["rating"] == theirs["rating"]
        assert ours["chatgpt-answer"] == theirs["chatgpt-answer"]


def test_fallback_prompt_matches_reference(monkeypatch):
    """Mock the reference's requests.post and byte-compare the judge prompt
    it would send for an unmatched multi-choice response."""
    ref = _load_ref_tc()
    captured = {}

    def fake_post(url, headers=None, data=None, **kw):
        import json as j
        captured["payload"] = j.loads(data.decode("utf-8"))

        class R:
            content = j.dumps({"choices": [{"message":
                                            {"content": "Correct"}}],
                               "usage": {}}).encode()
        return R()

    monkeypatch.setattr(ref.requests, "post", fake_post)
    ref.get_eval_result(ref_prompt_mc(ref), maxtry=0)
    ours = judge_fallback_prompt("multi-choice", MC_DOC["question"],
                                 MC_DOC["answer"], "free-form reply")
    assert captured["payload"]["messages"][1]["content"] == ours
    assert captured["payload"]["messages"][0]["content"] == \
        "You are an AI assistant for question answering."


def ref_prompt_mc(ref):
    """Rebuild the prompt exactly as the reference inline code does
    (utils.py:146-151)."""
    doc, pred = MC_DOC, "free-form reply"
    base_prompt = """
        You will receive a multi-choice question, the ground-truth answer and the prediction from a question answering (QA) model. \
        Your task is to determine whether QA model prediction is correct, based on the question and ground-truth answer. \
        If the prediction is correct, respond "Correct". If the prediction is incorrect, respond "Incorrect".
        """
    return f"""{base_prompt}\nMulti-Choice Question:\n{doc["question"]}\nGround-Truth Answer: {doc["answer"]}\nModel Prediction: {pred}"""
