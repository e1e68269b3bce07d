"""MixEvals-Video2Text parity tests."""

import pytest

from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.mix_evals import (make_mix_evals_task,
                                     mix_evals_doc_to_text,
                                     parse_judge_score)
from tspo_tpu.eval.mix_evals_prompts import (FREEFORM_SYSTEM,
                                             FREEFORM_USER_TEMPLATE,
                                             MC_SYSTEM, MC_USER_TEMPLATE)

FF_DOC = {"id": 3, "query": "what happens at the end?",
          "reference_answer": ["she waves", "waving"], "video_path": "f.mp4"}
MC_DOC = {"id": 4, "query": "what is he doing?",
          "options": ["cooking", "reading"], "answer_index": 1,
          "video_path": "m.mp4"}


class ReplyJudge(JudgeProvider):
    def __init__(self, reply):
        super().__init__()
        self.reply = reply
        self.calls = []

    def complete(self, messages):
        self.calls.append(messages)
        return self.reply


def test_prompt():
    # bare builder (no defaults)
    assert mix_evals_doc_to_text(FF_DOC) == "what happens at the end?"
    assert mix_evals_doc_to_text(MC_DOC) == (
        "what is he doing?\nHere are the options:\nA. cooking\nB. reading")
    # registered tasks bake the yaml defaults in
    from tspo_tpu.eval.mix_evals import make_mix_evals_task as mk
    mc_txt = mk("mc", ReplyJudge("x")).doc_to_text(MC_DOC)
    assert mc_txt.startswith("These are frames from a video.")
    assert mc_txt.endswith("Answer with the option's letter from the given "
                           "choices directly.")
    ff_txt = mk("freeform", ReplyJudge("x")).doc_to_text(FF_DOC)
    assert ff_txt.startswith("These are frames from a video.")
    with __import__("pytest").raises(ValueError):
        mk("free_form", ReplyJudge("x"))


def test_parse_score():
    assert parse_judge_score("The Correctness Score: [[0.5]]") == 0.5
    assert parse_judge_score("score [1.0]") == 1.0
    assert parse_judge_score("no score") is None


def test_freeform_flow():
    judge = ReplyJudge("Reasoning. The Correctness Score: [[0.8]]")
    task = make_mix_evals_task("freeform", judge)
    rec = task.process_response(FF_DOC, "she waves goodbye")
    assert rec["score"] == pytest.approx(0.8)
    assert judge.calls[0][0]["content"] == FREEFORM_SYSTEM
    assert judge.calls[0][-1]["content"] == FREEFORM_USER_TEMPLATE.format(
        prompt=FF_DOC["query"], gold_ans='["she waves", "waving"]',
        response="she waves goodbye")
    agg = task.aggregate([rec, dict(rec, score=0.2, unparsed=False)])
    assert agg["gpt_eval"] == pytest.approx(0.5)
    assert agg["unparsed_judgments"] == 0


def test_mc_flow():
    judge = ReplyJudge("The option chosen by the model: [[B]]")
    task = make_mix_evals_task("mc", judge)
    # gold comes from reference_answer (the mc yaml's doc_to_target)
    rec = task.process_response(
        dict(MC_DOC, reference_answer="1"), "he reads a book")
    del rec["question_idx"]
    rec["question_idx"] = MC_DOC["id"]
    rec2 = task.process_response(MC_DOC, "he reads a book")
    assert rec2["answer"] == 1          # answer_index fallback
    rec = rec2
    assert rec["pred_answer"] == 1 and rec["correct"] == 1
    assert judge.calls[0][0]["content"] == MC_SYSTEM
    assert judge.calls[0][-1]["content"] == MC_USER_TEMPLATE.format(
        prompt=MC_DOC["query"], options="A. cooking\nB. reading",
        response="he reads a book")
    assert task.aggregate([rec])["overall"] == pytest.approx(100.0)


def test_prompts_match_reference():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    ref = load_ref_utils_with_stubs(
        "mix_evals/video2text",
        (("lmms_eval.filters", {"Filter": object}),
         ("lmms_eval.filters.extraction", {"ExtendedRegexFilter": object})))
    ff = ref.video2text_gpt_judge_for_closeended_freeform(
        prompt="Q?", gold_ans='["g"]', response="r")
    assert ff[0]["content"] == FREEFORM_SYSTEM
    assert ff[1]["content"] == FREEFORM_USER_TEMPLATE.format(
        prompt="Q?", gold_ans='["g"]', response="r")
    mc = ref.video2text_gpt_judge_for_closeended_multiplechoice(
        prompt="Q?", options="A. x", response="r")
    assert mc[0]["content"] == MC_SYSTEM
    assert mc[1]["content"] == MC_USER_TEMPLATE.format(
        prompt="Q?", options="A. x", response="r")
    assert mix_evals_doc_to_text(dict(MC_DOC), {}) == \
        ref.mix_evals_video2text_doc_to_text(dict(MC_DOC), {})
    for reply in ("x [[0.7]]", "[0.3]"):
        # deterministic replies must match the reference parser exactly
        assert parse_judge_score(reply) == ref.get_score_from_judge(reply)
    assert parse_judge_score("none") is None   # ref falls back to random
