"""MVBench / EgoSchema / NExT-QA / PerceptionTest parity tests.

Layer 1: hardcoded expected prompt/parse/aggregate behavior (always on).
Layer 2: dynamic byte/value comparison against the actual reference
functions in /root/reference/lmms-eval (skipped when absent), via the same
stub-import helper as test_task_prompts.py.
"""

import random

import pytest

from tspo_tpu.eval.more_tasks import (aggregate_egoschema, aggregate_mvbench,
                                      aggregate_perceptiontest,
                                      egoschema_doc_to_choices,
                                      egoschema_parse_choice, mcq_acc,
                                      nextqa_parse_choice)
from tspo_tpu.eval.tasks import get_task

from test_task_prompts import _load_ref_utils

MVB_DOC = {
    "question": " What happened after the person took the food?",
    "candidates": ["Put down the food.", "Ate the sandwich.",
                   "Tidied up the table.", "Washed the dishes."],
    "answer": "Ate the sandwich.",
}
EGO_DOC = {
    "video_idx": "abc123",
    "question": "What is the primary activity?",
    "option": ["A. cooking a meal", "B. fixing a bike", "C. painting a wall",
               "D. typing on a laptop", "E. gardening outside"],
    "answer": 1,
}
NEXTQA_DOC = {
    "video": "4010069381", "qid": 7, "answer": 2,
    "question": "why did the man fall down",
    "a0": "slipped on ice", "a1": "pushed by crowd", "a2": "tripped on rock",
    "a3": "jumped on purpose", "a4": "lost his balance dancing",
}
PT_DOC = {
    "video_name": "video_1234", "question_id": 17, "answer_id": 2,
    "question": "What will happen next?",
    "options": ["the cup falls", "the cup stays", "the cup is lifted"],
    "area": "Memory", "tag": ["occlusion"], "reasoning": "descriptive",
}


# ---------------------------------------------------------------------------
# layer 1: pinned behavior
# ---------------------------------------------------------------------------

def test_mvbench_prompt_bytes():
    expected = (
        "Question: What happened after the person took the food?\nOption:\n"
        "(A) Put down the food.\n(B) Ate the sandwich.\n"
        "(C) Tidied up the table.\n(D) Washed the dishes.\n"
        "Only give the best option.\n")
    assert get_task("MVBench").doc_to_text(MVB_DOC) == expected


def test_mvbench_process_and_aggregate():
    t = get_task("MVBench")
    r1 = t.process_response(MVB_DOC, "(B) Ate the sandwich.")
    assert r1["answer"] == "B" and r1["score"] == 1
    r2 = t.process_response(MVB_DOC, "The person put down the food")
    assert r2["score"] == 0
    r3 = t.process_response(MVB_DOC, "")
    # empty predictions are excluded from the denominator (utils.py:183-197)
    agg = aggregate_mvbench([r1, r2, r3])
    assert agg["overall"] == pytest.approx(50.0)


def test_mcq_acc_quirks():
    assert mcq_acc("B", "b. Ate the sandwich") == 1     # leading option wins
    assert mcq_acc("B", "I think (B) is right") == 1    # standalone letter
    assert mcq_acc("Put down the food.", "put down the food") == 1  # content
    assert mcq_acc("B", "nothing relevant") == 0


def test_mvbench_subtask_video_resolution():
    t = get_task("MVBench_action_sequence")
    assert t.resolve_video({"video": "x.mp4"}, "/data") == \
        "/data/star/Charades_segment/x.mp4"


def test_egoschema_prompt_bytes():
    expected = (
        "What is the primary activity?"
        "\nA. cooking a meal\nB. fixing a bike\nC. painting a wall"
        "\nD. typing on a laptop\nE. gardening outside"
        "\nAnswer with the option's letter from the given choices directly.")
    assert get_task("EgoSchema").doc_to_text(EGO_DOC) == expected


def test_egoschema_process_and_aggregate():
    t = get_task("EgoSchema")
    r1 = t.process_response(EGO_DOC, "B")
    assert r1["pred_answer"] == 1 and r1["submission"] == {"abc123": 1}
    r2 = t.process_response(dict(EGO_DOC, video_idx="z9"), "(D)")
    agg = aggregate_egoschema([r1, r2])
    assert agg["overall"] == pytest.approx(50.0)
    assert agg["submission"] == {"abc123": 1, "z9": 3}


def test_egoschema_parse_quirks():
    i2a = {c: f"opt {c.lower()}" for c in "ABCDE"}
    # multi-candidate: earliest LAST-occurrence wins (argmin over rfind)
    assert egoschema_parse_choice("A. but also B.", list("ABCDE"), i2a) == "A"
    # content fallback on long answers
    i2a2 = dict(i2a, C="tripped on rock")
    assert egoschema_parse_choice(
        "the man clearly tripped on rock while walking", list("ABCDE"),
        i2a2) == "C"
    # random fallback is rng-driven
    assert egoschema_parse_choice("zzz", list("ABCDE"), i2a,
                                  random.Random(0)) in list("ABCDE")


def test_egoschema_choices():
    assert egoschema_doc_to_choices(EGO_DOC)[1] == "fixing a bike"
    assert get_task("EgoSchema-ppl").output_type == "loglikelihood"


def test_nextqa_prompt_bytes():
    expected = ("why did the man fall down\n"
                "A. slipped on ice\nB. pushed by crowd\nC. tripped on rock\n"
                "D. jumped on purpose\nE. lost his balance dancing")
    assert get_task("NExT-QA").doc_to_text(NEXTQA_DOC) == expected


def test_nextqa_process():
    t = get_task("NExT-QA")
    assert t.process_response(NEXTQA_DOC, "C")["pred_answer"] == "C"
    rec = t.process_response(NEXTQA_DOC, "C")
    assert rec["answer"] == "C"


def test_nextqa_parse_quirks():
    i2a = {c: f"opt {c.lower()}" for c in "ABCDE"}
    # ties resolve to the LAST occurrence (argmax), bracketed probe first
    assert nextqa_parse_choice("(A) no wait (C)", list("ABCDE"), i2a) == "C"
    assert nextqa_parse_choice("A or C", list("ABCDE"), i2a) in ("A", "C")


def test_perceptiontest_prompt_bytes():
    expected = (
        "What will happen next?"
        "\nA. the cup falls\nB. the cup stays\nC. the cup is lifted"
        "\nAnswer with the option's letter from the given choices directly.")
    assert get_task("PerceptionTest").doc_to_text(PT_DOC) == expected


def test_perceptiontest_process_and_aggregate():
    t = get_task("PerceptionTest")
    r1 = t.process_response(PT_DOC, "C")
    assert r1["pred_answer"] == 2 and r1["correct"] == 1
    r2 = t.process_response(PT_DOC, "no idea")
    assert r2["pred_answer"] == -1 and r2["correct"] == 0
    agg = aggregate_perceptiontest([r1, r2])
    assert agg["overall"] == pytest.approx(50.0)
    assert agg["areas"]["Memory"] == pytest.approx(50.0)


def test_video_suffix_resolution():
    assert get_task("EgoSchema").resolve_video(EGO_DOC, "/v") == \
        "/v/abc123.mp4"
    assert get_task("PerceptionTest").resolve_video(PT_DOC, "") == \
        "video_1234.mp4"


# ---------------------------------------------------------------------------
# layer 2: dynamic comparison vs the reference functions
# ---------------------------------------------------------------------------

def test_mvbench_prompt_matches_reference():
    ref = _load_ref_utils("mvbench")
    kw = {"sub_task": "action_sequence",
          "post_prompt": "Only give the best option.\n"}
    assert get_task("MVBench").doc_to_text(MVB_DOC) == \
        ref.mvbench_doc_to_text(dict(MVB_DOC), kw)


@pytest.mark.parametrize("resp", [
    "B", "(B)", "b. Ate the sandwich", "B. Ate the sandwich.",
    "The person Ate the sandwich", "Put down the food", "", "A or B",
    "I believe the answer is (C), not (A)", "it's unclear, maybe d",
    "B,- yes", "a,- b",   # punct-context vs mutated-string regression
])
def test_mvbench_process_matches_reference(resp):
    ref = _load_ref_utils("mvbench")
    ours = get_task("MVBench").process_response(MVB_DOC, resp)
    theirs = ref.mvbench_process_results(dict(MVB_DOC), [resp])[
        "mvbench_accuracy"]
    assert ours["score"] == theirs["score"]
    assert ours["answer"] == theirs["gt_answer"]


def test_egoschema_prompt_matches_reference():
    ref = _load_ref_utils("egoschema")
    assert get_task("EgoSchema").doc_to_text(EGO_DOC) == \
        ref.egoschema_doc_to_text(dict(EGO_DOC), {})


@pytest.mark.parametrize("resp", [
    "B", "(D)", "E.", "A. cooking a meal", "the answer is B. fixing a bike",
    "first (A) then (C) finally (B)", "A B C",
    "the video shows b. fixing a bike throughout the clip",
])
def test_egoschema_process_matches_reference(resp):
    ref = _load_ref_utils("egoschema")
    ours = get_task("EgoSchema").process_response(EGO_DOC, resp)
    theirs = ref.egoschema_process_results_generation(dict(EGO_DOC), [resp])
    assert ours["pred_answer"] == theirs["score"]["pred"]


def test_egoschema_choices_match_reference():
    ref = _load_ref_utils("egoschema")
    assert egoschema_doc_to_choices(EGO_DOC) == \
        ref.egoschema_doc_to_choice(EGO_DOC)


def _load_nextqa_ref():
    import sys
    import types
    # nextqa/utils.py reads stopwords.csv via pandas and imports a video
    # loader helper; stub the loader, let pandas run (it's in the image)
    name = "lmms_eval.tasks._task_utils.video_loader"
    mod = types.ModuleType(name)
    mod.get_cache_dir = lambda *a, **k: "/tmp"
    mod.get_video = lambda *a, **k: "/tmp/x.mp4"
    sys.modules[name] = mod
    try:
        return _load_ref_utils("nextqa")
    finally:
        sys.modules.pop(name, None)


def test_nextqa_prompt_matches_reference():
    ref = _load_nextqa_ref()
    assert get_task("NExT-QA").doc_to_text(NEXTQA_DOC) == \
        ref.nextqa_doc_to_text_mc(dict(NEXTQA_DOC), {})


@pytest.mark.parametrize("resp", [
    "C", "(C)", "C.", "B or C", "(A) no wait (C)",
    "he tripped on rock while running downhill yesterday",
    "the answer: D. jumped on purpose",
])
def test_nextqa_process_matches_reference(resp):
    ref = _load_nextqa_ref()
    ours = get_task("NExT-QA").process_response(NEXTQA_DOC, resp)
    theirs = ref.nextqa_mc_process_results(dict(NEXTQA_DOC), [resp])
    assert (ours["pred_answer"] == ours["answer"]) == \
        bool(theirs["exact_match"])


def test_perceptiontest_prompt_matches_reference():
    ref = _load_ref_utils("perceptiontest/val")
    assert get_task("PerceptionTest").doc_to_text(PT_DOC) == \
        ref.perceptiontest_val_doc_to_text(dict(PT_DOC), {})


@pytest.mark.parametrize("resp", ["C", "A", "B.", "(C)", "maybe", ""])
def test_perceptiontest_process_matches_reference(resp):
    ref = _load_ref_utils("perceptiontest/val")
    ours = get_task("PerceptionTest").process_response(PT_DOC, resp)
    theirs = ref.perceptiontest_val_process_results_mc(dict(PT_DOC), [resp])
    assert ours["pred_answer"] == theirs["accuracy"]["pred_id"]
    assert ours["correct"] == theirs["accuracy"]["correct"]


def test_perceptiontest_choices_match_reference():
    ref = _load_ref_utils("perceptiontest/val")
    assert get_task("PerceptionTest").doc_to_choices(PT_DOC) == \
        ref.perceptiontest_val_doc_to_choice(PT_DOC)
