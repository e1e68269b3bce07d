"""VSIBench + EgoPlan parity tests."""

import pytest

from tspo_tpu.eval.spatial_tasks import (egoplan_doc_to_text,
                                         egoplan_extract_letter,
                                         fuzzy_matching,
                                         mean_relative_accuracy,
                                         vsibench_doc_to_text)
from tspo_tpu.eval.tasks import get_task

MCA_DOC = {"id": 1, "question_type": "route_planning",
           "question": "Which route reaches the kitchen?",
           "options": ["A. left", "B. right"], "ground_truth": "A",
           "dataset": "scannet", "scene_name": "scene0011_00"}
NA_DOC = {"id": 2, "question_type": "object_counting",
          "question": "How many chairs are in the room?",
          "ground_truth": "4", "dataset": "arkit", "scene_name": "s2"}
EGO_DOC = {"sample_id": 77, "task_goal": "making a cup of coffee",
           "choice_a": "pour water", "choice_b": "grind beans",
           "choice_c": "open fridge", "choice_d": "wash cup",
           "golden_choice_idx": "B"}


def test_vsibench_prompts():
    assert vsibench_doc_to_text(MCA_DOC) == (
        "These are frames of a video.\n"
        "Which route reaches the kitchen?\n"
        "Options:\nA. left\nB. right\n"
        "Answer with the option's letter from the given choices directly.")
    assert vsibench_doc_to_text(NA_DOC) == (
        "These are frames of a video.\n"
        "How many chairs are in the room?\n"
        "Please answer the question using a single word or phrase.")


def test_mra():
    # |4-4|/4 = 0 -> all thresholds pass
    assert mean_relative_accuracy(4.0, 4.0) == pytest.approx(1.0)
    # the reference's int((end-start)/interval + 2) truncates 10.999... to
    # 10 linspace points (float quirk, reproduced); rel err 0.25 passes
    # thresholds theta <= 0.75 = 6 of the 10
    assert mean_relative_accuracy(3.0, 4.0) == pytest.approx(0.6)
    assert mean_relative_accuracy(40.0, 4.0) == pytest.approx(0.0)


def test_fuzzy():
    assert fuzzy_matching("4. chairs maybe") == "4"
    assert fuzzy_matching("A") == "A"


def test_vsibench_process_and_aggregate():
    t = get_task("VSIBench")
    r1 = t.process_response(MCA_DOC, "A. left")
    assert r1["accuracy"] == 1.0
    r2 = t.process_response(NA_DOC, "4")
    assert r2["mra"] == pytest.approx(1.0)
    r3 = t.process_response(NA_DOC, "many")     # unparseable -> worst case
    assert r3["mra"] == 0.0
    agg = t.aggregate([r1, r2, r3])
    assert agg["route_planning_accuracy"] == pytest.approx(1.0)
    assert agg["object_counting_MRA:.5:.95:.05"] == pytest.approx(0.5)
    assert agg["overall"] == pytest.approx(0.75)


def test_vsibench_rel_direction_merge():
    t = get_task("VSIBench")
    rows = []
    for d, acc in (("easy", 1.0), ("medium", 1.0), ("hard", 0.0)):
        doc = dict(MCA_DOC, question_type=f"object_rel_direction_{d}")
        rows.append(t.process_response(doc, "A" if acc else "B"))
    agg = t.aggregate(rows)
    assert agg["object_rel_direction_accuracy"] == pytest.approx(2 / 3)
    assert "object_rel_direction_easy_accuracy" not in agg


def test_vsibench_video_resolution():
    assert get_task("VSIBench").resolve_video(MCA_DOC, "/v") == \
        "/v/scannet/scene0011_00.mp4"


def test_egoplan_prompt():
    txt = egoplan_doc_to_text(EGO_DOC)
    assert txt.startswith("I am tasked with making a cup of coffee. ")
    assert "\nA. pour water\nB. grind beans" in txt
    assert txt.endswith("\nAnswer with the option's letter from the given "
                        "choices")
    # non-ing goal takes the other pattern
    txt2 = egoplan_doc_to_text(dict(EGO_DOC, task_goal="make coffee"))
    assert txt2.startswith("My current task is to make coffee. ")


def test_egoplan_parse_and_aggregate():
    assert egoplan_extract_letter("The answer is B") == "B"
    assert egoplan_extract_letter("b is right, I mean B") == "B"
    assert egoplan_extract_letter("definitely nothing useful here at all "
                                  "with many words and no letter") == ""
    t = get_task("EgoPlan")
    r1 = t.process_response(EGO_DOC, "B")
    r2 = t.process_response(EGO_DOC, "A")
    assert t.aggregate([r1, r2])["overall"] == pytest.approx(50.0)
    assert t.resolve_video(EGO_DOC, "/v") == "/v/77.mp4"


# ---------------------------------------------------------------------------
# dynamic parity vs reference
# ---------------------------------------------------------------------------

def _load(task_dir):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import _load_ref_utils
    old_hf = os.environ.get("HF_HOME")
    os.environ["HF_HOME"] = "/tmp"
    try:
        return _load_ref_utils(task_dir)
    finally:
        if old_hf is None:
            os.environ.pop("HF_HOME", None)
        else:
            os.environ["HF_HOME"] = old_hf


def test_vsibench_matches_reference():
    ref = _load("vsibench")
    kw = {}
    assert vsibench_doc_to_text(MCA_DOC, kw) == \
        ref.vsibench_doc_to_text(dict(MCA_DOC), kw)
    assert vsibench_doc_to_text(NA_DOC, kw) == \
        ref.vsibench_doc_to_text(dict(NA_DOC), kw)
    for pred, tgt in ((3.0, 4.0), (4.0, 4.0), (5.5, 4.0), (0.1, 4.0)):
        assert mean_relative_accuracy(pred, tgt) == pytest.approx(
            ref.mean_relative_accuracy(pred, tgt, start=.5, end=.95,
                                       interval=.05))
    for resp in ("A. left", "B", "4.", "roughly 4 chairs"):
        assert fuzzy_matching(resp) == ref.fuzzy_matching(resp)


def test_egoplan_matches_reference():
    ref = _load("egoplan")
    assert egoplan_doc_to_text(EGO_DOC) == \
        ref.egoplan_doc_to_text(dict(EGO_DOC))
    assert egoplan_doc_to_text(dict(EGO_DOC, task_goal="make coffee")) == \
        ref.egoplan_doc_to_text(dict(EGO_DOC, task_goal="make coffee"))
    for resp in ("The answer is B", "The best option isThe correct option "
                 "is C", "A", "no letter in this long answer of many many "
                 "words right"):
        assert egoplan_extract_letter(resp) == \
            ref.extract_characters_regex(resp)
