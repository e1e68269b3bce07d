"""VideoMMMU parity tests."""

import pytest

from tspo_tpu.eval.tasks import get_task
from tspo_tpu.eval.videommmu import (doc_to_text_adaptation,
                                     doc_to_text_perception_comprehension,
                                     eval_open, extract_numbers,
                                     extract_subset_name, normalize_str,
                                     parse_multi_choice_response,
                                     parse_open_response, parse_options)

MC_DOC = {"id": "validation_Physics_3", "question_type": "multiple-choice",
          "question": "What is the net force?",
          "options": ["2 N", "4 N", "6 N", "8 N"], "answer": "B"}
OPEN_DOC = {"id": "validation_Math_7", "question_type": "open",
            "question": "Compute the area.", "options": [],
            "answer": "12.5"}


def test_prompts():
    assert parse_options(["x", "y"]) == "A. x\nB. y"
    assert parse_options(["A. x", "B. y"]) == "A. x\nB. y"
    txt = doc_to_text_perception_comprehension(MC_DOC)
    assert txt.endswith("Please ignore the Quiz question in last frame of "
                        "the video.")
    ad = doc_to_text_adaptation(MC_DOC)
    assert ad.startswith("You should watch and learn the video content.")
    assert "multi-choice question" in ad
    ad_open = doc_to_text_adaptation(OPEN_DOC)
    assert "open-ended question" in ad_open


def test_mc_parse():
    ac = ["A", "B", "C", "D"]
    i2a = {"A": "2 N", "B": "4 N", "C": "6 N", "D": "8 N"}
    assert parse_multi_choice_response("B.", ac, i2a) == "B"
    assert parse_multi_choice_response("B: because", ac, i2a) == "B"
    assert parse_multi_choice_response("(C)", ac, i2a) == "C"
    assert parse_multi_choice_response("the answer must surely be 4 N here",
                                       ac, i2a) == "B"
    assert parse_multi_choice_response("zzz", ac, i2a) == "No Answer Found."
    assert parse_multi_choice_response("", ac, i2a) == "API Error"


def test_open_parse_and_eval():
    # NB "The area is 12.5 square units" would parse to ["units"]: the
    # reference's "are " indicator matches inside "squARE units" and takes
    # the shortest tail — a faithfully-reproduced quirk
    preds = parse_open_response("The area equals 12.5")
    assert 12.5 in preds
    assert eval_open("12.5", preds)
    assert not eval_open("99", preds)
    # the reference's simple-number pattern also re-extracts digit runs
    # inside the comma/scientific matches — faithful, warts and all
    assert extract_numbers("1,234 and 5.6e3 and 7") == \
        ["1,234", "5.6e3", "234", "5", "3", "7"]
    assert normalize_str("12.5") == [12.5]
    assert normalize_str("a") == [" a", "a "]


def test_flow_and_aggregate():
    t = get_task("VideoMMMU-perception")
    r1 = t.process_response(MC_DOC, "B.")
    r2 = t.process_response(OPEN_DOC, "So the answer is 13")
    assert r1["subdomain"] == "Physics" and r2["subdomain"] == "Math"
    agg = t.aggregate([r1, r2])
    assert agg["overall"] == pytest.approx(0.5)
    assert agg["Overall-Science"] == pytest.approx(0.5)
    assert agg["Physics"] == pytest.approx(1.0)
    assert extract_subset_name("validation_Art_Theory_12") == "Art_Theory"


def test_matches_reference():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    ref = load_ref_utils_with_stubs("videommmu")
    kw = {"pre_prompt": "You should watch and learn the video content. "
                        "Then apply what you learned to ",
          "perception_and_comprehension_prompt": "\nPlease ignore the Quiz "
          "question in last frame of the video.",
          "mcq_prompt": "answer the following multi-choice question. The "
          "image for this question is at the end of the video.\n",
          "open_ended_prompt": "answer the following open-ended question. "
          "The image for this question is at the end of the video.\n"}
    assert doc_to_text_perception_comprehension(dict(MC_DOC), kw) == \
        ref.videommmu_doc_to_text_perception_comprehension(dict(MC_DOC), kw)
    assert doc_to_text_adaptation(dict(MC_DOC), kw) == \
        ref.videommmu_doc_to_text_adaptation(dict(MC_DOC), kw)
    assert doc_to_text_adaptation(dict(OPEN_DOC), kw) == \
        ref.videommmu_doc_to_text_adaptation(dict(OPEN_DOC), kw)
    ac = ["A", "B", "C", "D"]
    i2a = {"A": "2 N", "B": "4 N", "C": "6 N", "D": "8 N"}
    for resp in ("B.", "B: sure", "(C)", "A or B.", "the answer must surely "
                 "be 4 N here", "zzz", "C. no wait D."):
        assert parse_multi_choice_response(resp, list(ac), dict(i2a)) == \
            ref.parse_multi_choice_response(resp, list(ac), dict(i2a))
    for resp in ("The area is therefore 12.5 square units",
                 "x = 3. So the result is 1,234", "just text"):
        assert sorted(map(str, parse_open_response(resp))) == \
            sorted(map(str, ref.parse_open_response(resp)))
