"""VideoMathQA parity tests."""

import pytest

from tspo_tpu.eval.tasks import get_task
from tspo_tpu.eval.videomathqa import (COT_POST_PROMPT,
                                       videomathqa_doc_to_text,
                                       videomathqa_extract_letter)

DOC = {"question_id": "q1", "videoID": "vm1", "length": "short",
       "category": "Arithmetic", "question": "What is the sum shown?",
       "options": ["A. 4", "B. 5", "C. 6", "D. 7", "E. 8"], "answer": "B"}
BIN_DOC = dict(DOC, options=["A. Yes", "B. No"])


def test_prompts():
    txt = videomathqa_doc_to_text(DOC)
    assert "(A, B, C, D or E)" in txt and txt.endswith("The best answer is:")
    assert "\nA. 4\nB. 5\n" in txt
    txt2 = videomathqa_doc_to_text(BIN_DOC)
    assert "(A or B)" in txt2
    txt3 = videomathqa_doc_to_text(DOC, {"post_prompt": COT_POST_PROMPT})
    assert txt3.endswith("from the given choices.")


def test_parse():
    assert videomathqa_extract_letter("The best answer is B") == "B"
    assert videomathqa_extract_letter("E.") == "E"
    assert videomathqa_extract_letter(
        "a long answer with absolutely no letters in range here ok") == ""


def test_mcq_aggregate():
    t = get_task("VideoMathQA")
    r1 = t.process_response(DOC, "B")
    r2 = t.process_response(dict(DOC, length="long", category="Chart"), "A")
    agg = t.aggregate([r1, r2])
    assert agg["overall"] == pytest.approx(50.0)
    assert agg["short"] == pytest.approx(100.0)
    assert agg["Chart"] == pytest.approx(0.0)


def test_mbin_all_probes_must_pass():
    t = get_task("VideoMathQA-mbin")
    # question q1: two probes, one wrong -> question counts wrong
    recs = [t.process_response(BIN_DOC, "A"),
            t.process_response(dict(BIN_DOC, answer="A"), "A"),
            # question q2: single correct probe
            t.process_response(dict(BIN_DOC, question_id="q2"), "B")]
    agg = t.aggregate(recs)
    assert agg["overall"] == pytest.approx(50.0)


def test_matches_reference():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    ref = load_ref_utils_with_stubs("videomathqa")
    kw = {}
    assert videomathqa_doc_to_text(dict(DOC), kw) == \
        ref.videomathqa_doc_to_text(dict(DOC), kw)
    assert videomathqa_doc_to_text(dict(BIN_DOC), kw) == \
        ref.videomathqa_doc_to_text(dict(BIN_DOC), kw)
    for resp in ("B", "The best answer is E", "(C)", "none of these words "
                 "contain any of the valid letters at all zzz"):
        assert videomathqa_extract_letter(resp) == \
            ref.extract_characters_regex(resp)
    # aggregate value parity (mcq): feed the reference its record shape
    ours = get_task("VideoMathQA").aggregate(
        [get_task("VideoMathQA").process_response(DOC, "B"),
         get_task("VideoMathQA").process_response(
             dict(DOC, length="long", category="Chart"), "A")])
    ref_results = [{"question_id": "q1", "duration": "short",
                    "category": "Arithmetic", "pred_answer": "B",
                    "answer": "B"},
                   {"question_id": "q1", "duration": "long",
                    "category": "Chart", "pred_answer": "A", "answer": "B"}]
    assert ours["overall"] == pytest.approx(
        ref.videomathqa_mcq_aggregate_results(ref_results))
