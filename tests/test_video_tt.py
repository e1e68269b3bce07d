"""Video-TT parity tests."""

import pytest

from tspo_tpu.eval.tasks import get_task
from tspo_tpu.eval.video_tt import videott_doc_to_text

DOC = {"video_id": "vt1", "capability": "Element Counting",
       "question": "How many birds appear?",
       "question_prompt": "A. 1\nB. 2\nC. 3\nD. 4", "answer": "B"}


def test_prompt_and_flow():
    t = get_task("Video-TT")
    # default run: yaml default post_prompt is EMPTY (videott_all.yaml)
    assert t.doc_to_text(DOC) == ("\nHow many birds appear?\n"
                                  "A. 1\nB. 2\nC. 3\nD. 4\n")
    assert t.doc_to_text(DOC, {"post_prompt": "The best answer is:"}) == \
        ("\nHow many birds appear?\nA. 1\nB. 2\nC. 3\nD. 4\n"
         "The best answer is:")
    r1 = t.process_response(DOC, "The best answer is B")
    assert r1["pred_answer"] == "B"
    r2 = t.process_response(dict(DOC, capability="Event Counting"), "A")
    agg = t.aggregate([r1, r2])
    assert agg["overall"] == pytest.approx(50.0)
    assert agg["Element Counting"] == pytest.approx(100.0)


def test_oe_correctness_threshold():
    t = get_task("Video-TT-oe")
    r1 = t.process_response(dict(DOC, correctness=4), "two birds")
    r2 = t.process_response(dict(DOC, correctness=2), "some birds")
    agg = t.aggregate([r1, r2])
    assert agg["overall"] == pytest.approx(50.0)


def test_matches_reference():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    ref = load_ref_utils_with_stubs("video-tt")
    kw = {"pre_prompt": "", "post_prompt": "The best answer is:"}
    assert videott_doc_to_text(dict(DOC), kw) == \
        ref.videott_doc_to_text(dict(DOC), kw)
    t = get_task("Video-TT")
    for resp in ("B", "The best option is C", "(E)", "no letters in this "
                 "long response of many words at all zz"):
        ours = t.process_response(DOC, resp)
        theirs = ref.videott_process_results(dict(DOC), [resp])[
            "videott_perception_score"]
        assert ours["pred_answer"] == theirs["pred_answer"]
    # aggregate parity
    recs = [t.process_response(DOC, "B"),
            t.process_response(dict(DOC, capability="Event Counting"), "A")]
    ref_results = [{"video_id": "vt1", "capability": "Element Counting",
                    "pred_answer": "B", "answer": "B"},
                   {"video_id": "vt1", "capability": "Event Counting",
                    "pred_answer": "A", "answer": "B"}]
    assert t.aggregate(recs)["overall"] == pytest.approx(
        ref.videott_aggregate_results(ref_results))
