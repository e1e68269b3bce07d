"""CameraBench parity tests."""

import pytest

from tspo_tpu.eval.camerabench import extract_answer
from tspo_tpu.eval.tasks import get_task


def _quad(base, scores):
    """Build 4 records for one group: q0_i0, q0_i1, q1_i0, q1_i1."""
    t = get_task("CameraBench")
    replies = {1: "Yes", 0: "No", -1: "maybe"}
    return [t.process_response({"Index": base + j, "Question": "Q?"},
                               replies[s]) for j, s in enumerate(scores)]


def test_prompt_and_parse():
    t = get_task("CameraBench")
    assert t.doc_to_text({"Index": 0, "Question": "Does the camera pan?"}) \
        == "Does the camera pan? Please answer Yes or No."
    assert extract_answer("Yes, it pans") == 1
    assert extract_answer("No") == 0
    assert extract_answer("yes... no wait") == 1   # earlier word wins
    assert extract_answer("not sure") == -1        # 'not' is not 'no'
    assert extract_answer("nothing here") == -1


def test_quadruple_scoring():
    # group 0 fully right (1,0,0,1); group 1 one flipped probe
    recs = _quad(0, [1, 0, 0, 1]) + _quad(4, [1, 1, 0, 1])
    agg = get_task("CameraBench").aggregate(recs)
    assert agg["G_Acc"] == pytest.approx(0.5)
    assert agg["Acc"] == pytest.approx(7 / 8)
    assert agg["Q_Acc"] == pytest.approx(3 / 4)    # group1 q0 fails both-videos
    assert agg["I_Acc"] == pytest.approx(3 / 4)    # group1 video1 fails
    assert agg["incomplete_quadruples_dropped"] == 0


def test_matches_reference():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    ref = load_ref_utils_with_stubs("camerabench_vqa")
    for resp in ("Yes", "No", "yes... no wait", "not sure", "B", "A yes"):
        assert extract_answer(resp) == ref.extract_answer(resp, "yes_no")
    assert get_task("CameraBench").doc_to_text(
        {"Index": 0, "Question": "Q?"}) == ref.cambench_doc_to_text(
        {"Index": 0, "Question": "Q?"})
    # aggregate parity on a 2-group synthetic set via the reference's
    # list-of-quadruple get_scores
    want = ref.get_scores([[1, 0, 0, 1], [1, 1, 0, 1]])
    recs = _quad(0, [1, 0, 0, 1]) + _quad(4, [1, 1, 0, 1])
    ours = get_task("CameraBench").aggregate(recs)
    for k in ("Acc", "Q_Acc", "I_Acc", "G_Acc"):
        assert ours[k] == pytest.approx(want[k])
