"""TOMATO + Vinoground parity tests."""

import pytest

from tspo_tpu.eval.tasks import get_task
from tspo_tpu.eval.tomato_vinoground import (aggregate_vinoground,
                                             tomato_construct_prompt,
                                             tomato_parse_choice,
                                             tomato_pre_parse)

TOMATO_DOC = {"id": "t1", "question": "What rotates?",
              "options": ["the wheel", "the door"], "answer": 0,
              "reason_type": "rotation", "demonstration_type": "human"}


def _vino_doc(i, polarity, qtype, gt):
    return {"index": f"{i}_{polarity}_{qtype}", "major": "camera",
            "minor": None, "GT": gt,
            "question": f"Which caption fits? q{i}",
            "video_name": f"v{i}.mp4"}


def test_tomato_prompt_structure():
    prompt, ac, i2a = tomato_construct_prompt("What rotates?",
                                              ["the wheel", "the door"])
    assert ac == ["A", "B"]
    assert i2a == {"A": "the wheel", "B": "the door"}
    assert "16 separate frames" in prompt
    assert "{'A': 'the wheel', 'B': 'the door'}" in prompt


def test_tomato_parse():
    ac = ["A", "B"]
    i2a = {"A": "the wheel", "B": "the door"}
    assert tomato_parse_choice("B", ac, i2a) == "B"
    assert tomato_parse_choice("nothing useful", ac, i2a) == "A"  # const, not random
    assert tomato_parse_choice(
        "i am sure that the door is what rotates here", ac, i2a) == "B"
    # NB the reference regex allows no space after the colon
    assert tomato_pre_parse("Answer is:(B)", ac, i2a) == "B"
    assert tomato_pre_parse("Answer is: (B)", ac, i2a) == ""
    assert tomato_pre_parse("b", ac, i2a) == "B"
    assert tomato_pre_parse("who knows", ac, i2a) == ""


def test_tomato_flow():
    t = get_task("TOMATO")
    r1 = t.process_response(TOMATO_DOC, "A")
    assert r1["score"] == 1.0
    r2 = t.process_response(dict(TOMATO_DOC, reason_type="count"), "B")
    agg = t.aggregate([r1, r2])
    assert agg["overall"] == pytest.approx(50.0)
    assert agg["reason_type/rotation"] == pytest.approx(100.0)
    assert agg["reason_type/count"] == pytest.approx(0.0)
    assert agg["demonstration_type/human"] == pytest.approx(50.0)


def test_vinoground_group_scoring():
    t = get_task("Vinoground")
    docs = []
    # pair 0: all four probes right -> text/video/group all count
    for pol, qt in (("pos", "text"), ("neg", "text"), ("pos", "video"),
                    ("neg", "video")):
        docs.append((_vino_doc(0, pol, qt, "A"), "A"))
    # pair 1: one text probe wrong -> video right, text/group wrong
    docs.append((_vino_doc(1, "pos", "text", "A"), "B"))
    docs.append((_vino_doc(1, "neg", "text", "B"), "B"))
    docs.append((_vino_doc(1, "pos", "video", "A"), "A"))
    docs.append((_vino_doc(1, "neg", "video", "B"), "B"))
    recs = [t.process_response(d, resp) for d, resp in docs]
    agg = t.aggregate(recs)
    assert agg["text"] == pytest.approx(50.0)
    assert agg["video"] == pytest.approx(100.0)
    assert agg["group"] == pytest.approx(50.0)
    assert agg["categories"]["camera"]["group"] == pytest.approx(50.0)
    assert agg["categories"]["all"]["video"] == pytest.approx(100.0)


def test_vinoground_prompt():
    doc = _vino_doc(3, "pos", "text", "A")
    assert get_task("Vinoground").doc_to_text(doc) == \
        "Which caption fits? q3\nPlease only output one English character."


# ---------------------------------------------------------------------------
# dynamic parity vs reference
# ---------------------------------------------------------------------------

def _load_tomato_ref():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    return load_ref_utils_with_stubs("tomato")


def test_tomato_prompt_matches_reference():
    ref = _load_tomato_ref()
    want, ac, i2a = ref.construct_prompt("What rotates?",
                                         ["the wheel", "the door"], 16)
    got, ac2, i2a2 = tomato_construct_prompt("What rotates?",
                                             ["the wheel", "the door"], 16)
    assert got == want and ac2 == ac and i2a2 == i2a


@pytest.mark.parametrize("resp", [
    "B", "A", "Answer is: B", "(A) certainly",
    "i am sure that the door is what rotates here",
    "nothing useful at all here", "A or B",
])
def test_tomato_parse_matches_reference(resp):
    ref = _load_tomato_ref()
    ac = ["A", "B"]
    i2a = {"A": "the wheel", "B": "the door"}
    assert tomato_parse_choice(resp, list(ac), dict(i2a)) == \
        ref.parse_multi_choice_response(resp, list(ac), dict(i2a))
    assert tomato_pre_parse(resp, list(ac), dict(i2a)) == \
        ref.pre_parser(resp, list(ac), dict(i2a))


def test_vinoground_aggregate_matches_reference(monkeypatch):
    """Feed the reference aggregate the same 8 probes via monkeypatched
    score dicts and compare the three headline numbers."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    ref = load_ref_utils_with_stubs("vinoground")

    gts = {("0", "pos", "text"): "A", ("0", "neg", "text"): "A",
           ("0", "pos", "video"): "A", ("0", "neg", "video"): "A",
           ("1", "pos", "text"): "A", ("1", "neg", "text"): "B",
           ("1", "pos", "video"): "A", ("1", "neg", "video"): "B"}
    preds = dict(gts)
    preds[("1", "pos", "text")] = "B"       # the one wrong probe

    text_dict = {f"{i}_{p}": {"GT": gts[(i, p, "text")]}
                 for i in "01" for p in ("pos", "neg")}
    video_dict = {f"{i}_{p}": {"GT": gts[(i, p, "video")]}
                  for i in "01" for p in ("pos", "neg")}
    monkeypatch.setattr(ref, "prep_data",
                        lambda: (text_dict, video_dict))

    ref_results = [{"index": f"{i}_{p}", "categories": ["all", "camera"],
                    "question_type": qt, "pred": preds[(i, p, qt)]}
                   for i in "01" for p in ("pos", "neg")
                   for qt in ("text", "video")]
    # reference hardcodes a 500-row matrix but only rows covered by
    # index_to_categories are read back; pad the mapping
    for i in range(2, 500):
        ref_results.append({"index": f"{i}_pos", "categories": ["all"],
                            "question_type": "text", "pred": "A"})
        text_dict[f"{i}_pos"] = {"GT": "B"}
    rt, rv, rg = ref.vinoground_aggregate_results(ref_results)

    t = get_task("Vinoground")
    recs = [t.process_response(_vino_doc(i, p, qt, gts[(str(i), p, qt)]),
                               preds[(str(i), p, qt)])
            for i in (0, 1) for p in ("pos", "neg")
            for qt in ("text", "video")]
    for i in range(2, 500):
        recs.append(t.process_response(_vino_doc(i, "pos", "text", "B"), "A"))
    ours = t.aggregate(recs)
    assert ours["text"] == pytest.approx(rt)
    assert ours["video"] == pytest.approx(rv)
    assert ours["group"] == pytest.approx(rg)
