"""TimeScope / LongTimeScope / CinePile parity tests."""

import pytest

from tspo_tpu.eval.tasks import get_task
from tspo_tpu.eval.timescope_cinepile import (_LTS_PREFIXES, _TS_PREFIXES,
                                              cinepile_doc_to_text,
                                              cinepile_eval_response,
                                              cinepile_normalize,
                                              timescope_extract_letter)

TS_DOC = {"id": 5, "length": 600, "video": "v5.mp4", "type": "ocr",
          "input": "What is written on the sign?\nA. stop\nB. go",
          "answer": "A"}
CP_DOC = {"videoID": "m1", "question": "Why does she leave?",
          "choices": ["anger", "boredom", "fear", "joy", "duty"],
          "answer_key": "fear", "answer_key_position": 2,
          "question_category": "Temporal", "hard_split": "True",
          "subtitles": "[00:01] I must go."}


def test_timescope_prompt_and_parse():
    t = get_task("TimeScope")
    assert t.doc_to_text(TS_DOC) == TS_DOC["input"]
    assert timescope_extract_letter("The best option is A") == "A"
    # the concatenated-prefix quirk: longtimescope does NOT strip the
    # standalone "The best option is" (only the merged pair string)
    assert timescope_extract_letter("F", _LTS_PREFIXES) == "F"
    rec = t.process_response(TS_DOC, "A. stop")
    assert rec["pred_answer"] == "A"


def test_timescope_aggregate():
    t = get_task("TimeScope")
    recs = [t.process_response(TS_DOC, "A"),
            t.process_response(dict(TS_DOC, length=1200, type="qa"), "B")]
    agg = t.aggregate(recs)
    assert agg["overall"] == pytest.approx(50.0)
    assert agg["600_ocr"] == pytest.approx(100.0)
    assert agg["1200_qa"] == pytest.approx(0.0)
    assert agg["length_600"] == pytest.approx(100.0)


def test_cinepile_prompt():
    txt = cinepile_doc_to_text(CP_DOC)
    assert txt.startswith("You will be provided with subtitles")
    assert "**Subtitles:**\n[00:01] I must go.\n\n" in txt
    assert "- A) anger\n- B) boredom\n- C) fear\n- D) joy\n- E) duty\n" in txt
    assert txt.endswith("(A, B, C, D, E) and nothing else.")


def test_cinepile_normalize_and_eval():
    assert cinepile_normalize("C") == ("C", "")
    assert cinepile_normalize("**Answer:** C) fear") == ("C", "fear")
    assert cinepile_normalize("she is afraid") == (None, "she is afraid")
    assert cinepile_eval_response("C", "C", "fear") == 1
    assert cinepile_eval_response("Answer: C) fear", "C", "fear") == 1
    assert cinepile_eval_response("Answer: C) joy", "C", "fear") == 0
    assert cinepile_eval_response("fear", "C", "fear") == 1
    assert cinepile_eval_response("B", "C", "fear") == 0


def test_cinepile_flow():
    t = get_task("CinePile")
    r1 = t.process_response(CP_DOC, "Answer: C")
    r2 = t.process_response(dict(CP_DOC, hard_split="False"), "Answer: B")
    agg = t.aggregate([r1, r2])
    assert agg["overall"] == pytest.approx(50.0)
    assert agg["Temporal"] == pytest.approx(50.0)
    assert agg["Temporal (hard)"] == pytest.approx(100.0)
    assert t.resolve_video(CP_DOC, "/v") == "/v/m1.mp4"


# ---------------------------------------------------------------------------
# dynamic parity vs reference
# ---------------------------------------------------------------------------

def _load(task_dir):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    return load_ref_utils_with_stubs(task_dir)


@pytest.mark.parametrize("resp", [
    "A", "The best answer is B", "The best option is C", "(D)", "F.",
    "a very long sentence with no letters to be found here at all ok",
])
def test_timescope_parsers_match_reference(resp):
    ts = _load("timescope")
    lts = _load("longtimescope")
    assert timescope_extract_letter(resp, _TS_PREFIXES) == \
        ts.extract_characters_regex(resp)
    assert timescope_extract_letter(resp, _LTS_PREFIXES) == \
        lts.extract_characters_regex(resp)


def test_cinepile_matches_reference():
    ref = _load("cinepile")
    kw = {"pre_prompt": "PRE", "post_prompt": "POST"}
    assert cinepile_doc_to_text(CP_DOC, kw) == \
        ref.cinepile_doc_to_text(dict(CP_DOC), kw)
    for resp in ("C", "**Answer:** C) fear", "Answer: B", "fear",
                 "no idea at all"):
        want, _, _ = ref.eval_response(resp, "C", "fear")
        assert cinepile_eval_response(resp, "C", "fear") == want