"""VDC parity tests (two-step judge flow, prompt pools)."""

import pytest

from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.vdc import (VDC_ANSWER_SYSTEM, VDC_POOLS,
                               VDC_SCORE_SYSTEM, make_vdc_task,
                               vdc_answer_prompt, vdc_score_prompt)

DOC = {"video_name": "v1.mp4", "caption": "gold caption",
       "qa_list": [{"question": "Who appears?", "answer": "a chef"},
                   {"question": "Where?", "answer": "a kitchen"}]}


class TwoStepJudge(JudgeProvider):
    """Answers questions with 'a chef', grades with yes/4."""

    def __init__(self):
        super().__init__()
        self.calls = []

    def complete(self, messages):
        self.calls.append(messages)
        if messages[0]["content"] == VDC_ANSWER_SYSTEM:
            return "a chef"
        return "{'pred': 'yes', 'score': 4}"


def test_pools_nonempty():
    for dim, pool in VDC_POOLS.items():
        assert len(pool) >= 16, dim
        assert all(isinstance(p, str) and p for p in pool)


def test_doc_to_text_draws_from_pool():
    from tspo_tpu.eval.vdc import make_vdc_doc_to_text
    d2t = make_vdc_doc_to_text("camera")
    for _ in range(5):
        assert d2t(DOC) in VDC_POOLS["camera"]


def test_two_step_flow():
    judge = TwoStepJudge()
    task = make_vdc_task("detailed", judge)
    rec = task.process_response(DOC, "a chef cooks in a kitchen")
    # 2 QA pairs x 2 judge calls each
    assert len(judge.calls) == 4
    assert rec["score"] == pytest.approx(4.0)
    assert rec["acc"] == pytest.approx(1.0)
    assert judge.calls[0][-1]["content"] == vdc_answer_prompt(
        "a chef cooks in a kitchen", "Who appears?")
    assert judge.calls[1][0]["content"] == VDC_SCORE_SYSTEM
    assert judge.calls[1][-1]["content"] == vdc_score_prompt(
        "Who appears?", "a chef", "a chef")
    agg = task.aggregate([rec, dict(rec, score=2.0, acc=0.0)])
    assert agg["average_score"] == pytest.approx(3.0)
    assert agg["accuracy"] == pytest.approx(0.5)   # raw fraction, like the reference


def test_prompts_match_reference():
    """The judge message bodies must match the reference's sglang templates
    (system/user bodies compared against the source strings; the pools are
    extracted from the reference module directly)."""
    import os
    import sys
    import types
    sys.path.insert(0, os.path.dirname(__file__))

    sgl = types.ModuleType("sglang")

    captured = {"msgs": []}

    def function(f=None, **kw):
        return f if f is not None else (lambda g: g)

    sgl.function = function
    sgl.system = lambda text: ("system", text)
    sgl.user = lambda text: ("user", text)
    sgl.assistant = lambda *a, **k: ("assistant", None)
    sgl.gen = lambda *a, **k: None
    sgl.set_default_backend = lambda *a, **k: None
    sgl.RuntimeEndpoint = object
    had = "sglang" in sys.modules
    old = sys.modules.get("sglang")
    sys.modules["sglang"] = sgl
    try:
        from test_task_prompts import load_ref_utils_with_stubs
        ref = load_ref_utils_with_stubs("vdc")
    finally:
        if had:
            sys.modules["sglang"] = old
        else:
            sys.modules.pop("sglang", None)

    class S:
        def __init__(self):
            self.msgs = []

        def __iadd__(self, other):
            self.msgs.append(other)
            return self

    s = S()
    ref.gener_pred_response(s, pred_cap="CAP", q="Q?")
    assert s.msgs[0] == ("system", VDC_ANSWER_SYSTEM)
    assert s.msgs[1] == ("user", vdc_answer_prompt("CAP", "Q?"))

    s = S()
    ref.gener_pred_score(s, qa={"question": "Q?", "answer": "A",
                                "pred_answer": "P"})
    assert s.msgs[0] == ("system", VDC_SCORE_SYSTEM)
    assert s.msgs[1] == ("user", vdc_score_prompt("Q?", "A", "P"))

    for dim, name in (("detailed", "DETAILED_CAPTION_PROMPTS"),
                      ("short", "SHORT_CAPTION_PROMPTS"),
                      ("camera", "CAMERA_CAPTION_PROMPTS"),
                      ("background", "BACKGROUND_CAPTION_PROMPTS"),
                      ("main_object", "MAIN_OBJECT_CAPTION_PROMPTS")):
        assert VDC_POOLS[dim] == getattr(ref, name)
