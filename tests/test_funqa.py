"""FunQA: judge system-message bytes, candidate truncation, last-number
parsing and aggregation parity vs lmms-eval/lmms_eval/tasks/funqa/utils.py,
plus the pure-Python BLEU-4 / ROUGE-L scorers in eval/text_metrics.py.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tspo_tpu.eval.funqa import (FUNQA_TASK_CODES, MAX_LEN, SYSTEM_MESSAGES,
                                 build_judge_content, extract_last_number,
                                 funqa_doc_to_text, make_funqa_task)
from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.text_metrics import bleu4, ptb_tokenize, rouge_l

REF = "/root/reference/lmms-eval/lmms_eval/tasks/funqa/utils.py"


class FakeJudge(JudgeProvider):
    def __init__(self, reply):
        super().__init__()
        self.reply = reply
        self.requests = []

    def complete(self, messages):
        self.requests.append(messages)
        return self.reply


def _load_ref():
    if not os.path.exists(REF):
        pytest.skip("reference checkout not available")
    stubs = {}
    specs = (
        ("loguru", {"logger": __import__("logging").getLogger("s")}),
        ("bleurt_pytorch", {"BleurtConfig": object,
                            "BleurtForSequenceClassification": object,
                            "BleurtTokenizer": object}),
        ("pycocoevalcap", {}),
        ("pycocoevalcap.eval", {"Bleu": object, "Cider": object,
                                "COCOEvalCap": object, "Meteor": object,
                                "Rouge": object, "Spice": object}),
        ("pycocoevalcap.tokenizer", {}),
        ("pycocoevalcap.tokenizer.ptbtokenizer", {"PTBTokenizer": object}),
        ("lmms_eval", {}), ("lmms_eval.tasks", {}),
        ("lmms_eval.tasks._task_utils", {}),
        ("lmms_eval.tasks._task_utils.file_utils",
         {"generate_submission_file": lambda *a, **k: "/dev/null"}),
        ("lmms_eval.filters", {}),
        ("lmms_eval.filters.extraction", {"ExtendedRegexFilter": object}),
    )
    for name, attrs in specs:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            stubs[name] = m
    sys.modules.update(stubs)
    old_hf = os.environ.get("HF_HOME")
    os.environ["HF_HOME"] = "/tmp"
    try:
        spec = importlib.util.spec_from_file_location("ref_funqa_utils", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        os.environ.pop("HF_HOME", None)
        if old_hf is not None:
            os.environ["HF_HOME"] = old_hf
        for name in stubs:
            sys.modules.pop(name, None)


def test_system_messages_match_reference():
    ref = _load_ref()
    assert SYSTEM_MESSAGES == ref.system_messages


def test_max_len_matches_reference():
    # funqa/utils.py:174 — read the dict straight out of the source
    src = open(REF).read() if os.path.exists(REF) else pytest.skip("no ref")
    import re
    m = re.search(r"max_len = (\{[^}]+\})", src)
    assert MAX_LEN == eval(m.group(1))


@pytest.mark.parametrize("s,expect", [
    ("[85]", 85.0), ("score: 42.5 done", 42.5), ("[Final Score]\n[70]", 70.0),
    ("no numbers", 0), ("3 then 9", 9.0), ("12.", 12.0),
])
def test_extract_last_number_matches_reference(s, expect):
    ref = _load_ref()
    assert extract_last_number(s) == expect == ref.extract_last_number(s)


def test_candidate_truncation():
    long_pred = "x" * 500
    content = build_judge_content("[gold]", long_pred, "H4")
    assert content == "[gold][" + "x" * 40 + "]"
    content = build_judge_content("[gold]", "short", "C2")
    assert content == "[gold][short]"


def test_doc_to_text_matches_reference():
    ref = _load_ref()
    doc = {"question": "What makes this funny?"}
    assert funqa_doc_to_text(doc) == ref.funqa_doc_to_text(dict(doc))


def test_reference_get_eval_namerror_bug_documented():
    """funqa/utils.py:199 references an undefined name ``score`` — every
    successful judge reply raises NameError inside the try, is swallowed by
    the retry handler, and the reference returns ("", "", 0).  We implement
    the evident intent instead; this test pins the divergence so a reference
    upgrade that fixes the bug gets noticed."""
    src = open(REF).read() if os.path.exists(REF) else pytest.skip("no ref")
    assert 'if content != "" and score != 0:' in src


def test_process_and_aggregate():
    judge = FakeJudge("[Content: 20], [Details: 45]\n[80]")
    task = make_funqa_task(judge)
    doc = {"video_name": "h1.mp4", "question": "Describe the video",
           "answer": "a man slips on a banana peel",
           "task": "H2", "prompt": "[a man slips on a banana peel]"}
    r = task.process_response(doc, "a man slips on a banana")
    assert r["gpt_score"] == 80.0
    # judge saw system message "2" and the truncated bracketed candidate
    msgs = judge.requests[0]
    assert [m for m in msgs if m["role"] == "system"][0]["content"] == \
        SYSTEM_MESSAGES["2"]
    assert [m for m in msgs if m["role"] == "user"][0]["content"] == \
        "[a man slips on a banana peel][a man slips on a banana]"

    agg = task.aggregate([r])
    # mean over the 8 task codes, 7 empty at 0 (funqa/utils.py:338-341)
    assert agg["gpt"]["H2"] == 80.0
    assert agg["overall"] == pytest.approx(80.0 / len(FUNQA_TASK_CODES))
    assert agg["BLEU4"]["H2"] > 0
    assert agg["ROUGE_L"]["H2"] > 0


def test_judge_failure_scores_zero():
    class FailJudge(JudgeProvider):
        def complete(self, messages):
            raise RuntimeError("down")
    task = make_funqa_task(FailJudge())
    doc = {"video_name": "v", "question": "q", "answer": "a", "task": "M3",
           "prompt": "[a]"}
    r = task.process_response(doc, "p")
    assert r["gpt_score"] == 0 and r["eval_answer"] == ""
    assert task.aggregate([r])["judge_failures"] == 1


def test_bleurt_gated():
    from tspo_tpu.eval.funqa import funqa_bleurt_scores
    with pytest.raises(RuntimeError, match="BLEURT"):
        funqa_bleurt_scores([], model_dir=None)


# ---------------------------------------------------------------------------
# text metrics (coco-caption algorithm reimplementation)
# ---------------------------------------------------------------------------

def test_ptb_tokenize():
    assert ptb_tokenize("A man, walking quickly.") == \
        ["a", "man", "walking", "quickly"]
    assert ptb_tokenize("Hello!  world...") == ["hello", "world..."] or \
        ptb_tokenize("Hello!  world...") == ["hello", "world"]


def test_bleu4_identity_and_disjoint():
    s = "a man walks a small brown dog in the park"
    assert bleu4(s, s) == pytest.approx(1.0, abs=1e-6)
    assert bleu4(s, "purple elephants fly over quiet oceans tonight "
                    "somewhere") < 1e-6


def test_bleu4_hand_computed():
    """Clipped n-gram precisions computed by hand: ref 'the cat sat on the
    mat', hyp 'the cat sat on mat' — p1=5/5, p2=3/4 (on-mat unmatched),
    p3=2/3 (sat-on-mat unmatched), p4=1/2 (cat-sat-on-mat unmatched);
    brevity ratio 5/6 -> exp(1 - 6/5)."""
    ref = "the cat sat on the mat"
    hyp = "the cat sat on mat"
    expected = (1.0 * (3 / 4) * (2 / 3) * (1 / 2)) ** 0.25
    expected *= np.exp(1 - 6 / 5)
    assert bleu4(ref, hyp) == pytest.approx(expected, rel=1e-6)


def test_rouge_l_hand_computed():
    """LCS('the cat sat', 'the cat ran') = 2 -> p=r=2/3, F_beta(1.2)."""
    p = r = 2 / 3
    beta = 1.2
    expected = (1 + beta ** 2) * p * r / (r + beta ** 2 * p)
    assert rouge_l("the cat sat", "the cat ran") == pytest.approx(expected)
    assert rouge_l("same words here", "same words here") == \
        pytest.approx(1.0)
    assert rouge_l("alpha beta", "gamma delta") == 0.0
    assert rouge_l("", "anything") == 0.0
