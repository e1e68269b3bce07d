"""TemporalBench / MMWorld / VideoEvalPro parity tests."""

import pytest

from tspo_tpu.eval.extra_tasks import (aggregate_mmworld,
                                       aggregate_temporalbench,
                                       make_videoevalpro_task,
                                       mmworld_doc_to_text, vep_judge_prompt)
from tspo_tpu.eval.llm_judge import JudgeProvider
from tspo_tpu.eval.tasks import get_task

TB_DOCS = [
    {"idx": 0, "video_name": "v1.mp4", "dataset": "sta", "category":
     "Action Order", "question": "Q0\nA. x\nB. y", "GT": "A"},
    {"idx": 1, "video_name": "v1.mp4", "dataset": "sta", "category":
     "Action Type", "question": "Q1\nA. x\nB. y", "GT": "B"},
    {"idx": 2, "video_name": "v2.mp4", "dataset": "clevrer", "category":
     "Action Order", "question": "Q2\nA. x\nB. y", "GT": "A"},
]
MMW_DOC = {"video_id": "yt/abc123", "discipline": "Science",
           "question": "What happens?",
           "options": ["A. boils", "B. freezes"],
           "correct_answer_label": "a"}
VEP_DOC = {"video": "x.mp4", "question": " Who wins? ",
           "answer_text": " The red team. ", "qa_type": "Local Perception"}


def test_temporalbench_flow():
    t = get_task("TemporalBench")
    assert t.doc_to_text(TB_DOCS[0]) == "Q0\nA. x\nB. y"
    recs = [t.process_response(d, resp)
            for d, resp in zip(TB_DOCS, ["A", "A", "A. yes"])]
    # doc1 wrong (A vs B): binary 2/3; video v1 has a wrong answer -> MBA 1/2
    agg = t.aggregate(recs)
    assert agg["binary_accuracy"] == pytest.approx(200 / 3)
    assert agg["multiple_binary_accuracy"] == pytest.approx(50.0)
    assert agg["per_dataset"]["sta"] == pytest.approx(50.0)
    assert agg["per_category"]["Action Order"] == pytest.approx(100.0)
    # empty response scores wrong, doesn't crash
    assert t.process_response(TB_DOCS[0], "")["correct"] == 0


def test_mmworld_prompt_and_flow():
    txt = mmworld_doc_to_text(MMW_DOC)
    assert txt.startswith("Select the best answer")
    assert "\nWhat happens?\n['A. boils', 'B. freezes']\n" in txt
    assert txt.endswith("The best answer is:")
    t = get_task("MMWorld")
    r1 = t.process_response(MMW_DOC, "A")
    assert r1["pred_answer"] == "A" and r1["answer"] == "A"
    agg = t.aggregate([r1, t.process_response(MMW_DOC, "B")])
    assert agg["overall"] == pytest.approx(50.0)
    assert agg["Science"] == pytest.approx(50.0)
    assert t.resolve_video(MMW_DOC, "/v") == "/v/yt/abc123.mp4"


class GradeJudge(JudgeProvider):
    def __init__(self, grade="A"):
        super().__init__()
        self.grade = grade
        self.calls = []

    def complete(self, messages):
        self.calls.append(messages)
        return self.grade


def test_videoevalpro_flow():
    judge = GradeJudge("A")
    task = make_videoevalpro_task(judge)
    rec = task.process_response(VEP_DOC, "the red team wins")
    assert rec["judge_result"] is True
    assert rec["question"] == "Who wins?" and rec["text_gt"] == "The red team."
    prompt = judge.calls[0][-1]["content"]
    assert "Question:Who wins? " in prompt
    assert "Goldtarget:The red team. " in prompt
    rec2 = make_videoevalpro_task(GradeJudge("B")).process_response(
        VEP_DOC, "blue")
    agg = task.aggregate([rec, rec2])
    assert agg["overall"] == pytest.approx(0.5)
    assert agg["Local Perception"] == pytest.approx(0.5)
    assert agg["Holistic Reasoning"] == 0.0


# ---------------------------------------------------------------------------
# dynamic parity vs reference
# ---------------------------------------------------------------------------

def _load(task_dir, extra_stubs=()):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_task_prompts import load_ref_utils_with_stubs
    return load_ref_utils_with_stubs(task_dir, extra_stubs)


def test_temporalbench_matches_reference():
    ref = _load("temporalbench")
    t = get_task("TemporalBench")
    assert t.doc_to_text(TB_DOCS[0]) == \
        ref.temporalbench_doc_to_text(dict(TB_DOCS[0]))
    # reference aggregate returns (binary, mba); feed it its record shape
    ref_results = [{"item": d, "pred": resp}
                   for d, resp in zip(TB_DOCS, ["A", "A", "A. yes"])]
    rb, rmba = ref.temporalbench_aggregate_results(ref_results)
    ours = t.aggregate([t.process_response(d, resp)
                        for d, resp in zip(TB_DOCS, ["A", "A", "A. yes"])])
    assert ours["binary_accuracy"] == pytest.approx(rb)
    assert ours["multiple_binary_accuracy"] == pytest.approx(rmba)


def test_mmworld_matches_reference():
    ref = _load("mmworld")
    kw = {}
    assert mmworld_doc_to_text(MMW_DOC, kw) == \
        ref.mmworld_doc_to_text(dict(MMW_DOC), kw)
    for resp in ("A", "The answer is B", "nothing here of use in many many "
                 "words to say"):
        ours = get_task("MMWorld").process_response(MMW_DOC, resp)
        theirs = ref.mmworld_process_results(dict(MMW_DOC), [resp])[
            "mmworld_accuracy"]
        assert ours["pred_answer"] == theirs["pred_answer"]
        assert ours["answer"] == theirs["answer"]


def test_videoevalpro_prompt_matches_reference(monkeypatch):
    """Byte-compare our template against what the reference judge would send
    through a stubbed OpenAI client."""
    import types

    captured = {}

    class Completions:
        def create(self, model=None, messages=None, temperature=None,
                   max_tokens=None):
            captured["prompt"] = messages[0]["content"]
            msg = types.SimpleNamespace(content="A")
            return types.SimpleNamespace(
                choices=[types.SimpleNamespace(message=msg)])

    client = types.SimpleNamespace(
        chat=types.SimpleNamespace(completions=Completions()))
    import os
    os.environ.setdefault("OPENAI_API_KEY", "test")
    ref = _load("videoevalpro",
                extra_stubs=((("cv2", {})),))
    monkeypatch.setattr(ref, "openai",
                        types.SimpleNamespace(OpenAI=lambda api_key: client))
    judge = ref.GPT4oJudge()
    judge(question="Who wins?", target="The red team.",
          predicted_answer="red")
    assert captured["prompt"] == vep_judge_prompt("Who wins?",
                                                  "The red team.", "red")


def test_temporalbench_captioning_local_embedder(tmp_path, monkeypatch):
    """The captioning variant scores mean cosine x 100 through ANY local
    sentence-transformers-layout dir (round-3 VERDICT next-step #8) — built
    here as a tiny random Qwen2 AutoModel + tokenizer, driven through the
    production AutoModel/AutoTokenizer mean-pooling path.  Identical
    pred==GT pairs must score ~100; the no-embedder case raises the runbook
    error instead of silently scoring."""
    import numpy as np
    import pytest
    import torch
    import transformers

    from tspo_tpu.eval.extra_tasks import (
        _temporalbench_caption_process, make_temporalbench_caption_aggregate)
    from tspo_tpu.utils.mini_tokenizer import write_mini_qwen2_tokenizer

    emb_dir = tmp_path / "embedder"
    vocab = write_mini_qwen2_tokenizer(str(emb_dir))
    torch.manual_seed(0)
    transformers.Qwen2Model(transformers.Qwen2Config(
        vocab_size=vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8)).save_pretrained(str(emb_dir))

    docs = [{"idx": i, "video_name": f"v{i}", "dataset": "d",
             "GT": f"the man walks away slowly {i}"} for i in range(3)]
    same = [_temporalbench_caption_process(d, d["GT"]) for d in docs]
    agg = make_temporalbench_caption_aggregate(str(emb_dir))
    assert agg(same)["similarity"] == pytest.approx(100.0, abs=1e-3)

    diff = [_temporalbench_caption_process(d, "a completely different scene "
                                              "with trains") for d in docs]
    assert agg(diff)["similarity"] < agg(same)["similarity"]

    monkeypatch.delenv("TSPO_EMBEDDER_PATH", raising=False)
    with pytest.raises(RuntimeError, match="Runbook"):
        make_temporalbench_caption_aggregate(None)(same)
