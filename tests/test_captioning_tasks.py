"""YouCook2 + CUVA: prompt/process parity vs the reference task functions and
hand-verified corpus BLEU/CIDEr math (pycocoevalcap is not installed here;
the scorer algorithms are validated against hand-computed closed forms).
"""

import importlib.util
import math
import os
import sys
import types

import pytest

from tspo_tpu.eval.captioning_tasks import (CUVA_QUESTIONS, aggregate_cuva,
                                            aggregate_youcook2,
                                            cuva_doc_to_text, cuva_process,
                                            remove_nonascii,
                                            youcook2_doc_to_text,
                                            youcook2_process)
from tspo_tpu.eval.tasks import get_task
from tspo_tpu.eval.text_metrics import bleu4, cider, corpus_bleu, rouge_l

REF_TASKS = "/root/reference/lmms-eval/lmms_eval/tasks"


def _load_ref(relpath: str):
    path = os.path.join(REF_TASKS, relpath)
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    stub_specs = {
        "loguru": {"logger": __import__("logging").getLogger("stub")},
        "requests": {}, "tqdm": {"tqdm": lambda x, **k: x},
        "bleurt_pytorch": {"BleurtConfig": object,
                           "BleurtForSequenceClassification": object,
                           "BleurtTokenizer": object},
        "pycocoevalcap": {}, "pycocoevalcap.eval":
            {"Bleu": object, "Cider": object, "COCOEvalCap": object,
             "Meteor": object, "Rouge": object, "Spice": object},
        "pycocoevalcap.tokenizer": {},
        "pycocoevalcap.tokenizer.ptbtokenizer": {"PTBTokenizer": object},
        "pycocotools": {}, "pycocotools.coco": {"COCO": object},
        "lmms_eval": {}, "lmms_eval.tasks": {},
        "lmms_eval.tasks._task_utils": {},
        "lmms_eval.tasks._task_utils.file_utils":
            {"generate_submission_file": lambda *a, **k: "/dev/null"},
        "lmms_eval.tasks._task_utils.video_loader":
            {"get_cache_dir": lambda cfg, name: "/tmp/" + name},
        "lmms_eval.filters": {}, "lmms_eval.filters.extraction":
            {"ExtendedRegexFilter": object},
    }
    mods = {}
    for name, attrs in stub_specs.items():
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            mods[name] = m
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_" + relpath.replace("/", "_").replace(".py", ""), path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for name in mods:
            sys.modules.pop(name, None)


# ---------------------------------------------------------------------------
# prompt/process parity
# ---------------------------------------------------------------------------

def test_youcook2_prompt_and_process_match_reference():
    ref = _load_ref("youcook2/utils.py")
    doc = {"youtube_id": "xYz12", "segment": [10.0, 35.5],
           "sentence": "add the pasta to the pot — stir",
           "video_path": "val/xYz12_10.mp4"}
    assert youcook2_doc_to_text(doc) == ref.youcook2_doc_to_text(doc)
    assert youcook2_doc_to_text(doc, {"prompt": "custom"}) == \
        ref.youcook2_doc_to_text(doc, {"prompt": "custom"})
    pred = "stir the pasta café"
    theirs = ref.youcook2_process_results(doc, [pred])["Bleu_4"]
    ours = youcook2_process(doc, pred)
    assert ours["answer"] == theirs["answer"]  # non-ascii filtered identically
    assert ours["pred"] == theirs["pred"]
    assert ours["video"] == theirs["video"]
    assert remove_nonascii("aéb") == ref.remove_nonascii("aéb")


def test_cuva_prompts_and_process_match_reference():
    ref = _load_ref("cuva/utils.py")
    for task in ("Description", "Cause", "Result"):
        doc = {"task": task, "answer": "gt", "video_name": "v.mp4"}
        assert cuva_doc_to_text(doc) == ref.cuva_doc_to_text(doc)
    doc = {"task": "Cause", "answer": "a fire started", "video_name": "v.mp4"}
    theirs = ref.cuva_process_results(doc, ["the fire"])["cuva_BLEU"]
    ours = cuva_process(doc, "the fire")
    assert (ours["pred"], ours["answer"], ours["task"]) == \
        (theirs["pred"], theirs["answer"], theirs["task"])


# ---------------------------------------------------------------------------
# scorer math (hand-computed closed forms; see eval/text_metrics.py docs)
# ---------------------------------------------------------------------------

def test_corpus_bleu_single_pair_equals_bleu4():
    r, h = "a man is cooking pasta", "a man cooks pasta"
    assert corpus_bleu([([r], h)])[3] == pytest.approx(bleu4(r, h))


def test_corpus_bleu_perfect_match_is_one():
    pairs = [(["the cat sat on the mat"], "the cat sat on the mat"),
             (["a dog barks loudly"], "a dog barks loudly")]
    for b in corpus_bleu(pairs):
        assert b == pytest.approx(1.0, abs=1e-6)


def test_corpus_bleu_multi_reference_clipping():
    # hyp unigrams: the(2), cat(1) ; max ref counts: the:2 (ref2), cat:1
    pairs = [((["the cat", "the the"]), "the the cat")]
    b1 = corpus_bleu([(["the cat", "the the"], "the the cat")], n=1)[0]
    assert b1 == pytest.approx(3 / 3, abs=1e-6)


def test_corpus_bleu_brevity_penalty():
    # hyp len 2, ref len 4 -> ratio .5, BP = exp(1-2) = e^-1
    [b1] = corpus_bleu([(["a b c d"], "a b")], n=1)
    assert b1 == pytest.approx(1.0 * math.exp(-1), rel=1e-6)


def test_cider_hand_cases():
    # identical 2-token captions, disjoint vocab across 2 pairs:
    # all df=1, weights log(2); k=0,1 cosine 1, k=2,3 empty -> 10*(2/4) = 5
    assert cider([(["a b"], "a b"), (["c d"], "c d")]) == pytest.approx(5.0)
    # single-pair corpus: ref_len = log(1) = 0 zeroes every weight
    assert cider([(["a b"], "a b")]) == pytest.approx(0.0)
    # shared unigram across ref sets -> df=2 kills that unigram's weight but
    # bigrams still differ; score stays 5.0 by the same cosine argument
    assert cider([(["a b"], "a b"), (["a d"], "a d")]) == pytest.approx(5.0)
    # disjoint captions score 0
    assert cider([(["a b"], "c d"), (["e f"], "g h")]) == pytest.approx(0.0)


def test_cider_length_penalty():
    # same unigrams, hyp has an extra token: delta enters the gaussian
    pairs = [(["a b"], "a b c"), (["d e"], "d e")]
    full = cider([(["a b"], "a b"), (["d e"], "d e")])
    assert cider(pairs) < full


# ---------------------------------------------------------------------------
# aggregates end-to-end
# ---------------------------------------------------------------------------

def test_youcook2_aggregate_two_videos():
    results = [
        youcook2_process({"youtube_id": "v1", "segment": [0, 1],
                          "sentence": "add oil to the pan"}, "add oil to the pan"),
        youcook2_process({"youtube_id": "v1", "segment": [1, 2],
                          "sentence": "chop the onions"}, "chop the onions"),
        youcook2_process({"youtube_id": "v2", "segment": [0, 1],
                          "sentence": "boil the noodles"}, "fry the rice"),
    ]
    agg = aggregate_youcook2(results)
    # true per-order: v1 perfect (both segments), v2 Bleu_1 = 1/3
    assert agg["Bleu_per_order"]["Bleu_1"] == \
        pytest.approx(100.0 * (1.0 + 1 / 3) / 2, rel=1e-4)
    # reference quirk: all four Bleu_N keys carry the grand mean of the
    # cumulative BLEU-1..4 list over videos (np.mean of the list-of-lists)
    assert agg["Bleu_1"] == agg["Bleu_2"] == agg["Bleu_3"] == agg["Bleu_4"]
    expected_quirk = sum(agg["Bleu_per_order"].values()) / 4
    assert agg["Bleu_1"] == pytest.approx(expected_quirk, rel=1e-9)
    assert agg["ROUGE_L"] > 50.0
    assert agg["overall"] == agg["CIDEr"]
    assert "gated" in agg["METEOR"]


def test_cuva_aggregate_task_means():
    results = [cuva_process({"task": "Description", "answer": "a b c d",
                             "video_name": "v"}, "a b c d"),
               cuva_process({"task": "Cause", "answer": "x y", "video_name":
                             "v"}, "totally different words here")]
    agg = aggregate_cuva(results)
    assert agg["BLEU"]["Description"] == pytest.approx(1.0, abs=1e-4)
    assert agg["BLEU"]["Result"] == 0  # no docs -> 0 like the reference
    assert agg["overall"] == pytest.approx(agg["BLEU"]["mean"])
    assert "gated" in agg["bleurt"]


def test_corpus_bleu_multiref_closest_reflen():
    # pycocoevalcap's Bleu wrapper always passes option="closest": hyp len 3
    # picks ref len 2 (closer than 6) -> ratio > 1, no brevity penalty
    [b1] = corpus_bleu([(["a b", "a b c d e f"], "a b c")], n=1)
    assert b1 == pytest.approx(1.0, abs=1e-6)  # all 3 unigrams covered, no BP


def test_cuva_upper_ext_fallback(tmp_path):
    (tmp_path / "v123.MP4").write_bytes(b"x")
    task = get_task("CUVA")
    assert task.resolve_video({"video_name": "v123.mp4"}, str(tmp_path)) == \
        str(tmp_path / "v123.MP4")
    # existing .mp4 wins
    (tmp_path / "v123.mp4").write_bytes(b"x")
    assert task.resolve_video({"video_name": "v123.mp4"}, str(tmp_path)) == \
        str(tmp_path / "v123.mp4")


def test_registry_and_make_table_strings():
    assert get_task("YouCook2").resolve_video(
        {"video_path": "val/x.mp4"}, "/r") == "/r/val/x.mp4"
    assert get_task("CUVA").resolve_video(
        {"video_name": "v.mp4"}, "/r") == "/r/v.mp4"
    from tspo_tpu.cli.evaluate import make_table
    t = make_table("CUVA", aggregate_cuva([]), 0)
    assert "overall" in t
    t2 = make_table("FunQA", {"overall": 1.0, "bleurt": "gated: x"}, 3)
    assert "gated: x" in t2
