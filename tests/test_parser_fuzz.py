"""Differential fuzzing of the answer parsers vs the actual reference code.

Each parser family runs a few hundred randomized responses (vocabulary
chosen to hit every branch: prefix strips, parenthesised letters, the
long-response bail, content fallback, random fallback) through OUR function
and the REFERENCE function extracted from the real task file.  Parsers with
a random no-match fallback are driven by identically-seeded RNGs on both
sides.  Fixed-case parity tests live next to each task module; this file is
the adversarial sweep that catches branch-order and prefix-list drift.
"""

import ast
import os
import random
import re

import numpy as np
import pytest

from tspo_tpu.eval.funqa import extract_last_number
from tspo_tpu.eval.more_tasks import egoschema_parse_choice, nextqa_parse_choice
from tspo_tpu.eval.tasks import (CONCAT_QUIRK_ANSWER_PREFIXES,
                                 extract_answer_letter,
                                 parse_multi_choice_response)
from tspo_tpu.eval.tomato_vinoground import tomato_parse_choice

REF_TASKS = "/root/reference/lmms-eval/lmms_eval/tasks"


def _ref_fn(relpath: str, name: str, rng=None):
    """Extract ONE reference function by AST (skips the heavy module tops:
    yaml template reads, loguru, lmms_eval imports).  ``rng`` replaces the
    module-level ``random`` so the no-match fallback is seedable."""
    path = os.path.join(REF_TASKS, relpath)
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(path).read())
    fns = [n for n in tree.body
           if isinstance(n, ast.FunctionDef) and n.name == name]
    assert fns, f"{name} not found in {relpath}"
    ns = {"re": re, "np": np, "numpy": np, "random": rng or random,
          "print": lambda *a, **k: None}
    exec(compile(ast.Module(fns, []), path, "exec"), ns)
    return ns[name]


def _responses(rng, vocab, n=500, maxlen=14):
    return [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, maxlen)))
            for _ in range(n)]


LETTER_VOCAB = [
    "A", "B", "C", "D", "E", "(A)", "(C)", "(E)", "A.", "C.", "b", "d",
    "Best answer:", "Best option:", "The best option is",
    "The correct option is", "The best answer is", "The answer is",
    "Either", "Elephant", "answer", "is", "maybe", "the", "scene", "shows",
    "a", "very", "long", "story", "about", "nothing", ",", ".", "?", "'",
]


def test_videomme_mlvu_letter_parse_fuzz():
    """Ours (quirk prefix list) vs videomme AND mlvu extract_characters_regex
    (the two reference copies are asserted identical first)."""
    ref_vmme = _ref_fn("videomme/utils.py", "extract_characters_regex")
    ref_mlvu = _ref_fn("mlvu/utils.py", "extract_characters_regex")
    rng = random.Random(11)
    for resp in _responses(rng, LETTER_VOCAB):
        theirs = ref_vmme(resp)
        assert ref_mlvu(resp) == theirs, repr(resp)
        ours = extract_answer_letter(resp, "ABCD",
                                     CONCAT_QUIRK_ANSWER_PREFIXES)
        assert ours == theirs, repr(resp)


def test_videomme_mlvu_task_process_path_fuzz():
    """The REGISTERED process fns must route through the quirk list too."""
    from tspo_tpu.eval.tasks import get_task
    ref = _ref_fn("videomme/utils.py", "extract_characters_regex")
    vmme, mlvu = get_task("VideoMME"), get_task("MLVU")
    rng = random.Random(12)
    for resp in _responses(rng, LETTER_VOCAB, n=300):
        doc = {"question_id": "q", "duration": "short", "task_type": "t",
               "answer": "A"}
        assert vmme.process_response(dict(doc), resp)["pred_answer"] == \
            ref(resp), repr(resp)
        assert mlvu.process_response(dict(doc), resp)["pred_answer"] == \
            ref(resp), repr(resp)


@pytest.mark.parametrize("n_choices", [4, 5])
def test_longvideobench_parse_fuzz(n_choices):
    """LVB parser: fixed [ABCDE] regex regardless of the doc's choice count
    (longvideobench/utils.py:218-222), separate 8-entry prefix list, random
    fallback — both sides driven by identically-seeded RNGs."""
    all_choices = [chr(ord("A") + i) for i in range(n_choices)]
    rng_ref = random.Random(21)
    rng_ours = random.Random(21)
    ref = _ref_fn("longvideobench/utils.py", "parse_multi_choice_response",
                  rng=rng_ref)
    rng = random.Random(22)
    for resp in _responses(rng, LETTER_VOCAB):
        theirs = ref(resp, all_choices, {})
        ours = parse_multi_choice_response(resp, all_choices, rng_ours)
        assert ours == theirs, repr(resp)


MMMU_VOCAB = [
    "A", "B", "C", "D", "E", "(A)", "(C)", "(E)", "A.", "C.", "E.",
    "piano", "violin", "the", "answer", "is", "maybe", "Drums", "guitar",
    "honestly", "not", "sure", "but", ",", ".", "!", "?", ";", ":", "'",
]
INDEX2ANS = {"A": "Piano", "B": "Violin", "C": "Drums", "D": "Guitar",
             "E": "Flute"}


def test_egoschema_parse_fuzz():
    rng_ref = random.Random(31)
    rng_ours = random.Random(31)
    ref = _ref_fn("egoschema/utils.py", "parse_multi_choice_response",
                  rng=rng_ref)
    rng = random.Random(32)
    for resp in _responses(rng, MMMU_VOCAB):
        theirs, _matched = ref(resp, list("ABCDE"), dict(INDEX2ANS))
        ours = egoschema_parse_choice(resp, list("ABCDE"), dict(INDEX2ANS),
                                      rng=rng_ours)
        assert ours == theirs, repr(resp)


def test_nextqa_parse_fuzz():
    rng_ref = random.Random(41)
    rng_ours = random.Random(41)
    ref = _ref_fn("nextqa/utils.py", "parse_multi_choice_response",
                  rng=rng_ref)
    rng = random.Random(42)
    for resp in _responses(rng, MMMU_VOCAB):
        theirs = ref(resp, list("ABCDE"), dict(INDEX2ANS))
        ours = nextqa_parse_choice(resp, list("ABCDE"), dict(INDEX2ANS),
                                   rng=rng_ours)
        assert ours == theirs, repr(resp)


def test_tomato_parse_fuzz():
    ref = _ref_fn("tomato/utils.py", "parse_multi_choice_response")
    rng = random.Random(51)
    for resp in _responses(rng, MMMU_VOCAB):
        theirs = ref(resp, list("ABCDE"), dict(INDEX2ANS))
        ours = tomato_parse_choice(resp, list("ABCDE"), dict(INDEX2ANS))
        assert ours == theirs, repr(resp)


def test_funqa_last_number_fuzz():
    ref = _ref_fn("funqa/utils.py", "extract_last_number")
    vocab = ["1", "42", "3.5", "0.", "100.25", "no", "number", "here",
             "v2", "7th", ".", "-", "3..4", "5.0.1", "10%"]
    rng = random.Random(61)
    for resp in _responses(rng, vocab, maxlen=8):
        theirs = ref(resp)
        ours = extract_last_number(resp)
        # reference returns None on miss (and prints); ours returns 0
        assert ours == (0 if theirs is None else theirs), repr(resp)


def test_video_tt_letter_parse_fuzz():
    """video-tt flavor: SEPARATE 8-entry prefix list + ABCDE (video-tt/
    utils.py:124-145) — the default prefix list, unlike videomme's quirk."""
    ref = _ref_fn("video-tt/utils.py", "extract_characters_regex")
    rng = random.Random(71)
    for resp in _responses(rng, LETTER_VOCAB):
        ours = extract_answer_letter(resp, "ABCDE")
        assert ours == ref(resp), repr(resp)


def test_videommmu_open_response_fuzz():
    """MMMU open-response parser (videommmu/utils.py:476-530): key-phrase
    subresponse split + number extraction + quote/string normalization."""
    import string as _string
    from tspo_tpu.eval.videommmu import parse_open_response
    path = os.path.join(REF_TASKS, "videommmu/utils.py")
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(path).read())
    want = {"extract_numbers", "check_is_number", "normalize_str",
            "parse_open_response"}
    fns = [n for n in tree.body
           if isinstance(n, ast.FunctionDef) and n.name in want]
    assert len(fns) == len(want)
    ns = {"re": re, "np": np, "random": random,
          "print": lambda *a, **k: None}
    exec(compile(ast.Module(fns, []), path, "exec"), ns)
    ref = ns["parse_open_response"]

    vocab = ["The", "answer", "is", "12.5", "so", "therefore", "3",
             "equals", "1,000", "-4.2", "'quoted'", "total", "area",
             "7%", "thus", "value is", "final", ".", "\n", "counted as",
             "Big", "it", "square", "units", "e.g", "A", "zero"]
    rng = random.Random(81)
    for resp in _responses(rng, vocab, n=400, maxlen=12):
        theirs = ref(resp)
        ours = parse_open_response(resp)
        assert sorted(map(str, ours)) == sorted(map(str, theirs)), repr(resp)


def _ref_fn_with_ast(relpath: str, name: str):
    """Like _ref_fn but with ``ast`` and an eval_logger stub in namespace
    (the judge-review parsers literal_eval dict strings and log failures)."""
    import ast as _ast_mod

    class _Log:
        def error(self, *a, **k):
            pass

    path = os.path.join(REF_TASKS, relpath)
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(path).read())
    fns = [n for n in tree.body
           if isinstance(n, ast.FunctionDef) and n.name == name]
    assert fns, f"{name} not found in {relpath}"
    ns = {"re": re, "np": np, "ast": _ast_mod, "random": random,
          "eval_logger": _Log(), "print": lambda *a, **k: None}
    exec(compile(ast.Module(fns, []), path, "exec"), ns)
    return ns[name]


def _review_strings(rng, n=400):
    """Randomized judge replies: well-formed dicts, broken dicts, prose with
    embedded dicts, non-dict literals — every parse branch."""
    preds = ["'yes'", "'no'", "'Yes definitely'", "'nope'", "'maybe'",
             "'correct'", "'incorrect'", "'A. cat'", "123"]
    scores = ["4", "'4'", "0", "4.7", "'high'", "-1", "None"]
    out = []
    for _ in range(n):
        kind = rng.randrange(6)
        p, s = rng.choice(preds), rng.choice(scores)
        if kind == 0:
            out.append(f"{{'pred': {p}, 'score': {s}}}")
        elif kind == 1:
            out.append(f"Sure! Here is the result: {{'pred': {p}, "
                       f"'score': {s}}} Hope that helps.")
        elif kind == 2:
            out.append(f"{{'score': {s}}}")
        elif kind == 3:
            out.append(f"{{'pred': {p}, 'score': {s}, 'reason': 'because "
                       "{nested} braces'}")
        elif kind == 4:
            out.append(rng.choice(["not a dict at all", "", "score: 3",
                                   "{broken", "}{", "3", "['yes', 2]"]))
        else:
            out.append(f"{{'pred': {p}, 'score': {s}")  # unclosed
    return out


def test_activitynet_review_parse_fuzz():
    from tspo_tpu.eval.tasks_activitynet import parse_review
    ref = _ref_fn_with_ast("activitynetqa/utils.py", "parse_score")
    rng = random.Random(91)
    for review in _review_strings(rng):
        assert parse_review(review) == ref(review), repr(review)


def test_videochatgpt_score_parse_fuzz():
    from tspo_tpu.eval.videochatgpt import parse_vcg_score
    ref = _ref_fn_with_ast("videochatgpt/utils.py", "parse_score")
    rng = random.Random(92)
    for review in _review_strings(rng):
        assert parse_vcg_score(review) == ref(review), repr(review)


def test_cvrr_review_parse_fuzz():
    from tspo_tpu.eval.worldqa_cvrr import parse_cvrr_review
    ref = _ref_fn_with_ast("cvrr/utils.py", "parse_score")
    rng = random.Random(93)
    for review in _review_strings(rng):
        assert parse_cvrr_review(review) == ref(review), repr(review)


def test_camerabench_extract_answer_fuzz():
    from tspo_tpu.eval.camerabench import extract_answer
    ref = _ref_fn_with_ast("camerabench_vqa/utils.py", "extract_answer")
    vocab = ["yes", "no", "Yes", "No.", "NO", "maybe", "the", "answer",
             "notably", "yesterday", "nothing", "A", "B", ",", "."]
    rng = random.Random(94)
    for resp in _responses(rng, vocab, maxlen=10):
        assert extract_answer(resp) == ref(resp), repr(resp)


def test_tempcompass_captioning_parse_fuzz():
    from tspo_tpu.eval.tempcompass import parse_captioning_reply
    ref = _ref_fn_with_ast("tempcompass/utils.py",
                           "parse_llm_output_for_captioning")
    pieces = ["Reasoning: the clip shows X", "Answer: A. a cat",
              "Answer: B. a dog", "Reasoning matters", "Answer",
              "A. a cat", "B. a dog jumping A. again", "", "some prose"]
    rng = random.Random(95)
    for _ in range(300):
        reply = "\n".join(rng.choice(pieces)
                          for _ in range(rng.randint(0, 4)))
        gt = rng.choice(["A. a cat", "B. a dog"])
        assert parse_captioning_reply(reply, gt) == ref(reply, gt), \
            repr((reply, gt))


def _ref_aggregate(relpath: str, name: str, consts=()):
    """AST-extract an aggregate function plus the module constants it uses."""

    class _Log:
        def info(self, *a, **k):
            pass

        def error(self, *a, **k):
            pass

    path = os.path.join(REF_TASKS, relpath)
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(path).read())
    nodes = [n for n in tree.body
             if (isinstance(n, ast.FunctionDef) and n.name == name)
             or (isinstance(n, ast.Assign) and any(
                 isinstance(t, ast.Name) and t.id in consts
                 for t in n.targets))]
    ns = {"re": re, "np": np, "eval_logger": _Log(),
          "print": lambda *a, **k: None}
    exec(compile(ast.Module(nodes, []), path, "exec"), ns)
    return ns[name]


def test_videomme_aggregate_fuzz():
    """Random result grids: our out['overall'] must equal the reference's
    returned micro-average (the per-bucket grids the reference only logs)."""
    from tspo_tpu.eval.tasks import aggregate_videomme
    ref = _ref_aggregate("videomme/utils.py", "videomme_aggregate_results",
                         consts=("VIDEO_TYPE", "CATEGORIES",
                                 "SUB_CATEGORIES", "TASK_CATEGORIES"))
    rng = random.Random(101)
    durations = ["short", "medium", "long"]
    cats = ["Knowledge", "Multilingual", "Life Record"]
    subs = ["Multilingual", "News Report", "Daily Life"]
    tasks = ["Temporal Perception", "Counting Problem", "OCR Problems"]
    for _ in range(50):
        results = [{"duration": rng.choice(durations),
                    "category": rng.choice(cats),
                    "sub_category": rng.choice(subs),
                    "task_category": rng.choice(tasks),
                    "task_type": "t", "question_id": str(i),
                    "pred_answer": rng.choice("ABCD"),
                    "answer": rng.choice("ABCD")}
                   for i in range(rng.randint(1, 40))]
        ours = aggregate_videomme([dict(r) for r in results])
        theirs = ref([dict(r) for r in results])
        assert ours["overall"] == pytest.approx(theirs)


def test_mlvu_aggregate_fuzz():
    from tspo_tpu.eval.tasks import MLVU_DEV_TASK_TYPES, aggregate_mlvu_dev
    ref = _ref_aggregate("mlvu/utils.py", "mlvu_aggregate_results_dev")
    rng = random.Random(102)
    for _ in range(50):
        results = [{"task_type": rng.choice(MLVU_DEV_TASK_TYPES),
                    "question_id": str(i),
                    "pred_answer": rng.choice("ABCD"),
                    "answer": rng.choice("ABCD")}
                   for i in range(rng.randint(1, 40))]
        ours = aggregate_mlvu_dev([dict(r) for r in results])
        theirs = ref([dict(r) for r in results])
        assert ours["overall"] == pytest.approx(theirs)


def test_mix_evals_judge_score_fuzz():
    """mix_evals get_score_from_judge ([[x]] then [x]); the reference's
    unparseable branch returns a RANDOM score (utils.py:98) where ours
    returns None for the caller to handle — compare parseable strings
    exactly and check the fallback's contract separately."""
    import random as _r
    from tspo_tpu.eval.mix_evals import parse_judge_score
    ref = _ref_fn_with_ast("mix_evals/video2text/utils.py",
                           "get_score_from_judge")
    vocab = ["Rating:", "[[4]]", "[[4.5]]", "[3]", "[0.5]", "[[bad]]",
             "good", "answer", "[[", "]]", "7", "[x]", "score"]
    rng = random.Random(103)
    for resp in _responses(rng, vocab, n=300, maxlen=8):
        ours = parse_judge_score(resp)
        theirs = ref(resp)
        if ours is None:
            assert 0.0 <= theirs <= 1.0   # reference random fallback
        else:
            assert ours == theirs, repr(resp)


def test_moviechat_and_vdd_review_parse_fuzz():
    """moviechat parse_score+parse_acc composition and
    video_detail_description's int-score parse vs our re-implementations."""
    from tspo_tpu.eval.more_judged_tasks import (parse_pred_score,
                                                 parse_score_only)
    ref_score = _ref_fn_with_ast("moviechat/utils.py", "parse_score")
    ref_acc = _ref_fn_with_ast("moviechat/utils.py", "parse_acc")
    ref_vdd = _ref_fn_with_ast("video_detail_description/utils.py",
                               "parse_score")
    rng = random.Random(104)
    for review in _review_strings(rng, n=300):
        ours = parse_pred_score(review)
        assert ours[1] == ref_score(review), repr(review)
        assert ours[0] == str(ref_acc(review)), repr(review)
        assert parse_score_only(review) == ref_vdd(review), repr(review)


def _ref_tempcompass(name, helpers=()):
    """Extract a tempcompass process fn + its rule helpers; the judge
    fallback (get_eval_result) is stubbed with a sentinel so rule-path vs
    fallback decisions are observable."""
    path = os.path.join(REF_TASKS, "tempcompass/utils.py")
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(path).read())
    want = set(helpers) | {name}
    fns = [n for n in tree.body
           if isinstance(n, ast.FunctionDef) and n.name in want]
    assert len(fns) == len(want)
    ns = {"re": re, "np": np, "random": random,
          "get_eval_result": lambda prompt: ("JUDGED", 7),
          "print": lambda *a, **k: None}
    exec(compile(ast.Module(fns, []), path, "exec"), ns)
    return ns[name]


def test_tempcompass_mc_rules_fuzz():
    from tspo_tpu.eval.tempcompass import mc_rule_rating
    ref = _ref_tempcompass("tempcompass_process_results_multi_choice")
    answer = "B. a dog"
    vocab = ["A", "B", "C", "D", "A.", "B.", "C)", "B)", "a", "dog",
             "B. a dog", "A. a cat", "the", "answer", "maybe", ".", "b"]
    rng = random.Random(111)
    for _ in range(300):
        pred = " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(0, 4))) or rng.choice(vocab)
        doc = {"video_id": "v", "question": "q?", "answer": answer,
               "dim": "order"}
        rec = ref(dict(doc), [pred])["avg_accuracy"]
        ours = mc_rule_rating(pred, answer)
        if rec["match_success"]:
            assert ours == rec["rating"], repr(pred)
        else:
            assert ours is None, repr(pred)   # our judge-fallback signal


def test_tempcompass_yes_no_rules_fuzz():
    from tspo_tpu.eval.tempcompass import extract_yes_no
    ref = _ref_tempcompass("tempcompass_process_results_yes_no",
                           helpers=("extract_pred",))
    vocab = ["yes", "no", "Yes", "No,", "maybe", "the", "answer", "is",
             "yes.", "no!", "Not", "yesterday", ""]
    rng = random.Random(112)
    for ans in ("yes", "no"):
        for _ in range(200):
            pred = " ".join(rng.choice(vocab)
                            for _ in range(rng.randint(0, 5)))
            doc = {"video_id": "v", "question": "q?", "answer": ans,
                   "dim": "speed"}
            rec = ref(dict(doc), [pred])["avg_accuracy"]
            got = extract_yes_no(pred)
            if rec["match_success"]:
                assert got, repr(pred)
                assert (got == ans) == (rec["rating"] == 1), repr(pred)
            else:
                assert not got, repr(pred)


def test_tempcompass_caption_matching_rules_fuzz():
    from tspo_tpu.eval.tempcompass import caption_matching_rule
    ref = _ref_tempcompass("tempcompass_process_results_caption_matching",
                           helpers=("eval_rule",))
    question = ("Which caption matches the video?\n"
                "Caption A: a cat sits\nCaption B: a dog runs")
    answer = "Caption B: a dog runs"
    vocab = ["Caption A", "Caption B", "A", "B", "a dog runs", "a cat sits",
             "the", "caption", "matches", ":", ".", "A:", "B:"]
    rng = random.Random(113)
    for _ in range(300):
        pred = " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(0, 5)))
        doc = {"video_id": "v", "question": question, "answer": answer,
               "dim": "order"}
        rec = ref(dict(doc), [pred])["avg_accuracy"]
        ours = caption_matching_rule(pred, question, answer)
        if rec["match_success"]:
            assert ours == rec["rating"], repr(pred)
        else:
            assert ours is None, repr(pred)


def test_charades_extract_time_fuzz():
    """Temporal-grounding time parse (charades_sta/eval_tvg.py:26-60):
    sentence split, keyword filter, float extraction, ordering fallback."""
    from tspo_tpu.eval.grounding_tasks import extract_time
    ref = _ref_fn("charades_sta/eval_tvg.py", "extract_time")
    vocab = ["The event", "starts", "ends", "at", "20.8", "30.0", "-", "to",
             "seconds", "happens in", "5", "0.5", "start time", "end time",
             "!", "?", "\n", "around", "clip", "from", "12.25", "then",
             "A specific example is : 20.8 - 30.0 seconds"]
    rng = random.Random(121)
    for _ in range(400):
        text = " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(0, 12)))
        ours = extract_time(text)
        theirs = ref(text)
        assert [list(map(float, p)) for p in ours] == \
            [list(map(float, p)) for p in theirs], repr(text)
