"""MEGA-Bench parity tests vs lmms-eval/lmms_eval/tasks/megabench/.

Three layers:
  1. metric parity — fuzz batteries through BOTH our METRICS functions and
     the reference's own scoring classes (imported from /root/reference via
     parent-package stubs: the real ``metrics/__init__.py`` imports
     nli_entailment, which builds a transformers download pipeline at import
     time, so it must be bypassed);
  2. parser parity — answer_string / json parse on adversarial responses;
  3. evaluator accounting — score_task's field aggregation / -1 exclusion /
     macro-micro summary checked against hand-computed values and the
     reference's MeanAggregation/MinAggregation.
"""

import importlib
import sys
import types

import pytest

from tspo_tpu.eval.megabench import (make_megabench_aggregate, media_type,
                                     megabench_doc_to_text,
                                     megabench_process, register_megabench)
from tspo_tpu.eval.megabench_metrics import (METRICS, aggregate_fields,
                                             parse_json, parse_judge_score,
                                             parse_response, score_task,
                                             symbolic_planning_test)
from tspo_tpu.eval.tasks import TASK_REGISTRY

MB = "/root/reference/lmms-eval/lmms_eval/tasks/megabench"


def _stub_pkg(name, path):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__path__ = [path]
        sys.modules[name] = mod


def ref_scoring(module_name):
    """Import a reference metrics.scoring.* module without running the real
    metrics/__init__.py (which needs a model download)."""
    _stub_pkg("metrics", f"{MB}/metrics")
    _stub_pkg("metrics.parsing", f"{MB}/metrics/parsing")
    _stub_pkg("metrics.parsing.common", f"{MB}/metrics/parsing/common")
    _stub_pkg("metrics.scoring", f"{MB}/metrics/scoring")
    _stub_pkg("metrics.scoring.common", f"{MB}/metrics/scoring/common")
    _stub_pkg("metrics.aggregation", f"{MB}/metrics/aggregation")
    return importlib.import_module(module_name)


# ---------------------------------------------------------------------------
# 1. metric parity
# ---------------------------------------------------------------------------

STR_CASES = [
    ("B", "B"), ("(B) something", "B"), ("b.", "B"), ("The answer", "B"),
    ("red-carpet", "red carpet"), ("Red Carpet.", "redcarpet"),
    ("  spaced out  ", "spacedout"), ("", ""), (3, "3"), ("3", "3"),
    ("yes\nno", "yes no"), ("Answer: C", "C"),
]

SET_CASES = [
    ("['a', 'b']", "['b', 'a']"), ("a, b", "['a','b']"),
    ("{'a', 'c'}", "['a','b']"), ("(1, 2, 3)", "[1,2,3]"),
    ("[]", "['a']"), ("not a set", "['not a set']"),
    ("['A','B']", "['a','b']"), ("", "['x']"), ("[1,2", "[1,2]"),
]

LIST_CASES = [
    ("[1, 2, 3]", "[1, 2, 3]"), ("[1, 2]", "[1, 2, 3]"),
    ("['a','b','c']", "['a','B','c']"), ("[3,2,1]", "[1,2,3]"),
    ("1, 2, 3", "[1,2,3]"), ("[]", "[1]"),
]

NUM_CASES = [
    ("3.14", "3.14"), ("3.15", "3.14"), ("42", "42.0"), ("nope", "42"),
    ("0.5", "1/2"), ("-7", "-7"), ("1e3", "1000"), ("[1,2]", "[1,2]"),
    ("100%", "1"), ("$42", "42"),
]

DICT_CASES = [
    ('{"a": "1", "b": "2"}', '{"a": "1", "b": "2"}'),
    ('{"a": "1"}', '{"a": "1", "b": "2"}'),
    ('{"a": "x", "b": "2"}', '{"a": "1", "b": "2"}'),
    ("not json", '{"a": "1"}'),
    ('{"a": ["x", "y"]}', '{"a": ["y", "x"]}'),
]

BBOX_CASES = [
    ("[[0.1, 0.1, 0.5, 0.5]]", "[[0.1, 0.1, 0.5, 0.5]]"),
    ("[[0.0, 0.0, 0.4, 0.4]]", "[[0.2, 0.2, 0.6, 0.6]]"),
    ("[0.1, 0.1, 0.5, 0.5]", "[[0.1, 0.1, 0.5, 0.5]]"),
    ("junk", "[[0.1, 0.1, 0.5, 0.5]]"),
    ("[[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]]",
     "[[0.1, 0.1, 0.5, 0.5]]"),
]


@pytest.mark.parametrize("name,ref_mod,ref_cls,cases", [
    ("exact_str_match", "metrics.scoring.exact_str_match", "ExactStrMatch",
     STR_CASES),
    ("simple_str_match", "metrics.scoring.simple_str_match",
     "SimpleStrMatch", STR_CASES),
    ("exact_str_match_case_insensitive",
     "metrics.scoring.exact_str_match_case_insensitive",
     "ExactStrMatchCaseInsensitive", [(str(a), str(b))
                                      for a, b in STR_CASES]),
    ("normalized_similarity_damerau_levenshtein",
     "metrics.scoring.normalized_similarity_damerau_levenshtein",
     "NormalizedSimilarityDamerauLevenshtein",
     [(str(a), str(b)) for a, b in STR_CASES]),
    ("set_equality", "metrics.scoring.set_equality", "SetEquality",
     SET_CASES),
    ("set_equality_case_insensitive", "metrics.scoring.set_equality",
     "SetEqualityCaseInsensitive", SET_CASES),
    ("str_set_equality_comma", "metrics.scoring.set_equality",
     "StringSetEqualityCommaSplit", [("a, b", "b, a"), ("None", "none"),
                                     ("a;b", "a;b"), ("", "x")]),
    ("str_set_equality_line_break", "metrics.scoring.set_equality",
     "StringSetEqualityLineSplit", [("a\nb", "B\na"), ("a\\nb", "a\nb"),
                                    ("one", "one\ntwo")]),
    ("jaccard_index", "metrics.scoring.jaccard", "Jaccard", SET_CASES),
    ("jaccard_index_case_insensitive", "metrics.scoring.jaccard",
     "JaccardCaseInsensitive", SET_CASES),
    ("set_precision", "metrics.scoring.set_precision", "SetPrecision",
     SET_CASES),
    ("dict_equality", "metrics.scoring.dict_equality", "DictEquality",
     DICT_CASES),
    ("dict_precision", "metrics.scoring.dict_equality", "DictPrecision",
     DICT_CASES),
    ("dict_exact_str_match_agg_recall",
     "metrics.scoring.dict_exact_match_agg_recall",
     "DictExactStrMatchAggRecall", DICT_CASES),
    ("dict_set_equality_agg_jaccard",
     "metrics.scoring.dict_set_equality_agg_jaccard",
     "DictSetEqualityAggJaccard",
     [('{"a": ["1","2"]}', '{"a": ["2","1"]}'),
      ('{"a": ["1"]}', '{"b": ["1"]}'), ("x", '{"a": ["1"]}')]),
    ("dict_jaccard_agg_jaccard", "metrics.scoring.dict_jaccard_agg_jaccard",
     "DictJaccardAggJaccard",
     [('{"a": ["1","2"]}', '{"a": ["2","3"]}'),
      ('{"a": ["1"]}', '{"b": ["1"]}')]),
    ("sequence_equality", "metrics.scoring.sequence_equality",
     "SequenceEquality", LIST_CASES),
    ("sequence_equality_case_insensitive",
     "metrics.scoring.sequence_equality", "SequenceEqualityCaseInsensitive",
     LIST_CASES),
    ("sequence_accuracy_case_insensitive",
     "metrics.scoring.sequence_equality", "SequenceAccuracyCaseInsensitive",
     LIST_CASES),
    ("longest_common_list_prefix_ratio",
     "metrics.scoring.longest_common_list_prefix_ratio",
     "LongestCommonListPrefixRatio", LIST_CASES),
    ("number_rel_diff_ratio", "metrics.scoring.number_rel_diff_ratio",
     "NumberRelDiffRatio", NUM_CASES[:8]),
    ("positive_int_match", "metrics.scoring.positive_int_match",
     "PositiveIntMatch", [("3", "3"), ("4", "3"), ("x", "3"), ("-1", "-2"),
                          ("0", "0"), ("3.5", "3")]),
    ("chess_move_list_jaccard_index", "metrics.scoring.chess_jaccard",
     "ChessMoveJaccard", [("['e4', 'Nf3!']", "['e4', 'Nf3']"),
                          ("['Qh5#']", "['Qh5']"), ("e4, d4", "['e4']")]),
    ("multi_ref_phrase", "metrics.scoring.multi_ref_phrase",
     "MultipleReferencePhraseEval",
     [("red", "['red', 'crimson']"), ("blue", "['red'，'blue']"),
      ("x", "['y']")]),
    ("nbbox_iou_tuple", "metrics.scoring.nbbox_iou", "NbboxIouTuple",
     BBOX_CASES),
    ("nbbox_iou_sequence", "metrics.scoring.nbbox_iou", "NbboxIouSequence",
     BBOX_CASES),
    ("xml_nbbox_iou_single", "metrics.scoring.xml_nbbox_iou",
     "XmlNbboxIouSingle",
     [("<box>0.1, 0.1, 0.5, 0.5</box>", "<box>0.1, 0.1, 0.5, 0.5</box>"),
      ("<box>0, 0, 1, 1</box>", "<box>0.5, 0.5, 1, 1</box>"),
      ("no box", "<box>0.1, 0.1, 0.5, 0.5</box>")]),
    ("xml_norm_point_distance", "metrics.scoring.xml_norm_point_distance",
     "XmlNormPointDistance",
     [("<point>0.5, 0.5</point>", "<point>0.5, 0.5</point>"),
      ("<point>0.1, 0.1</point>", "<point>0.9, 0.9</point>"),
      ("<point>2, 2</point>", "<point>0.5, 0.5</point>"),
      ("junk", "<point>0.5, 0.5</point>")]),
    ("normalized_rmse", "metrics.scoring.mse", "NormalizedRMSE",
     [("0.5", "0.52"), ("0.5", "0.9"), ("x", "0.5")]),
    ("angle_seq_float_rmse", "metrics.scoring.mse", "AngleSeqFloatRMSE",
     [("[10.0, 20.0]", "[12.0, 18.0]"), ("[10.0]", "[12.0, 18.0]"),
      ("[100.0, 200.0]", "[1.0, 2.0]")]),
    ("sequence_coords_similarity",
     "metrics.scoring.coordinate_sequence_match", "CoordsSequenceSimilarity",
     [("[[0.5, 0.5], [0.2, 0.2]]", "[[0.5, 0.5], [0.2, 0.2]]"),
      ("[[0.1, 0.1]]", "[[0.9, 0.9]]"),
      ("[[0.1, 0.1]]", "[[0.9, 0.9], [0.1, 0.1]]")]),
    ("general_single_numerical_match",
     "metrics.scoring.general_numerical_match", "GeneralSingleNumericalMatch",
     NUM_CASES),
    ("boxed_single_numerical_match",
     "metrics.scoring.general_numerical_match", "BoxedSingleNumericalMatch",
     [(r"so \boxed{42}", "42"), (r"\boxed{3.14}", "3.15"), ("7", "7")]),
    ("bleu", "metrics.scoring.sacrebleu_bleu", "Bleu",
     [("the cat sat on the mat right here now", "the cat sat on the mat "
       "right here now"), ("a dog ran", "the cat sat"), (3, "x")]),
    ("gleu_cn", "metrics.scoring.gleu", "GLEUChinese",
     [("今天天气很好", "今天天气很好"), ("今天下雨", "今天天气很好"), (1, "x")]),
    ("code_result_exact_str_match", "metrics.scoring.exact_str_match",
     "CodeResultExactStrMatch",
     [("42", "```\n42\n```"), ("41", "```\n42\n```"), ("plain", "plain")]),
])
def test_metric_parity(name, ref_mod, ref_cls, cases):
    ref = getattr(ref_scoring(ref_mod), ref_cls)
    ours = METRICS[name]
    for response, correct in cases:
        try:
            want = ref.match(response, correct)
        except Exception:  # noqa: BLE001 — reference raise => we score 0
            want = 0

        def safe():
            try:
                return ours(response, correct)
            except Exception:  # noqa: BLE001
                return 0
        got = safe()
        assert got == pytest.approx(want, abs=1e-9), \
            (name, response, correct, got, want)


def test_near_str_match_behavior():
    """No reference parity (the unidecode package is absent from this
    image); pin OUR documented semantics instead: article-dropping + accent
    folding + 0.9-cutoff Damerau-Levenshtein."""
    near = METRICS["near_str_match"]
    assert near("the café", "cafe") == 1.0
    assert near("A red dog", "red dog") == 1.0
    assert near("completely different", "red dog") == 0
    assert near(3, "x") == 0


def test_latex_expr_equality_fallback():
    """antlr4 is absent: sympy's parse_latex raises ImportError, and our
    metric falls back to simple_str_match (the reference would crash —
    its except list omits ImportError, latex_expr_equality.py:38-44)."""
    latex = METRICS["latex_expr_equality"]
    assert latex(r"\frac{1}{2}", r"\frac{1}{2}") == 1
    assert latex(r"\frac{1}{2}", r"\frac{1}{3}") == 0
    assert METRICS["text_with_latex_expr_equality"](
        "area is $x^2$", "area is $x^2$") == 1


# ---------------------------------------------------------------------------
# symbolic planning (full PDDL simulation)
# ---------------------------------------------------------------------------

# two actions: single-action domains hit the reference's list-vs-dict crash
# (parse_pddl_attr_from_string returns a bare list for one match, and
# get_domain_action calls .items() on it) -> both sides score 0 via the
# exception->0 wrapper; real MEGA-Bench domains are multi-action.
DOMAIN = """(define (domain grid)
  (:action move
    :parameters (?f ?t - cell)
    :precondition (and (at ?f) (adj ?f ?t))
    :effect (and (not (at ?f)) (at ?t)))
  (:action jump
    :parameters (?f ?t - cell)
    :precondition (and (at ?f) (springy ?f))
    :effect (and (not (at ?f)) (at ?t)))
)"""

TASK = """(define (problem p1) (:domain grid)
  (:init (at a) (adj a b) (adj b c))
  (:goal (and (at c)))
)"""


@pytest.mark.parametrize("plan,want", [
    ("(move a b)\n(move b c)", 1),         # valid plan reaches goal
    ("(move a b)", 0),                     # goal not reached
    ("(move b c)", 0),                     # precondition not satisfied
    ("(move a b)\n(move a c)", 0),         # second move from wrong cell
    ("free text no parens", 0),            # no actions -> goal unmet
    ("(fly a c)", 0),                      # unknown action
])
def test_symbolic_planning_parity(plan, want):
    ctx = {"domain_pddl": DOMAIN, "task_pddl": TASK}
    ref = ref_scoring("metrics.scoring.symbolic_planning")
    assert symbolic_planning_test(plan, ctx) == want
    assert ref.SymbolicPlanningMetricTest.match(plan, ctx) == want


def test_program_judge_gated(monkeypatch):
    from tspo_tpu.eval.megabench_metrics import program_judge
    monkeypatch.delenv("TSPO_ALLOW_CODE_EXEC", raising=False)
    with pytest.raises(RuntimeError, match="TSPO_ALLOW_CODE_EXEC"):
        program_judge("print(1)", {"test_case": []})
    monkeypatch.setenv("TSPO_ALLOW_CODE_EXEC", "1")
    cases = {"test_case": [
        {"input": ["2", "3"], "expected": "5"},
        {"input": ["10", "1"], "expected": "11"},
        {"input": ["1", "1"], "expected": "3"},
    ]}
    code = "a = int(input()); b = int(input()); print(a + b)"
    # explicit generous cap: the correctness cases must never flake on a
    # loaded 1-core CI box (the default cap is for production workloads)
    assert program_judge(code, cases, timeout=60) == pytest.approx(2 / 3)
    assert program_judge("while True: pass", cases, timeout=3) == 0


# ---------------------------------------------------------------------------
# 2. parser parity
# ---------------------------------------------------------------------------

PARSE_CASES = [
    "The answer is clear.\n\nAnswer: B",
    "Answer: B. Paris is the capital",
    "**Answer: 42**",
    "answer: first\nSome text\nAnswer: final",
    'Answer: {"name": "x", "count": 2}',
    "Answer: ['a', 'b', 'c']",
    "```json\n{\"k\": \"v\"}\n```",
    "no marker at all",
    "Answer: 'quoted string'",
    "Answer:",
    "",
]


@pytest.mark.parametrize("response", PARSE_CASES)
@pytest.mark.parametrize("single_line", [True, False])
def test_answer_string_parse_parity(response, single_line):
    ref = ref_scoring("metrics.parsing.answer_str_parse")
    want = ref.AnswerStrParse.parse(
        response, "answer", is_single_line_ans=single_line)
    got, _ = parse_response("answer_string", response, ["answer"],
                            {"answer": "x" if single_line else "x\ny"})
    assert got == want, (response, got, want)


@pytest.mark.parametrize("response", [
    '{"a": 1, "b": "two"}',
    'Some text then {"a": {"nested": true}} trailing',
    "Answer: {'single': 'quotes'}",
    '[{"x": 1}, {"x": 2}]',
    "not json at all",
    '{"outer": "{\\"inner\\": 3}"}',
    "[1, 2, 3]",
])
def test_json_parse_parity(response):
    ref = ref_scoring("metrics.parsing.common.parsers")
    assert parse_json(response) == ref.parse_json(response)


# ---------------------------------------------------------------------------
# 3. evaluator accounting
# ---------------------------------------------------------------------------


def test_aggregate_fields_matches_reference():
    ref_mean = ref_scoring("metrics.aggregation.mean_agg").MeanAggregation
    ref_min = ref_scoring("metrics.aggregation.min_agg").MinAggregation
    scores = {"a": 1.0, "b": 0.5, "c": -1}
    weights = {"a": 2, "b": 1, "c": 5}
    assert aggregate_fields("mean", scores, weights) == pytest.approx(
        ref_mean.aggregate(scores, weights))
    assert aggregate_fields("min", scores, weights) == \
        ref_min.aggregate(scores, weights)
    assert aggregate_fields("mean", {"a": -1}, {"a": 1}) == -1
    assert aggregate_fields("unsupported", scores, weights) == -1


def _mk_doc(task, idx, answer, metric_info, query="Q?"):
    return {"task_name": task, "id": idx,
            "task_description": "Do the thing.",
            "example_text": "Example: ...", "query_text": query,
            "global_media": "[]", "example_media": "[]",
            "query_media": "['./data/videos/v.mp4']",
            "answer": str(answer), "eval_context": "{}",
            "metric_info": str(metric_info)}


MI_RULE = {"field_score_function": {"answer": "exact_str_match"},
           "aggregation": {"function": "mean",
                           "field_weights": {"answer": 1}},
           "response_parse_function": "answer_string"}


def test_score_task_end_to_end():
    docs = [_mk_doc("t1", i, {"answer": "B"}, MI_RULE) for i in range(4)]
    recs = [megabench_process(d, r) for d, r in
            zip(docs, ["Answer: B", "B", "Answer: C", "nonsense"])]
    out = score_task(recs, recs[0]["metric_info"])
    assert out["task_score"] == 2.0
    assert out["mean_task_score"] == 0.5
    assert out["eval_type"] == "rule"


def test_megabench_aggregate_macro_micro():
    """macro = mean of task means, micro = total query score / num queries
    (evaluator.py:225-241)."""
    d1 = [_mk_doc("t1", i, {"answer": "B"}, MI_RULE) for i in range(2)]
    d2 = [_mk_doc("t2", i, {"answer": "yes"}, MI_RULE) for i in range(4)]
    recs = ([megabench_process(d, r) for d, r in zip(d1, ["B", "B"])]
            + [megabench_process(d, r) for d, r in
               zip(d2, ["yes", "no", "no", "no"])])
    agg = make_megabench_aggregate()
    out = agg(recs)
    assert out["num_tasks"] == 2 and out["num_queries"] == 6
    assert out["macro_mean_score"] == pytest.approx((1.0 + 0.25) / 2)
    assert out["micro_mean_score"] == pytest.approx(3 / 6)
    assert out["per_task"] == {"t1": 1.0, "t2": 0.25}


def test_judge_metric_routes_through_provider():
    from tspo_tpu.eval.llm_judge import JudgeConfig, JudgeProvider

    class FakeJudge(JudgeProvider):
        def __init__(self):
            super().__init__(JudgeConfig())
            self.prompts = []

        def complete(self, messages):
            self.prompts.append(messages[-1]["content"])
            return "**Score explanation**: fine\n\n**Score**: 7"

    mi = {"field_score_function": {"answer": "gpt_4o_as_judge"},
          "aggregation": {"function": "mean",
                          "field_weights": {"answer": 1}},
          "response_parse_function": "dummy",
          "gpt4o_eval_configs": {
              "judge_model_type": "text only",
              "eval_criteria_prompt": "Q: {q}\nGold: {gold}\nPred: {pred}",
              "reference_type": "answer",
              "template_mapping": {"q": "example_question",
                                   "gold": "answers.answer",
                                   "pred": "model_output"}}}
    doc = _mk_doc("open1", 0, {"answer": "a red ball"}, mi, query="What?")
    rec = megabench_process(doc, "a crimson ball")
    judge = FakeJudge()
    out = score_task([rec], rec["metric_info"], judge=judge)
    assert out["mean_task_score"] == pytest.approx(0.7)
    assert out["eval_type"] == "llm"
    assert judge.prompts == ["Q: What?\nGold: a red ball\nPred: "
                             "a crimson ball"]
    # without a judge the metric is gated loudly
    with pytest.raises(RuntimeError, match="JudgeProvider"):
        score_task([rec], rec["metric_info"], judge=None)


def test_parse_judge_score():
    assert parse_judge_score("**Score**: 10")[0] == 1.0
    assert parse_judge_score("garbage")[0] == 0


def test_gated_metrics_raise(monkeypatch):
    monkeypatch.delenv("TSPO_NLI_MODEL_PATH", raising=False)
    with pytest.raises(RuntimeError, match="TSPO_NLI_MODEL_PATH"):
        METRICS["nli_entailment"]("a", "b")
    mi = {"field_score_function": {"answer": "constrained_generation"},
          "aggregation": {"function": "mean",
                          "field_weights": {"answer": 1}},
          "response_parse_function": "dummy"}
    rec = megabench_process(_mk_doc("t", 0, {"answer": "x"}, mi), "x")
    with pytest.raises(RuntimeError, match="gated"):
        score_task([rec], rec["metric_info"])


# ---------------------------------------------------------------------------
# task layer
# ---------------------------------------------------------------------------


def test_doc_to_text_and_media(tmp_path):
    doc = _mk_doc("t1", 0, {"answer": "B"}, MI_RULE)
    assert megabench_doc_to_text(doc) == "Do the thing.\nExample: ...\nQ?"
    assert media_type(doc) == "video"
    register_megabench()
    task = TASK_REGISTRY.pop("MEGABench-core")
    TASK_REGISTRY.pop("MEGABench-open")
    assert task.resolve_video(doc, "/root/x") == "/root/x/videos/v.mp4"
    mixed = dict(doc, global_media="['img.jpg']")
    assert media_type(mixed) == "mixed"


def test_submission_dump_roundtrip(tmp_path):
    import json
    d1 = [_mk_doc("t1", i, {"answer": "B"}, MI_RULE) for i in range(2)]
    recs = [megabench_process(d, r) for d, r in zip(d1, ["B", "C"])]
    path = str(tmp_path / "sub.json")
    make_megabench_aggregate(submission_path=path)(recs)
    dumped = json.load(open(path))
    assert len(dumped) == 1 and dumped[0]["task_name"] == "t1"
    assert [q["response"] for q in dumped[0]["query_response"]] == ["B", "C"]
    assert dumped[0]["query_response"][0]["correct_answer"] == {"answer": "B"}


# ---------------------------------------------------------------------------
# randomized differential fuzz (the repo's standard parity pattern, cf.
# tests/test_parser_fuzz.py): seeded random adversarial strings through BOTH
# implementations
# ---------------------------------------------------------------------------

_FUZZ_ATOMS = ["Answer:", "**Answer:", "answer:", "```", "```json", "{", "}",
               "[", "]", '"a"', "'b'", ",", ":", "1", "2.5", "-3", "B", "(C)",
               "\n", "\n\n", "word", "true", "null", "None", "\\n", "  ",
               "α", "<point>0.3, 0.4</point>", "<box>0,0,1,1</box>", "π"]


def _fuzz_strings(n, seed):
    import numpy as np
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        k = int(rng.integers(1, 14))
        out.append("".join(_FUZZ_ATOMS[int(i)]
                           for i in rng.integers(0, len(_FUZZ_ATOMS), k)))
    return out


def test_fuzz_answer_string_parse_vs_reference():
    ref = ref_scoring("metrics.parsing.answer_str_parse")
    for s in _fuzz_strings(300, seed=7):
        for single in (True, False):
            want = ref.AnswerStrParse.parse(s, "k", is_single_line_ans=single)
            got, _ = parse_response("answer_string", s, ["k"],
                                    {"k": "x" if single else "x\ny"})
            assert got == want, (s, single, got, want)


def test_fuzz_json_parse_vs_reference():
    ref = ref_scoring("metrics.parsing.common.parsers")
    for s in _fuzz_strings(300, seed=11):
        assert parse_json(s) == ref.parse_json(s), s


def test_fuzz_core_metrics_vs_reference():
    pairs = [(a, b) for a in _fuzz_strings(40, seed=13)
             for b in _fuzz_strings(2, seed=17)]
    targets = [
        ("exact_str_match", "metrics.scoring.exact_str_match",
         "ExactStrMatch"),
        ("simple_str_match", "metrics.scoring.simple_str_match",
         "SimpleStrMatch"),
        ("set_equality", "metrics.scoring.set_equality", "SetEquality"),
        ("jaccard_index", "metrics.scoring.jaccard", "Jaccard"),
        ("sequence_equality", "metrics.scoring.sequence_equality",
         "SequenceEquality"),
        ("general_single_numerical_match",
         "metrics.scoring.general_numerical_match",
         "GeneralSingleNumericalMatch"),
    ]
    for name, mod, cls in targets:
        ref = getattr(ref_scoring(mod), cls)
        ours = METRICS[name]
        for a, b in pairs:
            try:
                want = ref.match(a, b)
            except Exception:  # noqa: BLE001
                want = 0
            try:
                got = ours(a, b)
            except Exception:  # noqa: BLE001
                got = 0
            assert got == pytest.approx(want, abs=1e-9), (name, a, b)


def test_megabench_core_never_judges():
    """MEGABench-core is the rule-based subset: registering WITH a judge
    must not wire it into core's aggregate (review finding) — a core doc
    whose metric_info names a judge metric fails loudly instead of
    silently judge-scoring."""
    from tspo_tpu.eval.llm_judge import DummyJudgeProvider
    register_megabench(judge=DummyJudgeProvider())
    core = TASK_REGISTRY.pop("MEGABench-core")
    TASK_REGISTRY.pop("MEGABench-open")
    mi = {"field_score_function": {"answer": "gpt_4o_as_judge"},
          "aggregation": {"function": "mean",
                          "field_weights": {"answer": 1}},
          "response_parse_function": "dummy",
          "gpt4o_eval_configs": {"judge_model_type": "text only",
                                 "eval_criteria_prompt": "{pred}",
                                 "reference_type": "answer",
                                 "template_mapping":
                                     {"pred": "model_output"}}}
    rec = megabench_process(_mk_doc("t", 0, {"answer": "x"}, mi), "x")
    with pytest.raises(RuntimeError, match="JudgeProvider"):
        core.aggregate([rec])
