"""MEGA-Bench scoring engine: response parsers, field metrics, aggregation.

Reimplements the reference's per-task metric machinery
(lmms-eval/lmms_eval/tasks/megabench/evaluator.py + metrics/) as one
table-driven module: every MEGA-Bench task carries a ``metric_info`` config
naming a response parser (``response_parse_function``), one metric per
answer field (``field_score_function``), and an aggregator
(``aggregation``); `score_task` replays the reference evaluator's exact
accounting (evaluator.py:92-248) over a list of (response, correct_answer,
eval_context) records.

The reference spreads ~50 metric classes over one-file-per-class
(metrics/scoring/*.py); here each is a plain function in METRICS, with the
same names and the same edge-case semantics (wrong-type -> 0, metric
exceptions -> 0 per metric_type.py:180-185, ``-1`` = field excluded from
aggregation).  Parity is pinned by tests/test_megabench.py, which imports
the reference's own classes and fuzzes both sides.

Environment-gated metrics (each raises a loud runbook error instead of
silently scoring, keyed in GATED_METRICS):
  - nli_entailment        needs microsoft/deberta-large-mnli; point
                          TSPO_NLI_MODEL_PATH at a local checkpoint dir
  - geo_proximity_location_dict  needs geopy + a live geocoding service
  - constrained_generation       needs the `pronouncing` CMU dict package
                                 and nltk wordnet/punkt corpora
  - program_judge         executes MODEL-GENERATED python; opt in with
                          TSPO_ALLOW_CODE_EXEC=1 (subprocess, wall-clock
                          limited, like the reference's CodeTester)
  - gpt_4o_as_judge / ascii_art_gpt4o_judge  route through a JudgeProvider
                          (eval/llm_judge.py) passed to score_task

Known approximation: near_str_match transliterates with unicodedata NFKD
(the `unidecode` package is absent from this image) — identical for
latin-1/accent folding, may differ on exotic scripts.
"""

from __future__ import annotations

import ast
import json
import math
import os
import re
import unicodedata
from numbers import Number

import numpy as np

# ---------------------------------------------------------------------------
# Response parsing (metrics/parsing/common/utils.py + parsers.py)
# ---------------------------------------------------------------------------


def evaluate_as_string(s):
    """Drop redundant python-literal string quotes (utils.py:137-152)."""
    try:
        v = ast.literal_eval(s)
        return v if isinstance(v, str) else s
    except (ValueError, SyntaxError):
        return s
    except MemoryError:
        return ""


def extract_code_block_content(response, code_type=None, is_ascii_art=False,
                               keep_surrounding_ws=False):
    """Return (content, found) for a ``` block (utils.py:5-37)."""
    if code_type:
        pattern = rf"```{code_type}\s*\n*(.*?)\s*```"
    elif is_ascii_art:
        if not response.strip() or len(response) > 10000:
            response = response.rstrip()
        if keep_surrounding_ws:
            pattern = r"```\w*(?:\s*\n+)?(.*?)(?:\n+\s*)?```"
        else:
            pattern = r"```\w*(?:\s*\n+)?(.*?)\s*```"
    else:
        pattern = r"```\w*\s*\n*(.*?)\s*```"
    m = re.search(pattern, response, flags=re.DOTALL)
    if not m:
        return response, False
    return (m.group(1) if is_ascii_art else m.group(1).strip()), True


def _keep_last_answer(s: str) -> str:
    s = s.replace("answer:", "Answer:")
    last = s.rfind("Answer:")
    if last == -1:
        return s
    return s[:last].replace("Answer:", "") + s[last:]


def extract_answer_content(response, is_ascii_art=False,
                           keep_surrounding_ws=False):
    """Pull the text after the LAST 'Answer:' marker (utils.py:63-89)."""
    response = _keep_last_answer(response)
    if is_ascii_art:
        m = re.search(r"\*\*?Answer:(.*?)\*\*?|\bAnswer:(.*)", response,
                      re.DOTALL)
    else:
        m = re.search(r"\*\*?Answer:\s*(.*?)\*\*?|\bAnswer:\s*(.*)", response,
                      re.DOTALL)
    if m:
        response = m.group(1) or m.group(2) or ""
    if is_ascii_art:
        response = re.sub(r"^\s*$(\n^\s*$)+", "", response, flags=re.MULTILINE)
        if keep_surrounding_ws:
            response = re.sub(r"(\n\s*)+$", "", response)
        else:
            response = response.rstrip()
        response = re.sub(r"^(\s*\n)+", "", response)
    else:
        response = response.strip()
    return response


def _is_multiline_answer(text: str) -> bool:
    lines = text.splitlines()
    for i, line in enumerate(lines):
        if line.strip() != "":
            if i + 1 < len(lines) and lines[i + 1].strip() == "":
                return False
            return True
    return False


def drop_additional_text(result: str) -> str:
    """Keep only the first paragraph for single-line MC-shaped answers
    (utils.py:104-117)."""
    first = result.split("\n\n")[0].strip()
    looks_short = re.search(
        r"^(?:(?:[a-zA-Z0-9_-]+)(?:,\s*[a-zA-Z0-9_-]+)*|(?:[a-zA-Z0-9_-]+)\."
        r"|\((?:[a-zA-Z0-9_-]+)\)$)", first)
    if looks_short and first != "" and not _is_multiline_answer(result):
        return first
    return result


def _extract_answer_at_line_start(response: str) -> str:
    m = re.search(r"^(?:\*\*Answer:|Answer:)\s*(.+)", response, re.MULTILINE)
    return m.group(1).strip() if m else response.strip()


_JSON_TIMEOUT = 0.1


def parse_json(response: str):
    """Best-effort JSON/py-literal extraction incl. nested JSON strings
    (parsers.py:13-95).  Uses the `regex` module's recursive pattern."""
    import regex

    response_ = _extract_answer_at_line_start(response)
    response_, _ = extract_code_block_content(response_, "json")
    json_pattern = r"(\{(?:[^{}]|(?R))*\}|\[(?:[^{}]|(?R))*\])"
    string_pattern = r'"(?:\\.|[^"\\])*"'
    try:
        candidates = regex.findall(json_pattern, response_,
                                   timeout=_JSON_TIMEOUT)
    except TimeoutError:
        return [] if response_.startswith("[") else {}

    valid = []
    for cand in candidates:
        cand = cand.replace('\\"', "__DQ__").replace("\\'", "__SQ__")
        for s in regex.findall(string_pattern, cand):
            unescaped = s[1:-1].replace("__DQ__", '"').replace("__SQ__", "'")
            try:
                inner = json.loads(unescaped)
                if isinstance(inner, (dict, list)):
                    cand = cand.replace(s, json.dumps(inner))
            except json.JSONDecodeError:
                pass
        cand = cand.replace("__DQ__", '\\"').replace("__SQ__", "\\'")
        try:
            valid.append(json.loads(cand))
        except json.JSONDecodeError:
            requoted = re.sub(r"(?<!\w)\'|\'(?!\w)", '"', cand)
            try:
                valid.append(json.loads(requoted))
            except json.JSONDecodeError:
                pass
        try:
            valid.append(ast.literal_eval(cand))
            continue
        except (SyntaxError, ValueError):
            pass
        cand2 = cand.replace('\\"', '\\\\"').replace("\\'", "\\\\'")
        try:
            valid.append(ast.literal_eval(cand2))
        except (SyntaxError, ValueError):
            pass
    if valid:
        return valid[-1]
    return [] if response_.startswith("[") else {}


def _parse_answer_str(response, *, is_ascii_art=False,
                      keep_surrounding_ws=False, is_single_line_ans=None):
    """Single-answer-field parse (answer_str_parse.py:17-66)."""
    if response is None:
        response = ""
    content = extract_answer_content(response, is_ascii_art=is_ascii_art,
                                     keep_surrounding_ws=keep_surrounding_ws)
    content, is_code = extract_code_block_content(
        content, is_ascii_art=is_ascii_art,
        keep_surrounding_ws=keep_surrounding_ws)
    if not is_code and is_single_line_ans and not is_ascii_art:
        content = drop_additional_text(content)
    if content.startswith("{") or content.startswith("["):
        obj = parse_json(content)
        if obj == {}:
            if "{}" not in content:
                return content
        elif obj == []:
            if "[]" not in content:
                return content
        return str(obj)
    return evaluate_as_string(content)


def _parse_json_fields(response: str):
    obj = parse_json(response)
    if isinstance(obj, dict):
        for k, v in obj.items():
            obj[k] = evaluate_as_string(v)
    return obj


# parser name -> (is_single_field, fn).  Single-field parsers receive kwargs.
PARSERS = {
    "answer_string": (True, lambda r, **kw: _parse_answer_str(r, **kw)),
    "ascii_answer_string": (True, lambda r, **kw: _parse_answer_str(
        r, is_ascii_art=True, is_single_line_ans=kw.get("is_single_line_ans"))),
    "verbatim_answer_string": (True, lambda r, **kw: _parse_answer_str(
        r, is_ascii_art=True, keep_surrounding_ws=True,
        is_single_line_ans=kw.get("is_single_line_ans"))),
    "json": (False, lambda r, **kw: _parse_json_fields(r)),
    "dummy": (False, lambda r, **kw: r.strip()),
}


def parse_response(parser_name, response, answer_fields, correct_answer):
    """Evaluator._parse_response (evaluator.py:297-342): returns the field
    dict plus whether structural parsing succeeded."""
    name = (parser_name or "dummy").lower()
    single, fn = PARSERS.get(name, PARSERS["json"])
    if single:
        if len(answer_fields) != 1:
            raise ValueError("single-field parser needs exactly one field")
        key = answer_fields[0]
        parsed = fn(response, is_single_line_ans="\n"
                    not in str(correct_answer.get(key, "")))
        if not isinstance(parsed, str):
            parsed = str(parsed)
        return {key: parsed}, True
    obj = fn(response)
    if name == "json" and (not isinstance(obj, dict) or not obj):
        return {f: response for f in correct_answer}, False
    return obj, True


# ---------------------------------------------------------------------------
# Conversions (metrics/scoring/common/conversions.py)
# ---------------------------------------------------------------------------


def _freeze(obj):
    if isinstance(obj, dict):
        return frozenset((k, _freeze(v)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(x) for x in obj)
    if isinstance(obj, set):
        return frozenset(obj)
    return obj


def _str_to_iterable(ctor, s):
    if not isinstance(s, str):
        return ctor()
    s = s.strip(" ")
    if not s:
        return ctor()
    in_iterable = s[0] in "({["
    if in_iterable and not s.endswith({"(": ")", "{": "}", "[": "]"}[s[0]]):
        return ctor()
    try:
        v = ast.literal_eval(s)
        if v is None:
            return ""
        if isinstance(v, (int, float)):
            v = [v]
        return ctor(v)
    except (SyntaxError, ValueError):
        if in_iterable:
            s = s[1:-1]
        return ctor(x.strip() for x in s.split(","))
    except TypeError:
        return ctor()


def cast_to_set(obj) -> set:
    obj = _freeze(obj)
    if isinstance(obj, (frozenset, set, tuple)):
        return set(obj)
    return _str_to_iterable(set, obj)


def str_to_list(s) -> list:
    return _str_to_iterable(list, s)


def cast_to_dict(obj):
    if isinstance(obj, dict):
        return {k: cast_to_dict(v) for k, v in obj.items()}
    if isinstance(obj, str):
        attempt = parse_json(obj)
        return attempt if attempt else obj
    return obj


def str_to_bboxes(s) -> list:
    if not isinstance(s, str):
        return []
    try:
        boxes = ast.literal_eval(s)
    except (SyntaxError, ValueError):
        try:
            boxes = json.loads(s)
        except json.JSONDecodeError:
            return []
    if len(boxes) == 4 and isinstance(boxes[0], Number):
        boxes = [boxes]
    if not isinstance(boxes, (tuple, list)):
        return []
    return [b for b in boxes
            if isinstance(b, (tuple, list)) and len(b) == 4
            and all(isinstance(c, (int, float)) for c in b)]


def str_to_coords(s, dim=2) -> list:
    if not isinstance(s, str):
        return []
    try:
        coords = ast.literal_eval(s)
    except SyntaxError:
        try:
            coords = json.loads(s)
        except json.JSONDecodeError:
            return []
    return [c for c in coords
            if isinstance(c, (tuple, list)) and len(c) == dim
            and all(isinstance(x, (int, float)) for x in c)]


def parse_point_from_xml(s):
    if not isinstance(s, str):
        return None
    matches = re.findall(r"<point>(.*?)<\/point>", s)
    if len(matches) >= 2 or not matches:
        return None
    parts = matches[0].split(",")
    if len(parts) != 2:
        return None
    try:
        return tuple(float(p.strip()) for p in parts)
    except ValueError:
        return None


def parse_bboxes_from_xml(s) -> list:
    if not isinstance(s, str):
        return []
    out = []
    for m in re.findall(r"<box>(.*?)<\/box>", s):
        parts = m.split(",")
        if len(parts) != 4:
            continue
        try:
            out.append(tuple(float(p.strip()) for p in parts))
        except ValueError:
            continue
    return out


# ---------------------------------------------------------------------------
# Set/IoU helpers (metrics/scoring/common/metrics.py)
# ---------------------------------------------------------------------------


def _bbox_iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, x2 - x1) * max(0, y2 - y1)
    area = lambda q: (q[2] - q[0]) * (q[3] - q[1])  # noqa: E731
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0


def _best_iou_scores(pred, target):
    return [max((_bbox_iou(p, t) for t in target), default=0) for p in pred]


def _set_score(pred, target, denom_of):
    pred, target = set(pred), set(target)
    denom = denom_of(pred, target)
    if not denom:
        return 1
    return len(pred & target) / denom


def jaccard_index(pred, target):
    return _set_score(pred, target, lambda p, t: len(p | t))


def set_precision_score(pred, target):
    return _set_score(pred, target, lambda p, t: len(p))


# ---------------------------------------------------------------------------
# Field metrics.  Each takes (response, correct) unless listed in
# CONTEXT_METRICS (which take (response, eval_context)).
# ---------------------------------------------------------------------------


def _parse_single_letter(s: str) -> str:
    m = re.match(r"^\(?([A-Za-z])\)?(?:\s*\.\s*|\.)?(.*)", s)
    return m.group(1) if m else s


def exact_str_match(response, correct) -> int:
    if not isinstance(response, str):
        response = str(response)
    if not isinstance(correct, str):
        correct = str(correct)
    if len(correct) == 1 and correct.isalpha() and len(response) > 1:
        response = _parse_single_letter(response)
    return 1 if response == correct else 0


def code_result_exact_str_match(response, correct) -> int:
    correct, _ = extract_code_block_content(correct, is_ascii_art=True,
                                            keep_surrounding_ws=True)
    return exact_str_match(response, correct)


def exact_str_match_case_insensitive(response, correct) -> int:
    if not isinstance(response, str) and isinstance(correct, str):
        return 0
    return exact_str_match(response.lower(), correct.lower())


_STRIP_CHARS = (" ", "-", "\n", "\t", ".")


def _squash(s: str) -> str:
    for ch in _STRIP_CHARS:
        s = s.replace(ch, "")
    return s.lower()


def simple_str_match(response, correct) -> int:
    if not isinstance(response, str):
        response = str(response)
    return exact_str_match(_squash(response), _squash(correct))


def _ascii_fold(text: str) -> str:
    # stand-in for unidecode: NFKD-decompose and drop combining marks
    return unicodedata.normalize("NFKD", text).encode(
        "ascii", "ignore").decode("ascii")


def _drop_articles(text: str) -> str:
    return " ".join(t for t in text.split(" ")
                    if t.lower() not in {"the", "a"})


def near_str_match(response, correct, threshold=0.9) -> float:
    import rapidfuzz
    if not isinstance(response, str) or not isinstance(correct, str):
        return 0
    a = _ascii_fold(_drop_articles(response)).lower()
    b = _ascii_fold(_drop_articles(correct)).lower()
    return rapidfuzz.distance.DamerauLevenshtein.normalized_similarity(
        a, b, score_cutoff=threshold)


def norm_sim_damerau_levenshtein(response, correct) -> float:
    import rapidfuzz
    if not isinstance(response, str) and isinstance(correct, str):
        return 0
    return rapidfuzz.distance.DamerauLevenshtein.normalized_similarity(
        response, correct)


def number_rel_diff_ratio(response, correct) -> float:
    try:
        pred = response if isinstance(response, Number) \
            else ast.literal_eval(response)
        if not isinstance(pred, Number):
            return 0
        gt = ast.literal_eval(correct)
        return max(0, 1 - math.fabs((pred - gt) / gt))
    except (SyntaxError, ValueError):
        return 0


def positive_int_match(response, correct):
    try:
        pred = ast.literal_eval(response)
    except (SyntaxError, ValueError):
        return 0
    if not correct:
        return 0
    gt = ast.literal_eval(correct)
    assert isinstance(gt, int)
    if not isinstance(pred, int):
        return 0
    if gt <= 0 and pred <= 0:
        return -1
    return 1 if pred == gt else 0


def jaccard(response, correct) -> float:
    if response is None:
        return 0
    return jaccard_index(cast_to_set(response), cast_to_set(correct))


def jaccard_case_insensitive(response, correct) -> float:
    if response is None:
        return 0
    resp, tgt = cast_to_set(response), cast_to_set(correct)
    first = list(tgt)[0]
    if isinstance(first, str):
        new_resp = {x.lower() if isinstance(x, str) else str(x).lower()
                    for x in resp}
        new_tgt = {x.lower() for x in tgt}
    elif isinstance(first, tuple):
        new_resp, new_tgt = set(), set()
        try:
            for r in resp:
                new_resp.add(tuple(_squash(x).replace("_", "") for x in r))
        except Exception:  # noqa: BLE001 — wrong response dtype
            return 0
        for t in tgt:
            new_tgt.add(tuple(_squash(x).replace("_", "") for x in t))
    else:
        return 0
    return jaccard_index(new_resp, new_tgt)


def set_equality(response, correct) -> int:
    return 1 if cast_to_set(response) == cast_to_set(correct) else 0


def set_equality_case_insensitive(response, correct) -> int:
    try:
        resp = {t.upper() for t in cast_to_set(response)}
        tgt = {t.upper() for t in cast_to_set(correct)}
    except AttributeError:
        return 0
    return 1 if resp == tgt else 0


def str_set_equality_line_break(response, correct) -> int:
    correct = correct.replace("\\n", "\n") if "\\n" in correct else correct
    response = response.replace("\\n", "\n") if "\\n" in response else response
    resp = {x.lower() if isinstance(x, str) else x
            for x in set(response.split("\n"))}
    tgt = {x.lower() if isinstance(x, str) else x
           for x in set(correct.split("\n"))}
    return 1 if resp == tgt else 0


def str_set_equality_comma(response, correct) -> int:
    resp = {x.lower() if isinstance(x, str) else x
            for x in _str_to_iterable(set, response)}
    tgt = {x.lower() if isinstance(x, str) else x
           for x in _str_to_iterable(set, correct)}
    return 1 if resp == tgt else 0


def set_precision(response, correct) -> float:
    if response is None:
        return 0
    return set_precision_score(cast_to_set(response), cast_to_set(correct))


def dict_equality(response, correct):
    response, correct = cast_to_dict(response), cast_to_dict(correct)
    if not isinstance(response, dict):
        return 0
    return 1 if response == correct else 0


def dict_precision(response, correct):
    response, correct = cast_to_dict(response), cast_to_dict(correct)
    if not isinstance(response, dict) or len(response) == 0:
        return 0
    matched = sum(1 for k, v in response.items()
                  if k in correct and exact_str_match(v, correct[k]))
    return matched / len(response)


def dict_exact_str_match_agg_recall(response, correct) -> float:
    response, correct = cast_to_dict(response), cast_to_dict(correct)
    if not isinstance(response, dict):
        return 0
    scores = [exact_str_match(response.get(k), v) for k, v in correct.items()]
    return sum(scores) / len(scores)


def _dict_agg(response, correct, per_key) -> float:
    response, correct = cast_to_dict(response), cast_to_dict(correct)
    if not isinstance(response, dict):
        return 0
    keys = set(response) | set(correct)
    return sum(per_key(response.get(k, []), correct.get(k, []))
               for k in keys) / len(keys)


def dict_set_equality_agg_jaccard(response, correct) -> float:
    return _dict_agg(response, correct, set_equality)


def dict_jaccard_agg_jaccard(response, correct) -> float:
    return _dict_agg(response, correct, jaccard)


def dict_nbbox_iou_tuple_agg_jaccard(response, correct) -> float:
    return _dict_agg(response, correct, nbbox_iou_tuple)


def sequence_equality(response, correct) -> int:
    if not isinstance(response, str):
        response = str(response)
    return 1 if str_to_list(response) == str_to_list(correct) else 0


def sequence_equality_case_insensitive(response, correct) -> int:
    if not isinstance(response, str):
        response = str(response)
    resp = [x.lower() if isinstance(x, str) else str(x)
            for x in str_to_list(response)]
    tgt = [x.lower() for x in str_to_list(correct)]
    return 1 if resp == tgt else 0


def sequence_accuracy_case_insensitive(response, correct) -> float:
    resp, tgt = str_to_list(response), str_to_list(correct)
    if len(tgt) != len(resp):
        return 0
    ok = 0
    for r, t in zip(resp, tgt):
        if isinstance(t, str):
            ok += int(r.lower() == t.lower())
        elif isinstance(t, Number) and isinstance(r, Number):
            ok += int(r == t)
    return ok / len(tgt)


def longest_common_list_prefix_ratio(response, correct) -> float:
    resp, tgt = str_to_list(response), str_to_list(correct)
    n = next((i for i, (a, b) in enumerate(zip(resp, tgt)) if a != b),
             min(len(resp), len(tgt)))
    return n / len(tgt)


def chess_move_list_jaccard_index(response, correct) -> float:
    if response is None:
        return 0

    def moves(seq):
        return {m.removesuffix("!").removesuffix("#")
                for m in _str_to_iterable(set, seq)}
    return jaccard_index(moves(response), moves(correct))


def multi_ref_phrase(response, correct):
    refs = _str_to_iterable(list, correct.replace("，", ","))
    for ref in refs:
        if simple_str_match(response, ref if isinstance(ref, str)
                            else str(ref)):
            return 1
    return 0


def bleu(response, correct):
    import sacrebleu
    if isinstance(response, str) and isinstance(correct, str):
        resp, corr = [response], [correct]
    elif isinstance(response, (list, tuple)) \
            and isinstance(correct, (list, tuple)):
        resp, corr = tuple(response), tuple(correct)
    else:
        return 0
    return sacrebleu.corpus_bleu(corr, [resp]).score / 100


def gleu_cn(response, correct):
    import jieba
    from nltk.translate.gleu_score import sentence_gleu
    if not (isinstance(response, str) and isinstance(correct, str)):
        return 0
    ref = list(jieba.cut_for_search(response))
    hyp = list(jieba.cut_for_search(correct))
    return sentence_gleu([ref], hyp)


def nbbox_iou_tuple(response, correct) -> float:
    if not isinstance(response, (tuple, list)):
        response = str_to_bboxes(response)
    if not isinstance(correct, (tuple, list)):
        correct = str_to_bboxes(correct)
    try:
        scores = _best_iou_scores(response, correct)
    except Exception:  # noqa: BLE001 — malformed box payloads
        return 0
    if not scores:
        return 0
    return sum(scores) / len(scores)


def nbbox_iou_single(response, correct) -> float:
    correct = ast.literal_eval(correct)
    try:
        response = ast.literal_eval(response)
    except SyntaxError:
        return 0
    try:
        scores = _best_iou_scores([response], [correct])
        if not scores:
            return 0
    except Exception:  # noqa: BLE001
        return 0
    return sum(scores) / len(scores)


def nbbox_iou_sequence(response, correct) -> float:
    if not isinstance(response, (tuple, list)):
        response = str_to_bboxes(str(response) if not isinstance(response, str)
                                 else response)
    if not isinstance(correct, (tuple, list)):
        correct = str_to_bboxes(correct)
    if len(correct) != len(response):
        return 0
    return float(np.mean([_best_iou_scores([r], [t])
                          for r, t in zip(response, correct)]))


def xml_nbbox_iou_single(response, correct) -> float:
    if not isinstance(response, (tuple, list)):
        response = parse_bboxes_from_xml(response)
    if not isinstance(correct, (tuple, list)):
        correct = parse_bboxes_from_xml(correct)
    if len(response) == 0:
        return 0
    if isinstance(response[0], Number) and len(response) == 4:
        response = [response]
    scores = _best_iou_scores(response, correct)
    if not scores:
        return 0
    return sum(scores) / len(scores)


def _parse_norm_point(point):
    if not isinstance(point, (tuple, list)):
        point = parse_point_from_xml(point)
        if not point:
            raise ValueError("unparseable point")
    elif len(point) != 2:
        raise ValueError("not 2D")
    if not all(0 <= c <= 1 for c in point):
        raise ValueError("not normalized")
    return tuple(point)


def xml_norm_point_distance(response, correct) -> float:
    try:
        r, t = _parse_norm_point(response), _parse_norm_point(correct)
    except ValueError:
        return 0
    return max(0, 1 - math.dist(r, t))


def xml_norm_point_in_bbox(response, eval_context):
    """CONTEXT metric: (score, which-box-matched) like the reference's
    tuple return (xml_norm_point_in_bbox.py:13-31)."""
    matched = {b: False for b in eval_context["bounding_boxes"]}
    boxes = [str_to_bboxes(b)[0] for b in eval_context["bounding_boxes"]]
    assert boxes
    if not isinstance(response, (tuple, list)):
        response = parse_point_from_xml(response)
        if not response:
            return 0, matched
    elif len(response) != 2:
        return 0, matched
    x, y = response
    for (x0, y0, x1, y1) in boxes:
        if x0 <= x <= x1 and y0 <= y <= y1:
            matched[str((x0, y0, x1, y1))] = True
            return 1, matched
    return 0, matched


def normalized_rmse(response, correct):
    lo, hi = 0.0, 0.1
    try:
        mse = (ast.literal_eval(response) - ast.literal_eval(correct)) ** 2
        rmse = float(np.clip(np.sqrt(mse), lo, hi))
        return 1 - (rmse - lo) / (hi - lo)
    except Exception:  # noqa: BLE001 — format errors
        return 0


def angle_seq_float_rmse(response, correct) -> float:
    lo, hi = 0.0, 10.0
    resp, tgt = str_to_list(response), str_to_list(correct)
    if len(resp) != len(tgt):
        return 0
    try:
        rmse = np.sqrt((np.array(resp) - np.array(tgt)) ** 2).sum() / len(tgt)
    except Exception:  # noqa: BLE001
        return 0
    rmse = float(np.clip(rmse, lo, hi))
    out = 1 - (rmse - lo) / (hi - lo)
    return 0 if math.isnan(out) else out


def sequence_coords_similarity(response, correct, k=10) -> float:
    if not isinstance(response, (tuple, list)):
        response = str_to_coords(response, dim=2)
    if not isinstance(correct, (tuple, list)):
        correct = str_to_coords(correct, dim=2)
    try:
        pred = np.array(response)
    except ValueError:
        return 0
    gt = np.array(correct)
    if pred.shape != gt.shape:
        return 0
    d = np.linalg.norm(pred - gt, axis=1) / np.sqrt(2)
    return float(np.mean(np.exp(-k * d)))


# --- numerical matching (general_numerical_match.py, MAmmoTH lineage) ------

def _clean_units(s: str) -> str:
    s = s.replace("\\pi", "π")
    s = re.sub(r"(?<![\d}])\\?π", "3.14", s)
    s = re.sub(r"(\d)(\\?π)", r"\1*3.14", s)
    s = re.sub(r"\{(\\?π)\}", "3.14", s)
    s = re.sub(r"\*(\\?π)", "*3.14", s)
    for junk in ("%", "$", "¥", "°C", " C", "°"):
        s = s.replace(junk, "/100" if junk == "%" else "")
    return s


def _floatify(x):
    try:
        v = float(x)
        return round(v) if v.is_integer() else v
    except Exception:  # noqa: BLE001
        return None


def _safe_eval_number(expr: str, timeout=5):
    """Evaluate a numeric expression in a subprocess with a wall-clock cap
    (the reference uses multiprocessing for the same reason,
    general_numerical_match.py:24-52)."""
    import multiprocessing
    q = multiprocessing.Queue()

    def run(expression, out):
        try:
            out.put(eval(expression))  # noqa: S307 — numeric-only strings
        except Exception as e:  # noqa: BLE001
            out.put(e)

    p = multiprocessing.Process(target=run, args=(expr, q))
    p.start()
    p.join(timeout)
    if p.is_alive():
        p.terminate()
        p.join()
        return None
    try:
        return q.get_nowait()
    except Exception:  # noqa: BLE001
        return None


def _number_it(num):
    if isinstance(num, (int, float)):
        return num
    num = _clean_units(num)
    try:
        from sympy.parsing.latex import parse_latex
        num = str(parse_latex(num))
    except Exception:  # noqa: BLE001 — incl. missing antlr runtime
        pass
    v = _floatify(num)
    if v is not None:
        return v
    try:
        v = _safe_eval_number(num)
        if isinstance(v, (list, tuple)):
            return v
        return _floatify(v)
    except Exception:  # noqa: BLE001
        return None


def _within_eps(pred, gt):
    eps = abs(gt) * 0.01
    return gt - eps <= pred <= gt + eps


def _compare_numbers(p, gt):
    try:
        return False if math.isnan(p) else _within_eps(p, gt)
    except Exception:  # noqa: BLE001
        return False


def _compare_lists(pred, gt):
    if not isinstance(pred, list) or len(pred) != len(gt) \
            or any(not isinstance(x, (int, float)) for x in pred):
        return False
    return all(_compare_numbers(p, g)
               for p, g in zip(sorted(pred), sorted(gt)))


def _remove_math_brackets(s: str) -> str:
    inline = re.compile(r"\\\((.*?)\\\)")
    display = re.compile(r"\\\[(.*?)\\\]")
    if inline.search(s) or display.search(s):
        s = inline.sub(r"\1", s)
        s = display.sub(r"\1", s)
    return s


def _parse_assignment(s: str) -> str:
    m = re.search(r"(?:=|≈|\\approx)\s*(.+)", s)
    return m.group(1).strip() if m else s


def general_single_numerical_match(response, correct) -> float:
    if not isinstance(response, str):
        response = str(response)
    response = _parse_assignment(_remove_math_brackets(response))
    correct = _parse_assignment(_remove_math_brackets(correct))
    res, tgt = _number_it(response), _number_it(correct)
    if res is not None and tgt is not None:
        if isinstance(res, (list, tuple)) and isinstance(tgt, (list, tuple)):
            return float(_compare_lists(list(res), list(tgt)))
        return float(_compare_numbers(res, tgt))
    return simple_str_match(response, correct)


def boxed_single_numerical_match(response, correct) -> float:
    def unbox(text):
        m = re.search(r"\\boxed\{((?:[^\{\}]+|\{[^\{\}]*\})*)\}", text)
        return m.group(1) if m else text
    if not isinstance(response, str):
        response = str(response)
    return general_single_numerical_match(unbox(response), unbox(correct))


# --- LaTeX equality (latex_expr_equality.py) --------------------------------

_GREEK = {c: rf"\{n}" for c, n in zip(
    "αβγδεζηθικλμνξοπρστυφχψω",
    ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
     "xi omicron pi rho sigma tau upsilon phi chi psi omega").split())}
_GREEK.update({c.upper(): rf"\{n.capitalize()}" for c, n in
               [(k, v[1:]) for k, v in _GREEK.items()]})


def _normalize_latex(text: str) -> str:
    text = text.replace("\\bar", "\\overline")
    out = []
    for ch in text:
        if ch.isalpha():
            d = unicodedata.normalize("NFD", ch)
            if len(d) > 1 and d[1] == "\u0304":
                out.append(f"\\overline{{{d[0]}}}")
            else:
                out.append(ch)
        elif ch != "\u0304":
            out.append(ch)
        elif out:
            out[-1] = f"\\overline{{{out[-1]}}}"
    text = "".join(out)
    text = re.sub(r"\\overline\{([^}]*)\}_([^{}\\ ]*)",
                  r"\\overline{\1_\2}", text)
    text = re.sub(r"[α-ωΑ-Ω]", lambda m: _GREEK.get(m.group(), m.group())
                  + " ", text)
    text = re.sub(r"\\(begin|end)\{.*?\}(?:\[[^\[\]]*\])?", "", text)
    text = re.sub(r"\\\(|\\\)", "", text)
    text = re.sub(r"\\\[|\\\]", "", text)
    return text


def latex_expr_equality(response, correct) -> int:
    if not isinstance(response, str) or not isinstance(correct, str):
        return 0
    try:
        from sympy.parsing.latex import parse_latex
        r = parse_latex(_normalize_latex(response))
        t = parse_latex(_normalize_latex(correct))
        return 1 if r.equals(t) else 0
    except Exception:  # noqa: BLE001 — parse errors OR missing antlr
        return simple_str_match(response, correct)


def text_with_latex_expr_equality(response, correct) -> int:
    if not isinstance(response, str) or not isinstance(correct, str):
        return 0

    def split_tex(text):
        parts = re.split(r"(\$[^$]*\$)", text)
        tex = [p for p in parts if p.startswith("$") and p.endswith("$")]
        plain = [p.strip() for p in parts
                 if not (p.startswith("$") and p.endswith("$"))]
        return plain, tex

    def join_tex(exprs):
        return " ".join(e[1:-1].strip().replace(",", "") for e in exprs)

    t_plain, t_tex = split_tex(correct)
    r_plain, r_tex = split_tex(response)
    text_ok = simple_str_match("".join(r_plain).replace(",", ""),
                               "".join(t_plain).replace(",", ""))
    tex_ok = latex_expr_equality(join_tex(r_tex), join_tex(t_tex))
    return 1 if text_ok and tex_ok else 0


# --- Symbolic planning (symbolic_planning.py): validate a PDDL plan --------

_PARAM_LIST = re.compile(r"((?:\?\S+\s*)+)(?:-\s+([^\?$]+)\s*)?")
_PARAM_NAME = re.compile(r"\?([^\s\?\)]+)\s*")


def _pddl_params(s: str) -> dict:
    s = s.strip()
    assert s[0] == "(" and s[-1] == ")"
    out = {}
    for params, ptype in _PARAM_LIST.findall(s[1:-1]):
        for p in _PARAM_NAME.findall(params):
            t = ptype.strip()
            out[p] = (re.split(r"\s+", t[1:-1].strip())[1:]
                      if t.startswith("(") else t)
    return out


def _pddl_outer_inner(s, ender=")", inner_open="(", inner_close=")"):
    depth, start, inner = 0, 0, []
    for i, c in enumerate(s):
        if depth == 0 and c == ender:
            return s[: i + 1], inner, i + 1
        if c == inner_open:
            if depth == 0:
                start = i
            depth += 1
        elif c == inner_close:
            depth -= 1
            if depth == 0:
                inner.append(s[start: i + 1])
    return s, inner, len(s)


def _pddl_attrs(s, starter="(:"):
    """All (name -> inner clauses) blocks opened by ``starter``."""
    segs = s.split(starter)
    if len(segs) == 1:
        return [], {}
    if len(segs) == 2:
        outer, inner, _ = _pddl_outer_inner(segs[1])
        return [starter + outer], inner
    outers, named = [], {}
    while len(s.split(starter)) > 1:
        s = s.split(starter, 1)[1]
        name = re.split(r"\s+", s.strip())[0]
        outer, inner, end = _pddl_outer_inner(s)
        outers.append(starter + outer)
        named[name] = inner
        s = s[end:]
    return outers, named


def _strip_cnf_types(s: str) -> str:
    parts = s.split(" - ")
    if len(parts) == 1:
        return s
    for i in range(1, len(parts)):
        seg = parts[i].strip()
        if len(seg.split(")")[0].split()) == 1:
            parts[i] = ")" + seg.split(")", 1)[1]
        else:
            parts[i] = " " + seg.split(" ", 1)[1]
    return "".join(parts).strip()


def _split_cnf(s: str) -> set:
    assert s.startswith("(and")
    clauses, depth, start = set(), 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
            if depth == 2:
                start = i
        elif c == ")":
            depth -= 1
            if depth == 0:
                break
            if depth == 1:
                clauses.add(_strip_cnf_types(s[start: i + 1]))
    return clauses


def symbolic_planning_test(response, eval_context):
    """Simulate the candidate plan through the domain's action
    pre/post-conditions and check goal satisfaction."""
    domain_pddl = eval_context["domain_pddl"]
    _, actions = _pddl_attrs(domain_pddl, "(:action")
    names, params = [], {}
    conds = {}
    for name, attrs in actions.items():
        assert len(attrs) == 3
        names.append(name)
        params[name] = _pddl_params(attrs[0])
        act_str = domain_pddl.split(f"(:action {name}")[1]
        for tag, suffix in ((":precondition", "pre"), (":effect", "post")):
            cond = act_str.split(tag)[1].strip()
            got = (_split_cnf(cond) if cond.startswith("(and")
                   else {cond.split(")")[0].strip() + ")"})
            conds[f"{name}_{suffix}"] = sorted(
                got, key=lambda x: 0 if x.startswith("(not ") else 1)

    if isinstance(response, str):
        candidates = response.split("\n")
    elif isinstance(response, (tuple, list)):
        candidates = list(response)
    else:
        raise ValueError(f"unsupported response type {type(response)}")
    plan = [a.strip() for a in candidates if a.startswith("(")]
    try:
        task_pddl = eval_context["task_pddl"]
        state = _pddl_attrs(task_pddl, "(:init")[1]
        goal = _pddl_attrs(task_pddl, "(and")[1]
    except IndexError:
        return 0

    def bind(cond, mapping):
        for p, obj in mapping.items():
            cond = re.sub(r"\?{}(?=[^\w-])".format(p), obj, cond)
        return cond

    try:
        for step in plan:
            body = step[1:-1]
            a_name = body.split(" ")[0].strip()
            objs = body.split(" ")[1:]
            assert len(objs) == len(params[a_name])
            mapping = dict(zip(params[a_name], objs))
            for cond in conds[f"{a_name}_pre"]:
                cond = bind(cond, mapping)
                neg = cond.startswith("(not ")
                if (neg and cond in state) or (not neg and cond not in state):
                    return 0
            for cond in conds[f"{a_name}_post"]:
                cond = bind(cond, mapping)
                _, rev = _pddl_attrs(cond, "(not ")
                if rev:
                    assert len(rev) == 1
                    if rev[0] in state:
                        state.remove(rev[0])
                elif cond.strip() not in state:
                    state.append(cond)
        for g in goal:
            neg = g.startswith("(not ")
            if (neg and g in state) or (not neg and g not in state):
                return 0
    except (ValueError, AssertionError, KeyError):
        return 0
    return 1


# --- Program judge (program_judge.py): gated code execution ----------------

def program_judge(response, eval_context, timeout=None):
    """Run model-generated python against the task's stdin/stdout test
    cases.  EXECUTES UNTRUSTED CODE — hard-gated behind
    TSPO_ALLOW_CODE_EXEC=1; runs in a subprocess with a wall-clock cap
    (the reference caps at 2s of in-process exec, program_judge.py:30; a
    subprocess additionally pays interpreter startup, so the default cap is
    2s + a measured startup allowance, override with TSPO_CODE_EXEC_TIMEOUT)."""
    if os.environ.get("TSPO_ALLOW_CODE_EXEC") != "1":
        raise RuntimeError(
            "program_judge executes model-generated python. Runbook: review "
            "the sandboxing (subprocess + wall-clock cap, no network "
            "isolation!) and opt in with TSPO_ALLOW_CODE_EXEC=1, ideally "
            "inside a container.")
    import subprocess
    import sys
    if timeout is None:
        # 3x the measured startup: the one-time measurement can be taken on
        # an idle core and then raced by a loaded one
        timeout = float(os.environ.get("TSPO_CODE_EXEC_TIMEOUT", "0")) \
            or 2 + 3 * _interp_startup_s()
    cases = eval_context["test_case"]
    if isinstance(cases, dict):
        cases = [cases]
    passed = 0
    for case in cases:
        stdin = "\n".join(case["input"]) + "\n"
        try:
            p = subprocess.run([sys.executable, "-c", response],
                               input=stdin, capture_output=True, text=True,
                               timeout=timeout)
            out = p.stdout.rstrip()
        except subprocess.TimeoutExpired:
            out = "ERROR: timeout"
        passed += int(out == case["expected"].rstrip())
    return passed / len(cases) if cases else 0


_STARTUP_CACHE: list = []


def _interp_startup_s() -> float:
    """One-time measurement of bare `python -c pass` wall time (sandboxed
    CI hosts can take seconds), so the per-case cap stays 2s of USER code."""
    if not _STARTUP_CACHE:
        import subprocess
        import sys
        import time
        t0 = time.perf_counter()
        subprocess.run([sys.executable, "-c", "pass"], capture_output=True,
                       timeout=60)
        _STARTUP_CACHE.append(time.perf_counter() - t0)
    return _STARTUP_CACHE[0]


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

METRICS = {
    "exact_str_match": exact_str_match,
    "simple_str_match": simple_str_match,
    "code_result_exact_str_match": code_result_exact_str_match,
    "dict_exact_str_match_agg_recall": dict_exact_str_match_agg_recall,
    "exact_str_match_case_insensitive": exact_str_match_case_insensitive,
    "normalized_similarity_damerau_levenshtein": norm_sim_damerau_levenshtein,
    "near_str_match": near_str_match,
    "number_rel_diff_ratio": number_rel_diff_ratio,
    "set_equality": set_equality,
    "set_equality_case_insensitive": set_equality_case_insensitive,
    "dict_set_equality_agg_jaccard": dict_set_equality_agg_jaccard,
    "dict_precision": dict_precision,
    "jaccard_index": jaccard,
    "jaccard_index_case_insensitive": jaccard_case_insensitive,
    "dict_jaccard_agg_jaccard": dict_jaccard_agg_jaccard,
    "dict_equality": dict_equality,
    "set_precision": set_precision,
    "positive_int_match": positive_int_match,
    "chess_move_list_jaccard_index": chess_move_list_jaccard_index,
    "longest_common_list_prefix_ratio": longest_common_list_prefix_ratio,
    "bleu": bleu,
    "gleu_cn": gleu_cn,
    "xml_nbbox_iou_single": xml_nbbox_iou_single,
    "latex_expr_equality": latex_expr_equality,
    "text_with_latex_expr_equality": text_with_latex_expr_equality,
    "nbbox_iou_tuple": nbbox_iou_tuple,
    "nbbox_iou_single": nbbox_iou_single,
    "nbbox_iou_sequence": nbbox_iou_sequence,
    "dict_nbbox_iou_tuple_agg_jaccard": dict_nbbox_iou_tuple_agg_jaccard,
    "xml_norm_point_distance": xml_norm_point_distance,
    "normalized_rmse": normalized_rmse,
    "str_set_equality_line_break": str_set_equality_line_break,
    "str_set_equality_comma": str_set_equality_comma,
    "sequence_equality": sequence_equality,
    "sequence_equality_case_insensitive": sequence_equality_case_insensitive,
    "sequence_accuracy_case_insensitive": sequence_accuracy_case_insensitive,
    "angle_seq_float_rmse": angle_seq_float_rmse,
    "multi_ref_phrase": multi_ref_phrase,
    "general_single_numerical_match": general_single_numerical_match,
    "boxed_single_numerical_match": boxed_single_numerical_match,
    "sequence_coords_similarity": sequence_coords_similarity,
}

# metrics whose second argument is eval_context, not the correct answer
CONTEXT_METRICS = {
    "symbolic_planning_test": symbolic_planning_test,
    "program_judge": program_judge,
    "xml_norm_point_in_bbox": xml_norm_point_in_bbox,
}

GATED_METRICS = {
    "nli_entailment": (
        "needs microsoft/deberta-large-mnli; download it and set "
        "TSPO_NLI_MODEL_PATH=<local dir> (transformers text-classification)"),
    "geo_proximity_location_dict": (
        "needs the geopy package and a LIVE geocoding service — "
        "fundamentally online, cannot run in a zero-egress build"),
    "constrained_generation": (
        "needs the `pronouncing` CMU-dict package and nltk wordnet/punkt "
        "corpora (python -m nltk.downloader wordnet punkt)"),
}


def nli_entailment(response, correct):
    """Entailment via a LOCAL deberta-mnli checkpoint (TSPO_NLI_MODEL_PATH).
    Mirrors nli_entailment.py:12-18 including its inverted guard quirk."""
    path = os.environ.get("TSPO_NLI_MODEL_PATH")
    if not path:
        raise RuntimeError("nli_entailment gated: "
                           + GATED_METRICS["nli_entailment"])
    from transformers import pipeline
    pipe = _NLI_CACHE.setdefault(path, pipeline("text-classification",
                                                model=path))
    if not isinstance(response, str) or isinstance(correct, str):
        # reference quirk: `or isinstance(correct, str)` SHOULD be `not
        # isinstance` — kept bug-for-bug so scores match
        return 0
    out = pipe(f"[CLS] {correct.strip()} [SEP] {response.strip()} [SEP]")
    return 1 if out[0]["label"] == "ENTAILMENT" else 0


_NLI_CACHE: dict = {}
METRICS["nli_entailment"] = nli_entailment


# ---------------------------------------------------------------------------
# VLM-as-judge routing (vlm_as_judge.py) via the framework's JudgeProvider
# ---------------------------------------------------------------------------

_SCORE_RE = re.compile(r"\*\*Score\*\*\s*:\s*(\d+)")
_EXPL_RE = re.compile(r"\*\*Score explanation\*\*\s*:\s*(.*)", re.DOTALL)


def build_judge_prompt(metric_config, response, correct_answer, query_text,
                       eval_context):
    """Fill eval_criteria_prompt from template_mapping
    (vlm_as_judge.py:105-127)."""
    mapping = {}
    for key, val in metric_config["template_mapping"].items():
        if val == "model_output":
            mapping[key] = response
        elif val == "example_question":
            mapping[key] = query_text
        elif val.split(".")[0] == "answers":
            mapping[key] = correct_answer[val.split(".")[1]]
        elif val.split(".")[0] == "eval_context":
            mapping[key] = eval_context[val.split(".")[1]]
    return metric_config["eval_criteria_prompt"].format(**mapping)


def parse_judge_score(text: str):
    """'**Score**: N' -> (N/10, info) (vlm_as_judge.py:191-209)."""
    m = _SCORE_RE.search(text)
    if m is None:
        return 0, f"Score is NULL: {text};"
    expl = _EXPL_RE.search(text)
    info = (f"Score: {m.group(1)}; Explanation: "
            f"{expl.group(1).strip() if expl else ''}")
    return int(m.group(1)) / 10.0, info


def vlm_judge_score(judge, metric_config, response, correct_answer,
                    query_text, eval_context):
    if judge is None:
        raise RuntimeError(
            "gpt_4o_as_judge gated: pass a JudgeProvider (eval/llm_judge.py) "
            "to score_task(..., judge=...) — the reference posts to the "
            "OpenAI API (vlm_as_judge.py:129-143)")
    prompt = build_judge_prompt(metric_config, response, correct_answer,
                                query_text, eval_context)
    result = judge._complete_with_retry(prompt)
    if not result.success:
        return 0, f"judge error: {result.error}"
    return parse_judge_score(result.content)


# ---------------------------------------------------------------------------
# Aggregation + the task-level evaluator (evaluator.py:92-248)
# ---------------------------------------------------------------------------


def aggregate_fields(name, scores: dict, weights: dict):
    valid = {f: s for f, s in scores.items() if s >= 0}
    if not valid:
        return -1
    if name == "mean":
        return float(np.average(list(valid.values()),
                                weights=[weights[f] for f in valid]))
    if name == "min":
        return min(valid.values())
    return -1


def _field_value(response_obj, field, default):
    """The reference's evaluator reads the parsed field with DIFFERENT
    defaults per metric family: ``.get(field)`` (None) for context metrics
    and the VLM judge (evaluator.py:269,277,281), ``.get(field, "")`` for
    standard metrics (:294); non-dict response objects pass through whole."""
    if isinstance(response_obj, dict):
        return response_obj.get(field, default)
    return response_obj


def _run_metric(name, metric_config, judge, response_obj, correct_answer,
                field, eval_context, query_text, is_aux=False):
    """One field score, with the reference's exception->0 wrapping
    (metric_type.py:180-185).  Returns (score, info_or_None)."""
    if name in ("gpt_4o_as_judge", "ascii_art_gpt4o_judge"):
        score, info = vlm_judge_score(judge, metric_config,
                                      _field_value(response_obj, field, None),
                                      correct_answer, query_text,
                                      eval_context)
        return score, info
    if name in CONTEXT_METRICS:
        try:
            out = CONTEXT_METRICS[name](
                _field_value(response_obj, field, None), eval_context)
        except RuntimeError:
            raise   # gate errors stay loud
        except Exception:  # noqa: BLE001
            return 0, None
        if isinstance(out, tuple):
            return out[0], out[1]
        return out, None
    fn = METRICS.get(name)
    if fn is None:
        if name in GATED_METRICS:
            raise RuntimeError(f"{name} gated: {GATED_METRICS[name]}")
        return 0, f"unsupported metric: {name}"
    correct_val = correct_answer if is_aux \
        else correct_answer.get(field, "")
    correct_val = evaluate_as_string(correct_val)
    try:
        return fn(_field_value(response_obj, field, ""), correct_val), None
    except RuntimeError:
        raise
    except Exception:  # noqa: BLE001 — reference scores format errors as 0
        return 0, None


def score_task(records: list, metric_info: dict, judge=None) -> dict:
    """Score one task's responses.  ``records``: dicts with ``response``,
    ``correct_answer`` (field dict), ``eval_context``, ``query_text``.
    Returns {"task_score", "mean_task_score", "num_queries", "query_scores",
    "eval_type"} with the reference's exact accounting."""
    agg_cfg = metric_info.get("aggregation", {})
    agg_name = (agg_cfg.get("function") or "unsupported").lower()
    weights = agg_cfg.get("field_weights", {})
    field_fns = metric_info.get("field_score_function", {})
    aux_fns = metric_info.get("global_aux_metrics", {})
    parser_name = metric_info.get("response_parse_function", "dummy")
    judge_cfg = metric_info.get("gpt4o_eval_configs")
    has_judge_metric = any(
        m in ("gpt_4o_as_judge", "ascii_art_gpt4o_judge")
        for m in list(field_fns.values()) + list(aux_fns.values()))

    if not records:
        return {"task_score": 0.0, "mean_task_score": 0.0, "num_queries": 0,
                "query_scores": [], "eval_type": "rule"}
    first_correct = records[0]["correct_answer"]
    answer_fields = [f for f in first_correct if not f.startswith("##")]

    task_sum = 0.0
    query_scores = []
    for rec in records:
        correct = rec["correct_answer"]
        eval_context = rec.get("eval_context", {})
        query_text = rec.get("query_text", "")
        response_obj, _ = parse_response(parser_name, rec.get("response", ""),
                                         answer_fields, correct)
        scores, infos = {}, {}
        for fld, metric_name in field_fns.items():
            scores[fld], info = _run_metric(
                metric_name, judge_cfg, judge, response_obj, correct, fld,
                eval_context, query_text)
            if info is not None:
                infos[fld] = info
        for fld, metric_name in aux_fns.items():
            # aux metrics see the WHOLE response object under their own key
            # and the whole correct-answer dict (evaluator.py:175-190)
            scores[fld], info = _run_metric(
                metric_name, judge_cfg, judge, {fld: response_obj}, correct,
                fld, eval_context, query_text, is_aux=True)
            if info is not None:
                infos[fld] = info
        q = aggregate_fields(agg_name, scores, weights)
        query_scores.append({"field": scores, "info": infos, "query": q})
        if q >= 0:
            task_sum += q

    return {"task_score": task_sum,
            "mean_task_score": task_sum / len(records),
            "num_queries": len(records),
            "query_scores": query_scores,
            "eval_type": "llm" if has_judge_metric else "rule"}
