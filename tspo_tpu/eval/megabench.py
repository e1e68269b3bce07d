"""MEGA-Bench task layer: prompts, submission records, in-process scoring.

Rebuilds the reference's megabench integration
(lmms-eval/lmms_eval/tasks/megabench/utils.py + evaluator.py) for the video
slice of TIGER-Lab/MEGA-Bench.  The reference splits the flow in two: the
lmms-eval task dumps a submission json
(megabench_aggregate_results_for_submission, utils.py:105-125) and a
separate offline evaluator scores it against per-task ``metric_info``
configs (evaluator.py).  Here both live in one aggregate: records are
grouped by task, scored through eval/megabench_metrics.py::score_task (the
same parse -> per-field metric -> weighted aggregation accounting), and the
reference evaluator's summary (macro_mean_score over tasks,
micro_mean_score over queries, evaluator.py:225-241) is returned — plus the
submission-format dump for cross-checking with the reference's own
evaluator.

Doc schema (the HF dataset rows): ``task_name``, ``id``, ``task_description``
(a.k.a. global_description), ``example_text``, ``query_text``,
``global_media`` / ``example_media`` / ``query_media`` (stringified path
lists), ``answer`` (stringified field dict), ``eval_context`` and
``metric_info`` (stringified dicts).

Scope: video and single-video-media tasks score end-to-end.  Mixed
image+video docs prompt with the same 3-part join (the reference additionally
re-renders video placeholders as frame placeholders, image_video_utils.py —
an image-pipeline concern, out of the video slice).  Metric gates
(code-exec, NLI model, geocoding, CMU dict) are inherited from
megabench_metrics.GATED_METRICS and raise loud runbook errors.

Two registry entries mirror the reference's subsets: ``MEGABench-core``
(rule-based metrics; fully offline) and ``MEGABench-open`` (adds the
GPT-4o-as-judge metric; needs a JudgeProvider).
"""

from __future__ import annotations

import json
from ast import literal_eval
from collections import defaultdict
from dataclasses import dataclass

from .llm_judge import JudgeProvider
from .megabench_metrics import score_task
from .tasks import TASK_REGISTRY, BenchmarkTask

VIDEO_EXTS = (".mp4", ".mkv", ".webm", ".avi", ".mov", ".wmv", ".mpg",
              ".mpeg", ".m4v")


def _media_lists(doc) -> list:
    out = []
    for key in ("global_media", "example_media", "query_media"):
        val = doc.get(key, "[]")
        out.extend(literal_eval(val) if isinstance(val, str) else val)
    return out


def media_type(doc) -> str:
    """image / video / mixed, matching utils.py::_check_media_type."""
    media = _media_lists(doc)
    is_video = [m.lower().endswith(VIDEO_EXTS) for m in media]
    if not any(is_video):
        return "image"
    return "video" if all(is_video) else "mixed"


def megabench_doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
    """task_description + example_text + query_text (utils.py:47-57)."""
    return "\n".join([doc.get("task_description", ""),
                      doc.get("example_text", ""),
                      doc.get("query_text", "")])


def _literal(val, default):
    if isinstance(val, str):
        try:
            return literal_eval(val)
        except (ValueError, SyntaxError):
            return default
    return val if val is not None else default


def megabench_process(doc, response, rng=None) -> dict:
    """Submission-format record (utils.py:80-99) + the metric_info the
    in-process scorer needs (the reference fetches it from the HF dataset
    at evaluator time, evaluator.py:30-33)."""
    return {
        "task_name": doc.get("task_name", ""),
        "global_idx": doc.get("id"),
        "eval_context": _literal(doc.get("eval_context"), {}),
        "images": _literal(doc.get("query_media"), []),
        "query_text": doc.get("query_text", ""),
        "global_images": _literal(doc.get("global_media"), []),
        "global_description": doc.get("task_description", ""),
        "example_info": {
            "image_paths": _literal(doc.get("example_media"), []),
            "example_text": doc.get("example_text", ""),
        },
        "correct_answer": _literal(doc.get("answer"), {}),
        "metric_info": _literal(doc.get("metric_info"), {}),
        "response": response,
    }


def make_megabench_aggregate(judge: JudgeProvider | None = None,
                             submission_path: str | None = None):
    """Group by task, score each via score_task, emit the reference
    evaluator's summary.  ``submission_path`` additionally dumps the
    reference-submission-format json (utils.py:105-125) so results can be
    cross-checked through the reference's own offline evaluator."""

    def aggregate(results: list) -> dict:
        by_task = defaultdict(list)
        for r in results:
            by_task[r["task_name"]].append(r)

        num_tasks = num_queries = 0
        total_task = total_query = 0.0
        per_task = {}
        for task_name, records in by_task.items():
            scored = score_task(records, records[0].get("metric_info") or {},
                                judge=judge)
            num_tasks += 1
            num_queries += scored["num_queries"]
            total_task += scored["mean_task_score"]
            total_query += scored["task_score"]
            per_task[task_name] = scored["mean_task_score"]

        if submission_path:
            _dump_submission(results, submission_path)
        return {
            "macro_mean_score": total_task / num_tasks if num_tasks else 0.0,
            "micro_mean_score": (total_query / num_queries
                                 if num_queries else 0.0),
            "num_tasks": num_tasks,
            "num_queries": num_queries,
            "per_task": per_task,
        }

    return aggregate


def _dump_submission(results: list, path: str) -> None:
    import os
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    by_task = defaultdict(list)
    for r in results:
        by_task[r["task_name"]].append(r)
    task_keys = ("task_name", "global_images", "global_description",
                 "example_info")
    sample_keys = ("response", "correct_answer", "global_idx", "images",
                   "query_text")
    out = []
    for records in by_task.values():
        task = {k: records[0][k] for k in task_keys}
        task["query_response"] = [{k: r[k] for k in sample_keys}
                                  for r in records]
        out.append(task)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=4, ensure_ascii=False)


@dataclass(frozen=True)
class MegaBenchTask(BenchmarkTask):
    """BenchmarkTask whose video resolves from MEGA-Bench's media lists:
    the first video file across global/example/query media."""

    def resolve_video(self, doc, video_root: str = "") -> str:
        import os
        for m in _media_lists(doc):
            if m.lower().endswith(VIDEO_EXTS):
                rel = m[len("./data/"):] if m.startswith("./data/") else m
                return os.path.join(video_root, rel)
        raise KeyError("no video media in MEGA-Bench doc "
                       f"(task {doc.get('task_name')}, id {doc.get('id')})")


def register_megabench(judge: JudgeProvider | None = None,
                       submission_path: str | None = None) -> None:
    for name in ("MEGABench-core", "MEGABench-open"):
        TASK_REGISTRY[name] = MegaBenchTask(
            name=name,
            doc_to_text=megabench_doc_to_text,
            process_response=megabench_process,
            # core is the rule-based subset: never judge-score it, so a core
            # doc whose metric_info names a judge metric fails loudly
            aggregate=make_megabench_aggregate(
                judge=judge if name.endswith("open") else None,
                submission_path=submission_path),
        )
