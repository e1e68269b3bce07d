"""TemporalBench, MMWorld, and VideoEvalPro benchmark tasks.

Reference sources:
  - lmms-eval/lmms_eval/tasks/temporalbench/utils.py — binary QA scored by
    the FIRST CHARACTER of the response vs GT (:107-113), plus Multiple
    Binary Accuracy (a video counts only if every one of its questions is
    right, :115-131) and per-dataset/category breakdowns; the short/long
    captioning variant needs sentence-transformers (absent from this
    zero-egress image) — use a judged task for captions instead.
  - lmms-eval/lmms_eval/tasks/mmworld/utils.py — VideoMME-style option
    prompt but with ``str(doc["options"])`` (the python list repr!) and a
    "The best answer is:" default post prompt (:85-93); EgoPlan's parser
    with the concatenated-prefix quirk (:96-114); per-discipline breakdown,
    overall accuracy ×100 (:141-169).
  - lmms-eval/lmms_eval/tasks/videoevalpro/utils.py — open-ended QA graded
    by a SimpleQA-style CORRECT/INCORRECT/NOT_ATTEMPTED judge returning
    A/B/C (:56-100, prompt extracted byte-exact into
    videoevalpro_prompt.py); per-qa_type + overall fraction (:126-149).
"""

from __future__ import annotations

import os

from .llm_judge import JudgeConfig, JudgeProvider, create_provider
from .spatial_tasks import egoplan_extract_letter
from .tasks import TASK_REGISTRY, BenchmarkTask
from .videoevalpro_prompt import VEP_JUDGE_PROMPT_TEMPLATE

# ---------------------------------------------------------------------------
# TemporalBench
# ---------------------------------------------------------------------------


def temporalbench_doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
    """temporalbench/utils.py:43-44: the bare question field."""
    return doc["question"]


def _temporalbench_process(doc, response, rng=None) -> dict:
    # utils.py:111: first character vs GT, case-insensitive.  (The reference
    # would IndexError on an empty response; "" scores wrong instead.)
    first = response[0].lower() if response else ""
    return {"idx": doc.get("idx"), "video_name": doc.get("video_name"),
            "dataset": doc.get("dataset"), "category": doc.get("category"),
            "pred_answer": response,
            "answer": doc.get("GT"),
            "correct": int(first == str(doc.get("GT", "")).lower())}


def aggregate_temporalbench(results: list) -> dict:
    """utils.py:90-200: Binary Accuracy + Multiple Binary Accuracy (all
    questions of a video must be right) + per-dataset/category breakdowns
    (the reference only logs the breakdowns; returned here)."""
    out = {}
    if not results:
        return {"binary_accuracy": 0.0, "multiple_binary_accuracy": 0.0}
    correct = sum(r["correct"] for r in results)
    out["binary_accuracy"] = 100.0 * correct / len(results)
    per_video: dict = {}
    for r in results:
        v = r["video_name"]
        per_video[v] = per_video.get(v, True) and bool(r["correct"])
    out["multiple_binary_accuracy"] = \
        100.0 * sum(per_video.values()) / len(per_video)
    for key in ("dataset", "category"):
        groups: dict = {}
        for r in results:
            if r.get(key):
                groups.setdefault(r[key], []).append(r)
        if groups:
            out[f"per_{key}"] = {
                g: 100.0 * sum(r["correct"] for r in rows) / len(rows)
                for g, rows in sorted(groups.items())}
    return out


# ---------------------------------------------------------------------------
# MMWorld
# ---------------------------------------------------------------------------

MMWORLD_DISCIPLINES = ["Tech & Engineering", "Science", "Health & Medicine",
                       "Sports & Arts", "Game", "Business", "Embodied Tasks"]


def mmworld_doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
    """mmworld/utils.py:85-93 — options rendered via str(list) on purpose."""
    kw = lmms_eval_specific_kwargs or {}
    option_prompt = ("Select the best answer to the following multiple-choice "
                     "question based on the video and the subtitles. Respond "
                     "with only the letter (A, B, C, or D) of the correct "
                     "option.")
    question = doc["question"] + "\n" + str(doc["options"])
    post = kw.get("post_prompt", "The best answer is:")
    return option_prompt + "\n" + question + "\n" + post


def _mmworld_process(doc, response, rng=None) -> dict:
    # same parser as EgoPlan (mmworld/utils.py:96-114 is an exact copy,
    # concatenated-prefix quirk included)
    return {"video_id": doc.get("video_id"),
            "discipline": doc.get("discipline"),
            "pred_answer": egoplan_extract_letter(response),
            "answer": str(doc.get("correct_answer_label", "")).upper()}


def aggregate_mmworld(results: list) -> dict:
    out = {}
    for d in MMWORLD_DISCIPLINES:
        rows = [r for r in results if r.get("discipline") == d]
        if rows:
            out[d] = 100.0 * sum(r["pred_answer"] == r["answer"]
                                 for r in rows) / len(rows)
    out["overall"] = (100.0 * sum(r["pred_answer"] == r["answer"]
                                  for r in results) / len(results)
                      if results else 0.0)
    return out


# ---------------------------------------------------------------------------
# VideoEvalPro
# ---------------------------------------------------------------------------

VEP_TASK_TYPES = ("Local Perception", "Local Reasoning",
                  "Holistic Perception", "Holistic Reasoning")


def vep_judge_prompt(question: str, target: str, predicted_answer: str) -> str:
    return VEP_JUDGE_PROMPT_TEMPLATE.format(
        question=question, target=target, predicted_answer=predicted_answer)


def videoevalpro_doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
    kw = lmms_eval_specific_kwargs or {}
    return (f"{kw.get('pre_prompt', '')}{doc['question']}"
            f"{kw.get('post_prompt', '')}")


def make_videoevalpro_task(judge: JudgeProvider | None = None) -> BenchmarkTask:
    if judge is None:
        judge = create_provider(config=JudgeConfig(
            model_name=os.environ.get("MODEL_VERSION", "gpt-4o-2024-11-20"),
            max_tokens=5))

    def process(doc, response, rng=None) -> dict:
        q = (doc.get("question") or "").strip()
        gt = (doc.get("answer_text") or "").strip()
        res = judge._complete_with_retry(vep_judge_prompt(q, gt, response))
        # utils.py:103: grade A == CORRECT; any failure counts incorrect
        ok = bool(res.success and res.content.strip()[:1].upper() == "A")
        return {"question": q, "task_type": (doc.get("qa_type") or "").strip(),
                "text_gt": gt, "pred_ans": response, "judge_result": ok}

    def aggregate(results: list) -> dict:
        out = {}
        for t in VEP_TASK_TYPES:
            rows = [r for r in results if r["task_type"] == t]
            out[t] = (sum(r["judge_result"] for r in rows) / len(rows)
                      if rows else 0.0)
        out["overall"] = (sum(r["judge_result"] for r in results)
                          / len(results) if results else 0.0)
        return out

    return BenchmarkTask(name="VideoEvalPro",
                         doc_to_text=videoevalpro_doc_to_text,
                         process_response=process, aggregate=aggregate,
                         video_path_keys=("video", "video_path"))


def register_extra_tasks(judge: JudgeProvider | None = None) -> None:
    TASK_REGISTRY["TemporalBench"] = BenchmarkTask(
        name="TemporalBench", doc_to_text=temporalbench_doc_to_text,
        process_response=_temporalbench_process,
        aggregate=aggregate_temporalbench,
        video_path_keys=("video_name", "video_path"))
    TASK_REGISTRY["MMWorld"] = BenchmarkTask(
        name="MMWorld", doc_to_text=mmworld_doc_to_text,
        process_response=_mmworld_process, aggregate=aggregate_mmworld,
        video_path_keys=("video_id", "video_path"), video_suffix=".mp4")
    if judge is not None:
        TASK_REGISTRY["VideoEvalPro"] = make_videoevalpro_task(judge)


register_extra_tasks()
