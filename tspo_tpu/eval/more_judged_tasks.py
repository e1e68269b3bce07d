"""MovieChat + Video-Detail-Description — LLM-judged open-ended tasks.

Reference sources:
  - lmms-eval/lmms_eval/tasks/moviechat/utils.py — global + breakpoint modes
    share one yes/no+score judge (prompts :102-126, identical wording to
    ActivityNet-QA's but with a clean ``{'pred': 'yes', 'score': 4.8}``
    example, no doubled quote); parse :193-215; aggregates accuracy
    yes/(yes+no) and mean score (:246-271).  Breakpoint docs carry a
    ``time`` field — in this pipeline the frames around the breakpoint come
    from phase-1 ``frame_idx`` (precompute with a window around ``time``),
    which the harness gathers like any other doc.
  - lmms-eval/lmms_eval/tasks/video_detail_description/utils.py — one
    detail-orientation 0-5 judge (prompts :91-115, VideoChatGPT's
    detailed_orientation wording with the clean example), mean score
    aggregate (:210-220).
"""

from __future__ import annotations

import ast
import logging
import os

from .llm_judge import JudgeConfig, JudgeProvider, create_provider
from .tasks import TASK_REGISTRY, BenchmarkTask
from .tasks_activitynet import JUDGE_SYSTEM_PROMPT as MOVIECHAT_SYSTEM_PROMPT
from .videochatgpt import VCG_SYSTEM_PROMPTS, videochatgpt_doc_to_text

logger = logging.getLogger(__name__)

VDD_SYSTEM_PROMPT = VCG_SYSTEM_PROMPTS["detailed_orientation"]


def moviechat_user_prompt(question: str, answer: str, pred: str) -> str:
    """moviechat/utils.py:116-126 — byte-equivalent (note the clean
    ``{'pred': ...}`` example; ActivityNet-QA's has a doubled quote)."""
    return (
        "Please evaluate the following video-based question-answer pair:\n\n"
        f"Question: {question}\n"
        f"Correct Answer: {answer}\n"
        f"Predicted Answer: {pred}\n\n"
        "Provide your evaluation only as a yes/no and score where the score "
        "is an integer value between 0 and 5, with 5 indicating the highest "
        "meaningful match. "
        "Please generate the response in the form of a Python dictionary "
        "string with keys 'pred' and 'score', where value of 'pred' is  a "
        "string of 'yes' or 'no' and value of 'score' is in INTEGER, not "
        "STRING."
        "DO NOT PROVIDE ANY OTHER OUTPUT TEXT OR EXPLANATION. Only provide "
        "the Python dictionary string. "
        "For example, your response should look like this: "
        "{'pred': 'yes', 'score': 4.8}.")


def vdd_user_prompt(question: str, answer: str, pred: str) -> str:
    """video_detail_description/utils.py:102-114 — byte-equivalent."""
    return (
        "Please evaluate the following video-based question-answer pair:\n\n"
        f"Question: {question}\n"
        f"Correct Answer: {answer}\n"
        f"Predicted Answer: {pred}\n\n"
        "Provide your evaluation only as a detail orientation score where "
        "the detail orientation score is an integer value between 0 and 5, "
        "with 5 indicating the highest level of detail orientation. "
        "Please generate the response in the form of a Python dictionary "
        "string with keys 'score', where its value is the detail orientation "
        "score in INTEGER, not STRING."
        "DO NOT PROVIDE ANY OTHER OUTPUT TEXT OR EXPLANATION. Only provide "
        "the Python dictionary string. "
        "For example, your response should look like this: {'score': 4.8}.")


def parse_pred_score(review: str):
    """moviechat/utils.py:170-203 (parse_score + parse_acc): the RAW review
    must literal_eval (no brace extraction, unlike ActivityNet-QA's parser);
    failures default to ['no', 0]."""
    try:
        d = ast.literal_eval(review)
        score = int(d.get("score", 0))
    except Exception as e:  # noqa: BLE001
        logger.error("error parsing review %r: %s", review[:200], e)
        score = 0
    try:
        pred = str(ast.literal_eval(review).get("pred", "no"))
    except Exception:  # noqa: BLE001 — logged above
        pred = "no"
    return [pred, score]


def parse_score_only(review: str) -> int:
    """video_detail_description/utils.py:157-170: int score, 0 on failure."""
    try:
        return int(ast.literal_eval(review).get("score", 0))
    except Exception as e:  # noqa: BLE001
        logger.error("error parsing review %r: %s", review[:200], e)
        return 0


# both reference doc_to_text fns are the same pre+question+post builder as
# VideoChatGPT's (moviechat/utils.py:84-96, video_detail_description :68-79)
_question_doc_to_text = videochatgpt_doc_to_text


def _default_judge() -> JudgeProvider:
    return create_provider(config=JudgeConfig(
        model_name=os.environ.get("MODEL_VERSION", "gpt-4o-2024-11-20"),
        max_tokens=64))


def make_moviechat_task(mode: str = "global",
                        judge: JudgeProvider | None = None) -> BenchmarkTask:
    if judge is None:
        judge = _default_judge()

    def process(doc, response, rng=None) -> dict:
        res = judge._complete_with_retry(
            moviechat_user_prompt(doc["question"], doc["answer"], response),
            system_prompt=MOVIECHAT_SYSTEM_PROMPT)
        scores = parse_pred_score(res.content) if res.success else ["no", 0]
        return {"video_name": doc.get("video_name"),
                "question": doc.get("question"), "answer": doc.get("answer"),
                "pred": response, "time": doc.get("time"),
                "Correctness": scores[0], "score": scores[1]}

    def aggregate(results: list) -> dict:
        # moviechat_aggregate_acc: exact "yes" over ALL results (:261-271)
        yes = sum(r["Correctness"] == "yes" for r in results)
        return {"accuracy": 100.0 * yes / max(len(results), 1),
                "average_score": sum(r["score"] for r in results)
                / max(len(results), 1)}

    return BenchmarkTask(name=f"MovieChat-{mode}",
                         doc_to_text=_question_doc_to_text,
                         process_response=process, aggregate=aggregate,
                         video_path_keys=("video_path", "video_name"))


def make_vdd_task(judge: JudgeProvider | None = None) -> BenchmarkTask:
    if judge is None:
        judge = _default_judge()

    def process(doc, response, rng=None) -> dict:
        res = judge._complete_with_retry(
            vdd_user_prompt(doc["question"], doc["answer"], response),
            system_prompt=VDD_SYSTEM_PROMPT)
        score = parse_score_only(res.content) if res.success else 0
        return {"video_name": doc.get("video_name"),
                "question": doc.get("question"), "answer": doc.get("answer"),
                "pred": response, "score": score}

    def aggregate(results: list) -> dict:
        return {"average_score": sum(r["score"] for r in results)
                / max(len(results), 1)}

    return BenchmarkTask(name="VideoDetailDescription",
                         doc_to_text=_question_doc_to_text,
                         process_response=process, aggregate=aggregate,
                         video_path_keys=("video_path", "video_name"),
                         video_suffix=".mp4")


def register_more_judged(judge: JudgeProvider | None = None) -> None:
    if judge is None:
        judge = _default_judge()
    for mode in ("global", "breakpoint"):
        task = make_moviechat_task(mode, judge)
        TASK_REGISTRY[task.name] = task
    task = make_vdd_task(judge)
    TASK_REGISTRY[task.name] = task
