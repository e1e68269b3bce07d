"""VDC (Video Detailed Captioning) — five caption dimensions graded by a
two-step LLM judge.

Reference: lmms-eval/lmms_eval/tasks/vdc/utils.py — each dimension (short /
detailed / main_object / camera / background) asks for a caption with a
prompt drawn uniformly from its pool (:51-194, pools extracted byte-exact
into vdc_prompts.py); grading runs per attached QA pair in two steps
(:202-307):
  1. the judge ANSWERS the question from the predicted caption
     (``gener_pred_response`` system/user prompts);
  2. a second judge call grades that answer against the gold answer with
     the familiar yes/no + 0-5 dict reply (``gener_pred_score``).
Per-case score = mean QA score, accuracy = fraction of "yes"; aggregates
are dataset means (:321-345).  The reference drives an sglang endpoint;
transport here is any eval/llm_judge.py provider.
"""

from __future__ import annotations

import ast
import logging
import os
import random

from .llm_judge import JudgeConfig, JudgeProvider, create_provider
from .tasks import TASK_REGISTRY, BenchmarkTask
from .vdc_prompts import (BACKGROUND_CAPTION_PROMPTS, CAMERA_CAPTION_PROMPTS,
                          DETAILED_CAPTION_PROMPTS,
                          MAIN_OBJECT_CAPTION_PROMPTS, SHORT_CAPTION_PROMPTS)

logger = logging.getLogger(__name__)

VDC_POOLS = {
    "short": SHORT_CAPTION_PROMPTS,
    "detailed": DETAILED_CAPTION_PROMPTS,
    "main_object": MAIN_OBJECT_CAPTION_PROMPTS,
    "camera": CAMERA_CAPTION_PROMPTS,
    "background": BACKGROUND_CAPTION_PROMPTS,
}

# gener_pred_response (utils.py:202-218) — byte-equivalent
VDC_ANSWER_SYSTEM = (
    "You are an intelligent chatbot designed for providing accurate answers "
    "to questions related to the content based on a detailed description of "
    "a video or image."
    "Here's how you can accomplish the task:"
    "------"
    "##INSTRUCTIONS: "
    "- Read the detailed description carefully.\n"
    "- Answer the question only based on the detailed description.\n"
    "- The answer should be a short sentence or phrase.\n")


def vdc_answer_prompt(pred_cap: str, q: str) -> str:
    return (
        "Please provide accurate answers to questions related to the "
        "content based on a detailed description of a video or image:\n\n"
        f"detailed description: {pred_cap}, question: {q}"
        "DO NOT PROVIDE ANY OTHER OUTPUT TEXT OR EXPLANATION. Only provide "
        "short but accurate answer.")


# gener_pred_score (utils.py:229-249) — byte-equivalent
VDC_SCORE_SYSTEM = (
    "You are an intelligent chatbot designed for evaluating the correctness "
    "of generative outputs for question-answer pairs. "
    "Your task is to compare the predicted answer with the correct answer "
    "and determine if they match meaningfully. Here's how you can "
    "accomplish the task:"
    "------"
    "##INSTRUCTIONS: "
    "- Focus on the meaningful match between the predicted answer and the "
    "correct answer.\n"
    "- Consider synonyms or paraphrases as valid matches.\n"
    "- Evaluate the correctness of the prediction compared to the answer.")


def vdc_score_prompt(question: str, answer: str, pred_answer: str) -> str:
    return (
        "Please evaluate the following video-based question-answer "
        "pair:\n\n"
        f"Question: {question}\n"
        f"Correct Answer: {answer}\n"
        f"Predicted Answer: {pred_answer}\n\n"
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


def make_vdc_doc_to_text(dimension: str):
    pool = VDC_POOLS[dimension]

    def doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
        # the reference draws from the pool with the UNSEEDED global random
        # (utils.py:172-194); here the draw is keyed on the doc so runs are
        # reproducible and resume-cache-consistent (harness.py assumes
        # deterministic responses) while staying uniform across docs
        return random.Random(str(doc.get("video_name"))).choice(pool)
    return doc_to_text


def make_vdc_task(dimension: str,
                  judge: JudgeProvider | None = None) -> BenchmarkTask:
    if judge is None:
        judge = create_provider(config=JudgeConfig(
            model_name=os.environ.get("MODEL_VERSION", "gpt-4o-2024-11-20"),
            max_tokens=256))

    def process(doc, response, rng=None) -> dict:
        """llmms_eval (utils.py:261-307): answer each QA from the caption,
        grade each answer, mean score + yes-fraction per case."""
        scores, accs = [], []
        for qa in doc.get("qa_list", []):
            ans = judge._complete_with_retry(
                vdc_answer_prompt(response, qa["question"]),
                system_prompt=VDC_ANSWER_SYSTEM)
            pred_answer = ans.content.strip() if ans.success else ""
            graded = judge._complete_with_retry(
                vdc_score_prompt(qa["question"], qa["answer"], pred_answer),
                system_prompt=VDC_SCORE_SYSTEM)
            try:
                d = ast.literal_eval(graded.content.strip())
                scores.append(float(d["score"]))
                accs.append(1.0 if d["pred"] == "yes" else 0.0)
            except Exception as e:  # noqa: BLE001
                logger.error("vdc grade parse failed: %s", e)
        n = max(len(scores), 1)
        return {"video_name": doc.get("video_name"),
                "caption": doc.get("caption"), "pred": response,
                "score": sum(scores) / n, "acc": sum(accs) / n,
                "n_qa": len(scores)}

    def aggregate(results: list) -> dict:
        # reference scales: score is the raw 0-5 mean, accuracy the raw 0-1
        # fraction (vdc_aggregate_score/_acc utils.py:321-345)
        n = max(len(results), 1)
        return {"average_score": sum(r["score"] for r in results) / n,
                "accuracy": sum(r["acc"] for r in results) / n}

    return BenchmarkTask(
        name=f"VDC-{dimension}", doc_to_text=make_vdc_doc_to_text(dimension),
        process_response=process, aggregate=aggregate,
        video_path_keys=("video_name", "video_path"),
        video_suffix=".mp4")   # vdc_doc_to_visual appends .mp4 (utils.py:158)


def register_vdc(judge: JudgeProvider | None = None) -> None:
    for dim in VDC_POOLS:
        task = make_vdc_task(dim, judge)
        TASK_REGISTRY[task.name] = task
