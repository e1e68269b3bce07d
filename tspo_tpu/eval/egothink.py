"""EgoThink — first-person (egocentric) reasoning QA, MT-bench-style judge.

Reference: lmms-eval/lmms_eval/tasks/egothink/utils.py — bare-question
prompt with optional pre/post kwargs (:69-76); each answer is rated 0 / 0.5
/ 1 by an impartial-judge prompt whose reply must carry ``[[rating]]``
(:136-161, parsed by the two bracket regexes :22-23, -1 when unparseable —
the reference keeps the -1 in its mean); aggregate = mean rating
(:178-188).  The gold answer is lowercased/period-stripped before judging
(:172).
"""

from __future__ import annotations

import ast
import os
import re

from .llm_judge import JudgeConfig, JudgeProvider, create_provider
from .tasks import TASK_REGISTRY, BenchmarkTask

ONE_SCORE_PATTERN = re.compile(r"\[\[(\d+\.?\d*)\]\]")
ONE_SCORE_PATTERN_BACKUP = re.compile(r"\[(\d+\.?\d*)\]")

EGOTHINK_JUDGE_SYSTEM = "You are a helpful assistant."


def egothink_judge_prompt(question: str, answer: str, ref_answer: str) -> str:
    """utils.py:145 — byte-equivalent."""
    return (
        "[Instruction]\nPlease act as an impartial judge and evaluate the "
        "quality of the response provided by an AI assistant to the user "
        "question displayed below. Your evaluation should consider "
        "correctness and helpfulness. You will be given a reference answer "
        "and the assistant's answer. Begin your evaluation by comparing the "
        "assistant's answer with the reference answer. Identify and correct "
        "any mistakes. The assistant has access to an image alongwith "
        "questions but you will not be given images. Therefore, please "
        "consider only how the answer is close to the reference answer. If "
        "the assistant's answer is not exactly same as or similar to the "
        "answer, then he must be wrong.  Be as objective as possible. "
        "Discourage uninformative answers. Also, equally treat short and "
        "long answers and focus on the correctness of answers.  After "
        "providing your explanation, you must rate the response with either "
        "0, 0.5 or 1 by strictly following this format: \"[[rating]]\", "
        "for example: \"Rating: [[0.5]]\".\n\n[Question]\n"
        f"{question}\n\n[The Start of Reference Answer]\n{ref_answer}\n"
        "[The End of Reference Answer]\n\n[The Start of Assistant's Answer]"
        f"\n{answer}\n[The End of Assistant's Answer]")


def parse_rating(judgment: str) -> float:
    """utils.py:150-160: [[x]] first, [x] fallback, -1 when absent."""
    m = ONE_SCORE_PATTERN.search(judgment)
    if not m:
        m = ONE_SCORE_PATTERN_BACKUP.search(judgment)
    if m:
        return ast.literal_eval(m.groups()[0])
    return -1


def egothink_doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
    kw = lmms_eval_specific_kwargs or {}
    q = doc["question"].strip()
    if kw.get("pre_prompt", ""):
        q = f"{kw['pre_prompt']}{q}"
    if kw.get("post_prompt", ""):
        q = f"{q}{kw['post_prompt']}"
    return q


def make_egothink_task(judge: JudgeProvider | None = None) -> BenchmarkTask:
    if judge is None:
        judge = create_provider(config=JudgeConfig(
            model_name=os.environ.get("MODEL_VERSION", "gpt-4o-2024-11-20"),
            max_tokens=2048))
    elif judge.config.max_tokens < 2048:
        # the judge explains BEFORE the trailing "Rating: [[x]]"
        # (utils.py:150 uses max_tokens=2048); a short cap truncates the
        # rating off and every sample parses to -1
        judge.config.max_tokens = 2048

    def process(doc, response, rng=None) -> dict:
        ref = str(doc["answer"]).lower().strip().replace(".", "")
        res = judge._complete_with_retry(
            egothink_judge_prompt(doc["question"], response, ref),
            system_prompt=EGOTHINK_JUDGE_SYSTEM)
        judgment = res.content if res.success else ""
        return {"question_id": doc.get("id"), "pred_answer": response,
                "answer": doc.get("answer"),
                "score": parse_rating(judgment), "judge": judgment}

    def aggregate(results: list) -> dict:
        # the reference keeps unparseable ratings as -1 in the mean
        return {"overall": sum(r["score"] for r in results)
                / max(len(results), 1)}

    return BenchmarkTask(name="EgoThink", doc_to_text=egothink_doc_to_text,
                         process_response=process, aggregate=aggregate,
                         video_path_keys=("image_path", "video_path", "id"))


def register_egothink(judge: JudgeProvider | None = None) -> None:
    TASK_REGISTRY["EgoThink"] = make_egothink_task(judge)
