"""VideoChatGPT — the LLM-judged open-ended video QA benchmark family.

Faithful rebuild of `lmms-eval/lmms_eval/tasks/videochatgpt/utils.py`:
three task flavors over the same prediction flow —
  - generic:   each answer judged on THREE dimensions (correctness,
               detailed_orientation, context), one judge call each
               (utils.py:108-141)
  - temporal:  one temporal-accuracy judge call (utils.py:145-167)
  - consistency: two near-duplicate questions per video answered
               independently; pairs are joined by video_name at aggregation
               and judged together (utils.py:171-215, 359-425, 497-525)

Judge prompts are byte-equivalent to the reference's (utils.py:218-319,
359-388) — a differently-prompted judge is a different metric — and replies
are parsed as a Python-dict string ``{'score': N}`` via ast.literal_eval
with 0 on any failure (utils.py:428-442).  Transport goes through
eval/llm_judge.py providers (OpenAI-compatible HTTP, local backbone, dummy)
instead of the reference's hardcoded requests loop.  Scores are 0-5 means,
reported per dimension (videochatgpt_aggregate_score utils.py:570-579).
"""

from __future__ import annotations

import ast
import logging
import os

from .llm_judge import JudgeConfig, JudgeProvider, create_provider
from .tasks import TASK_REGISTRY, BenchmarkTask

logger = logging.getLogger(__name__)

# utils.py:218-319 — system prompt per judged dimension
VCG_SYSTEM_PROMPTS = {
    "correctness": (
        "You are an intelligent chatbot designed for evaluating the factual "
        "accuracy of generative outputs for video-based question-answer pairs. "
        "Your task is to compare the predicted answer with the correct answer "
        "and determine if they are factually consistent. Here's how you can "
        "accomplish the task:"
        "------"
        "##INSTRUCTIONS: "
        "- Focus on the factual consistency between the predicted answer and "
        "the correct answer. The predicted answer should not contain any "
        "misinterpretations or misinformation.\n"
        "- The predicted answer must be factually accurate and align with the "
        "video content.\n"
        "- Consider synonyms or paraphrases as valid matches.\n"
        "- Evaluate the factual accuracy of the prediction compared to the "
        "answer."),
    "detailed_orientation": (
        "You are an intelligent chatbot designed for evaluating the detail "
        "orientation of generative outputs for video-based question-answer "
        "pairs. "
        "Your task is to compare the predicted answer with the correct answer "
        "and determine its level of detail, considering both completeness and "
        "specificity. Here's how you can accomplish the task:"
        "------"
        "##INSTRUCTIONS: "
        "- Check if the predicted answer covers all major points from the "
        "video. The response should not leave out any key aspects.\n"
        "- Evaluate whether the predicted answer includes specific details "
        "rather than just generic points. It should provide comprehensive "
        "information that is tied to specific elements of the video.\n"
        "- Consider synonyms or paraphrases as valid matches.\n"
        "- Provide a single evaluation score that reflects the level of detail "
        "orientation of the prediction, considering both completeness and "
        "specificity."),
    "context": (
        "You are an intelligent chatbot designed for evaluating the contextual "
        "understanding of generative outputs for video-based question-answer "
        "pairs. "
        "Your task is to compare the predicted answer with the correct answer "
        "and determine if the generated response aligns with the overall "
        "context of the video content. Here's how you can accomplish the task:"
        "------"
        "##INSTRUCTIONS: "
        "- Evaluate whether the predicted answer aligns with the overall "
        "context of the video content. It should not provide information that "
        "is out of context or misaligned.\n"
        "- The predicted answer must capture the main themes and sentiments of "
        "the video.\n"
        "- Consider synonyms or paraphrases as valid matches.\n"
        "- Provide your evaluation of the contextual understanding of the "
        "prediction compared to the answer."),
    "temporal": (
        "You are an intelligent chatbot designed for evaluating the temporal "
        "understanding of generative outputs for video-based question-answer "
        "pairs. "
        "Your task is to compare the predicted answer with the correct answer "
        "and determine if they correctly reflect the temporal sequence of "
        "events in the video content. Here's how you can accomplish the task:"
        "------"
        "##INSTRUCTIONS: "
        "- Focus on the temporal consistency between the predicted answer and "
        "the correct answer. The predicted answer should correctly reflect "
        "the sequence of events or details as they are presented in the video "
        "content.\n"
        "- Consider synonyms or paraphrases as valid matches, but only if the "
        "temporal order is maintained.\n"
        "- Evaluate the temporal accuracy of the prediction compared to the "
        "answer."),
    "consistency": (
        "You are an intelligent chatbot designed for evaluating the "
        "consistency of generative outputs for similar video-based "
        "question-answer pairs. "
        "You will be given two very similar questions, a common answer common "
        "to both the questions and predicted answers for the two questions ."
        "Your task is to compare the predicted answers for two very similar "
        "question, with a common correct answer and determine if they are "
        "consistent. Here's how you can accomplish the task:"
        "------"
        "##INSTRUCTIONS: "
        "- Focus on the consistency between the two predicted answers and the "
        "correct answer. Both predicted answers should correspond to the "
        "correct answer and to each other, and should not contain any "
        "contradictions or significant differences in the conveyed "
        "information.\n"
        "- Both predicted answers must be consistent with each other and the "
        "correct answer, in terms of the information they provide about the "
        "video content.\n"
        "- Consider synonyms or paraphrases as valid matches, but only if "
        "they maintain the consistency in the conveyed information.\n"
        "- Evaluate the consistency of the two predicted answers compared to "
        "the correct answer."),
}

# utils.py:236-243 etc — per-dimension wording inside the user prompt
_VCG_SCORE_NAMES = {
    "correctness": ("a factual accuracy score where the factual accuracy "
                    "score is", "the factual accuracy score"),
    "detailed_orientation": ("a detail orientation score where the detail "
                             "orientation score is", "the detail orientation "
                             "score"),
    "context": ("a contextual understanding score where the contextual "
                "understanding score is", "contextual understanding score"),
    "temporal": ("a temporal accuracy score where the temporal accuracy "
                 "score is", "the temporal accuracy score"),
}
_VCG_LEVEL_NAMES = {
    "correctness": "factual consistency",
    "detailed_orientation": "detail orientation",
    "context": "contextual understanding",
    "temporal": "temporal consistency",
}


def vcg_user_prompt(dimension: str, question: str, answer: str,
                    pred: str) -> str:
    """utils.py:236-318 — byte-equivalent per-dimension user message."""
    lead, noun = _VCG_SCORE_NAMES[dimension]
    level = _VCG_LEVEL_NAMES[dimension]
    return (
        "Please evaluate the following video-based question-answer pair:\n\n"
        f"Question: {question}\n"
        f"Correct Answer: {answer}\n"
        f"Predicted Answer: {pred}\n\n"
        f"Provide your evaluation only as {lead} an integer value between 0 "
        f"and 5, with 5 indicating the highest level of {level}. "
        "Please generate the response in the form of a Python dictionary "
        f"string with keys 'score', where its value is {noun} in INTEGER, "
        "not STRING."
        "DO NOT PROVIDE ANY OTHER OUTPUT TEXT OR EXPLANATION. Only provide "
        "the Python dictionary string. "
        "For example, your response should look like this: {''score': 4.8}.")


def vcg_consistency_prompt(question1: str, question2: str, answer: str,
                           pred1: str, pred2: str) -> str:
    """utils.py:376-387 — byte-equivalent."""
    return (
        "Please evaluate the following video-based question-answer pair:\n\n"
        f"Question 1: {question1}\n"
        f"Question 2: {question2}\n"
        f"Correct Answer: {answer}\n"
        f"Predicted Answer to Question 1: {pred1}\n"
        f"Predicted Answer to Question 2: {pred2}\n\n"
        "Provide your evaluation only as a consistency score where the "
        "consistency score is an integer value between 0 and 5, with 5 "
        "indicating the highest level of consistency. "
        "Please generate the response in the form of a Python dictionary "
        "string with keys 'score', where its value is the consistency score "
        "in INTEGER, not STRING."
        "DO NOT PROVIDE ANY OTHER OUTPUT TEXT OR EXPLANATION. Only provide "
        "the Python dictionary string. "
        "For example, your response should look like this: {''score': 4.8}.")


def parse_vcg_score(review: str) -> int:
    """utils.py:428-442: literal_eval the dict string, int(score), 0 on any
    failure."""
    try:
        return int(ast.literal_eval(review).get("score", 0))
    except Exception as e:  # noqa: BLE001 — reference logs every flavor
        logger.error("error parsing review %r: %s", review[:200], e)
        return 0


def videochatgpt_doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
    """utils.py:68-80."""
    kw = lmms_eval_specific_kwargs or {}
    return (f"{kw.get('pre_prompt', '')}{doc['question']}"
            f"{kw.get('post_prompt', '')}")


def videochatgpt_doc_to_text_consistency(doc,
                                         lmms_eval_specific_kwargs=None) -> str:
    """utils.py:84-99: each doc carries exactly one live question."""
    kw = lmms_eval_specific_kwargs or {}
    q = doc["question_1"] if doc["question_1"] != "None" else doc["question_2"]
    return f"{kw.get('pre_prompt', '')}{q}{kw.get('post_prompt', '')}"


def _judge_dimension(judge: JudgeProvider, dimension: str, question: str,
                     answer: str, pred: str) -> int:
    res = judge._complete_with_retry(
        vcg_user_prompt(dimension, question, answer, pred),
        system_prompt=VCG_SYSTEM_PROMPTS[dimension])
    return parse_vcg_score(res.content) if res.success else 0


def _default_judge() -> JudgeProvider:
    return create_provider(config=JudgeConfig(
        model_name=os.environ.get("MODEL_VERSION", "gpt-4o-2024-11-20"),
        max_tokens=64))


def make_videochatgpt_task(flavor: str,
                           judge: JudgeProvider | None = None) -> BenchmarkTask:
    """flavor in {generic, temporal, consistency} (the three yaml tasks)."""
    if judge is None:
        judge = _default_judge()

    if flavor == "generic":
        # utils.py:108-141 — three judge calls per doc
        def process(doc, response, rng=None) -> dict:
            scores = {d: _judge_dimension(judge, d, doc["question"],
                                          doc["answer"], response)
                      for d in ("correctness", "detailed_orientation",
                                "context")}
            return {"video_name": doc["video_name"], "Q": doc["question"],
                    "A": doc["answer"], "pred": response, **scores}

        def aggregate(results: list) -> dict:
            n = max(len(results), 1)
            return {d: sum(r[d] for r in results) / n
                    for d in ("correctness", "detailed_orientation",
                              "context")}

        return BenchmarkTask(
            name="VideoChatGPT-generic", doc_to_text=videochatgpt_doc_to_text,
            process_response=process, aggregate=aggregate,
            video_path_keys=("video_path", "video_name"),
            video_suffix=".mp4")

    if flavor == "temporal":
        # utils.py:145-167
        def process(doc, response, rng=None) -> dict:
            score = _judge_dimension(judge, "temporal", doc["question"],
                                     doc["answer"], response)
            return {"video_name": doc["video_name"], "Q": doc["question"],
                    "A": doc["answer"], "pred": response, "score": score}

        def aggregate(results: list) -> dict:
            return {"average_score": sum(r["score"] for r in results)
                    / max(len(results), 1)}

        return BenchmarkTask(
            name="VideoChatGPT-temporal", doc_to_text=videochatgpt_doc_to_text,
            process_response=process, aggregate=aggregate,
            video_path_keys=("video_path", "video_name"),
            video_suffix=".mp4")

    if flavor == "consistency":
        # utils.py:171-215 + 497-525: record per-question preds, pair by
        # video_name in encounter order at aggregation, judge each pair.
        # Sharded runs split the adjacent Q1/Q2 docs across ranks, so
        # rank-local aggregates find few/no pairs (cheap); the full pairing
        # happens at merge_shards re-aggregation over all ranks' results.
        # Judge calls are memoized on the pair content so a pair judged in a
        # rank-local pass is never re-judged at merge time.
        judged_pairs: dict = {}

        def process(doc, response, rng=None) -> dict:
            rec = {"video_name": doc["video_name"], "A": doc["answer"]}
            if doc["question_1"] != "None":
                rec.update({"Q1": doc["question_1"], "pred1": response})
            else:
                rec.update({"Q2": doc["question_2"], "pred2": response})
            return rec

        def aggregate(results: list) -> dict:
            pairs, used = [], set()
            for i, first in enumerate(results):
                if i in used:
                    continue
                for j in range(i + 1, len(results)):
                    if j in used:
                        continue
                    second = results[j]
                    if first.get("video_name") == second.get("video_name"):
                        merged = dict(first)
                        merged.update({k: second.get(k)
                                       for k in ("Q1", "Q2", "pred1", "pred2")
                                       if second.get(k) is not None})
                        used.update((i, j))
                        pairs.append(merged)
                        break
            total = 0
            for p in pairs:
                key = (p.get("Q1", ""), p.get("Q2", ""), p.get("A", ""),
                       p.get("pred1", ""), p.get("pred2", ""))
                if key not in judged_pairs:
                    res = judge._complete_with_retry(
                        vcg_consistency_prompt(*key),
                        system_prompt=VCG_SYSTEM_PROMPTS["consistency"])
                    judged_pairs[key] = (parse_vcg_score(res.content)
                                         if res.success else 0)
                p["score"] = judged_pairs[key]
                total += p["score"]
            return {"average_score": total / max(len(pairs), 1),
                    "pairs_judged": len(pairs)}

        return BenchmarkTask(
            name="VideoChatGPT-consistency",
            doc_to_text=videochatgpt_doc_to_text_consistency,
            process_response=process, aggregate=aggregate,
            video_path_keys=("video_path", "video_name"),
            video_suffix=".mp4")

    raise ValueError(f"unknown VideoChatGPT flavor: {flavor}")


def register_videochatgpt(judge: JudgeProvider | None = None) -> None:
    if judge is None:
        judge = _default_judge()
    for flavor in ("generic", "temporal", "consistency"):
        task = make_videochatgpt_task(flavor, judge)
        TASK_REGISTRY[task.name] = task
