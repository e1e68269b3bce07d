"""ActivityNet-QA — an open-ended, LLM-judged benchmark task.

Faithful rebuild of `lmms-eval/lmms_eval/tasks/activitynetqa/utils.py`:
doc_to_text capitalizes the raw question and appends "?" (utils.py:63-86),
each prediction is graded by a judge model with the reference's exact
system/user prompts (utils.py:93-117), the reply is parsed as a Python-dict
string with 'pred' (yes/no) and integer 'score' 0-5 (utils.py:158-173), and
two aggregates are reported: accuracy = yes/(yes+no) and mean score
(utils.py:246-280 activitynetqa_aggregate_score/accuracy).

Transport goes through eval/llm_judge.py providers instead of a hardcoded
requests loop — any provider works (OpenAI-compatible HTTP, local backbone,
dummy), with the reference's retry semantics.  The judge prompt/parsing are
kept byte-equivalent: a differently-prompted judge is a different metric.
"""

from __future__ import annotations

import ast
import logging
import os

from .llm_judge import JudgeConfig, JudgeProvider, create_provider
from .tasks import TASK_REGISTRY, BenchmarkTask

logger = logging.getLogger(__name__)

JUDGE_SYSTEM_PROMPT = (
    "You are an intelligent chatbot designed for evaluating the correctness "
    "of generative outputs for question-answer pairs. "
    "Your task is to compare the predicted answer with the correct answer "
    "and determine if they match meaningfully. Here's how you can accomplish "
    "the task:"
    "------"
    "##INSTRUCTIONS: "
    "- Focus on the meaningful match between the predicted answer and the "
    "correct answer.\n"
    "- Consider synonyms or paraphrases as valid matches.\n"
    "- Evaluate the correctness of the prediction compared to the answer."
)


def judge_user_prompt(question: str, answer: str, pred: str) -> str:
    """utils.py:108-117 — byte-equivalent."""
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
        "{'pred': 'yes', 'score': 4.8}."
    )


def parse_review(review: str):
    """utils.py:158-179 — ('yes'|'no', int score); (None on parse failure,
    handled by the caller as ['no', 0] like the reference)."""
    try:
        review = "{" + review.split("{")[1].split("}")[0] + "}"
        d = ast.literal_eval(review)
        score = int(d["score"])
        pred = d["pred"]
        pred = "yes" if "yes" in pred.lower() else \
            "no" if "no" in pred.lower() else pred
        return [pred, score]
    except Exception as e:  # noqa: BLE001 — reference logs every flavor
        logger.error("error parsing review %r: %s", review[:200], e)
        return None


def activitynetqa_doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
    kw = lmms_eval_specific_kwargs or {}
    question = doc["question"].capitalize() + "?"
    return f"{kw.get('pre_prompt', '')}{question}{kw.get('post_prompt', '')}"


def _resolve_video(doc, video_root: str = "") -> str:
    """cache-dir v_{video_name} with extension fallbacks (utils.py:52-60)."""
    base = os.path.join(video_root, f"v_{doc['video_name']}.mp4")
    for ext in ("mp4", "webm", "mkv"):
        p = base[:-3] + ext
        if os.path.exists(p):
            return p
    raise FileNotFoundError(base)


def make_activitynetqa_task(judge: JudgeProvider | None = None) -> BenchmarkTask:
    if judge is None:
        judge = create_provider(config=JudgeConfig(
            model_name=os.environ.get("MODEL_VERSION", "gpt-4o-2024-11-20"),
            max_tokens=64))

    def process(doc, response, rng=None) -> dict:
        # per-call system prompt: never mutate the (possibly shared) config
        res = judge._complete_with_retry(
            judge_user_prompt(doc["question"], doc["answer"], response),
            system_prompt=JUDGE_SYSTEM_PROMPT)
        scores = parse_review(res.content) if res.success else None
        if scores is None:
            scores = ["no", 0]          # reference failure default
        return {"video_name": doc.get("video_name"),
                "question": doc.get("question"), "answer": doc.get("answer"),
                "pred": response, "question_id": doc.get("question_id"),
                "type": doc.get("type"), "Correctness": scores[0],
                "score": scores[1]}

    def aggregate(results: list) -> dict:
        yes = sum(r["Correctness"] == "yes" for r in results)
        no = sum(r["Correctness"] == "no" for r in results)
        total = sum(r["score"] for r in results)
        return {"accuracy": 100.0 * yes / max(yes + no, 1),
                "average_score": total / max(len(results), 1)}

    task = BenchmarkTask(name="ActivityNet-QA",
                         doc_to_text=activitynetqa_doc_to_text,
                         process_response=process, aggregate=aggregate,
                         video_path_keys=("video_path", "video_name"))
    return task


class _ActivityNetTask(BenchmarkTask):
    """BenchmarkTask with the reference's v_{name}.{mp4,webm,mkv} resolution."""

    def resolve_video(self, doc, video_root: str = "") -> str:
        if doc.get("video_path"):
            return os.path.join(video_root, str(doc["video_path"]))
        return _resolve_video(doc, video_root)


def register_activitynetqa(judge: JudgeProvider | None = None) -> BenchmarkTask:
    base = make_activitynetqa_task(judge)
    task = _ActivityNetTask(**{f.name: getattr(base, f.name)
                               for f in base.__dataclass_fields__.values()})
    TASK_REGISTRY["ActivityNet-QA"] = task
    return task
