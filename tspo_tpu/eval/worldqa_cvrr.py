"""WorldQA (generation + MC + mc_ppl) and CVRR benchmark tasks.

Reference sources:
  - lmms-eval/lmms_eval/tasks/worldqa/utils.py — generation answers are
    graded by a keypoint-scoring judge prompt whose reply's LAST line is the
    point value 1/0.5/0.3/0 (:47-68, :206-219); MC answers go through the
    VLMEvalKit-style ``can_infer_option`` matcher and, on miss, an
    option-matching judge whose output letter is compared to the gold letter
    (worldqa_mc_evaluator.py:22-130); mc_ppl ranks option texts
    (utils.py:233-234).
  - lmms-eval/lmms_eval/tasks/cvrr/utils.py — a correct/incorrect + 0-5
    score judge returning a ``{"pred","score","reason"}`` dict (:107-133,
    :171-188); aggregates mean score and correct-fraction accuracy
    (:223-250).
"""

from __future__ import annotations

import ast
import logging
import os
import string

from .llm_judge import JudgeConfig, JudgeProvider, create_provider
from .tasks import TASK_REGISTRY, BenchmarkTask

logger = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# WorldQA
# ---------------------------------------------------------------------------

# utils.py:47-68 — byte-equivalent
WORLDQA_EVAL_PROMPT = """You are an AI assistant who will help me to evaluate the quality of the candidate responses belonging to a question. The quality of the responses should be referred to the ground truth response.

Some criterion
- Response that perfectly reflect the key points in the ground truth: 1 point
- Response that reflect none of the key points in the ground truth: 0 point
- Some part in the response are correct but other parts in the response are contrast to the ground truth: 0.3 point
- Some part in the response are correct but some parts in the ground truth are not mentioned in the response: 0.5 point
- Some part in the response are correct but other parts in the response are not mentioned in the ground truth: 0.5 point

Your output should be in the following format:
Keypoint in the ground truth response:
XXX
Rationale:
XXXX
Point:
1/0.5/0.3/0

Let's begin this task:
question: {question}
ground truth: {answer}
candidate: {candidate}
"""

# worldqa_mc_evaluator.py:22-41 — byte-equivalent
WORLDQA_MC_MATCH_PROMPT = (
    "You are an AI assistant who will help me to match an answer "
    "with several options of a single-choice question. "
    "You are provided with a question, several options, and an answer, "
    "and you need to find which option is most similar to the answer. "
    "If the meaning of all options are significantly different "
    "from the answer, output E. "
    "Your should output a single uppercase character in A, B, C, D "
    "(if they are valid options), and E. \n"
    "Example 1: \n"
    "Question: What is the main object in image?\nOptions: A. teddy bear "
    "B. rabbit C. cat D. dog\nAnswer: a cute teddy bear\nYour output: A\n"
    "Example 2: \n"
    "Question: What is the main object in image?\nOptions: A. teddy bear "
    "B. rabbit C. cat D. dog\nAnswer: Spider\nYour output: E\n"
    "Example 3: \n"
    "Question: {}?\nOptions: {}\nAnswer: {}\nYour output: "
)


def worldqa_doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
    """utils.py:136-152: options appended when present, NO forced post
    prompt (the letter instruction stays commented out in the reference)."""
    kw = lmms_eval_specific_kwargs or {}
    q = doc["question"]
    if "option" in doc:
        for op in doc["option"]:
            q += "\n" + op
    return f"{kw.get('pre_prompt', '')}{q}{kw.get('post_prompt', '')}"


def can_infer_option(answer: str, num_choice: int = 5):
    """worldqa_mc_evaluator.py:44-70 — whitespace-token letter matcher with
    the "A might be a quantifier" guard and the decorated-token fallbacks."""
    choices = string.ascii_uppercase[:num_choice]
    if "Failed to obtain answer via API" in answer:
        return False

    def count(splits, choices="ABCD", prefix="", suffix=""):
        return sum(prefix + c + suffix in splits for c in choices)

    splits = [x.strip() for x in answer.split()]
    if count(splits, choices) == 1:
        for ch in choices:
            if "A" in splits and len(splits) > 3:
                logger.info("A might be a quantifier in: %s", answer[:120])
                break
            if ch in splits:
                return ch
    tups = [("", "."), ("", ","), ("", ":"), ("", ")"), ("", ")."),
            ("(", ")"), ("(", ")."), (":", ""), (":", ","), (":", "."),
            (":", ")"), (":", ").")]
    for pre, suf in tups:
        if count(splits, choices, prefix=pre, suffix=suf) == 1:
            for ch in choices:
                if pre + ch + suf in splits:
                    return ch
    return False


def parse_worldqa_gen_score(eval_answer: str) -> float:
    """worldq_gen_gpt_eval (utils.py:206-219): last line -> float, 0 on any
    failure."""
    try:
        return float(eval_answer.split("\n")[-1].strip())
    except (ValueError, TypeError, AttributeError):
        return 0.0


def _default_judge() -> JudgeProvider:
    return create_provider(config=JudgeConfig(
        model_name=os.environ.get("MODEL_VERSION", "gpt-4o-2024-11-20"),
        max_tokens=1024))


def make_worldqa_task(flavor: str = "generation",
                      judge: JudgeProvider | None = None) -> BenchmarkTask:
    if judge is None:
        judge = _default_judge()

    if flavor == "generation":
        def process(doc, response, rng=None) -> dict:
            res = judge._complete_with_retry(WORLDQA_EVAL_PROMPT.format(
                question=doc["question"], answer=doc["answer"],
                candidate=response))
            reply = res.content.strip() if res.success else ""
            return {"question_idx": doc.get("question_idx"),
                    "pred": response, "answer": doc.get("answer"),
                    "eval_answer": reply,
                    "score": parse_worldqa_gen_score(reply)}

        def aggregate(results: list) -> dict:
            return {"gpt_eval": sum(r["score"] for r in results)
                    / max(len(results), 1)}

        return BenchmarkTask(name="WorldQA", doc_to_text=worldqa_doc_to_text,
                             process_response=process, aggregate=aggregate,
                             video_path_keys=("video_idx", "video_path"),
                             video_suffix=".mp4")

    # MC: rule-match first; judge matches free-form answers to an option.
    # Judged in process_response (NOT aggregate) so multi-host merges never
    # re-run judge calls and --log-samples records the matched letter.
    def process(doc, response, rng=None) -> dict:
        choice = can_infer_option(response, num_choice=4)
        if not choice:
            res = judge._complete_with_retry(WORLDQA_MC_MATCH_PROMPT.format(
                doc["question"], "\n".join(doc["option"]), response))
            choice = res.content.strip() if res.success else ""
        gold = doc["answer"].split(".")[0]
        return {"question_idx": doc.get("question_idx"), "pred": response,
                "answer": doc["answer"], "option": doc["option"],
                "question": doc["question"], "matched_choice": str(choice),
                "correct": int(str(choice).lower().strip()
                               == gold.lower().strip())}

    def aggregate(results: list) -> dict:
        """worldqa_aggregate_mc_eval (worldqa_mc_evaluator.py:110-130)."""
        return {"overall": 100.0 * sum(r["correct"] for r in results)
                / max(len(results), 1)}

    def doc_to_choices(doc):
        # worldqa_doc_to_choice (utils.py:233-234)
        return [op.split(".")[1].strip() for op in doc["option"]]

    return BenchmarkTask(
        name=f"WorldQA-{flavor}", doc_to_text=worldqa_doc_to_text,
        process_response=process, aggregate=aggregate,
        video_path_keys=("video_idx", "video_path"), video_suffix=".mp4",
        doc_to_choices=doc_to_choices,
        output_type="loglikelihood" if flavor == "mc_ppl" else
        "generate_until", ll_length_normalize=(flavor == "mc_ppl"))


# ---------------------------------------------------------------------------
# CVRR
# ---------------------------------------------------------------------------

CVRR_SYSTEM_PROMPT = (
    "You are an intelligent chatbot designed for evaluating the correctness "
    "of AI assistant predictions for question-answer pairs. "
    "Your task is to compare the predicted answer with the ground-truth "
    "answer and determine if the predicted answer is correct or not. Here's "
    "how you can accomplish the task:"
    "------"
    "##INSTRUCTIONS: "
    "- Focus on the correctness and accuracy of the predicted answer with "
    "the ground-truth.\n"
    "- Consider predictions with less specific details as correct "
    "evaluation, unless such details are explicitly asked in the "
    "question.\n")


def cvrr_user_prompt(question: str, answer: str, pred: str) -> str:
    """cvrr/utils.py:122-133 — byte-equivalent."""
    return (
        "Please evaluate the following video-based question-answer pair:\n\n"
        f"Question: {question}\n"
        f"Ground truth correct Answer: {answer}\n"
        f"Predicted Answer: {pred}\n\n"
        "Provide your evaluation as a correct/incorrect prediction along "
        "with the score where the score is an integer value between 0 "
        "(fully wrong) and 5 (fully correct). The middle score provides the "
        "percentage of correctness."
        "Please generate the response in the form of a Python dictionary "
        "string with keys 'pred', 'score' and 'reason', where value of "
        "'pred' is  a string of 'correct' or 'incorrect', value of 'score' "
        "is in INTEGER, not STRING and value of 'reason' should provide the "
        "reason behind the decision."
        "Only provide the Python dictionary string."
        'For example, your response should look like this: {"pred": '
        '"correct", "score": 4.8, "reason": reason}.')


def parse_cvrr_review(review: str):
    """cvrr/utils.py:171-188: ('correct'|'incorrect', int score, reason)."""
    try:
        d = ast.literal_eval(review)
        return (d.get("pred", "incorrect"), int(d.get("score", 0)),
                d.get("reason", ""))
    except Exception as e:  # noqa: BLE001
        logger.error("error parsing review %r: %s", review[:200], e)
        return "incorrect", 0, ""


def make_cvrr_task(judge: JudgeProvider | None = None) -> BenchmarkTask:
    if judge is None:
        judge = _default_judge()

    def process(doc, response, rng=None) -> dict:
        res = judge._complete_with_retry(
            cvrr_user_prompt(doc["Q"], doc["A"], response),
            system_prompt=CVRR_SYSTEM_PROMPT)
        correctness, score, reason = parse_cvrr_review(
            res.content.strip()) if res.success else ("incorrect", 0, "")
        return {"VideoID": doc.get("VideoID"), "Q": doc.get("Q"),
                "A": doc.get("A"), "pred": response,
                "DimensionName": doc.get("DimensionName"),
                "correctness": correctness, "score": score, "reason": reason}

    def aggregate(results: list) -> dict:
        n = max(len(results), 1)
        out = {"average_score": sum(r["score"] for r in results) / n,
               "accuracy": 100.0 * sum(r["correctness"] == "correct"
                                       for r in results) / n}
        dims: dict = {}
        for r in results:
            if r.get("DimensionName"):
                dims.setdefault(r["DimensionName"], []).append(r)
        if dims:
            out["dimensions"] = {
                d: 100.0 * sum(r["correctness"] == "correct" for r in rows)
                / len(rows) for d, rows in sorted(dims.items())}
        return out

    def doc_to_text(doc, lmms_eval_specific_kwargs=None) -> str:
        kw = lmms_eval_specific_kwargs or {}
        return f"{kw.get('pre_prompt', '')}{doc['Q']}{kw.get('post_prompt', '')}"

    return BenchmarkTask(name="CVRR", doc_to_text=doc_to_text,
                         process_response=process, aggregate=aggregate,
                         video_path_keys=("VideoID", "video_path"),
                         video_suffix=".mp4")


def register_worldqa_cvrr(judge: JudgeProvider | None = None) -> None:
    for flavor in ("generation", "mc", "mc_ppl"):
        task = make_worldqa_task(flavor, judge)
        TASK_REGISTRY[task.name if flavor != "generation" else "WorldQA"] = task
    TASK_REGISTRY["CVRR"] = make_cvrr_task(judge)
