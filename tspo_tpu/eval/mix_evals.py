"""MixEvals-Video2Text — freeform + multiple-choice video QA, judge-scored.

Reference: lmms-eval/lmms_eval/tasks/mix_evals/video2text/utils.py —
  - prompt: ``query`` + lettered "Here are the options:" block when the doc
    has >1 options (:176-204);
  - freeform answers are scored 0.0-1.0 by an example-laden judge prompt
    whose reply carries ``[[score]]`` (:49-101; an unparseable reply falls
    back to a RANDOM 0-1 score in the reference — here it falls back to 0.0
    with an unparsed count, since a random metric is unreproducible);
  - multiple-choice answers go through an option-EXTRACTOR judge whose
    ``[[letter]]`` pick is compared to the gold index (:300-420, the
    GPTMultiChoiceFilter flow, 0 on any failure like the reference);
  - open-convs is submission-only in the reference (no metric) and is not
    registered here.
Both judge message templates are extracted byte-exact into
mix_evals_prompts.py.
"""

from __future__ import annotations

import ast
import logging
import os
import re

from .llm_judge import JudgeConfig, JudgeProvider, create_provider
from .mix_evals_prompts import (FREEFORM_SYSTEM, FREEFORM_USER_TEMPLATE,
                                MC_SYSTEM, MC_USER_TEMPLATE)
from .tasks import TASK_REGISTRY, BenchmarkTask

logger = logging.getLogger(__name__)


# yaml default kwargs (mix_evals_video2text_{mc,freeform}.yaml) — baked in
# like the other families so the default run matches the reference prompt
MIX_EVALS_DEFAULT_KWARGS = {
    "mc": {"pre_prompt": "These are frames from a video. Please answer the "
                         "following questions about the video.",
           "post_prompt": "Answer with the option's letter from the given "
                          "choices directly."},
    "freeform": {"pre_prompt": "These are frames from a video. Please "
                               "answer the following questions about the "
                               "video.",
                 "post_prompt": ""},
}


def mix_evals_doc_to_text(doc, lmms_eval_specific_kwargs=None,
                          _defaults=None) -> str:
    """utils.py:176-204."""
    kw = {**(_defaults or {}), **(lmms_eval_specific_kwargs or {})}
    user_prompt = doc["query"]
    if "options" in doc and len(doc["options"]) > 1:
        option_prompt = "Here are the options:\n"
        for idx, option in enumerate(doc["options"]):
            option_prompt += f"{chr(ord('A') + idx)}. {option.strip()}\n"
        user_prompt = f"{user_prompt}\n{option_prompt.rstrip(chr(10))}"
    if kw.get("pre_prompt"):
        user_prompt = f"{kw['pre_prompt']}\n{user_prompt}"
    if kw.get("post_prompt"):
        user_prompt = f"{user_prompt}\n{kw['post_prompt']}"
    return user_prompt


_SCORE = re.compile(r"\[\[(\d+\.?\d*)\]\]")
_SCORE_BACKUP = re.compile(r"\[(\d+\.?\d*)\]")


def parse_judge_score(judge_response: str):
    """utils.py:84-101 sans the random fallback: None when unparseable."""
    m = _SCORE.search(judge_response) or _SCORE_BACKUP.search(judge_response)
    return float(ast.literal_eval(m.groups()[0])) if m else None


def _default_judge() -> JudgeProvider:
    # MAX_NEW_TOKENS=999 (utils.py:33) for both judge payloads
    return create_provider(config=JudgeConfig(
        model_name=os.environ.get("MODEL_VERSION", "gpt-3.5-turbo-0125"),
        max_tokens=999))


def make_mix_evals_task(flavor: str,
                        judge: JudgeProvider | None = None) -> BenchmarkTask:
    if flavor not in ("freeform", "mc"):
        raise ValueError(f"unknown MixEvals flavor: {flavor}")
    if judge is None:
        judge = _default_judge()

    if flavor == "freeform":
        def process(doc, response, rng=None) -> dict:
            gts = doc["reference_answer"]
            gold = "[" + ", ".join(f'"{g}"' for g in gts) + "]"
            res = judge._complete_with_retry(
                FREEFORM_USER_TEMPLATE.format(
                    prompt=doc["query"], gold_ans=gold, response=response),
                system_prompt=FREEFORM_SYSTEM)
            score = parse_judge_score(res.content.strip()) \
                if res.success else None
            return {"question_idx": doc.get("id"), "pred": response,
                    "target": gts, "eval_answer": res.content,
                    "score": score if score is not None else 0.0,
                    "unparsed": score is None}

        def aggregate(results: list) -> dict:
            n = max(len(results), 1)
            return {"gpt_eval": sum(r["score"] for r in results) / n,
                    "unparsed_judgments": sum(r["unparsed"]
                                              for r in results)}
    else:                                  # multiple-choice
        def process(doc, response, rng=None) -> dict:
            options = "\n".join(f"{chr(ord('A') + i)}. {o}"
                                for i, o in enumerate(doc["options"]))
            res = judge._complete_with_retry(
                MC_USER_TEMPLATE.format(prompt=doc["query"], options=options,
                                        response=response),
                system_prompt=MC_SYSTEM)
            idx = 0                         # reference default on any failure
            if res.success and res.content:
                m = re.search(r"\[\[([A-Z])\]\]", res.content)
                if m:
                    idx = ord(m.group(1)) - ord("A")
            # gold index lives in ``reference_answer`` (doc_to_target
            # "{{reference_answer}}" in the mc yaml)
            for key in ("reference_answer", "answer_index", "answer"):
                if key in doc:
                    gold = int(doc[key])
                    break
            else:
                raise KeyError("mc doc carries no reference_answer")
            return {"question_idx": doc.get("id"), "pred": response,
                    "pred_answer": idx, "answer": gold,
                    "correct": int(idx == gold)}

        def aggregate(results: list) -> dict:
            return {"overall": 100.0 * sum(r["correct"] for r in results)
                    / max(len(results), 1)}

    import functools
    doc_to_text = functools.partial(
        mix_evals_doc_to_text, _defaults=MIX_EVALS_DEFAULT_KWARGS[flavor])
    return _MixEvalsTask(
        name=f"MixEvals-Video2Text-{flavor}", doc_to_text=doc_to_text,
        process_response=process, aggregate=aggregate,
        video_path_keys=("video_path", "video"))


class _MixEvalsTask(BenchmarkTask):
    """MixEval-X docs carry their media in ``input_file`` (a LIST of paths,
    utils.py:149) — the first entry resolves."""

    def resolve_video(self, doc, video_root: str = "") -> str:
        if doc.get("input_file") and not doc.get("video_path") \
                and not doc.get("video"):
            files = doc["input_file"]
            name = files[0] if isinstance(files, list) else files
            return os.path.join(video_root, str(name))
        return super().resolve_video(doc, video_root)


def register_mix_evals(judge: JudgeProvider | None = None) -> None:
    for flavor in ("freeform", "mc"):
        task = make_mix_evals_task(flavor, judge)
        TASK_REGISTRY[task.name] = task
