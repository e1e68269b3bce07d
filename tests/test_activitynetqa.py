"""ActivityNet-QA judged task: reference prompt fidelity, review parsing,
aggregation, and end-to-end through the harness with a stub judge."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tspo_tpu.eval.harness import evaluate_task
from tspo_tpu.eval.llm_judge import JudgeConfig, JudgeProvider
from tspo_tpu.eval.tasks import TASK_REGISTRY
from tspo_tpu.eval.tasks_activitynet import (
    JUDGE_SYSTEM_PROMPT,
    activitynetqa_doc_to_text,
    judge_user_prompt,
    make_activitynetqa_task,
    parse_review,
    register_activitynetqa,
)


def test_doc_to_text_capitalize_and_question_mark():
    doc = {"question": "what is the man doing"}
    assert activitynetqa_doc_to_text(doc) == "What is the man doing?"
    assert activitynetqa_doc_to_text(
        doc, {"pre_prompt": "<", "post_prompt": ">"}) == "<What is the man doing?>"


def test_judge_prompt_matches_reference_text():
    p = judge_user_prompt("Q", "gold", "guess")
    # anchors from utils.py:108-117, byte-equivalent fragments
    assert p.startswith("Please evaluate the following video-based "
                        "question-answer pair:\n\n")
    assert "Question: Q\nCorrect Answer: gold\nPredicted Answer: guess\n\n" in p
    assert "integer value between 0 and 5" in p
    assert p.endswith("{'pred': 'yes', 'score': 4.8}.")
    assert "Focus on the meaningful match" in JUDGE_SYSTEM_PROMPT


def test_parse_review():
    assert parse_review("{'pred': 'yes', 'score': 4}") == ["yes", 4]
    # the reference's own example reply: float score truncates via int()
    assert parse_review("noise {'pred': 'Yes!', 'score': 4.8} tail") == ["yes", 4]
    assert parse_review("{'pred': 'No', 'score': 0}") == ["no", 0]
    assert parse_review("not a dict") is None


class StubJudge(JudgeProvider):
    def __init__(self):
        super().__init__(JudgeConfig(model_name="stub", num_retries=1,
                                     retry_delay=0.0))
        self.seen = []

    def complete(self, messages):
        self.seen.append(messages)
        pred = messages[-1]["content"].split("Predicted Answer: ")[1].split("\n")[0]
        good = "blue" in pred
        return ("{'pred': '%s', 'score': %d}" % ("yes" if good else "no",
                                                 5 if good else 1))


def test_aggregation_accuracy_and_score():
    task = make_activitynetqa_task(StubJudge())
    recs = [task.process_response({"question": "q", "answer": "a",
                                   "video_name": "v", "question_id": i,
                                   "type": "3"}, resp)
            for i, resp in enumerate(["blue door", "red door"])]
    assert [r["Correctness"] for r in recs] == ["yes", "no"]
    agg = task.aggregate(recs)
    assert agg == {"accuracy": 50.0, "average_score": 3.0}


def test_judge_failure_defaults_no_zero():
    class DownJudge(JudgeProvider):
        def __init__(self):
            super().__init__(JudgeConfig(num_retries=1, retry_delay=0.0))

        def complete(self, messages):
            raise ConnectionError("down")

    task = make_activitynetqa_task(DownJudge())
    rec = task.process_response({"question": "q", "answer": "a",
                                 "video_name": "v"}, "resp")
    assert rec["Correctness"] == "no" and rec["score"] == 0


def test_end_to_end_with_video_name_resolution(tmp_path):
    d = tmp_path / "videos"
    d.mkdir()
    w = cv2.VideoWriter(str(d / "v_abc.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
                        2.0, (48, 48))
    for j in range(40):
        w.write(np.full((48, 48, 3), 30, np.uint8))
    w.release()

    class BlueBackbone:
        def generate(self, frames, prompt):
            return "the blue thing"

    judge = StubJudge()
    register_activitynetqa(judge)
    try:
        docs = [{"question_id": "q0", "question": "what color is it",
                 "answer": "blue", "video_name": "abc", "type": "4"}]
        res = evaluate_task("ActivityNet-QA", docs, BlueBackbone(),
                            video_root=str(d), max_frames_num=4,
                            on_error="raise")
        assert res.metrics["accuracy"] == 100.0
        # the judge saw the reference system prompt
        assert judge.seen[0][0]["role"] == "system"
        assert judge.seen[0][0]["content"] == JUDGE_SYSTEM_PROMPT
        # and the backbone prompt was the capitalized question
        assert res.samples[0]["pred"] == "the blue thing"
    finally:
        TASK_REGISTRY.pop("ActivityNet-QA", None)
