"""Judge-graded tasks through the eval harness (C35 integration): an
open-ended task whose responses are graded by an LLM judge instead of letter
parsing, end to end with real video decode + stub backbone."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tspo_tpu.eval.harness import evaluate_task
from tspo_tpu.eval.llm_judge import JudgeConfig, JudgeProvider
from tspo_tpu.eval.tasks import TASK_REGISTRY, make_judged_task, register_judged_task


class SemanticStubJudge(JudgeProvider):
    """Grades 1 iff the gold answer appears in the prediction text."""

    def __init__(self):
        super().__init__(JudgeConfig(model_name="stub"))
        self.prompts = []

    def complete(self, messages):
        self.prompts.append(messages[-1]["content"])
        prompt = messages[-1]["content"]
        # prompt embeds answer + prediction blocks; crude containment check
        answer = prompt.split("Ground Truth Answer:\n```\n")[1].split("\n```")[0]
        pred = prompt.split("Model Prediction:\n```\n")[1].split("\n```")[0]
        return "1" if answer.lower() in pred.lower() else "0"


class FreeformBackbone:
    def generate(self, frames, prompt):
        return ("the man opens a blue door" if "door" in prompt
                else "something else entirely")


@pytest.fixture()
def video_dir(tmp_path):
    d = tmp_path / "videos"
    d.mkdir()
    w = cv2.VideoWriter(str(d / "v0.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
                        2.0, (48, 48))
    for j in range(60):
        w.write(np.full((48, 48, 3), j * 4 % 255, np.uint8))
    w.release()
    return d


def test_judged_task_through_harness(video_dir):
    judge = SemanticStubJudge()
    register_judged_task("OpenEnded-test", judge)
    try:
        docs = [
            {"question_id": "q0", "question": "What happens at the door?",
             "answer": "blue door", "video_path": "v0.mp4"},
            {"question_id": "q1", "question": "Describe the weather.",
             "answer": "raining", "video_path": "v0.mp4"},
        ]
        res = evaluate_task("OpenEnded-test", docs, FreeformBackbone(),
                            video_root=str(video_dir), max_frames_num=4,
                            on_error="raise")
        assert [r["judge_score"] for r in res.results] == [1, 0]
        assert res.metrics == {"overall": 50.0, "judge_failures": 0}
        # the judge saw the reference binary-judge prompt skeleton
        assert "strict evaluator" in judge.prompts[0]
    finally:
        TASK_REGISTRY.pop("OpenEnded-test", None)


def test_judged_task_specific_kwargs_prompting():
    task = make_judged_task("t", SemanticStubJudge())
    doc = {"question": "Q?", "answer": "a"}
    assert task.doc_to_text(doc) == "Q?"
    assert task.doc_to_text(doc, {"pre_prompt": "<", "post_prompt": ">"}) == "<Q?>"


def test_judge_failure_counted_not_dropped():
    class BrokenJudge(JudgeProvider):
        def __init__(self):
            super().__init__(JudgeConfig(num_retries=1, retry_delay=0.0))

        def complete(self, messages):
            raise ConnectionError("judge down")

    task = make_judged_task("t", BrokenJudge())
    rec = task.process_response({"question": "Q", "answer": "a"}, "pred")
    assert rec["judge_score"] == 0 and rec["judge_success"] is False
    assert task.aggregate([rec]) == {"overall": 0.0, "judge_failures": 1}
