"""Tests for metrics introspection, stage timers, response cache, multihost
helpers (single-process paths)."""

import json
import os

import numpy as np

from tspo_tpu.eval.caching import ResponseCache
from tspo_tpu.parallel.multihost import gather_host_objects, process_shard
from tspo_tpu.utils.metrics import ema, plot_rewards, read_metrics, series
from tspo_tpu.utils.profiling import StageTimer


def test_metrics_round_trip(tmp_path):
    path = tmp_path / "metrics.jsonl"
    with open(path, "w") as f:
        for i in range(20):
            f.write(json.dumps({"step": i, "rewards/accuracy_reward": i / 20,
                                "loss": 1.0 - i / 40}) + "\n")
    metrics = read_metrics(str(path))
    steps, vals = series(metrics, "rewards/accuracy_reward")
    assert len(steps) == 20
    smoothed = ema(vals, 0.9)
    assert smoothed.shape == vals.shape
    assert smoothed[-1] < vals[-1]  # lags a rising series
    out = plot_rewards(str(path), str(tmp_path / "r.png"),
                       keys=("rewards/accuracy_reward",))
    assert os.path.exists(out)


def test_stage_timer():
    t = StageTimer()
    with t.stage("decode"):
        pass
    with t.stage("decode"):
        pass
    with t.stage("encode"):
        pass
    s = t.summary()
    assert s["decode"]["count"] == 2
    assert s["encode"]["count"] == 1
    assert s["decode"]["total_s"] >= 0


def test_response_cache(tmp_path):
    c = ResponseCache(str(tmp_path), "VideoMME", rank=0, world=2)
    assert c.get("q1") is None
    c.put("q1", "A")
    c.put("q2", "B")
    c.close()
    c2 = ResponseCache(str(tmp_path), "VideoMME", rank=0, world=2)
    assert c2.get("q1") == "A" and len(c2) == 2
    c2.delete()
    assert not os.path.exists(c2.path)


def test_response_cache_in_harness(tmp_path):
    from tspo_tpu.eval.harness import evaluate_task

    calls = []

    class Backbone:
        def generate(self, frames, prompt):
            calls.append(1)
            return "A"

    docs = [{"question_id": "q0", "question": "?", "options": [], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": "missing.mp4"}]
    cache = ResponseCache(str(tmp_path), "VideoMME")
    cache.put("q0", "The answer is A")
    res = evaluate_task("VideoMME", docs, Backbone(), video_root=str(tmp_path),
                        max_frames_num=4, response_cache=cache)
    assert calls == []  # served from cache, video never opened
    assert res.results[0]["pred_answer"] == "A"


def test_multihost_single_process():
    rank, world = process_shard()
    assert (rank, world) == (0, 1)
    assert gather_host_objects({"x": 1}) == [{"x": 1}]
