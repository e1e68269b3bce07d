"""WandbLogger offline fallback (reference loggers/wandb_logger.py surface):
payload structure, replay format, CLI kwargs parsing."""

import json

from tspo_tpu.utils.wandb_logger import WandbLogger, parse_wandb_args


def _read(path):
    return [json.loads(line) for line in open(path)]


def test_parse_wandb_args():
    assert parse_wandb_args("project=tspo,job_type=eval,name=r1") == {
        "project": "tspo", "job_type": "eval", "name": "r1"}
    assert parse_wandb_args("") == {}


def test_offline_scalar_stream(tmp_path):
    wb = WandbLogger(output_dir=str(tmp_path), project="p")
    wb.log({"loss": 0.5, "reward": 1.0}, step=1)
    wb.log({"loss": 0.25}, step=2)
    wb.finish()
    events = _read(tmp_path / "wandb_offline.jsonl")
    kinds = [e["kind"] for e in events]
    assert kinds == ["init", "log", "log", "finish"]
    assert events[0]["payload"] == {"project": "p"}
    assert events[1]["payload"] == {"step": 1, "loss": 0.5, "reward": 1.0}


def test_offline_eval_results_and_samples(tmp_path):
    wb = WandbLogger(output_dir=str(tmp_path))
    wb.post_init({"VideoMME": {"overall": 63.9, "short": 70.0,
                               "categories": {"d": 63.9}}})
    wb.log_eval_result()
    wb.log_eval_samples({"VideoMME": [{"doc_id": "q0", "pred_answer": "A"}]})
    events = _read(tmp_path / "wandb_offline.jsonl")
    res = next(e for e in events if e["kind"] == "eval_result")
    # only numeric leaves go to the flat summary
    assert res["payload"]["summary"] == {"VideoMME/overall": 63.9,
                                         "VideoMME/short": 70.0}
    samp = next(e for e in events if e["kind"] == "eval_samples")
    assert samp["payload"]["rows"][0]["doc_id"] == "q0"


def test_log_samples_disabled(tmp_path):
    wb = WandbLogger(output_dir=str(tmp_path), log_samples=False)
    wb.log_eval_samples({"T": [{"a": 1}]})
    assert all(e["kind"] != "eval_samples"
               for e in _read(tmp_path / "wandb_offline.jsonl"))
