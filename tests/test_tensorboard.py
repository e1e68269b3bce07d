"""TensorBoard event-file writer: byte-level validity proven by parsing our
files with the OFFICIAL tensorboard event_accumulator (the same library the
reference's scripts/read_tensorboard.py uses, C11/C33)."""

import json

import numpy as np
import pytest

from tspo_tpu.utils.tensorboard import (TensorBoardWriter, crc32c,
                                        masked_crc,
                                        metrics_jsonl_to_tensorboard,
                                        read_scalars)


def test_crc32c_known_vectors():
    # RFC 3720 iSCSI test vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert masked_crc(b"x") != crc32c(b"x")


def test_write_and_read_back_ourselves(tmp_path):
    with TensorBoardWriter(str(tmp_path)) as tb:
        for step in range(5):
            tb.add_scalar("train/reward", step * 0.5, step)
            tb.add_scalar("train/loss", 1.0 / (step + 1), step)
        path = tb.path
    scalars = read_scalars(path)
    assert [s for s, _ in scalars["train/reward"]] == list(range(5))
    assert np.allclose([v for _, v in scalars["train/loss"]],
                       [1.0 / (s + 1) for s in range(5)])


def test_official_tensorboard_parses_our_files(tmp_path):
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")
    with TensorBoardWriter(str(tmp_path)) as tb:
        tb.add_scalar("train/rewards/accuracy_reward", 0.75, 3)
        tb.add_scalar("train/rewards/accuracy_reward", 0.875, 4)
    ea = ea_mod.EventAccumulator(str(tmp_path))
    ea.Reload()
    events = ea.Scalars("train/rewards/accuracy_reward")
    assert [(e.step, round(e.value, 4)) for e in events] == \
        [(3, 0.75), (4, 0.875)]


def test_metrics_jsonl_conversion(tmp_path):
    mpath = tmp_path / "metrics.jsonl"
    with open(mpath, "w") as f:
        for step in range(3):
            f.write(json.dumps({"step": step, "reward": float(step),
                                "rewards/accuracy_reward": 0.5,
                                "type": "general"}) + "\n")
    out = metrics_jsonl_to_tensorboard(str(mpath), str(tmp_path / "tb"))
    scalars = read_scalars(out)
    assert len(scalars["train/reward"]) == 3
    assert "train/rewards/accuracy_reward" in scalars
    assert "train/type" not in scalars  # non-numeric fields skipped


def test_long_tag_round_trip(tmp_path):
    """Tags >= 128 bytes: the tag-string length is a protobuf varint, not a
    single raw byte (review finding r3) — a long reward name written by our
    own writer must read back intact."""
    tag = "train/rewards/" + "x" * 140
    with TensorBoardWriter(str(tmp_path)) as tb:
        tb.add_scalar(tag, 0.25, 3)
        tb.add_scalar("short", 0.5, 4)
        path = tb.path
    scalars = read_scalars(path)
    assert scalars[tag] == [(3, 0.25)]
    assert scalars["short"] == [(4, 0.5)]
