"""Subtitle variants: SRT parsing + VideoMME subtitle prompt + LVB
interleave, byte-compared against the reference functions where they are
pure (no filesystem resolution)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tspo_tpu.eval.subtitles import (compute_frame_timestamps,
                                     insert_subtitles_into_frames, load_srt,
                                     lvb_doc_to_text_interleaved,
                                     parse_subtitle_time,
                                     videomme_doc_to_text_subtitle,
                                     videomme_subtitles_for_frames)

SRT = """1
00:00:01,000 --> 00:00:04,000
<font color="white" size=".72c">hello world</font>

2
00:00:10,500 --> 00:00:12,000
<font color="white" size=".72c">second line</font>

3
00:01:40,000 --> 00:01:45,250
<font color="white" size=".72c">late line</font>
"""

SUBS_LVB = [
    {"start": "0:00:01.0", "end": "0:00:03.0", "line": "alpha"},
    {"start": "0:00:08.0", "end": "0:00:09.5", "line": "beta"},
    {"start": "0:00:20.0", "end": "0:00:29.0", "line": "gamma"},
]


def test_parse_and_load_srt(tmp_path):
    assert parse_subtitle_time("00:01:40,250") == 100.25
    p = tmp_path / "s.srt"
    p.write_text(SRT)
    subs = load_srt(str(p))
    assert (1.0, 4.0) in subs and "hello world" in subs[(1.0, 4.0)]
    assert len(subs) == 3


def test_videomme_subtitle_prompt(tmp_path):
    cv2 = pytest.importorskip("cv2")
    vid = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                        (32, 32))
    for i in range(1100):  # 110 s at 10 fps: covers the "late line" cue
        w.write(np.full((32, 32, 3), i % 255, np.uint8))
    w.release()
    srt = tmp_path / "v.srt"
    srt.write_text(SRT)
    doc = {"question": "Q?", "options": ["A. x", "B. y"]}
    text = videomme_subtitles_for_frames(str(vid), str(srt), frame_num=64)
    assert "hello world" in text and "late line" in text
    prompt = videomme_doc_to_text_subtitle(
        doc, {"video_path": str(vid), "subtitle_path": str(srt),
              "frame_num": 64})
    assert prompt.startswith("This video's subtitles are listed below: \n")
    assert prompt.endswith("Q?\nA. x\nB. y\nThe best answer is:")
    assert "hello world" in prompt

    # missing subtitle file -> "No subtitles available"
    p2 = videomme_doc_to_text_subtitle(doc, {"video_path": str(vid),
                                             "subtitle_path": "/nope.srt"})
    assert "No subtitles available" in p2


def _load_ref_lvb_utils():
    path = "/root/reference/lmms-eval/lmms_eval/tasks/longvideobench/utils.py"
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    stubs = {}
    for name in ("decord", "loguru", "lmms_eval", "lmms_eval.tasks",
                 "lmms_eval.tasks._task_utils",
                 "lmms_eval.tasks._task_utils.file_utils"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "decord":
                mod.VideoReader, mod.cpu = object, object
            if name == "loguru":
                import logging
                mod.logger = logging.getLogger("stub")
            if name.endswith("file_utils"):
                mod.generate_submission_file = lambda *a, **k: "/dev/null"
            stubs[name] = mod
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location("ref_lvb_utils", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"cannot import reference utils: {e}")
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
    return mod


def test_lvb_interleave_matches_reference():
    ref = _load_ref_lvb_utils()
    for duration, max_frames, start_off in ((30.0, 16, 0.0), (12.0, 16, 0.0),
                                            (100.0, 8, 2.0)):
        ts = compute_frame_timestamps(duration, max_frames)
        assert ts == ref.compute_frame_timestamps(duration, max_frames)
        ours = insert_subtitles_into_frames(ts, SUBS_LVB, start_off, duration)
        theirs = ref.insert_subtitles_into_frames(ts, SUBS_LVB, start_off,
                                                  duration)
        assert ours == theirs

    # dict-timestamp form too
    subs2 = [{"timestamp": (1.0, 3.0), "text": "alpha"},
             {"timestamp": (5.0, None), "text": "tail"}]
    ts = compute_frame_timestamps(20.0, 16)
    assert insert_subtitles_into_frames(ts, subs2, 0.0, 20.0) == \
        ref.insert_subtitles_into_frames(ts, subs2, 0.0, 20.0)


def test_lvb_interleaved_prompt(tmp_path):
    import json
    sp = tmp_path / "subs.json"
    sp.write_text(json.dumps(SUBS_LVB))
    doc = {"question": "Q?", "candidates": ["x", "y"], "duration": 30.0,
           "starting_timestamp_for_subtitles": 0.0}
    out = lvb_doc_to_text_interleaved(doc, {"subtitle_path": str(sp),
                                            "max_num_frames": 16})
    assert "<image>" in out and "alpha" in out
    assert out.endswith("Q?\nA. x\nB. y\n"
                        "Answer with the option's letter from the given "
                        "choices directly.\n")


def test_subtitle_task_cli_end_to_end(tmp_path):
    """VideoMME-subtitles through the evaluate CLI with a stub backbone."""
    import json
    import subprocess
    import sys
    cv2 = pytest.importorskip("cv2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    (tmp_path / "videos").mkdir()
    (tmp_path / "subs").mkdir()
    w = cv2.VideoWriter(str(tmp_path / "videos" / "v0.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (32, 32))
    for i in range(200):
        w.write(np.full((32, 32, 3), i % 255, np.uint8))
    w.release()
    (tmp_path / "subs" / "v0.mp4.srt").write_text(SRT)
    docs = [{"question_id": "q0", "question": "Q?",
             "options": ["A. x", "B. y"], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": "v0.mp4",
             "frame_idx": [0.0, 3.0, 6.0, 9.0]}]
    (tmp_path / "docs.json").write_text(json.dumps(docs))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "tspo_tpu.cli.evaluate",
         "--task", "VideoMME-subtitles",
         "--frame-idx-json", str(tmp_path / "docs.json"),
         "--video-root", str(tmp_path / "videos"),
         "--subtitle-root", str(tmp_path / "subs"),
         "--backbone", "stub", "--max-frames-num", "4",
         "--output", str(tmp_path / "res")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=240)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "overall | 100.00" in proc.stdout
    samples = [json.loads(l) for l in open(
        next((tmp_path / "res").glob("*_samples.jsonl")))]
    assert samples[0]["pred_answer"] == "A"
