"""WorldSense + AV-Odyssey: prompt bytes, parser, scoring, and aggregation
parity vs the reference lmms-eval task functions
(worldsense/utils.py, av_odyssey/utils.py), dynamically imported.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tspo_tpu.eval.av_odyssey import (aggregate_av_odyssey,
                                      av_odyssey_doc_to_text,
                                      av_odyssey_process, doc_to_media,
                                      split_media_tags)
from tspo_tpu.eval.tasks import get_task
from tspo_tpu.eval.worldsense import (aggregate_worldsense,
                                      parse_multi_choice_response,
                                      worldsense_doc_to_text,
                                      worldsense_doc_to_text_subtitle,
                                      worldsense_process)

REF_TASKS = "/root/reference/lmms-eval/lmms_eval/tasks"

WS_DOC = {
    "index": "ws_001",
    "question": "What instrument is playing?",
    "candidates": ["A. Piano", "B. Violin", "C. Drums", "D. Guitar"],
    "answer": "B",
    "task_type": "Audio Recognition",
    "task_domain": "Music",
    "duration": "60s~5min",
    "audio_class": ["music", "speech"],
    "video_path": "videos/ws_001.mp4",
    "subtitle_path": "subtitles/ws_001.srt",
}

AVO_DOC = {
    "question_id": "avo_7",
    "question": "Listen to [audio1] and watch [video1]. Which mood matches?",
    "options": ["A. Joyful", "B. Somber", "C. Tense", "D. Calm"],
    "answer": "C",
    "subfield": "Timbre",
    "data_type": "video",
    "video_path": ["v/clip7.mp4"],
    "image_path": [],
    "audio_path": ["a/clip7.wav"],
}


def _load_ref(relpath: str, hf_home: str = "/tmp"):
    path = os.path.join(REF_TASKS, relpath)
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    mods = {}
    base = [("loguru", {"logger": __import__("logging").getLogger("stub")}),
            ("decord", {"VideoReader": object, "cpu": object}),
            ("lmms_eval", {}), ("lmms_eval.tasks", {}),
            ("lmms_eval.tasks._task_utils", {}),
            ("lmms_eval.tasks._task_utils.file_utils",
             {"generate_submission_file": lambda *a, **k: "/dev/null"})]
    for name, attrs in base:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            mods[name] = m
    sys.modules.update(mods)
    old_hf = os.environ.get("HF_HOME")
    os.environ["HF_HOME"] = hf_home
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_" + relpath.replace("/", "_").replace(".py", ""), path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        os.environ.pop("HF_HOME", None)
        if old_hf is not None:
            os.environ["HF_HOME"] = old_hf
        for name in mods:
            sys.modules.pop(name, None)


# ---------------------------------------------------------------------------
# WorldSense
# ---------------------------------------------------------------------------

def test_worldsense_doc_to_text_bytes():
    ref = _load_ref("worldsense/utils.py")
    assert worldsense_doc_to_text(WS_DOC) == ref.worldsense_doc_to_text(WS_DOC)
    doc3 = {**WS_DOC, "candidates": WS_DOC["candidates"][:3]}
    assert worldsense_doc_to_text(doc3) == ref.worldsense_doc_to_text(doc3)


PARSER_CASES = [
    "B",
    "(C)",
    "The answer is (B).",
    "I think it is A because the piano is visible",
    "b",  # lowercase letter: no candidate, short -> "A" fallback
    "",
    "After hearing the music it is clearly a violin being played there",
    "Both A and C could be right, but mostly (C)",
    "A B C D",
    "  D.  ",
    "The mood is somber overall in my view honestly",
]


def test_worldsense_parser_matches_reference():
    ref = _load_ref("worldsense/utils.py")
    index2ans = {"A": "Piano", "B": "Violin", "C": "Drums", "D": "Guitar"}
    for resp in PARSER_CASES:
        assert parse_multi_choice_response(resp, ["A", "B", "C", "D"],
                                           dict(index2ans)) == \
            ref.parse_multi_choice_response(resp, ["A", "B", "C", "D"],
                                            dict(index2ans)), resp


def test_worldsense_process_and_aggregate_match_reference():
    ref = _load_ref("worldsense/utils.py")
    docs = []
    for i, (resp, cat, dom, dur, aud, ans) in enumerate([
            ("B", "Audio Recognition", "Music", "60s~5min", ["music"], "B"),
            ("(A)", "Event Recognition", "Sports", "<60s", ["speech"], "C"),
            ("The violin, option (B)", "Audio Recognition", "Music",
             "60s~5min", ["music", "speech"], "B"),
            ("no idea", "Hallucination", "Games", ">5min", [], "D")]):
        docs.append(({**WS_DOC, "index": f"q{i}", "task_type": cat,
                      "task_domain": dom, "duration": dur,
                      "audio_class": aud, "answer": ans}, resp))
    ours = [worldsense_process(d, r) for d, r in docs]
    theirs = [ref.worldsense_process_results(d, [r])["worldsense_score"]
              for d, r in docs]
    for o, t in zip(ours, theirs):
        assert o["score"] == t["score"]
        assert o["category"] == t["category"]
        assert o["domain"] == t["domain"]
    agg = aggregate_worldsense(ours)
    assert agg["overall"] == pytest.approx(
        ref.worldsense_aggregate_results(theirs))
    # per-category means agree with a hand count
    assert agg["task_categories"]["Audio Recognition"] == pytest.approx(100.0)


def _write_srt(path, entries):
    blocks = []
    for i, (start, end, text) in enumerate(entries):
        blocks.append(f"{i+1}\n{start} --> {end}\n{text}")
    path.write_text("\n\n".join(blocks) + "\n")


def test_worldsense_subtitle_prompt_bytes(tmp_path):
    import cv2
    cache = tmp_path / "WorldSense"
    (cache / "videos").mkdir(parents=True)
    (cache / "subtitles").mkdir(parents=True)
    w = cv2.VideoWriter(str(cache / WS_DOC["video_path"]),
                        cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (32, 32))
    for i in range(100):  # 10 s at 10 fps
        w.write(np.full((32, 32, 3), i % 255, dtype=np.uint8))
    w.release()
    _write_srt(cache / WS_DOC["subtitle_path"],
               [("00:00:00,000", "00:00:03,000", "hello world"),
                ("00:00:04,000", "00:00:07,500", "second line"),
                ("00:00:08,000", "00:00:09,500", "third line")])
    ref = _load_ref("worldsense/utils.py", hf_home=str(tmp_path))
    theirs = ref.worldsense_doc_to_text_subtitle(WS_DOC, {"frame_num": 8})
    ours = worldsense_doc_to_text_subtitle(
        WS_DOC, {"video_root": str(cache), "subtitle_root": str(cache),
                 "frame_num": 8})
    assert ours == theirs


def test_worldsense_subtitle_empty_overlap_byte_parity(tmp_path):
    # file exists but no cue overlaps any sampled frame: the reference
    # formats "" into the template (utils.py:180-185) — byte parity here
    import cv2
    cache = tmp_path / "WorldSense"
    (cache / "videos").mkdir(parents=True)
    (cache / "subtitles").mkdir(parents=True)
    w = cv2.VideoWriter(str(cache / WS_DOC["video_path"]),
                        cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (32, 32))
    for i in range(50):
        w.write(np.zeros((32, 32, 3), dtype=np.uint8))
    w.release()
    # cue far beyond the 5 s video -> no overlap with any sampled frame
    _write_srt(cache / WS_DOC["subtitle_path"],
               [("00:10:00,000", "00:10:05,000", "way past the end")])
    ref = _load_ref("worldsense/utils.py", hf_home=str(tmp_path))
    theirs = ref.worldsense_doc_to_text_subtitle(WS_DOC, {"frame_num": 8})
    ours = worldsense_doc_to_text_subtitle(
        WS_DOC, {"video_root": str(cache), "subtitle_root": str(cache),
                 "frame_num": 8})
    assert ours == theirs
    assert '""' in ours  # the empty-string substitution, not a placeholder


def test_worldsense_overall_dedups_per_category_pair():
    # same question_id under two categories: the reference counts it once
    # per (category, qid) via category2score totals
    base = {"pred_answer": "A", "answer": "A", "domain": "Music",
            "duration": "<60s", "audio_class": []}
    results = [
        {**base, "question_id": "q1", "category": "Event Recognition",
         "score": 1.0},
        {**base, "question_id": "q1", "category": "Hallucination",
         "score": 0.0},
    ]
    agg = aggregate_worldsense(results)
    assert agg["overall"] == pytest.approx(100.0 * (1.0 + 0.0) / 2)


def test_worldsense_subtitle_missing_file_graceful():
    # reference NameErrors here (utils.py:185 dead-intent bug); we emit the
    # intended placeholder
    out = worldsense_doc_to_text_subtitle(WS_DOC, {"frame_num": 8})
    assert "No subtitles available" in out


def test_worldsense_registry():
    task = get_task("WorldSense")
    assert task.resolve_video(WS_DOC, "/root") == "/root/videos/ws_001.mp4"
    assert get_task("WorldSense-subtitles").output_type == "generate_until"


# ---------------------------------------------------------------------------
# AV-Odyssey
# ---------------------------------------------------------------------------

def test_av_odyssey_split_and_text_bytes():
    ref = _load_ref("av_odyssey/utils.py")
    assert split_media_tags(AVO_DOC["question"]) == \
        ref.split_media_tags(AVO_DOC["question"])
    assert split_media_tags("no tags at all") == \
        ref.split_media_tags("no tags at all")
    assert split_media_tags("[img2] leading and trailing [audio10]") == \
        ref.split_media_tags("[img2] leading and trailing [audio10]")
    assert av_odyssey_doc_to_text(AVO_DOC) == \
        ref.av_odyssey_doc_to_text(AVO_DOC)


def test_av_odyssey_media_order(tmp_path):
    cache = tmp_path / "AV_Odyssey"
    for rel in AVO_DOC["video_path"] + AVO_DOC["audio_path"]:
        p = cache / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")
    ref = _load_ref("av_odyssey/utils.py", hf_home=str(tmp_path))
    theirs = ref.av_odyssey_doc_to_visual(AVO_DOC)
    ours = doc_to_media(AVO_DOC, str(cache))
    assert [p for p, _ in ours] == theirs
    assert [t for _, t in ours] == ["audio", "video"]


def test_av_odyssey_process_and_aggregate_match_reference():
    ref = _load_ref("av_odyssey/utils.py")
    cases = [("C", "C", "Timbre"), ("(B)", "C", "Tone"),
             ("The tense mood dominates the clip throughout here", "C",
              "Timbre"), ("gibberish", "A", "Melody")]
    ours, theirs = [], []
    for i, (resp, ans, sub) in enumerate(cases):
        doc = {**AVO_DOC, "question_id": f"q{i}", "answer": ans,
               "subfield": sub}
        ours.append(av_odyssey_process(doc, resp))
        theirs.append(ref.av_odyssey_process_results(
            doc, [resp])["av_odyssey_score"])
    for o, t in zip(ours, theirs):
        assert o["score"] == t["score"] and o["category"] == t["category"]
    agg = aggregate_av_odyssey(ours)
    assert agg["overall"] == pytest.approx(
        ref.av_odyssey_aggregate_results(theirs))
    assert set(agg["subfields"]) == {"Timbre", "Tone", "Melody"}


def test_av_odyssey_registry_list_path():
    task = get_task("AV-Odyssey")
    assert task.resolve_video(AVO_DOC, "/data") == "/data/v/clip7.mp4"


def test_harness_feeds_audio_to_capable_backbone(tmp_path):
    """WorldSense (wants_audio) + a backbone with supports_audio: the
    harness extracts no audio from a silent mp4 (graceful) but passes the
    waveform through when the container carries one (wav here); video-only
    backbones never see an audio kwarg."""
    import cv2
    from tspo_tpu.eval.harness import evaluate_task
    from tspo_tpu.video import native

    (tmp_path / "videos").mkdir()
    vid = str(tmp_path / "videos" / "v0.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (32, 32))
    for i in range(25):
        w.write(np.full((32, 32, 3), i * 9 % 255, np.uint8))
    w.release()
    doc = {**WS_DOC, "index": "q0", "video_path": "v0.mp4",
           "frame_idx": [0, 5, 10, 15]}

    class AVBackbone:
        supports_audio = True

        def __init__(self):
            self.audio_seen = []

        def generate(self, frames, prompt, audio=None):
            self.audio_seen.append(audio)
            return "B"

    bb = AVBackbone()
    res = evaluate_task("WorldSense", [doc], bb,
                        video_root=str(tmp_path / "videos"),
                        max_frames_num=4)
    assert res.metrics["overall"] == 100.0
    # cv2 writes no audio stream -> graceful frames-only call
    assert bb.audio_seen == [None]

    if native.audio_available():
        # a wav container IS an audio stream: the harness must deliver it
        import wave
        wav = str(tmp_path / "videos" / "a0.wav")
        tone = (0.3 * np.sin(np.linspace(0, 880 * np.pi, 16000))
                * 32767).astype(np.int16)
        with wave.open(wav, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(tone.tobytes())
        # frame loading of a wav fails -> use an mp4 WITH pretend audio by
        # monkeypatching load_audio instead: assert the wiring passes audio
        import tspo_tpu.eval.harness as H
        from tspo_tpu.video.native import load_audio as real_load
        wavform = real_load(wav, 16000)
        import tspo_tpu.video.native as N
        orig = N.load_audio
        N.load_audio = lambda p, sr=16000: wavform
        try:
            bb2 = AVBackbone()
            evaluate_task("WorldSense", [doc], bb2,
                          video_root=str(tmp_path / "videos"),
                          max_frames_num=4)
            assert bb2.audio_seen[0] is not None
            assert len(bb2.audio_seen[0]) == 16000
        finally:
            N.load_audio = orig


def test_video_only_backbone_unaffected(tmp_path):
    """A backbone without supports_audio gets the plain generate call."""
    import cv2
    from tspo_tpu.eval.harness import evaluate_task
    (tmp_path / "videos").mkdir()
    vid = str(tmp_path / "videos" / "v0.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (32, 32))
    for i in range(25):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    doc = {**WS_DOC, "index": "q0", "video_path": "v0.mp4",
           "frame_idx": [0, 5, 10]}

    class VideoOnly:
        def generate(self, frames, prompt):   # no audio kwarg at all
            return "B"

    res = evaluate_task("WorldSense", [doc], VideoOnly(),
                        video_root=str(tmp_path / "videos"),
                        max_frames_num=4)
    assert res.metrics["overall"] == 100.0


def test_av_odyssey_resolve_audio_standalone_clip(tmp_path):
    """AV-Odyssey's audio comes from doc['audio_path'] clips, not the
    video's soundtrack — the harness resolver returns the first clip."""
    from tspo_tpu.eval.av_odyssey import av_odyssey_resolve_audio
    cache = tmp_path
    for rel in AVO_DOC["video_path"] + AVO_DOC["audio_path"]:
        p = cache / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")
    got = av_odyssey_resolve_audio(AVO_DOC, str(cache))
    assert got == str(cache / "a/clip7.wav")
    task = get_task("AV-Odyssey")
    assert task.resolve_audio is av_odyssey_resolve_audio


def test_harness_refuses_broken_audio_decoder(tmp_path, monkeypatch):
    """wants_audio + supports_audio + no native audio decoder must fail
    loudly, not silently run video-only."""
    import cv2
    from tspo_tpu.eval.harness import evaluate_task
    import tspo_tpu.video.native as N
    (tmp_path / "videos").mkdir()
    vid = str(tmp_path / "videos" / "v0.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (32, 32))
    for i in range(10):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    doc = {**WS_DOC, "index": "q0", "video_path": "v0.mp4",
           "frame_idx": [0, 2, 4]}

    class AV:
        supports_audio = True

        def generate(self, frames, prompt, audio=None):
            return "B"

    monkeypatch.setattr(N, "audio_available", lambda: False)
    with pytest.raises(RuntimeError, match="native audio decoder"):
        evaluate_task("WorldSense", [doc], AV(),
                      video_root=str(tmp_path / "videos"), max_frames_num=4)


def test_worldsense_parser_fuzz_parity():
    """500 random response strings through ours vs the reference parser."""
    import random as _r
    ref = _load_ref("worldsense/utils.py")
    rng = _r.Random(7)
    vocab = ["A", "B", "C", "D", "(A)", "(C)", "piano", "violin", "the",
             "answer", "is", ",", ".", "maybe", "Drums", "guitar",
             "honestly", "?", "'", ":", "b", "d"]
    index2ans = {"A": "Piano", "B": "Violin", "C": "Drums", "D": "Guitar"}
    for _ in range(500):
        resp = " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(0, 12)))
        ours = parse_multi_choice_response(resp, ["A", "B", "C", "D"],
                                           dict(index2ans))
        theirs = ref.parse_multi_choice_response(resp, ["A", "B", "C", "D"],
                                                 dict(index2ans))
        assert ours == theirs, repr(resp)
