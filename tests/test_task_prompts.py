"""Byte-exact doc_to_text parity vs the reference lmms-eval task functions.

Two layers of checking (VERDICT.md round-1 Weak #3):
  1. hardcoded expected prompt strings, derived by hand from the reference
     sources (tasks/{longvideobench,mlvu,videomme}/utils.py + yaml defaults) —
     always on;
  2. dynamic import of the actual reference functions (with unused heavy deps
     stubbed) and byte comparison — skipped when /root/reference is absent.

The kwargs-selection rule being encoded: the reference picks
lmms_eval_specific_kwargs[model_name] on an exact match, else merges in
["default"] (lmms-eval/lmms_eval/api/task.py:793-800).  The TSPO adapters are
named llava_vid_tspo / qwen2_5_vl_tspo — no exact match — so the "default"
yaml kwargs apply to every TSPO eval run.
"""

import importlib.util
import os
import sys
import types

import pytest

from tspo_tpu.eval.tasks import get_task

REF = "/root/reference/lmms-eval/lmms_eval/tasks"

LVB_DOC = {
    "question": "What is the person doing?",
    "candidates": ["cooking", "reading a book", "swimming", "sleeping"],
}
MLVU_DOC = {"question": "How many people appear?\nA. 1\nB. 2\nC. 3\nD. 4"}
VMME_DOC = {
    "question": "What color is the car?",
    "options": ["A. red", "B. blue", "C. green", "D. black"],
}


def test_lvb_prompt_bytes():
    expected = (
        "What is the person doing?\n"
        "A. cooking\nB. reading a book\nC. swimming\nD. sleeping\n"
        "Answer with the option's letter from the given choices directly.\n")
    assert get_task("LongVideoBench").doc_to_text(LVB_DOC) == expected


def test_mlvu_prompt_bytes():
    expected = ("\nHow many people appear?\nA. 1\nB. 2\nC. 3\nD. 4\n"
                "Only give the best option.\n\nBest option: (")
    assert get_task("MLVU").doc_to_text(MLVU_DOC) == expected


def test_videomme_prompt_bytes():
    expected = (
        "Select the best answer to the following multiple-choice question "
        "based on the video and the subtitles. Respond with only the letter "
        "(A, B, C, or D) of the correct option.\n"
        "What color is the car?\n"
        "A. red\nB. blue\nC. green\nD. black\n"
        "\nAnswer with the option's letter from the given choices directly.")
    assert get_task("VideoMME").doc_to_text(VMME_DOC) == expected


def test_prompt_override_plumbed():
    out = get_task("VideoMME").doc_to_text(
        VMME_DOC, {"post_prompt": "The best answer is:"})
    assert out.endswith("D. black\nThe best answer is:")
    out = get_task("LongVideoBench").doc_to_text(
        LVB_DOC, {"pre_prompt": "X: ", "post_prompt": "Y"})
    assert out.startswith("X: What") and out.endswith("sleeping\nY")


# ---------------------------------------------------------------------------
# dynamic cross-check against the actual reference functions
# ---------------------------------------------------------------------------

def _load_ref_utils(task_dir: str):
    """Import a reference tasks/<name>/utils.py with heavy deps stubbed."""
    path = os.path.join(REF, task_dir, "utils.py")
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    stubs = {}
    for name in ("decord", "loguru", "cv2", "lmms_eval",
                 "lmms_eval.tasks", "lmms_eval.tasks._task_utils",
                 "lmms_eval.tasks._task_utils.file_utils"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "decord":
                mod.VideoReader, mod.cpu = object, object
            if name == "loguru":
                import logging
                mod.logger = logging.getLogger("ref-stub")
            if name.endswith("file_utils"):
                mod.generate_submission_file = lambda *a, **k: "/dev/null"
            stubs[name] = mod
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(f"ref_{task_dir}_utils",
                                                      path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception as e:  # missing dep we didn't anticipate
        pytest.skip(f"cannot import reference utils: {e}")
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
    return mod


def load_ref_utils_with_stubs(task_dir: str, extra=()):
    """`_load_ref_utils` plus the stub set most judge-style task modules
    need (openai/tqdm), optional ``extra`` (name, attrs) module stubs, and
    HF_HOME save/restore.  Shared by all per-task parity test files."""
    stubs = {}
    base = (("openai", {"OpenAI": object, "AzureOpenAI": object}),
            ("tqdm", {"tqdm": lambda x, **k: x}))
    for name, attrs in (*base, *extra):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            stubs[name] = mod
    sys.modules.update(stubs)
    old_hf = os.environ.get("HF_HOME")
    os.environ["HF_HOME"] = "/tmp"
    try:
        return _load_ref_utils(task_dir)
    finally:
        if old_hf is None:
            os.environ.pop("HF_HOME", None)
        else:
            os.environ["HF_HOME"] = old_hf
        for name in stubs:
            sys.modules.pop(name, None)


def test_lvb_prompt_matches_reference():
    ref = _load_ref_utils("longvideobench")
    kw = {"pre_prompt": "", "post_prompt": "Answer with the option's letter "
                                           "from the given choices directly.\n"}
    assert get_task("LongVideoBench").doc_to_text(LVB_DOC) == \
        ref.longvideobench_doc_to_text(dict(LVB_DOC), kw)


def test_mlvu_prompt_matches_reference():
    ref = _load_ref_utils("mlvu")
    assert get_task("MLVU").doc_to_text(MLVU_DOC) == \
        ref.mlvu_doc_to_text(dict(MLVU_DOC))


def test_videomme_prompt_matches_reference():
    ref = _load_ref_utils("videomme")
    kw = {"pre_prompt": "", "post_prompt": "\nAnswer with the option's letter "
                                           "from the given choices directly."}
    assert get_task("VideoMME").doc_to_text(VMME_DOC) == \
        ref.videomme_doc_to_text(dict(VMME_DOC), kw)


def test_lvbench_prompt_pinned():
    """LVBench phase-2 is an extension (the reference's eval scripts reject
    it); this pins the exact prompt so it cannot drift silently."""
    expected = (
        "Select the best answer to the following multiple-choice question "
        "based on the video and the subtitles. Respond with only the letter "
        "(A, B, C, or D) of the correct option.\n"
        "What color is the car?\n"
        "A. red\nB. blue\nC. green\nD. black\n"
        "\nAnswer with the option's letter from the given choices directly."
    )
    assert get_task("LVBench").doc_to_text(VMME_DOC) == expected
