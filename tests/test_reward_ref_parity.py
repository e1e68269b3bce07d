"""GRPO reward functions vs the ACTUAL reference code (src/open_tspo/tspo.py).

The training rewards decide what the selector learns; this fuzzes our
implementations against the reference functions extracted from the real
file.  math_verify is not in this image (and isn't needed for option-letter
video QA), so the reference's symbolic-verification branch is stubbed to
raise — exactly the reference's own behavior when parse() fails — forcing
the string-match path both sides take on MC answers.
"""

import ast
import os
import random
import re
from datetime import datetime

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tspo_tpu.train.rewards import (accuracy_reward, format_reward,
                                    map_prediction_to_option,
                                    temporal_localization_reward)

REF_TSPO = "/root/reference/src/open_tspo/tspo.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF_TSPO):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(REF_TSPO).read())
    want = {"map_prediction_to_option", "accuracy_reward",
            "temporal_localization_reward", "format_reward"}
    fns = [n for n in tree.body
           if isinstance(n, ast.FunctionDef) and n.name in want]
    assert len(fns) == len(want)

    def _raise(*a, **k):
        raise RuntimeError("math_verify absent")

    ns = {"re": re, "os": os, "torch": torch, "datetime": datetime,
          "parse": _raise, "verify": _raise,
          "print": lambda *a, **k: None}
    exec(compile(ast.Module(fns, []), REF_TSPO, "exec"), ns)
    return ns


OPTION_VOCAB = ["a", "B", "(c)", "D.", "e:", "answer", "is", "the", "cat",
                "zebra", "A)", "b,", "<answer>", "</answer>", "option",
                "1", ".", "f", "ab", "e"]


def test_map_prediction_fuzz(ref):
    rng = random.Random(11)
    for _ in range(500):
        s = " ".join(rng.choice(OPTION_VOCAB)
                     for _ in range(rng.randint(0, 8)))
        assert map_prediction_to_option(s) == \
            ref["map_prediction_to_option"](s), repr(s)


def test_accuracy_reward_fuzz(ref):
    rng = random.Random(12)
    for _ in range(300):
        content = " ".join(rng.choice(OPTION_VOCAB)
                           for _ in range(rng.randint(0, 8)))
        sol_letter = rng.choice("abcde")
        sol = rng.choice([f"<answer>{sol_letter}</answer>",
                          sol_letter, f"The answer is {sol_letter}."])
        ours = accuracy_reward([content], [sol])
        theirs = ref["accuracy_reward"](
            [[{"content": content}]], [sol],
            sel_idxs=[None], total_mask=None)
        assert ours == theirs, repr((content, sol))


def test_temporal_localization_reward_fuzz(ref):
    rng = np.random.default_rng(13)
    for _ in range(100):
        T = int(rng.integers(16, 128))
        k = int(rng.integers(1, 16))
        mask = rng.random(T) < 0.4
        idx = rng.choice(T, size=k, replace=False)
        ours = temporal_localization_reward(
            ["x"], ["s"], sel_idxs=[idx], total_mask=mask)
        theirs = ref["temporal_localization_reward"](
            [[{"content": "x"}]], ["s"],
            sel_idxs=[(None, torch.from_numpy(idx))],
            total_mask=torch.from_numpy(mask))
        assert ours == pytest.approx(theirs)


def test_format_reward_fuzz(ref):
    rng = random.Random(14)
    pieces = ["<think>", "</think>", "<answer>", "</answer>", "stuff",
              "\n", " ", "reasoning here", "a"]
    for _ in range(300):
        content = "".join(rng.choice(pieces)
                          for _ in range(rng.randint(0, 8)))
        ours = format_reward([content])
        theirs = ref["format_reward"]([[{"content": content}]])
        assert ours == theirs, repr(content)
