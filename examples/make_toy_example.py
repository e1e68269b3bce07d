"""Generate a self-contained toy example (reference toy_example/ equivalent).

Creates a synthetic long video whose question-relevant segment is visually
distinct, plus the 9-row jsonl the toy trainer consumes (C15 schema:
video / original_question / problem / solution / complete_answer / type).
Run the toy loop with:

  python examples/make_toy_example.py --out toy_data
  python -m tspo_tpu.cli.train --toy-jsonl-path toy_data/example.jsonl \
      --video-folder toy_data --backbone stub --tiny --max-steps 20
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def make_video(path: str, n_frames: int = 96, fps: float = 1.0,
               wh=(128, 96), bright=(30, 55)):
    import cv2
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, wh)
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        if bright[0] <= i < bright[1]:
            # "relevant" segment: bright moving square
            frame = np.full((wh[1], wh[0], 3), 40, np.uint8)
            x = 10 + (i * 3) % (wh[0] - 40)
            frame[20:60, x:x + 30] = (60, 200, 230)
        else:
            frame = rng.integers(10, 60, (wh[1], wh[0], 3)).astype(np.uint8)
        w.write(frame)
    w.release()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="toy_data")
    p.add_argument("--rows", type=int, default=9)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    make_video(os.path.join(args.out, "toy.mp4"))
    row = {
        "video": "toy.mp4",
        "original_question": "<image>\nWhen does the bright square appear?\n"
                             "A. in the middle\nB. never Please respond with "
                             "only the letter of the correct answer.",
        "problem": "When does the bright square appear?",
        "solution": "<answer>a</answer>",
        "complete_answer": "A. in the middle",
        "type": "general",
    }
    with open(os.path.join(args.out, "example.jsonl"), "w") as f:
        for _ in range(args.rows):
            f.write(json.dumps(row) + "\n")
    print(f"wrote {args.out}/toy.mp4 and {args.out}/example.jsonl")


if __name__ == "__main__":
    main()
