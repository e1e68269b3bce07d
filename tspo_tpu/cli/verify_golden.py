"""Golden-artifact verification against a mounted reference checkout.

Checks, without any model weights, that this framework's artifact plumbing is
byte-compatible with the reference's shipped reproducibility artifacts
(SURVEY.md §4 item 3):

  1. frameIdx merge: jsons/<bench>.json + golden indices ->
     jsons_idx/<exp>_<bench>_frameIdx.json must reproduce the golden file.
  2. Doc schema: every golden record keys/ids resolve through our task
     registry (id key, video path key, prompt builder).

  python -m tspo_tpu.cli.verify_golden --reference /root/reference
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    args = p.parse_args(argv)
    from ..eval.datasets import JSON_NAME, load_json, merge_frame_indices, DOC_ID_KEY
    from ..eval.tasks import get_task

    base = os.path.join(args.reference, "evaluation")
    failures = 0
    for bench in ("LongVideoBench", "MLVU", "VideoMME"):
        anno_path = os.path.join(base, "jsons", f"{JSON_NAME[bench]}.json")
        golden_path = os.path.join(base, "jsons_idx",
                                   f"TSPO_{bench}_frameIdx.json")
        if not (os.path.exists(anno_path) and os.path.exists(golden_path)):
            print(f"[skip] {bench}: reference artifacts not found")
            continue
        anno = load_json(anno_path)
        golden = load_json(golden_path)
        id_key = DOC_ID_KEY[bench]
        scores = {g[id_key]: g["frame_idx"] for g in golden if "frame_idx" in g}
        merged = merge_frame_indices(anno, scores, bench)
        ok = merged == golden
        print(f"[{'ok' if ok else 'FAIL'}] {bench}: frameIdx merge "
              f"{'reproduces' if ok else 'differs from'} golden "
              f"({len(golden)} records, {len(scores)} with indices)")
        failures += 0 if ok else 1

        task = get_task(bench)
        bad = 0
        for doc in golden[:50]:
            try:
                task.doc_to_text(doc)
                task.process_response(doc, "A")
            except Exception:
                bad += 1
        print(f"[{'ok' if bad == 0 else 'FAIL'}] {bench}: task registry "
              f"handles golden docs ({50 - bad}/50)")
        failures += 0 if bad == 0 else 1
    if failures:
        raise SystemExit(f"{failures} golden checks failed")
    print("all golden checks passed")


if __name__ == "__main__":
    main()
