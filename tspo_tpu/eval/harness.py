"""Phase-2 evaluation harness: run a backbone over precomputed frame indices.

Rebuild of the lmms-eval flow the reference uses (SURVEY.md §3.4): question
records carry ``frame_idx`` (from phase 1); the harness gathers exactly those
frames, builds the task prompt, asks the backbone for a greedy answer, parses
the letter, and aggregates per-benchmark metrics.  Backbones plug in through
``BackboneAdapter`` (LLaVA-Video and Qwen2.5-VL jax adapters in models/;
uniform-sampling mode reproduces the reference "original_*" baselines).

Where the reference shards requests over 8 accelerate ranks with NCCL gathers
(evaluator.py:469-626), a rank here is (rank, world) slicing of the doc list
and metric merge is a host-side dict merge (jax.process_index() drives it in
multi-host runs).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Callable, Protocol

import numpy as np

from ..video.reader import load_video_indices, sample_indices, video_info
from .datasets import DOC_ID_KEY
from .tasks import BenchmarkTask, get_task


class BackboneAdapter(Protocol):
    def generate(self, frames: np.ndarray, prompt: str) -> str:
        """Greedy answer for a frame set + question prompt."""
        ...


def load_frames_by_index(video_path: str, doc: dict, max_frames_num: int):
    """Gather doc['frame_idx'][:N] sorted; uniform fallback when the index
    list is shorter than N (llava_vid_tspo.py:362-380)."""
    frame_idx = sorted(int(i) for i in doc["frame_idx"][:max_frames_num])
    if len(frame_idx) < max_frames_num:
        total, _, _, _ = video_info(video_path)
        frame_idx = np.linspace(0, total - 1, max_frames_num, dtype=int).tolist()
    return load_video_indices(video_path, frame_idx), frame_idx


def load_frames_uniform(video_path: str, max_frames_num: int):
    """1-fps then uniform-cap decode (llava_vid_tspo.py:315-333) — the
    is_uniform=True baseline path."""
    total, fps, _, _ = video_info(video_path)
    frame_idx, _ = sample_indices(total, fps or 30.0, fps=1,
                                  max_frames_num=max_frames_num,
                                  min_frames_num=0, force_sample=False)
    return load_video_indices(video_path, frame_idx), frame_idx


@dataclass
class EvalResult:
    results: list
    metrics: dict
    samples: list = field(default_factory=list)


def evaluate_task(task_name: str, docs: list, backbone: BackboneAdapter,
                  video_root: str = "", max_frames_num: int = 64,
                  is_uniform: bool = False, limit: int | None = None,
                  shard: tuple = (0, 1), log_samples: bool = True,
                  seed: int = 1234, progress: Callable | None = None,
                  on_error: str = "skip", response_cache=None) -> EvalResult:
    """Run one benchmark slice.  ``is_uniform=True`` reproduces the baseline
    (no TSPO) rows of the results table.  ``response_cache`` (eval/caching.py)
    skips regeneration on resume — responses are deterministic (greedy,
    frozen backbone)."""
    task: BenchmarkTask = get_task(task_name)
    rng = random.Random(seed)
    id_key = DOC_ID_KEY[task_name]
    rank, world = shard

    picked = [d for i, d in enumerate(docs[:limit] if limit else docs)
              if i % world == rank]

    # Host decode prefetch: the next doc's frame gather (ffmpeg) overlaps the
    # current doc's backbone generate on device (same pattern as phase-1).
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=2)

    def producer():
        for doc in picked:
            if response_cache is not None and \
                    response_cache.get(doc.get(id_key)) is not None:
                q.put((doc, "cached", None))
                continue
            try:
                path = task.resolve_video(doc, video_root)
                if is_uniform or "frame_idx" not in doc:
                    frames, frame_idx = load_frames_uniform(path, max_frames_num)
                else:
                    frames, frame_idx = load_frames_by_index(path, doc,
                                                             max_frames_num)
                q.put((doc, "frames", (frames, frame_idx)))
            except Exception as e:
                q.put((doc, "error", e))
        q.put(None)

    threading.Thread(target=producer, daemon=True).start()

    results, samples = [], []
    while True:
        item = q.get()
        if item is None:
            break
        doc, kind, payload = item
        try:
            if kind == "cached":
                response = response_cache.get(doc.get(id_key))
                frame_idx = doc.get("frame_idx", [])
            elif kind == "error":
                raise payload
            else:
                frames, frame_idx = payload
                prompt = task.doc_to_text(doc)
                response = backbone.generate(frames, prompt)
                if response_cache is not None:
                    response_cache.put(doc.get(id_key), response)
        except Exception as e:
            if on_error == "raise":
                raise
            # keep the run alive, emit an error response like the reference
            # adapter (llava_vid_tspo.py:499-508)
            response, frame_idx = f"[error: {e}]", []
        rec = task.process_response(doc, response, rng)
        results.append(rec)
        if log_samples:
            samples.append({"doc_id": doc.get(id_key), "response": response,
                            "frame_idx": frame_idx, **rec})
        if progress:
            progress(doc.get(id_key))
    return EvalResult(results=results, metrics=task.aggregate(results),
                      samples=samples)


def merge_shards(task_name: str, shards: list) -> EvalResult:
    """Rank-0 merge of per-rank EvalResults (replaces the NCCL gather_object
    of evaluator.py:602-626)."""
    task = get_task(task_name)
    results = [r for s in shards for r in s.results]
    samples = [r for s in shards for r in s.samples]
    return EvalResult(results=results, metrics=task.aggregate(results),
                      samples=samples)
