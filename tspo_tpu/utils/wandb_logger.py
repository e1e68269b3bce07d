"""W&B experiment logging — gated equivalent of the reference's
`lmms-eval/lmms_eval/loggers/wandb_logger.py` (WandbLogger: init kwargs,
post_init(results), log_eval_result, log_eval_samples) and the HF-Trainer
wandb reporting used in training.

The wandb package is not in this image (and the container has zero egress),
so the logger is transport-gated: if ``wandb`` imports, every call forwards
to a real run; otherwise the same payloads are written to
``<dir>/wandb_offline.jsonl`` — one json object per event, replayable into a
real run later with ``replay_offline``.  Callers never need to know which
backend is active (the reference hard-fails without wandb installed;
loggers should not take down an eval run)."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)

try:  # pragma: no cover - wandb not in this image
    import wandb as _wandb
except Exception:  # noqa: BLE001
    _wandb = None


def parse_wandb_args(spec: str) -> Dict[str, str]:
    """'project=lmms-eval,job_type=eval' -> kwargs (reference __main__.py:297)."""
    out = {}
    for part in filter(None, (spec or "").split(",")):
        k, _, v = part.partition("=")
        out[k.strip()] = v.strip()
    return out


class WandbLogger:
    """Reference wandb_logger.py:23-280 surface; offline-jsonl fallback."""

    def __init__(self, output_dir: str = ".", log_samples: bool = True,
                 **init_kwargs):
        self.log_samples = log_samples
        self.init_kwargs = init_kwargs
        self.results: Dict[str, Any] = {}
        self._offline_path = os.path.join(output_dir, "wandb_offline.jsonl")
        self.run = None
        if _wandb is not None:
            try:
                self.run = _wandb.init(**init_kwargs)
            except Exception as e:  # noqa: BLE001 — offline fallback
                logger.warning("wandb.init failed (%s); logging offline", e)
        if self.run is None:
            os.makedirs(output_dir or ".", exist_ok=True)
            self._emit("init", init_kwargs)

    # -- backend ------------------------------------------------------------
    def _emit(self, kind: str, payload: Any) -> None:
        with open(self._offline_path, "a") as f:
            f.write(json.dumps({"ts": time.time(), "kind": kind,
                                "payload": payload}, default=str) + "\n")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        """Scalar stream (training loss/reward curves — the HF Trainer
        report_to=wandb shape)."""
        if self.run is not None:
            self.run.log(metrics, step=step)
        else:
            self._emit("log", {"step": step, **metrics})

    # -- eval-results surface (reference post_init/log_eval_result) ---------
    def post_init(self, results: Dict[str, Any]) -> None:
        self.results = dict(results)

    def log_eval_result(self) -> None:
        summary = {f"{task}/{metric}": value
                   for task, metrics in self.results.items()
                   if isinstance(metrics, dict)
                   for metric, value in metrics.items()
                   if isinstance(value, (int, float))}
        if self.run is not None:
            self.run.log(summary)
        else:
            self._emit("eval_result", {"summary": summary,
                                       "results": self.results})

    def log_eval_samples(self, samples: Dict[str, List[dict]]) -> None:
        if not self.log_samples:
            return
        for task, rows in samples.items():
            if self.run is not None:
                columns = sorted({k for r in rows for k in r})
                table = _wandb.Table(
                    columns=columns,
                    data=[[r.get(c) for c in columns] for r in rows])
                self.run.log({f"{task}_eval_results": table})
            else:
                self._emit("eval_samples", {"task": task, "rows": rows})

    def finish(self) -> None:
        if self.run is not None:
            self.run.finish()
        else:
            self._emit("finish", {})


def replay_offline(path: str, init_kwargs: Optional[dict] = None) -> int:
    """Replay an offline jsonl into a live wandb run (requires wandb).
    Returns the number of events replayed."""
    if _wandb is None:
        raise RuntimeError("wandb is not installed; cannot replay")
    events = [json.loads(line) for line in open(path)]
    kw = init_kwargs or next((e["payload"] for e in events
                              if e["kind"] == "init"), {})
    run = _wandb.init(**kw)
    n = 0
    for e in events:
        if e["kind"] == "log":
            payload = dict(e["payload"])
            step = payload.pop("step", None)
            run.log(payload, step=step)
            n += 1
        elif e["kind"] == "eval_result":
            run.log(e["payload"]["summary"])
            n += 1
    run.finish()
    return n
