"""Training-metrics introspection — the read_tensorboard.py equivalent (C11).

The trainer writes one json line per step to ``metrics.jsonl``; this reads
them back, applies EMA smoothing, and plots reward curves.
"""

from __future__ import annotations

import json

import numpy as np


def read_metrics(path: str) -> list:
    with open(path, encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


def series(metrics: list, key: str):
    steps, vals = [], []
    for m in metrics:
        if key in m and isinstance(m[key], (int, float)):
            steps.append(m.get("step", len(steps)))
            vals.append(m[key])
    return np.asarray(steps), np.asarray(vals, np.float64)


def ema(values: np.ndarray, alpha: float = 0.9) -> np.ndarray:
    """Exponential moving average (reference read_tensorboard.py smoothing)."""
    out = np.empty_like(values, np.float64)
    acc = values[0] if len(values) else 0.0
    for i, v in enumerate(values):
        acc = alpha * acc + (1 - alpha) * v
        out[i] = acc
    return out


def plot_rewards(metrics_path: str, out_path: str = "rewards.png",
                 keys=("rewards/accuracy_reward", "rewards/temporal_reward"),
                 alpha: float = 0.9):
    """Smoothed reward curves (read_tensorboard.py:22-45)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    metrics = read_metrics(metrics_path)
    fig = plt.figure(figsize=(6, 3.5))
    for key in keys:
        steps, vals = series(metrics, key)
        if len(vals):
            plt.plot(steps, ema(vals, alpha), label=key.split("/")[-1])
    plt.xlabel("step")
    plt.ylabel("reward (EMA)")
    plt.legend()
    plt.grid(True, linestyle="--", alpha=0.5)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path
