"""Helpers for porting HuggingFace/torch checkpoints into jax pytrees."""

from __future__ import annotations

import numpy as np


def t2j(t) -> np.ndarray:
    """torch tensor / ndarray -> float32 numpy (host-side; cast on device_put)."""
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def state_dict_of(model_or_sd) -> dict:
    if hasattr(model_or_sd, "state_dict"):
        return {k: t2j(v) for k, v in model_or_sd.state_dict().items()}
    return {k: t2j(v) for k, v in model_or_sd.items()}


def stack_layers(sd: dict, n_layers: int, fmt: str) -> dict:
    """Stack per-layer tensors ``fmt.format(i=...)`` along a new leading axis."""
    return np.stack([sd[fmt.format(i=i)] for i in range(n_layers)])
