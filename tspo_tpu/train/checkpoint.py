"""Selector checkpointing and merged-model export.

Replaces HF Trainer checkpoints + ZeRO-3 16-bit gather + merge_weights.py:
only the ~3.5M-param selector trains, so a checkpoint is a single small npz
(params + optimizer state + step); ``export_merged`` fuses selector + CLIP
into a standalone TSPO-0.4B directory (scripts/merge_weights.py:31-58), and
``export_torch_selector`` writes the torch-layout state dict for
interoperability with the reference merge flow.
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np

from ..models.selector import selector_params_to_torch


def _flatten(tree, prefix=""):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                for p in path)
        out[key] = np.asarray(leaf)
    return out


def _unflatten(flat: dict):
    out = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return out


def save_train_state(directory: str, step: int, selector_params, opt_state=None,
                     extra: dict | None = None):
    os.makedirs(directory, exist_ok=True)
    payload = _flatten(selector_params, "params/")
    if opt_state is not None:
        # optimizer state is a pytree of optax namedtuples — persist leaves
        # in traversal order; restore via restore_opt_state(template, leaves)
        for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
            payload[f"opt/{i:04d}"] = np.asarray(leaf)
    path = os.path.join(directory, f"checkpoint-{step}.npz")
    np.savez(path + ".tmp.npz", **payload)
    os.replace(path + ".tmp.npz", path)
    meta = {"step": step, **(extra or {})}
    with open(os.path.join(directory, f"checkpoint-{step}.json"), "w") as f:
        json.dump(meta, f)
    return path


def list_checkpoints(directory: str) -> list:
    if not os.path.isdir(directory):
        return []
    steps = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"checkpoint-(\d+)\.npz", name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def prune_checkpoints(directory: str, keep: int):
    """save_total_limit behavior (train_deepspeed.sh:38)."""
    steps = list_checkpoints(directory)
    for step in steps[:-keep] if keep > 0 else []:
        for suffix in (".npz", ".json"):
            path = os.path.join(directory, f"checkpoint-{step}{suffix}")
            if os.path.exists(path):
                os.remove(path)


def load_train_state(directory: str, step: int | None = None):
    """Returns (step, selector_params, opt_leaves_or_None).

    ``opt_leaves`` is the flat leaf list; rebuild the optax state with
    :func:`restore_opt_state` against a freshly-initialized template."""
    steps = list_checkpoints(directory)
    if not steps:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    step = steps[-1] if step is None else step
    with np.load(os.path.join(directory, f"checkpoint-{step}.npz")) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten({k[len("params/"):]: v for k, v in flat.items()
                         if k.startswith("params/")})
    opt_keys = sorted(k for k in flat if k.startswith("opt/"))
    opt_leaves = [flat[k] for k in opt_keys] if opt_keys else None
    return step, params, opt_leaves


def restore_opt_state(template_opt_state, opt_leaves):
    """Rebuild an optax state pytree from persisted leaves."""
    treedef = jax.tree_util.tree_structure(template_opt_state)
    import jax.numpy as jnp
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in opt_leaves])


class OrbaxCheckpointer:
    """Orbax-backed train-state checkpointing — the TPU-idiomatic production
    layer (async writes, multi-host coordination, native sharded-array
    support; SURVEY.md §7.2 item 7).  Same payload contract as the npz
    functions above: selector params tree + flat optimizer leaves + json
    metadata.  npz stays the default (single-host, zero deps, torch-interop
    adjacent); pass ``--ckpt-backend orbax`` in tspo-train for this one.
    """

    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep or None))

    def save(self, step: int, selector_params, opt_state=None,
             extra: dict | None = None):
        ocp = self._ocp
        tree = {"params": selector_params,
                "opt": list(jax.tree_util.tree_leaves(opt_state))
                if opt_state is not None else []}
        self.mgr.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(tree),
            meta=ocp.args.JsonSave({"step": step, **(extra or {})})))
        return step

    def latest_step(self):
        return self.mgr.latest_step()

    def restore(self, step: int | None = None):
        """(step, selector_params, opt_leaves_or_None, meta) — mirror of
        load_train_state + the json metadata."""
        ocp = self._ocp
        step = self.mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no orbax checkpoints")
        out = self.mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(), meta=ocp.args.JsonRestore()))
        state, meta = out["state"], out["meta"]
        opt = state["opt"] or None
        return step, state["params"], opt, meta

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()


def export_merged(directory: str, clip_params, selector_params, clip_cfg=None,
                  selector_cfg=None):
    """Standalone TSPO-0.4B merged checkpoint (npz format of TSPOScorer.save)."""
    from ..models.tspo_model import TSPOScorer
    scorer = TSPOScorer(clip_params=clip_params, selector_params=selector_params,
                        **({"clip_cfg": clip_cfg} if clip_cfg else {}),
                        **({"selector_cfg": selector_cfg} if selector_cfg else {}))
    scorer.save(directory)
    return directory


def export_torch_selector(path: str, selector_params):
    """torch-layout MultiModal_Align state dict (keys Self_q/.../mlp.0/mlp.2),
    loadable by the reference merge_weights flow."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in selector_params_to_torch(selector_params).items()}
    torch.save(sd, path)
    return path
