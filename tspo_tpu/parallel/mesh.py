"""Device mesh and sharding rules.

Replaces the reference's entire distributed stack (DeepSpeed ZeRO-3 + HF
Accelerate + NCCL, SURVEY.md §2.5): on TPU the whole layer is jit +
``jax.sharding`` over a Mesh — XLA inserts the collectives and rides ICI.

Axes:
  data   — data parallelism: samples / questions / frame shards.
  model  — Megatron-style tensor parallelism of transformer towers: QKV and
           MLP-in projections column-sharded, O and MLP-out row-sharded, so
           each block needs a single psum on its output (inserted by XLA from
           the output sharding constraint).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int | None = None, model: int = 1,
                devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    if data is None:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(f"mesh {data}x{model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *axes: str | None) -> NamedSharding:
    """Sharding with the given axis names per dimension (None = replicated)."""
    return NamedSharding(mesh, P(*axes))


def clip_param_shardings(params, mesh: Mesh):
    """Megatron TP shardings for the stacked-layer CLIP tower params.

    Layer-stacked kernels are [L, in, out]:
      q/k/v kernel -> shard ``out`` (heads dim) on 'model'; bias likewise
      o kernel     -> shard ``in`` on 'model'; bias replicated
      fc1          -> shard ``out``;  fc2 -> shard ``in``
    Embeddings, layernorms, projections stay replicated (small).
    """

    def spec_for(path) -> P:
        keys = [str(getattr(p, "key", p)) for p in path]
        joined = "/".join(keys)
        leaf = keys[-1]
        if "attn" in keys:
            which = keys[keys.index("attn") + 1]
            if which in ("q", "k", "v"):
                return P(None, None, "model") if leaf == "kernel" else P(None, "model")
            if which == "o":
                return P(None, "model", None) if leaf == "kernel" else P()
        if "mlp" in keys and "layers" in joined:
            which = keys[keys.index("mlp") + 1]
            if which == "fc1":
                return P(None, None, "model") if leaf == "kernel" else P(None, "model")
            if which == "fc2":
                return P(None, "model", None) if leaf == "kernel" else P()
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path)), params)
