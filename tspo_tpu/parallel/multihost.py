"""Multi-host orchestration — the TPU replacement for the reference's
torchrun/accelerate/NCCL process layer (SURVEY.md §2.5 comm-backend row).

One python process per host; ``jax.distributed.initialize`` wires the
controller; collectives ride ICI/DCN inside jit.  Host-side work (question
lists, decode, rewards) shards by ``process_shard``; small result dicts merge
to host 0 via ``gather_host_objects`` (the gather_object equivalent built on
multihost_utils broadcast of pickled payloads).
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Idempotent jax.distributed init.  Must run before any backend use —
    so no jax.devices()/process_count() probing here."""
    if coordinator_address is None:
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError as e:
        # Swallow ONLY the double-init case.  Anything else (unreachable
        # coordinator, peer down) must raise: XlaRuntimeError subclasses
        # RuntimeError, and silently degrading to single-host mode would
        # make every host run the full work list as "host 0".
        msg = str(e).lower()
        if "once" not in msg and "already" not in msg:
            raise


def process_shard() -> tuple:
    """(rank, world) for sharding host-side work lists."""
    return jax.process_index(), jax.process_count()


def gather_host_objects(obj) -> list | None:
    """Gather a picklable object from every host onto host 0.

    Returns the list of per-host objects on host 0, None elsewhere.  A
    two-phase uint8 all-gather through the device mesh (replaces
    torch.distributed.gather_object, evaluator.py:612-626): hosts first
    agree on the largest payload size, then gather buffers of exactly that
    size — no fixed cap that could discard a completed multi-host eval
    whose samples outgrew it (payload size is bounded by host memory, as
    with the reference's gather_object).
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj)
    sizes = multihost_utils.process_allgather(
        np.array([len(payload)], np.int64))
    cap = int(np.max(sizes))
    buf = np.zeros(cap, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    if jax.process_index() != 0:
        return None
    return [pickle.loads(row[: int(n)].tobytes())
            for row, n in zip(gathered, np.asarray(sizes).reshape(-1))]


def barrier(name: str = "barrier"):
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
