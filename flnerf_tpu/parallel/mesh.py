"""Device mesh + sharding helpers: the framework's entire distribution story.

Replaces the reference's nn.DataParallel wrapping (nerf-ours/run_nerf.py:82,90)
and its dormant DDP scaffolding (nerf++-ours/ddp_train_nerf.py:12-14,154,
ngp-ours/nerf/utils.py:336-338) with one first-class data-parallel path:

  * a 1-D ``jax.sharding.Mesh`` over the ``data`` axis (ICI within a slice,
    DCN only for multi-host data parallelism),
  * ray batches sharded on their leading axis, parameters replicated,
  * gradients reduced by the collectives XLA inserts under jit — no NCCL,
    no process groups, no explicit all-reduce code.

Models here are tiny (NeRF MLP ~1.2M params), so TP/PP/EP are intentionally
absent; the scaling axis is rays (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray-batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host (DCN) initialization hook (SURVEY §2.8/§5.8).

    Call once per host before make_mesh(); afterwards jax.devices() spans
    every host and the same 1-D data mesh stretches across DCN — the train
    steps are unchanged (XLA routes the gradient psum over ICI within a
    slice and DCN between slices).  No-op (returns False) when running
    single-host with no coordinator configured, so single-chip runs and
    the CPU test mesh never pay for it.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "FLNERF_COORDINATOR")
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
