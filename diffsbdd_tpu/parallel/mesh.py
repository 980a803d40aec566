"""Device mesh + sharding helpers for data-parallel training.

The reference scales with PyTorch-Lightning DDP over NCCL
(/root/reference/train.py:112-120).  The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over the 'data' axis: the batch is sharded, params are
replicated, and XLA GSPMD inserts the gradient all-reduce over ICI — no
bespoke communication code (SURVEY.md §2.2).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices)
    if n_data > len(devices):
        # silently truncating would desync callers that sized their batch
        # against the requested mesh (opaque shard errors, or training at a
        # fraction of the expected parallelism with no warning)
        raise ValueError(
            f"requested a {n_data}-device data mesh but only "
            f"{len(devices)} devices are visible")
    return Mesh(np.asarray(devices[:n_data]), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array of a (nested) batch dict with batch-axis sharding.

    Single-process: a plain sharded device_put.  Multi-process (multi-host
    pod, after ``jax.distributed.initialize``): each host holds only its
    local slice of the global batch (PaddedLoader's process sharding), so the
    global array is assembled with ``make_array_from_process_local_data`` —
    the host-local slices become the shards, no cross-host data movement.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def shard_stacked_batch(batches, mesh: Mesh):
    """Stack a list of batch dicts on a new leading (step) axis and place
    them with ``(None, 'data')`` sharding — the input layout of the chained
    train step (``train.loop.make_train_step(chain_steps=K)``): axis 0 is
    scanned over on-device, axis 1 stays batch-sharded over the mesh."""
    stacked = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)
    sharding = NamedSharding(mesh, P(None, "data"))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        stacked)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def maybe_initialize_distributed(cfg=None) -> int:
    """Initialize JAX multi-process mode when launched on a multi-host pod.

    Uses the standard coordinator environment (JAX_COORDINATOR_ADDRESS &
    friends, or TPU pod metadata auto-detection).  Safe to call on a single
    host: without coordinator configuration it leaves JAX in single-process
    mode.  Returns the process count.  Mirrors the role of Lightning's DDP
    process-group setup (train.py:119).
    """
    import os

    want = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")
            or (cfg is not None and getattr(cfg.tpu, "multihost", False)))
    # IMPORTANT: do not touch any backend-initializing jax API (e.g.
    # jax.process_count()) before initialize() — it must run first, or it
    # raises and the pod would silently train as disconnected single-process
    # replicas.  Skip only if distributed state is already up.
    if want and not jax.distributed.is_initialized():
        jax.distributed.initialize()
    return jax.process_count()
