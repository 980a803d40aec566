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
    return Mesh(np.asarray(devices[:n_data]), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array of a (nested) batch dict with batch-axis sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
