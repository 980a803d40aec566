"""Lennard-Jones auxiliary loss and its time-dependent weight schedule.

Padded-batch equivalents of the reference implementations at
/root/reference/lightning_modules.py:304-331 (potential) and :902-914
(WeightSchedule).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def lj_potential(atom_x, atom_one_hot, mask, lj_rm, norm_value: float,
                 clamp: Optional[float] = None):
    """Per-graph summed Lennard-Jones potential on padded ligands.

    atom_x: (B, N, 3); atom_one_hot: (B, N, A); mask: (B, N);
    lj_rm: (A, A) optimal radii in pm.  Self-edges are excluded
    (lightning_modules.py:306).
    """
    B, N, _ = atom_x.shape
    adj = mask[:, :, None] * mask[:, None, :]
    adj = adj * (1.0 - jnp.eye(N, dtype=atom_x.dtype)[None])

    diff = atom_x[:, :, None, :] - atom_x[:, None, :, :]
    r2 = jnp.sum(diff**2, axis=-1)
    r = jnp.sqrt(jnp.where(adj > 0, r2, 1.0))  # masked-out pairs -> r=1

    rm_table = jnp.asarray(lj_rm, atom_x.dtype) / 100.0 / norm_value  # pm -> A
    types = jnp.argmax(atom_one_hot, axis=-1)
    rm = rm_table[types[:, :, None], types[:, None, :]]
    sigma = 2 ** (-1.0 / 6.0) * rm
    sr = sigma / r
    out = 4 * (sr**12 - sr**6)
    if clamp is not None:
        out = jnp.minimum(out, clamp)
    out = out * adj
    return jnp.sum(out, axis=(1, 2))


class WeightSchedule:
    """weight(t) lookup: linearly decaying from max_weight at t=0, or constant."""

    def __init__(self, T: int, max_weight: float, mode: str = "linear"):
        if mode == "linear":
            self.weights = jnp.asarray(
                np.linspace(max_weight, 0, T + 1), jnp.float32)
        elif mode == "constant":
            self.weights = max_weight * jnp.ones(T + 1, jnp.float32)
        else:
            raise NotImplementedError(f"{mode} weight schedule")

    def __call__(self, t_int):
        return self.weights[jnp.asarray(t_int, jnp.int32)]
