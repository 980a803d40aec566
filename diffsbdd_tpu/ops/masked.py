"""Masked reductions over padded node axes.

The reference stores batches as ragged concatenations with a per-node graph-id
vector and reduces with torch_scatter (``scatter_add``/``scatter_mean``; see
/root/reference/equivariant_diffusion/en_diffusion.py:8,919-946).  On TPU we
use padded fixed shapes ``(B, N, ...)`` with a validity mask ``(B, N)`` so that
every reduction is a dense masked sum that XLA fuses and vectorizes — no
dynamic shapes, no scatters.
"""
from __future__ import annotations

import jax.numpy as jnp


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Sum of ``x`` (B, N, D) over the node axis, counting only mask==1 nodes."""
    return jnp.sum(x * jnp.expand_dims(mask, -1), axis=axis)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1, eps: float = 1e-12) -> jnp.ndarray:
    """Mean of ``x`` (B, N, D) over valid nodes; safe for empty masks."""
    total = masked_sum(x, mask, axis=axis)
    count = jnp.sum(mask, axis=axis, keepdims=False)
    return total / jnp.maximum(count, eps)[..., None]


def sum_except_batch(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Reduce all axes but the batch axis, ignoring padded nodes.

    Equivalent of the reference ``sum_except_batch`` (en_diffusion.py:944-946)
    on the padded layout: ``x`` is (B, N, D), ``mask`` is (B, N) -> (B,).
    """
    return jnp.sum(jnp.sum(x, axis=-1) * mask, axis=-1)
