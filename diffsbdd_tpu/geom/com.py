"""Center-of-mass subspace projections on padded ligand/pocket batches.

Three distinct semantics exist in the reference and are easy to silently mix
up (SURVEY.md §7 'hard parts'); they are separate, individually-tested
functions here:

* joint:        subtract the CoM of the *combined* ligand+pocket system from
                both parts (en_diffusion.py:919-923 used at :490-499).
* conditional:  subtract the *ligand* CoM from ligand AND pocket, so the pocket
                translates within the ligand frame (conditional_model.py:688-696).
* simple:       no projection (SimpleConditionalDDPM, conditional_model.py:717-721).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from diffsbdd_tpu.ops.masked import masked_mean, masked_sum


def remove_mean_joint(
    x_lig: jnp.ndarray,
    x_pocket: jnp.ndarray,
    mask_lig: jnp.ndarray,
    mask_pocket: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project coordinates onto the combined-system CoM-free subspace."""
    total = masked_sum(x_lig, mask_lig) + masked_sum(x_pocket, mask_pocket)
    count = jnp.sum(mask_lig, axis=1) + jnp.sum(mask_pocket, axis=1)
    mean = total / jnp.maximum(count, 1e-12)[..., None]
    return x_lig - mean[:, None, :], x_pocket - mean[:, None, :]


def remove_mean_conditional(
    x_lig: jnp.ndarray,
    x_pocket: jnp.ndarray,
    mask_lig: jnp.ndarray,
    mask_pocket: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Subtract the ligand CoM from both ligand and pocket coordinates."""
    mean = masked_mean(x_lig, mask_lig)
    return x_lig - mean[:, None, :], x_pocket - mean[:, None, :]


def remove_mean_simple(x_lig, x_pocket, mask_lig, mask_pocket):
    """Identity projection (SimpleConditionalDDPM)."""
    return x_lig, x_pocket


def remove_mean_single(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Subtract the masked CoM of a single padded node set (B, N, 3)."""
    mean = masked_mean(x, mask)
    return (x - mean[:, None, :]) * mask[..., None]


def max_com_drift(x_lig, x_pocket, mask_lig, mask_pocket) -> jnp.ndarray:
    """max |sum of coordinates| across batch — the CoG-drift monitor.

    Mirrors the reference drift check (en_diffusion.py:637-644) which compares
    the *sum* (scatter_add) of coordinates, not the mean.
    """
    s = masked_sum(x_lig, mask_lig) + masked_sum(x_pocket, mask_pocket)
    return jnp.max(jnp.abs(s))


def mean_zero_relative_error(x, mask) -> jnp.ndarray:
    """Relative CoM error used by the paranoid-mode invariant check.

    Mirrors ``assert_mean_zero_with_mask`` (en_diffusion.py:925-930): the max
    |masked sum| normalized by the largest coordinate magnitude.
    """
    largest = jnp.max(jnp.abs(x * mask[..., None]))
    err = jnp.max(jnp.abs(masked_sum(x, mask)))
    return err / (largest + 1e-10)
