"""Training-time data augmentation: random rigid rotation + CoM-free jitter.

The reference exposes ``augment_noise`` / ``augment_rotation`` config options
whose intended semantics are documented inline but left unimplemented
(/root/reference/lightning_modules.py:338-347 raises NotImplementedError on
both branches; the intent — center-of-gravity-free Gaussian jitter and a
random rigid rotation of the coordinates — comes from the upstream EDM
codebase those lines were copied from).  Here both options are functional:

* ``augment_noise > 0``: add ``eps * augment_noise`` to all coordinates,
  where ``eps`` is a standard Gaussian projected onto the joint
  (ligand+pocket) zero-CoM subspace per graph, so the augmentation never
  moves a complex off the CoM-free manifold the diffusion model lives on.
* ``augment_rotation``: draw one uniform random rotation per graph (via
  normalized quaternions) and apply it to ligand and pocket coordinates
  consistently.  Padded (masked-out) nodes sit at the origin and are fixed
  points of any rotation, so masking is preserved by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from diffsbdd_tpu.geom import com


def random_rotation_matrices(key, batch_size: int) -> jnp.ndarray:
    """(B, 3, 3) rotation matrices drawn uniformly from SO(3).

    A 4-D standard normal, normalized, is uniform on S^3; mapping the unit
    quaternion to its rotation matrix yields the Haar measure on SO(3).
    """
    q = jax.random.normal(key, (batch_size, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def augment_batch(key, ligand, pocket, augment_noise: float = 0.0,
                  augment_rotation: bool = False):
    """Return (ligand, pocket) with augmented coordinates (other fields shared)."""
    x_l, x_p = ligand["x"], pocket["x"]
    m_l, m_p = ligand["mask"], pocket["mask"]
    k_rot, k_noise = jax.random.split(key)

    if augment_rotation:
        rot = random_rotation_matrices(k_rot, x_l.shape[0])
        x_l = jnp.einsum("bij,bnj->bni", rot, x_l)
        x_p = jnp.einsum("bij,bnj->bni", rot, x_p)

    if augment_noise > 0:
        k1, k2 = jax.random.split(k_noise)
        eps_l = jax.random.normal(k1, x_l.shape) * m_l[..., None]
        eps_p = jax.random.normal(k2, x_p.shape) * m_p[..., None]
        eps_l, eps_p = com.remove_mean_joint(eps_l, eps_p, m_l, m_p)
        x_l = x_l + augment_noise * eps_l * m_l[..., None]
        x_p = x_p + augment_noise * eps_p * m_p[..., None]

    ligand = dict(ligand)
    pocket = dict(pocket)
    ligand["x"] = x_l
    pocket["x"] = x_p
    return ligand, pocket
