"""diffsbdd_tpu — a TPU-native JAX framework for structure-based drug design.

Re-implements the full capability surface of DiffSBDD (Schneuing et al., Nature
Computational Science 2024; reference code layout documented in SURVEY.md) as an
idiomatic JAX/XLA/Pallas/pjit stack:

* padded fixed-shape ligand/pocket graph batches instead of ragged concat+mask,
* a dense masked E(3)/SE(3)-equivariant GNN denoiser that maps onto the MXU,
* joint and pocket-conditional DDPMs whose ancestral samplers, RePaint
  inpainting and partial-noising diversification run as on-chip ``lax.scan``,
* data-parallel training over a ``jax.sharding.Mesh``,
* a host-side chemistry/evaluation subsystem (PDB/SDF IO, bond perception,
  molecular metrics, docking wrappers) with optional RDKit/OpenBabel bridges.
"""

__version__ = "0.1.0"
