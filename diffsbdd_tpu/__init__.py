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

# Convenience re-exports (lazy where heavy)
from diffsbdd_tpu.config import Config, load_config  # noqa: E402,F401


def build_module(cfg, node_histogram):
    from diffsbdd_tpu.train.module import build_module_from_config
    return build_module_from_config(cfg, node_histogram)


def load_model(ckpt_dir, name="best"):
    from diffsbdd_tpu.checkpoint import load_model as _load
    return _load(ckpt_dir, name=name)
