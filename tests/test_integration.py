"""End-to-end slice: PDB -> pocket -> sampling -> molecule building -> metrics.

Uses the reference's example structure (read-only data) with a tiny untrained
model at T=10 — exercises the full inference pipeline that
cli/generate_ligands drives in production.
"""
from pathlib import Path

import jax
import numpy as np
import pytest

from diffsbdd_tpu.chem.molecule import SimpleMol
from diffsbdd_tpu.config import load_config
from diffsbdd_tpu.train.module import build_module_from_config

EXAMPLE_PDB = Path("/root/reference/example/3rfm.pdb")

pytestmark = pytest.mark.skipif(
    not EXAMPLE_PDB.exists(), reason="example PDB unavailable")


def tiny_module(mode="pocket_conditioning", rep="CA"):
    cfg = load_config(overrides={
        "dataset": "crossdock",
        "mode": mode,
        "pocket_representation": rep,
        "egnn_params": {"joint_nf": 8, "hidden_nf": 16, "n_layers": 1,
                        "inv_sublayers": 1, "attention": True, "tanh": True,
                        "norm_constant": 1, "edge_cutoff_pocket": 5.0,
                        "edge_cutoff_interaction": 5.0},
        "diffusion_params": {"diffusion_steps": 10,
                             "normalize_factors": [1, 4]},
        "tpu": {"n_lig_max": 16, "n_pocket_max": 64, "lig_bucket": 8,
                "pocket_bucket": 64},
    })
    hist = np.ones((17, 65))
    module = build_module_from_config(cfg, hist)
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    return module, params


def test_generate_ligands_conditional():
    module, params = tiny_module()
    mols, raw = module.generate_ligands(
        params, jax.random.PRNGKey(1), EXAMPLE_PDB, n_samples=4,
        ref_ligand="A:330", sanitize=False, n_nodes_min=4,
        size_rng=np.random.default_rng(0), return_raw=True)
    assert len(raw) == 4
    assert all(isinstance(m, SimpleMol) for m in raw)
    assert all(m.n_atoms >= 1 for m in raw)
    # generated ligand sits near the pocket (same frame as the input PDB)
    from diffsbdd_tpu.chem.pdb import get_pocket_from_ligand, parse_pdb
    struct = parse_pdb(EXAMPLE_PDB)
    residues = get_pocket_from_ligand(struct, "A:330")
    pocket_xyz = np.concatenate([r.coords() for r in residues])
    for m in raw:
        d = np.linalg.norm(
            m.coords.mean(0) - pocket_xyz.mean(0))
        assert d < 20.0, f"ligand far from pocket: {d}"


def test_generate_ligands_with_pocket_ids():
    module, params = tiny_module()
    mols, raw = module.generate_ligands(
        params, jax.random.PRNGKey(2), EXAMPLE_PDB, n_samples=2,
        pocket_ids=["A:45", "A:50", "A:52"],
        num_nodes_lig=np.array([8, 8]), return_raw=True)
    assert len(raw) == 2
    assert all(m.n_atoms == 8 for m in raw)


def test_generate_ligands_joint_inpainting_path():
    module, params = tiny_module(mode="joint")
    mols, raw = module.generate_ligands(
        params, jax.random.PRNGKey(3), EXAMPLE_PDB, n_samples=2,
        ref_ligand="A:330", num_nodes_lig=np.array([6, 6]),
        return_raw=True)
    assert len(raw) == 2


def test_analyze_samples():
    module, params = tiny_module()
    mols, raw = module.generate_ligands(
        params, jax.random.PRNGKey(4), EXAMPLE_PDB, n_samples=3,
        ref_ligand="A:330", num_nodes_lig=np.array([6, 6, 6]),
        return_raw=True)
    atom_types = [t for m in raw for t in
                  [module.lig_type_encoder[s] for s in m.symbols]]
    out = module.analyze_samples(raw, atom_types, aa_types=[0, 1, 2])
    for key in ("Validity", "Connectivity", "QED", "Diversity",
                "kl_div_atom_types"):
        assert key in out
