"""Geometry-precision localization for the synth-trained flagship (r05).

Connectivity plateaued at ~0.08 (covalent) from 20k to 34k steps while
Validity/Uniqueness/KL are reference-grade.  This probe separates the two
candidate causes:

* small-t dynamics imprecise -> diversify(t small) reconstructions of
  ground-truth ligands drift / break bonds;
* small-t fine, mid-chain mode inconsistency -> reconstructions are tight
  (low RMSD, bonds intact) and only full chains fragment.

Mirrors the r03 GEOMETRY_PROBE methodology (diversify =
conditional_model.py:332-409).  Writes benchmarks/SYNTH_GEOM_r05.json.
"""
import json, sys, time
from pathlib import Path
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
cache = REPO / ".jax_cache"; cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
import jax.numpy as jnp

from diffsbdd_tpu.checkpoint import load_model
from diffsbdd_tpu.chem.metrics import BasicMolecularMetrics
from diffsbdd_tpu.chem.molecule import build_molecule
from diffsbdd_tpu.data.dataset import LigandPocketDataset, pad_batch

CKPT = Path("/tmp/diffsbdd_synth_r05/runs/synth_quality_r05/checkpoints")
module, state, cfg = load_model(CKPT, name="last")
ds = LigandPocketDataset("/tmp/diffsbdd_synth_r05/data/val.npz")
items = [ds[i] for i in range(16)]
batch = pad_batch(items, 32, 320)
ligand = {k: jnp.asarray(v) for k, v in batch["ligand"].items()}
pocket = {k: jnp.asarray(v) for k, v in batch["pocket"].items()}

out = {"checkpoint_step": int(state.step)}
met = BasicMolecularMetrics(module.dataset_info)
for t_noise in (25, 100, 250):
    xh_lig, _ = module.ddpm.diversify(state.params, jax.random.PRNGKey(3),
                                      ligand, pocket, noising_steps=t_noise)
    xh = np.asarray(xh_lig)
    rmsds, bond_errs, frags = [], [], []
    mols = []
    for b, it in enumerate(items):
        n = len(it["lig_coords"])
        x = xh[b, :n, :3]
        x0 = np.asarray(ligand["x"][b, :n])
        rmsds.append(float(np.sqrt(((x - x0) ** 2).sum(-1).mean())))
        m = build_molecule(x, it["lig_one_hot"].argmax(-1),
                           module.dataset_info, perception="covalent")
        mols.append(m)
        frags.append(len(m.largest_fragment().symbols) / n)
        # bond-length error vs the GT bond set
        gt = build_molecule(x0, it["lig_one_hot"].argmax(-1),
                            module.dataset_info, perception="edm")
        for i, j, _ in gt.bonds:
            d0 = np.linalg.norm(x0[i] - x0[j])
            d1 = np.linalg.norm(x[i] - x[j])
            bond_errs.append(abs(d1 - d0))
    (v, c, _, _), _ = met.evaluate_mols(mols)
    out[f"t{t_noise}"] = {
        "rmsd_mean": round(float(np.mean(rmsds)), 4),
        "bond_len_abs_err_mean": round(float(np.mean(bond_errs)), 4),
        "bond_len_abs_err_p95": round(float(np.percentile(bond_errs, 95)), 4),
        "mean_largest_frag": round(float(np.mean(frags)), 4),
        "covalent_Validity": round(v, 4), "covalent_Connectivity": round(c, 4),
    }
    print(t_noise, json.dumps(out[f"t{t_noise}"]), flush=True)

(REPO / "benchmarks" / "SYNTH_GEOM_r05.json").write_text(
    json.dumps(out, indent=1) + "\n")
print("wrote SYNTH_GEOM_r05.json")
