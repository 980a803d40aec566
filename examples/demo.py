"""End-to-end demo: build a model, sample ligands for a pocket, evaluate.

Scripted equivalent of the reference's Colab notebook
(/root/reference/colab/DiffSBDD.ipynb): pocket selection from a PDB file,
conditional generation, molecule building, metric evaluation, and SDF/xyz
export.  Runs with untrained weights out of the box; point ``--checkpoint``
at a converted Zenodo checkpoint for real samples.

    python examples/demo.py --pdbfile /root/reference/example/3rfm.pdb \
        --ref_ligand A:330 --n_samples 8 --outdir demo_out
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pdbfile", type=str, required=True)
    p.add_argument("--ref_ligand", type=str, default="A:330")
    p.add_argument("--n_samples", type=int, default=8)
    p.add_argument("--timesteps", type=int, default=100)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--outdir", type=Path, default=Path("demo_out"))
    args = p.parse_args()

    if args.checkpoint:
        from diffsbdd_tpu.checkpoint import load_model
        module, state, cfg = load_model(args.checkpoint)
        params = state.params
        print(f"loaded checkpoint from {args.checkpoint}")
    else:
        from diffsbdd_tpu.config import load_config
        from diffsbdd_tpu.train.module import build_module_from_config
        print("no checkpoint given — using untrained weights "
              "(structures will be noise-like)")
        cfg = load_config(overrides={
            "dataset": "crossdock",
            "mode": "pocket_conditioning",
            "pocket_representation": "full-atom",
            "egnn_params": {"joint_nf": 32, "hidden_nf": 64, "n_layers": 3,
                            "attention": True, "tanh": True,
                            "norm_constant": 1,
                            "edge_cutoff_pocket": 5.0,
                            "edge_cutoff_interaction": 5.0,
                            "reflection_equivariant": False},
            "diffusion_params": {"diffusion_steps": args.timesteps,
                                 "normalize_factors": [1, 4]},
        })
        hist = np.ones((31, 513))
        hist[:6, :] = 0  # at least 6 atoms
        module = build_module_from_config(cfg, hist)
        params = module.init_params(jax.random.PRNGKey(0))

    # --- generate --------------------------------------------------------
    print(f"sampling {args.n_samples} ligands for pocket "
          f"{args.ref_ligand} of {args.pdbfile} ...")
    mols, raw = module.generate_ligands(
        params, jax.random.PRNGKey(1), args.pdbfile, args.n_samples,
        ref_ligand=args.ref_ligand, timesteps=args.timesteps,
        sanitize=False, n_nodes_min=6, return_raw=True,
        size_rng=np.random.default_rng(0))
    print(f"built {len(raw)} molecules")

    # --- evaluate --------------------------------------------------------
    atom_types = [module.lig_type_encoder[s] for m in raw for s in m.symbols]
    metrics = module.analyze_samples(raw, atom_types, aa_types=[0])
    for k, v in metrics.items():
        print(f"  {k:24s} {v}")

    # --- export ----------------------------------------------------------
    args.outdir.mkdir(parents=True, exist_ok=True)
    from diffsbdd_tpu.chem.sdfio import write_sdf_file
    from diffsbdd_tpu.chem.visualization import save_xyz_file

    write_sdf_file(args.outdir / "samples.sdf", raw)
    for i, m in enumerate(raw):
        oh = np.zeros((m.n_atoms, len(module.lig_type_decoder)), np.float32)
        for j, s in enumerate(m.symbols):
            oh[j, module.lig_type_encoder[s]] = 1.0
        save_xyz_file(args.outdir, oh, m.coords, module.lig_type_decoder,
                      name=f"sample_{i}")
    print(f"wrote SDF + xyz files to {args.outdir}/")


if __name__ == "__main__":
    main()
