"""Evolutionary molecule optimization CLI — equivalent of
/root/reference/optimize.py: population -> partial noise/denoise
(``diversify``) -> score -> top-k selection -> repeat.

    python -m diffsbdd_tpu.cli.optimize <ckpt_dir> --pdbfile example/5ndu.pdb \
        --ref_ligand example/5ndu_C_8V2.sdf --objective sa --outfile opt.sdf
"""
from __future__ import annotations

import argparse
import random
from pathlib import Path
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from diffsbdd_tpu.chem import pdb as pdbmod
from diffsbdd_tpu.chem.metrics import MoleculeProperties
from diffsbdd_tpu.chem.molecule import SimpleMol, build_molecule, process_molecule
from diffsbdd_tpu.chem.sdfio import read_sdf, write_sdf_file
from diffsbdd_tpu.checkpoint import load_model
from diffsbdd_tpu.data.dataset import round_to_bucket
from diffsbdd_tpu.utils.misc import shift_to_pocket_frame


def prepare_ligands_from_mols(mols: List[SimpleMol], atom_encoder,
                              n_lig_pad: int):
    """Molecule list -> padded ligand batch (optimize.py:39-62)."""
    B = len(mols)
    A = len(atom_encoder)
    ligand = {
        "x": np.zeros((B, n_lig_pad, 3), np.float32),
        "one_hot": np.zeros((B, n_lig_pad, A), np.float32),
        "mask": np.zeros((B, n_lig_pad), np.float32),
        "size": np.zeros((B,), np.int32),
    }
    for b, mol in enumerate(mols):
        n = mol.n_atoms
        ligand["x"][b, :n] = mol.coords
        for i, s in enumerate(mol.symbols):
            ligand["one_hot"][b, i, atom_encoder[s]] = 1.0
        ligand["mask"][b, :n] = 1.0
        ligand["size"][b] = n
    return {k: jnp.asarray(v) for k, v in ligand.items()}


def diversify_ligands(module, params, rng, pocket, mols: List[SimpleMol],
                      timesteps: int, sanitize: bool = False,
                      largest_frag: bool = False, relax_iter: int = 0):
    """Partial noising + denoising of a population (optimize.py:92-147)."""
    n_lig_pad = round_to_bucket(
        max(m.n_atoms for m in mols), module.lig_bucket)
    ligand = prepare_ligands_from_mols(
        mols, module.lig_type_encoder, n_lig_pad)

    pkt_m = np.asarray(pocket["mask"])
    com_before = (np.asarray(pocket["x"]) * pkt_m[..., None]).sum(1) \
        / pkt_m.sum(1)[..., None]

    # shared_pocket: the optimize CLI replicates ONE pocket across the
    # population (optimize.py:175-184 layout)
    xh_lig, xh_pocket = module.ddpm.diversify(
        params, rng, ligand, pocket, noising_steps=timesteps,
        shared_pocket=True)

    lig_m = np.asarray(ligand["mask"])
    xh_lig, xh_pocket = shift_to_pocket_frame(
        xh_lig, xh_pocket, lig_m, pkt_m, com_before)

    molecules = []
    for b in range(len(mols)):
        sel = lig_m[b] > 0
        mol = build_molecule(xh_lig[b, sel, :3],
                             xh_lig[b, sel, 3:].argmax(-1),
                             module.dataset_info, add_coords=True)
        mol = process_molecule(mol, sanitize=sanitize, relax_iter=relax_iter,
                               largest_frag=largest_frag)
        if mol is not None:
            molecules.append(mol)
    return molecules


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", type=Path)
    p.add_argument("--pdbfile", type=str, required=True)
    p.add_argument("--ref_ligand", type=str, required=True)
    p.add_argument("--objective", type=str, default="sa",
                   choices={"qed", "sa"})
    p.add_argument("--timesteps", type=int, default=100)
    p.add_argument("--population_size", type=int, default=100)
    p.add_argument("--evolution_steps", type=int, default=10)
    p.add_argument("--top_k", type=int, default=7)
    p.add_argument("--outfile", type=Path, required=True)
    p.add_argument("--relax", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    module, state, _ = load_model(args.checkpoint)
    params = state.params

    struct = pdbmod.parse_pdb(args.pdbfile)
    residues = pdbmod.get_pocket_from_ligand(struct, args.ref_ligand)
    pocket = module.prepare_pocket(residues, repeats=args.population_size)

    props = MoleculeProperties()
    objective = props.calculate_qed if args.objective == "qed" \
        else props.calculate_sa

    ref_mol = read_sdf(args.ref_ligand)[0]
    rng = jax.random.PRNGKey(args.seed)
    random.seed(args.seed)

    ref_score = objective(ref_mol)
    if not np.isfinite(ref_score):
        raise RuntimeError(
            f"objective '{args.objective}' returned {ref_score} for the "
            f"reference ligand — refusing to run an optimization loop on a "
            f"non-finite objective (check the metrics backend)")

    rows = [{"generation": 0, "score": ref_score, "fate": "initial",
             "mol": ref_mol, "smiles": ref_mol.to_smiles()}]
    buffer = pd.DataFrame(rows)

    molecules = [ref_mol]
    for generation in range(args.evolution_steps):
        if generation == 0:
            population = molecules * args.population_size
        else:
            prev = buffer[buffer["generation"] == generation]
            if prev.empty:
                # a generation in which every molecule failed sanitization:
                # reseed from the best survivors of ALL prior generations
                # instead of crashing the run
                print(f"generation {generation} produced no valid "
                      f"molecules; reseeding from the global buffer")
                prev = buffer
            top_k = prev.nlargest(args.top_k, "score")["mol"].tolist()
            buffer.loc[buffer["generation"] == generation, "fate"] = "survived"
            # replicate survivors; remainder drawn at random from the
            # (never-empty) survivor list, as in the reference
            population = top_k * (args.population_size // len(top_k))
            while len(population) < args.population_size:
                population.append(random.choice(top_k))
        population = population[:args.population_size]

        scores = [objective(m) for m in population]
        print(f"generation {generation}, mean score: {np.nanmean(scores):.4f}")

        rng, step_rng = jax.random.split(rng)
        molecules = diversify_ligands(
            module, params, step_rng, pocket, population,
            timesteps=args.timesteps, sanitize=True,
            relax_iter=(200 if args.relax else 0))

        new_rows = [{"generation": generation + 1, "score": objective(m),
                     "fate": "purged", "mol": m, "smiles": m.to_smiles()}
                    for m in molecules]
        buffer = pd.concat([buffer, pd.DataFrame(new_rows)],
                           ignore_index=True)

    args.outfile.parent.mkdir(parents=True, exist_ok=True)
    write_sdf_file(args.outfile, molecules)
    buffer.drop(columns=["mol"]).to_csv(args.outfile.with_suffix(".csv"))
    print(f"wrote {len(molecules)} molecules to {args.outfile}")


if __name__ == "__main__":
    main()
