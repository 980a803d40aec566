"""Substructure inpainting / fragment linking CLI — equivalent of
/root/reference/inpaint.py (RePaint-style conditional inpainting).

    python -m diffsbdd_tpu.cli.inpaint <ckpt_dir> --pdbfile example/5ndu.pdb \
        --ref_ligand C:8V2 --fix_atoms C1 N6 C5 C12 --outfile out.sdf
    python -m diffsbdd_tpu.cli.inpaint <ckpt_dir> --pdbfile example/5ndu.pdb \
        --ref_ligand example/5ndu_C_8V2.sdf --fix_atoms example/fragments.sdf \
        --outfile linked.sdf
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffsbdd_tpu.chem import pdb as pdbmod
from diffsbdd_tpu.chem.molecule import build_molecule, process_molecule
from diffsbdd_tpu.chem.sdfio import read_sdf, write_sdf_file
from diffsbdd_tpu.checkpoint import load_model
from diffsbdd_tpu.data.dataset import round_to_bucket
from diffsbdd_tpu.utils.misc import shift_to_pocket_frame
from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask


def prepare_substructure(ref_ligand, fix_atoms, struct, atom_encoder):
    """Fixed-substructure coords/one-hot from SDF files or PDB atom names
    (inpaint.py:19-60)."""
    if fix_atoms[0].endswith(".sdf"):
        coords, one_hot = [], []
        for fn in fix_atoms:
            mol = read_sdf(fn)[0]
            coords.append(np.asarray(mol.coords, np.float32))
            oh = np.zeros((mol.n_atoms, len(atom_encoder)), np.float32)
            for i, s in enumerate(mol.symbols):
                oh[i, atom_encoder[s]] = 1.0
            one_hot.append(oh)
        return np.concatenate(coords), np.concatenate(one_hot)

    chain, resi = ref_ligand.split(":")
    lig_res = struct.residue(chain, int(resi))
    wanted = set(fix_atoms)
    atoms = [a for a in lig_res.atoms if a.name in wanted]
    coords = np.asarray([a.coord for a in atoms], np.float32)
    one_hot = np.zeros((len(atoms), len(atom_encoder)), np.float32)
    for i, a in enumerate(atoms):
        one_hot[i, atom_encoder[a.element.capitalize()]] = 1.0
    return coords, one_hot


def inpaint_ligand(module, params, rng, pdb_file, n_samples: int,
                   ligand: str, fix_atoms: List[str],
                   add_n_nodes: Optional[int] = None, center: str = "ligand",
                   sanitize: bool = False, largest_frag: bool = False,
                   relax_iter: int = 0, timesteps: Optional[int] = None,
                   resamplings: int = 1, save_traj: bool = False,
                   size_rng: Optional[np.random.Generator] = None):
    """Generate ligands around a fixed substructure (inpaint.py:63-189).

    ``save_traj`` (requires n_samples=1) returns one molecule per denoising
    frame instead of per sample, like the reference's trajectory mode.
    """
    if save_traj and n_samples > 1:
        raise NotImplementedError(
            "Can only visualize trajectory with n_samples=1.")
    frames = (timesteps or module.ddpm.T) if save_traj else 1
    if save_traj:
        sanitize, relax_iter, largest_frag = False, 0, False
    struct = pdbmod.parse_pdb(pdb_file)
    residues = pdbmod.get_pocket_from_ligand(struct, ligand)
    pocket = module.prepare_pocket(residues, repeats=n_samples)

    x_fixed, one_hot_fixed = prepare_substructure(
        ligand, fix_atoms, struct, module.lig_type_encoder)
    n_fixed = len(x_fixed)

    if add_n_nodes is None:
        num_nodes = module.ddpm.size_distribution.sample_conditional(
            n2=np.asarray(pocket["size"]), rng=size_rng)
        num_nodes = np.clip(num_nodes, n_fixed, None)
    else:
        num_nodes = np.full(n_samples, n_fixed + add_n_nodes)

    n_lig_pad = round_to_bucket(int(num_nodes.max()), module.lig_bucket)
    lig_mask = num_nodes_to_mask(num_nodes, n_lig_pad)

    ligand_batch = {
        "x": np.zeros((n_samples, n_lig_pad, 3), np.float32),
        "one_hot": np.zeros((n_samples, n_lig_pad, module.atom_nf), np.float32),
        "mask": lig_mask.astype(np.float32),
        "size": np.asarray(num_nodes, np.int32),
    }
    lig_fixed = np.zeros((n_samples, n_lig_pad), np.float32)
    ligand_batch["x"][:, :n_fixed] = x_fixed[None]
    ligand_batch["one_hot"][:, :n_fixed] = one_hot_fixed[None]
    lig_fixed[:, :n_fixed] = 1.0

    ligand_batch = {k: jnp.asarray(v) for k, v in ligand_batch.items()}

    pkt_m = np.asarray(pocket["mask"])
    com_before = (np.asarray(pocket["x"]) * pkt_m[..., None]).sum(1) \
        / pkt_m.sum(1)[..., None]

    from diffsbdd_tpu.diffusion.ddpm import JointDDPM
    joint = isinstance(module.ddpm, JointDDPM)
    if save_traj:
        if joint:
            raise NotImplementedError(
                "--save_traj is only supported for conditional checkpoints "
                "(the joint RePaint sampler does not collect frames)")
        xh_lig, xh_pocket = module.ddpm.inpaint(
            params, rng, ligand_batch, pocket, jnp.asarray(lig_fixed),
            center=center, resamplings=resamplings, timesteps=timesteps,
            return_frames=frames)
    elif joint:
        # joint checkpoints inpaint with every pocket node clamped
        # (lightning_modules.py:814-834 semantics); no `center` option —
        # the joint sampler works in its own CoM-free frame
        xh_lig, xh_pocket = module.ddpm.inpaint_segmented(
            params, rng, ligand_batch, pocket, jnp.asarray(lig_fixed),
            pocket_fixed=pocket["mask"], resamplings=resamplings,
            timesteps=timesteps, segment=50)
    else:
        # segmented dispatch: identical trajectory, bounded per-dispatch
        # execution (T x resamplings iterations would otherwise run as one
        # monolithic device program)
        # shared_pocket: one pocket replicated across the samples
        xh_lig, xh_pocket = module.ddpm.inpaint_segmented(
            params, rng, ligand_batch, pocket, jnp.asarray(lig_fixed),
            center=center, resamplings=resamplings, timesteps=timesteps,
            segment=50, shared_pocket=True)

    if save_traj:
        # treat intermediate frames as the batch axis (inpaint.py:152-162)
        xh_lig = np.array(xh_lig[:, 0])
        xh_pocket = np.array(xh_pocket[:, 0])
        lig_mask = np.repeat(lig_mask[:1], frames, axis=0)
        pkt_m = np.repeat(pkt_m[:1], frames, axis=0)
        com_before = np.repeat(com_before[:1], frames, axis=0)
        n_samples = frames
    xh_lig, xh_pocket = shift_to_pocket_frame(
        xh_lig, xh_pocket, np.asarray(lig_mask), pkt_m, com_before)

    molecules = []
    for b in range(n_samples):
        sel = np.asarray(lig_mask)[b] > 0
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
    p.add_argument("--fix_atoms", type=str, nargs="+", required=True)
    p.add_argument("--center", type=str, default="ligand",
                   choices={"ligand", "pocket"})
    p.add_argument("--outfile", type=Path, required=True)
    p.add_argument("--n_samples", type=int, default=20)
    p.add_argument("--add_n_nodes", type=int, default=None)
    p.add_argument("--relax", action="store_true")
    p.add_argument("--sanitize", action="store_true")
    p.add_argument("--resamplings", type=int, default=20)
    p.add_argument("--timesteps", type=int, default=50)
    p.add_argument("--save_traj", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    module, state, _ = load_model(args.checkpoint)
    molecules = inpaint_ligand(
        module, state.params, jax.random.PRNGKey(args.seed), args.pdbfile,
        args.n_samples, args.ref_ligand, args.fix_atoms,
        add_n_nodes=args.add_n_nodes, center=args.center,
        sanitize=args.sanitize,
        relax_iter=(200 if args.relax else 0),
        timesteps=args.timesteps, resamplings=args.resamplings,
        save_traj=args.save_traj,
        size_rng=np.random.default_rng(args.seed))

    args.outfile.parent.mkdir(parents=True, exist_ok=True)
    write_sdf_file(args.outfile, molecules)
    print(f"wrote {len(molecules)} molecules to {args.outfile}")


if __name__ == "__main__":
    main()
