"""CrossDocked preprocessing pipeline.

Dependency-free equivalent of /root/reference/process_crossdock.py: reads the
Pocket2Mol split of the CrossDocked pocket10 dataset, extracts ligand atoms
and pocket residues within a distance cutoff (CA-only or full-atom), and
writes ``{train,val,test}.npz`` (the flat-array format consumed by
diffsbdd_tpu.data.dataset) plus the derived statistics:

* ``size_distribution.npy`` — Gaussian-smoothed joint (n_lig, n_pocket)
  histogram (process_crossdock.py:144-170),
* ``train_smiles.npy`` — canonical keys of the training ligands for novelty
  metrics (RDKit SMILES when available, WL hashes otherwise),
* type histograms (process_crossdock.py:221-232).

Bond-length / Lennard-Jones matrices are *generated* from
diffsbdd_tpu.constants (verified equal to the reference arrays), so they are
not recomputed here.
"""
from __future__ import annotations

import argparse
import random
import shutil
from pathlib import Path
from time import time
from typing import Dict, Optional

import numpy as np

from diffsbdd_tpu.chem import pdb as pdbmod
from diffsbdd_tpu.chem.sdfio import read_sdf


def process_ligand_and_pocket(pdbfile, sdffile, atom_dict, amino_acid_dict,
                              dist_cutoff: float, ca_only: bool):
    """One complex -> (ligand_data, pocket_data) flat arrays.

    Mirrors process_crossdock.py:26-111: hydrogens outside the atom dict are
    dropped from the ligand; unknown heavy atoms raise so the complex is
    skipped; pocket residues are standard AAs with any atom within the cutoff.
    """
    struct = pdbmod.parse_pdb(pdbfile)
    mols = read_sdf(sdffile)
    if not mols:
        raise ValueError(f"cannot read sdf mol ({sdffile})")
    ligand = mols[0]

    keep = [i for i, s in enumerate(ligand.symbols)
            if s.capitalize() in atom_dict or s != "H"]
    lig_symbols = [ligand.symbols[i] for i in keep]
    lig_coords = np.asarray(ligand.coords, np.float64)[keep]
    try:
        lig_one_hot = np.stack([
            np.eye(1, len(atom_dict), atom_dict[s.capitalize()]).squeeze()
            for s in lig_symbols])
    except KeyError as e:
        raise KeyError(f"{e} not in atom dict ({sdffile})")

    pocket_residues = pdbmod.get_pocket_residues_from_coords(
        struct, lig_coords, dist_cutoff=dist_cutoff)
    if not pocket_residues:
        raise ValueError(f"empty pocket ({pdbfile})")
    pocket_ids = [f"{res.chain_id}:{res.resseq}" for res in pocket_residues]

    if ca_only:
        coords, one_hot = [], []
        for res in pocket_residues:
            ca = res.get_atom("CA")
            if ca is None:
                # reference indexes res['CA'] directly, so a CA-less
                # residue excludes the whole complex, not just the residue
                raise KeyError(f"no CA in {res.chain_id}:{res.resseq}")
            one_hot.append(np.eye(1, len(amino_acid_dict),
                                  amino_acid_dict[res.one_letter()]).squeeze())
            coords.append(ca.coord)
        pocket_coords = np.stack(coords)
        pocket_one_hot = np.stack(one_hot)
    else:
        coords, one_hot = [], []
        for res in pocket_residues:
            for atom in res.atoms:
                el = atom.element.capitalize()
                if el in amino_acid_dict:
                    one_hot.append(np.eye(1, len(amino_acid_dict),
                                          amino_acid_dict[el]).squeeze())
                elif el != "H":
                    # unknown heavy atom -> 'others' column, as the reference
                    one_hot.append(np.eye(1, len(amino_acid_dict),
                                          len(amino_acid_dict) - 1).squeeze())
                else:
                    continue
                coords.append(atom.coord)
        pocket_coords = np.stack(coords)
        pocket_one_hot = np.stack(one_hot)

    ligand_data = {"lig_coords": lig_coords.astype(np.float32),
                   "lig_one_hot": lig_one_hot.astype(np.float32)}
    pocket_data = {"pocket_coords": pocket_coords.astype(np.float32),
                   "pocket_one_hot": pocket_one_hot.astype(np.float32),
                   "pocket_ids": pocket_ids}
    return ligand_data, pocket_data


def get_n_nodes(lig_mask, pocket_mask, smooth_sigma: Optional[float] = None):
    """Joint size histogram with optional Gaussian smoothing
    (process_crossdock.py:144-170)."""
    idx_lig, n_lig = np.unique(lig_mask, return_counts=True)
    idx_pkt, n_pkt = np.unique(pocket_mask, return_counts=True)
    assert np.all(idx_lig == idx_pkt)

    joint = np.zeros((int(n_lig.max()) + 1, int(n_pkt.max()) + 1))
    for nl, npk in zip(n_lig, n_pkt):
        joint[nl, npk] += 1

    if smooth_sigma is not None:
        from scipy.ndimage import gaussian_filter
        joint = gaussian_filter(joint, sigma=smooth_sigma, order=0,
                                mode="constant", cval=0.0, truncate=4.0)
    return joint


def compute_smiles(positions, one_hot, mask, dataset_info):
    """Canonical keys of the training ligands (process_crossdock.py:114-141)."""
    from diffsbdd_tpu.chem.molecule import build_molecule

    sections = np.where(np.diff(mask))[0] + 1
    positions = [np.asarray(p) for p in np.split(positions, sections)]
    types = [np.asarray(o).argmax(-1) for o in np.split(one_hot, sections)]
    smiles = []
    for pos, t in zip(positions, types):
        mol = build_molecule(pos, t, dataset_info)
        key = mol.largest_fragment().to_smiles()
        if key is not None:
            smiles.append(key)
    return np.array(smiles)


def type_histograms(lig_one_hot, pocket_one_hot, atom_decoder, aa_decoder):
    atom_counts = {a: 0 for a in atom_decoder}
    for idx in np.asarray(lig_one_hot).argmax(-1):
        atom_counts[atom_decoder[idx]] += 1
    aa_counts = {a: 0 for a in aa_decoder}
    for idx in np.asarray(pocket_one_hot).argmax(-1):
        aa_counts[aa_decoder[idx]] += 1
    return atom_counts, aa_counts


def saveall(filename, names, lig_coords, lig_one_hot, lig_mask,
            pocket_coords, pocket_one_hot, pocket_mask, receptors=None):
    extra = {} if receptors is None else {"receptors": receptors}
    np.savez(filename, names=names,
             lig_coords=lig_coords, lig_one_hot=lig_one_hot,
             lig_mask=lig_mask, pocket_coords=pocket_coords,
             pocket_one_hot=pocket_one_hot, pocket_mask=pocket_mask,
             **extra)


def read_split(split_path) -> Dict[str, list]:
    """Pocket2Mol split file: torch .pt dict {split: [(pocket, ligand), ...]}
    or an equivalent .json."""
    split_path = Path(split_path)
    if split_path.suffix == ".pt":
        import torch
        return torch.load(split_path, weights_only=False)
    import json
    return json.loads(split_path.read_text())


def process_split(split_pairs, datadir, processed_dir, split_name, atom_dict,
                  amino_acid_dict, dist_cutoff, ca_only,
                  copy_test_files=True):
    """Extract every complex of one split; returns flat arrays + failures."""
    acc = {k: [] for k in ("lig_coords", "lig_one_hot", "lig_mask",
                           "pocket_coords", "pocket_one_hot", "pocket_mask")}
    names = []
    failed = []
    count = 0
    out_dir = Path(processed_dir, split_name)
    out_dir.mkdir(parents=True, exist_ok=True)

    for pocket_fn, ligand_fn in split_pairs:
        sdffile = Path(datadir, ligand_fn)
        pdbfile = Path(datadir, pocket_fn)
        try:
            ligand_data, pocket_data = process_ligand_and_pocket(
                pdbfile, sdffile, atom_dict, amino_acid_dict, dist_cutoff,
                ca_only)
        except (KeyError, ValueError, FileNotFoundError, AssertionError,
                IndexError) as e:
            failed.append((str(type(e).__name__), pocket_fn, ligand_fn))
            continue

        names.append(f"{pocket_fn}_{ligand_fn}")
        acc["lig_coords"].append(ligand_data["lig_coords"])
        acc["lig_one_hot"].append(ligand_data["lig_one_hot"])
        acc["lig_mask"].append(
            count * np.ones(len(ligand_data["lig_coords"])))
        acc["pocket_coords"].append(pocket_data["pocket_coords"])
        acc["pocket_one_hot"].append(pocket_data["pocket_one_hot"])
        acc["pocket_mask"].append(
            count * np.ones(len(pocket_data["pocket_coords"])))
        count += 1

        if split_name in {"val", "test"} and copy_test_files:
            # keep the PDB/SDF + pocket-id txt for the benchmark sampler
            new_rec = Path(pdbfile).stem.replace("_", "-")
            shutil.copy(pdbfile, Path(out_dir, f"{new_rec}.pdb"))
            new_lig = f"{new_rec}_{Path(sdffile).stem.replace('_', '-')}"
            shutil.copy(sdffile, Path(out_dir, new_lig + ".sdf"))
            with open(Path(out_dir, new_lig + ".txt"), "w") as f:
                f.write(" ".join(pocket_data["pocket_ids"]))

    flat = {k: np.concatenate(v) if v else np.zeros((0,))
            for k, v in acc.items()}
    return names, flat, failed


def main(argv=None):
    from diffsbdd_tpu.constants import dataset_params

    p = argparse.ArgumentParser()
    p.add_argument("basedir", type=Path)
    p.add_argument("--outdir", type=Path, default=None)
    p.add_argument("--split_file", type=Path, default=None)
    p.add_argument("--ca_only", action="store_true")
    p.add_argument("--dist_cutoff", type=float, default=8.0)
    p.add_argument("--random_seed", type=int, default=42)
    args = p.parse_args(argv)

    datadir = args.basedir / "crossdocked_pocket10"
    split_file = args.split_file or args.basedir / "split_by_name.pt"
    processed_dir = args.outdir or Path(
        args.basedir, "processed_crossdock_noH_ca_only" if args.ca_only
        else "processed_crossdock_noH_full")
    processed_dir.mkdir(parents=True, exist_ok=True)

    dinfo = dataset_params["crossdock" if args.ca_only else "crossdock_full"]
    atom_dict = dinfo["atom_encoder"]
    amino_acid_dict = dinfo["aa_encoder"]

    random.seed(args.random_seed)
    np.random.seed(args.random_seed)

    data_split = read_split(split_file)
    # reference: carve a validation set out of train (300 complexes)
    if "val" not in data_split:
        random.shuffle(data_split["train"])
        data_split["val"] = data_split["train"][:300]
        data_split["train"] = data_split["train"][300:]

    train_flat = None
    for split in data_split:
        tic = time()
        names, flat, failed = process_split(
            data_split[split], datadir, processed_dir, split, atom_dict,
            amino_acid_dict, args.dist_cutoff, args.ca_only)
        saveall(processed_dir / f"{split}.npz", names, **flat)
        print(f"{split}: {len(names)} complexes "
              f"({len(failed)} failed) in {time() - tic:.1f}s")
        if split == "train":
            train_flat = flat

    # statistics from the training split
    n_nodes = get_n_nodes(train_flat["lig_mask"], train_flat["pocket_mask"],
                          smooth_sigma=1.0)
    np.save(processed_dir / "size_distribution.npy", n_nodes)
    smiles = compute_smiles(train_flat["lig_coords"],
                            train_flat["lig_one_hot"],
                            train_flat["lig_mask"], dinfo)
    np.save(processed_dir / "train_smiles.npy", smiles)
    # full-atom pockets are atom-typed: decode with the atom decoder
    atom_hist, aa_hist = type_histograms(
        train_flat["lig_one_hot"], train_flat["pocket_one_hot"],
        dinfo["atom_decoder"],
        dinfo["aa_decoder"] if args.ca_only else dinfo["atom_decoder"])
    print("atom histogram:", atom_hist)
    print("aa histogram:", aa_hist)


if __name__ == "__main__":
    main()
