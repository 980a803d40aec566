"""Docking-score wrappers around external binaries (smina / QuickVina2).

Host-side subprocess pipeline with the same semantics as
/root/reference/analysis/docking.py: smina ``--score_only`` scoring of SDF
ligands against a receptor, and the QuickVina2 redocking pipeline (obabel
SDF->PDBQT, 20A box centered at the ligand CoM, exhaustiveness 16).  All
binaries are optional; a clear error names what is missing.
"""
from __future__ import annotations

import os
import re
import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import List, Union

import numpy as np

from diffsbdd_tpu.chem.sdfio import read_sdf, write_sdf_file


def _require(binary: str):
    if shutil.which(binary) is None:
        raise FileNotFoundError(
            f"external binary '{binary}' not found on PATH — install it to "
            f"run docking evaluation")


def calculate_smina_score(pdb_file, sdf_file) -> List[float]:
    """Parse 'Affinity: <x> (kcal/mol)' lines from smina --score_only."""
    _require("smina.static")
    out = subprocess.run(
        ["smina.static", "-l", str(sdf_file), "-r", str(pdb_file),
         "--score_only"],
        capture_output=True, text=True).stdout
    matches = re.findall(
        r"Affinity:[ ]+([+-]?[0-9]*[.]?[0-9]+)[ ]+\(kcal/mol\)", out)
    return [float(x) for x in matches]


def smina_score(mols, receptor_file: Union[str, List[str]]) -> List[float]:
    """Score molecules against one receptor (or one receptor per molecule).

    Always returns exactly ``len(mols)`` entries (nan for failures), so
    per-molecule receptor pairing cannot drift when a score is missing."""
    if isinstance(receptor_file, list):
        if len(receptor_file) != len(mols):
            raise ValueError(
                f"{len(mols)} molecules but {len(receptor_file)} receptors "
                f"— per-molecule scoring needs a 1:1 pairing")
        scores = []
        for mol, rec in zip(mols, receptor_file):
            with tempfile.NamedTemporaryFile(suffix=".sdf") as tmp:
                write_sdf_file(tmp.name, [mol])
                res = calculate_smina_score(rec, tmp.name)
                scores.append(res[0] if res else float("nan"))
        return scores
    with tempfile.NamedTemporaryFile(suffix=".sdf") as tmp:
        write_sdf_file(tmp.name, mols)
        scores = calculate_smina_score(receptor_file, tmp.name)
    if len(scores) != len(mols):
        # a parse failure mid-file leaves alignment unknown — report nan for
        # everything rather than silently mispairing
        import warnings
        warnings.warn(f"smina returned {len(scores)} affinities for "
                      f"{len(mols)} molecules; discarding ambiguous scores")
        return [float("nan")] * len(mols)
    return scores


def pdb_to_pdbqt(pdb_file, pdbqt_file, dataset: str = "crossdocked"):
    """MGLTools receptor prep (reference analysis/docking_py27.py:14-23).

    BindingMOAD receptors get ``-A checkhydrogens -e`` (add missing
    hydrogens, drop non-standard residues) exactly as the reference's
    python-2.7 helper does; CrossDocked receptors are converted as-is.
    Existing outputs are kept (the reference's early-return caching)."""
    pdbqt_file = Path(pdbqt_file)
    if pdbqt_file.exists():
        return pdbqt_file
    _require("prepare_receptor4.py")
    cmd = ["prepare_receptor4.py", "-r", str(pdb_file),
           "-o", str(pdbqt_file)]
    if dataset in ("bindingmoad", "moad"):
        cmd += ["-A", "checkhydrogens", "-e"]
    elif dataset != "crossdocked":
        raise NotImplementedError(
            f"unknown dataset '{dataset}' (crossdocked | bindingmoad)")
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0 or not pdbqt_file.exists():
        raise RuntimeError(
            f"prepare_receptor4.py failed for {pdb_file} "
            f"(rc={res.returncode}): {res.stderr[-500:]}")
    return pdbqt_file


def pdbs_to_pdbqts(pdb_dir, pdbqt_dir, dataset: str = "crossdocked"):
    """Convert every ``*.pdb`` in a directory (docking_py27.py:6-11)."""
    pdbqt_dir = Path(pdbqt_dir)
    pdbqt_dir.mkdir(parents=True, exist_ok=True)
    out = []
    for f in sorted(Path(pdb_dir).glob("*.pdb")):
        outfile = pdbqt_dir / (f.stem + ".pdbqt")
        out.append(pdb_to_pdbqt(f, outfile, dataset))
        print(f"Wrote converted file to {outfile}")
    return out


def sdf_to_pdbqt(sdf_file, pdbqt_outfile, mol_id: int):
    _require("obabel")
    subprocess.run(
        ["obabel", str(sdf_file), "-O", str(pdbqt_outfile),
         "-f", str(mol_id + 1), "-l", str(mol_id + 1)],
        capture_output=True)
    return pdbqt_outfile


def calculate_qvina2_score(receptor_file, sdf_file, out_dir, size: int = 20,
                           exhaustiveness: int = 16, return_mols: bool = False):
    """QuickVina2 redocking of every ligand in an SDF file."""
    _require("qvina2.1")
    receptor_file = Path(receptor_file)
    sdf_file = Path(sdf_file)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if receptor_file.suffix == ".pdb":
        # MGLTools receptor prep (python 2.7 helper, docking.py:68)
        receptor_pdbqt = pdb_to_pdbqt(
            receptor_file, Path(out_dir, receptor_file.stem + ".pdbqt"))
    else:
        receptor_pdbqt = receptor_file

    scores = []
    out_mols = []
    # keep_invalid: molecule index i must match obabel's positional -f/-l
    # file indexing, so unparseable blocks stay as None placeholders
    mols = read_sdf(sdf_file, keep_invalid=True)
    for i, mol in enumerate(mols):
        name = f"{sdf_file.stem}_{i}"
        ligand_pdbqt = Path(out_dir, name + ".pdbqt")
        out_sdf = Path(out_dir, name + "_out.sdf")

        if mol is None:
            scores.append(float("nan"))
            if return_mols:
                out_mols.append(None)
            continue
        if out_sdf.exists():
            with open(out_sdf) as f:
                scores.append(min(
                    float(line.split()[2]) for line in f
                    if line.startswith(" VINA RESULT:")))
        else:
            sdf_to_pdbqt(sdf_file, ligand_pdbqt, i)
            cx, cy, cz = np.asarray(mol.coords).mean(0)
            out = subprocess.run(
                ["qvina2.1",
                 "--receptor", str(receptor_pdbqt),
                 "--ligand", str(ligand_pdbqt),
                 "--center_x", f"{cx:.4f}", "--center_y", f"{cy:.4f}",
                 "--center_z", f"{cz:.4f}",
                 "--size_x", str(size), "--size_y", str(size),
                 "--size_z", str(size),
                 "--exhaustiveness", str(exhaustiveness)],
                capture_output=True, text=True).stdout
            ligand_pdbqt.unlink(missing_ok=True)

            sep = "-----+------------+----------+----------"
            if sep not in out:
                scores.append(float("nan"))
                if return_mols:
                    out_mols.append(None)  # keep scores[i] <-> out_mols[i]
                continue
            lines = out.splitlines()
            best = lines[lines.index(sep) + 1].split()
            assert best[0] == "1"
            scores.append(float(best[1]))

            out_pdbqt = Path(out_dir, name + "_out.pdbqt")
            if out_pdbqt.exists():
                subprocess.run(["obabel", str(out_pdbqt), "-O", str(out_sdf)],
                               capture_output=True)
                out_pdbqt.unlink()

        if return_mols:
            # one entry per input ligand (None when no docked pose exists)
            docked = read_sdf(out_sdf) if out_sdf.exists() else []
            out_mols.append(docked[0] if docked else None)

    return (scores, out_mols) if return_mols else scores


# ---------------------------------------------------------------------------
# batch-scoring CLI (reference analysis/docking.py:133-197)
# ---------------------------------------------------------------------------

def main(argv=None):
    """Walk a directory of generated SDFs, QuickVina2-score each against its
    receptor, and write ``qvina2_scores.csv`` (+ optional results pickle).

    File-name convention matches the reference: for ``--dataset moad``
    ligand files are ``<receptor>_<pocket>_<suffix>.sdf`` with the receptor
    at ``<pdbqt_dir>/<receptor>.pdbqt``; for ``--dataset crossdocked`` the
    receptor name is the ligand stem minus its last 4 characters.
    """
    import argparse
    import pickle

    parser = argparse.ArgumentParser("QuickVina evaluation")
    parser.add_argument("--pdbqt_dir", type=Path, required=True,
                        help="Receptor files in pdbqt format")
    parser.add_argument("--sdf_dir", type=Path, default=None,
                        help="Ligand files in sdf format")
    parser.add_argument("--sdf_files", type=Path, nargs="+", default=None)
    parser.add_argument("--out_dir", type=Path, required=True)
    parser.add_argument("--write_csv", action="store_true")
    parser.add_argument("--write_dict", action="store_true")
    parser.add_argument("--dataset", type=str, default="moad",
                        choices=["moad", "crossdocked"])
    args = parser.parse_args(argv)

    assert (args.sdf_dir is not None) ^ (args.sdf_files is not None), \
        "give exactly one of --sdf_dir / --sdf_files"
    args.out_dir.mkdir(parents=True, exist_ok=True)

    results = {"receptor": [], "ligand": [], "scores": []}
    results_dict = {}
    sdf_files = sorted(args.sdf_dir.glob("[!.]*.sdf")) \
        if args.sdf_dir is not None else args.sdf_files
    for sdf_file in sdf_files:
        ligand_name = sdf_file.stem
        if args.dataset == "moad":
            receptor_name = ligand_name.split("_")[0]
        else:  # crossdocked: strip the '_gen'-style 4-char suffix
            receptor_name = ligand_name[:-4]
        receptor_file = Path(args.pdbqt_dir, receptor_name + ".pdbqt")

        scores, mols = calculate_qvina2_score(
            receptor_file, sdf_file, args.out_dir, return_mols=True)
        print(f"{ligand_name}: {scores}")
        results["receptor"].append(str(receptor_file))
        results["ligand"].append(str(sdf_file))
        results["scores"].append(scores)
        if args.write_dict:
            results_dict[ligand_name] = {
                "receptor": str(receptor_file), "ligand": str(sdf_file),
                "scores": scores, "mols": mols,
            }

    if args.write_csv:
        import pandas as pd
        pd.DataFrame.from_dict(results).to_csv(
            Path(args.out_dir, "qvina2_scores.csv"))
    if args.write_dict:
        # plain pickle instead of the reference's torch.save container
        with open(Path(args.out_dir, "qvina2_scores.pkl"), "wb") as f:
            pickle.dump(results_dict, f)
    return results


if __name__ == "__main__":
    main()
