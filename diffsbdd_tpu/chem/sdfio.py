"""SDF (MDL molfile V2000) and XYZ IO without external chemistry libraries.

Covers the reference's uses of RDKit SDMolSupplier/SDWriter and the xyz
writer (utils.py:64-85, analysis/molecule_builder.py:70-86).  Molecules are
``SimpleMol`` objects (diffsbdd_tpu.chem.molecule).
"""
from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np


def write_xyz_file(coords, atom_types, filename):
    """Plain xyz writer (utils.py:64-70)."""
    coords = np.asarray(coords)
    out = f"{len(coords)}\n\n"
    assert len(coords) == len(atom_types)
    for i in range(len(coords)):
        out += (f"{atom_types[i]} {coords[i, 0]:.3f} "
                f"{coords[i, 1]:.3f} {coords[i, 2]:.3f}\n")
    with open(filename, "w") as f:
        f.write(out)


def load_xyz_files(path, shuffle=True):
    """List xyz files in a directory (analysis/visualization.py:26-34)."""
    files = sorted(Path(path).glob("*.txt")) + sorted(Path(path).glob("*.xyz"))
    if shuffle:
        import random
        files = list(files)
        random.shuffle(files)
    return files


def load_molecule_xyz(file, atom_encoder):
    """Read one xyz file -> (coords (N,3), one_hot (N, A)) numpy arrays."""
    with open(file) as f:
        n_atoms = int(f.readline())
        f.readline()
        coords = np.zeros((n_atoms, 3), dtype=np.float32)
        one_hot = np.zeros((n_atoms, len(atom_encoder)), dtype=np.float32)
        for i in range(n_atoms):
            parts = f.readline().split()
            coords[i] = [float(v) for v in parts[1:4]]
            one_hot[i, atom_encoder[parts[0]]] = 1.0
    return coords, one_hot


def _mol_block(mol, name="") -> str:
    n_atoms = len(mol.coords)
    n_bonds = len(mol.bonds)
    lines = [name, "  diffsbdd_tpu", ""]
    lines.append(f"{n_atoms:3d}{n_bonds:3d}  0  0  0  0  0  0  0  0999 V2000")
    for i in range(n_atoms):
        x, y, z = mol.coords[i]
        lines.append(
            f"{x:10.4f}{y:10.4f}{z:10.4f} {mol.symbols[i]:<3} 0  0  0  0  0  0  0  0  0  0  0  0")
    for (i, j, order) in mol.bonds:
        # orders are V2000-coded ints already (4 = aromatic)
        lines.append(f"{i + 1:3d}{j + 1:3d}{int(order):3d}  0")
    lines.append("M  END")
    return "\n".join(lines)


def write_sdf_file(sdf_path, molecules):
    """Write a list of SimpleMol (or rdkit mols) to an SDF file.

    Mirrors utils.py:73-85 including skipping None entries.
    """
    with open(sdf_path, "w") as f:
        for m in molecules:
            if m is None:
                continue
            if hasattr(m, "GetNumAtoms"):  # rdkit molecule
                from rdkit import Chem  # pragma: no cover - optional bridge
                f.write(Chem.MolToMolBlock(m, kekulize=False))
            else:
                f.write(_mol_block(m, name=getattr(m, "name", "")))
            f.write("\n$$$$\n")


def read_sdf(path, keep_invalid: bool = False) -> List["SimpleMol"]:
    """Parse every V2000 molblock in an SDF file into SimpleMol objects.

    ``keep_invalid``: append ``None`` for molecule-shaped blocks that fail
    to parse instead of silently skipping them — callers that index other
    tools by molecule position in the FILE (e.g. obabel -f/-l in the
    docking pipeline) need the indices to stay aligned."""
    from diffsbdd_tpu.chem.molecule import SimpleMol

    mols = []
    with open(path) as f:
        content = f.read()
    for block in content.split("$$$$"):
        lines = block.strip("\n").split("\n")
        if len(lines) < 4:
            continue
        # counts line usually ends in V2000 but the version tag is optional;
        # fall back to the canonical position (line 4 of the molblock)
        counts_idx = None
        for i, ln in enumerate(lines[:8]):
            if ln.rstrip().endswith("V2000"):
                counts_idx = i
                break
        if counts_idx is None:
            counts_idx = 3
        try:
            counts = lines[counts_idx]
            n_atoms = int(counts[0:3])
            n_bonds = int(counts[3:6])
            symbols, coords = [], []
            for i in range(n_atoms):
                ln = lines[counts_idx + 1 + i]
                coords.append([float(ln[0:10]), float(ln[10:20]),
                               float(ln[20:30])])
                symbols.append(ln[31:34].strip())
            bonds = []
            for i in range(n_bonds):
                ln = lines[counts_idx + 1 + n_atoms + i]
                a = int(ln[0:3]) - 1
                b = int(ln[3:6]) - 1
                order = int(ln[6:9])
                bonds.append((a, b, order))
        except (ValueError, IndexError):
            if keep_invalid:
                mols.append(None)
            continue
        name = lines[0].strip() if counts_idx >= 3 else ""
        mols.append(SimpleMol(symbols=symbols,
                              coords=np.array(coords, dtype=np.float32),
                              bonds=bonds, name=name))
    return mols
