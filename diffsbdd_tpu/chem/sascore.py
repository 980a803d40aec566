"""Synthetic accessibility (Ertl & Schuffenhauer) scoring.

The reference vendors RDKit's contrib SA scorer
(/root/reference/analysis/SA_Score/sascorer.py) together with its fragment
frequency table.  With RDKit installed, we load that identical scorer + data
from RDKit's Contrib directory.  Without RDKit, ``calculate_score`` accepts a
SimpleMol and falls back to the Ertl-style scorer in chem/descriptors.py
(complexity and symmetry terms exact, fragment-frequency term approximated),
so SA-driven workloads (cli.optimize, metrics) stay functional and never
return NaN.
"""
from __future__ import annotations

from diffsbdd_tpu.chem.molecule import HAVE_RDKIT, SimpleMol

_sascorer = None


def _load():
    global _sascorer
    if _sascorer is None:
        import os
        import sys

        from rdkit.Chem import RDConfig
        sa_dir = os.path.join(RDConfig.RDContribDir, "SA_Score")
        if sa_dir not in sys.path:
            sys.path.append(sa_dir)
        import sascorer  # type: ignore
        _sascorer = sascorer
    return _sascorer


def calculate_score(mol) -> float:
    """Ertl-Schuffenhauer SA score in [1, 10] (lower = easier to make).

    Accepts an RDKit mol (exact contrib scorer, requires RDKit) or a
    SimpleMol (dependency-free fallback scorer).
    """
    if isinstance(mol, SimpleMol):
        if HAVE_RDKIT:
            return _load().calculateScore(mol.to_rdkit())
        from diffsbdd_tpu.chem.descriptors import sa_score
        return sa_score(mol)
    return _load().calculateScore(mol)
