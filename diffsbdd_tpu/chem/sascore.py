"""Synthetic accessibility (Ertl & Schuffenhauer) scoring.

The reference vendors RDKit's contrib SA scorer
(/root/reference/analysis/SA_Score/sascorer.py) together with its fragment
frequency table.  RDKit ships the identical scorer + data in its Contrib
directory, so here we load it from the installed RDKit instead of vendoring;
everything is gated on RDKit availability.
"""
from __future__ import annotations

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


def calculate_score(rdmol) -> float:
    """Ertl-Schuffenhauer SA score in [1, 10] (lower = easier to make)."""
    return _load().calculateScore(rdmol)
