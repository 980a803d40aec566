"""Miscellaneous host-side utilities.

Ports of the reference's odds and ends (/root/reference/utils.py): the
graph-isomorphism RMSD used to compare generated conformers (:157-204) and a
bounded statistics queue (:12-29; the on-device variant used in training
lives in train/loop.py).
"""
from __future__ import annotations

from typing import Iterable, List, Optional

import numpy as np

from diffsbdd_tpu.chem.molecule import SimpleMol


class Queue:
    """Bounded FIFO with mean/std — host-side twin of the reference Queue."""

    def __init__(self, max_len: int = 50):
        self.items: List[float] = []
        self.max_len = max_len

    def __len__(self):
        return len(self.items)

    def add(self, item: float):
        self.items.insert(0, item)
        if len(self) > self.max_len:
            self.items.pop()

    def mean(self):
        return float(np.mean(self.items))

    def std(self):
        return float(np.std(self.items))


def mol_to_nxgraph(mol: SimpleMol):
    import networkx as nx

    g = nx.Graph()
    for i, sym in enumerate(mol.symbols):
        g.add_node(i, atom_type=sym)
    for i, j, _ in mol.bonds:
        g.add_edge(i, j)
    return g


def calc_rmsd(mol_a: SimpleMol, mol_b: SimpleMol) -> Optional[float]:
    """RMSD between two molecules with unknown atom correspondence.

    Enumerates graph isomorphisms matching atom types and returns the minimum
    coordinate RMSD, or None if the graphs aren't isomorphic (utils.py:170-204).
    """
    from networkx.algorithms import isomorphism

    gm = isomorphism.GraphMatcher(
        mol_to_nxgraph(mol_a), mol_to_nxgraph(mol_b),
        node_match=lambda na, nb: na["atom_type"] == nb["atom_type"])

    # loop-invariant: symmetric molecules enumerate MANY automorphisms
    coords_a = np.asarray(mol_a.coords)
    coords_b_all = np.asarray(mol_b.coords)
    best = None
    for mapping in gm.isomorphisms_iter():
        perm = np.fromiter((mapping[i] for i in range(mol_a.n_atoms)),
                           dtype=np.int64, count=mol_a.n_atoms)
        diff = coords_a - coords_b_all[perm]
        rmsd = float(np.sqrt(np.mean(np.sum(diff * diff, axis=1))))
        best = rmsd if best is None else min(best, rmsd)
    return best


def shift_to_pocket_frame(xh_lig, xh_pocket, lig_mask, pkt_mask, com_before):
    """Translate sampled ligand+pocket back into the original pocket frame.

    The conditional samplers run in a ligand-CoM frame in which the pocket
    drifts (conditional_model.py:688-696); callers record the pocket CoM
    before sampling and restore it afterwards
    (lightning_modules.py:845-852).  Returns writable host copies of
    ``xh_lig``/``xh_pocket`` with the shift applied under the masks.
    """
    xh_lig = np.array(xh_lig)
    xh_pocket = np.array(xh_pocket)
    pkt_m = np.asarray(pkt_mask)
    lig_m = np.asarray(lig_mask)
    com_after = (xh_pocket[..., :3] * pkt_m[..., None]).sum(1) \
        / np.maximum(pkt_m.sum(1), 1.0)[..., None]
    shift = np.asarray(com_before) - com_after
    xh_pocket[..., :3] += shift[:, None, :] * pkt_m[..., None]
    xh_lig[..., :3] += shift[:, None, :] * lig_m[..., None]
    return xh_lig, xh_pocket
