"""Molecular quality metrics.

Mirrors /root/reference/analysis/metrics.py.  With RDKit installed, the exact
reference metrics run (sanitization validity, QED/SA/logP/Lipinski, Tanimoto
diversity).  Without it, dependency-free equivalents keep every pipeline
functional: valence-table validity, WL-hash uniqueness/novelty, Morgan-style
WL fingerprints for diversity, and a mass/heteroatom approximation of the
Lipinski rules.  Metric names and return structures are identical either way.
"""
from __future__ import annotations

import hashlib
import math
from copy import deepcopy
from typing import List, Optional, Sequence, Tuple

import numpy as np

from diffsbdd_tpu.chem.molecule import HAVE_RDKIT, SimpleMol


class CategoricalDistribution:
    """KL divergence of an empirical type histogram from the dataset prior
    (analysis/metrics.py:11-32)."""

    EPS = 1e-10

    def __init__(self, histogram_dict, mapping):
        histogram = np.zeros(len(mapping))
        for k, v in histogram_dict.items():
            histogram[mapping[k]] = v
        self.p = histogram / histogram.sum()
        self.mapping = deepcopy(mapping)

    def kl_divergence(self, other_sample: Sequence[int]) -> float:
        sample_histogram = np.zeros(len(self.mapping))
        for x in other_sample:
            sample_histogram[int(x)] += 1
        q = sample_histogram / max(sample_histogram.sum(), 1)
        # zero-probability classes contribute nothing (p log p/q -> 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = -self.p * np.log(q / self.p + self.EPS)
        return float(np.sum(np.where(self.p > 0, terms, 0.0)))


def wl_fingerprint(mol: SimpleMol, radius: int = 2) -> set:
    """Morgan/ECFP-like fingerprint: the set of WL environment hashes up to
    ``radius`` iterations.  Used for Tanimoto diversity without RDKit."""
    labels = [hashlib.sha1(s.encode()).hexdigest()[:8] for s in mol.symbols]
    nbrs = [[] for _ in range(mol.n_atoms)]
    for i, j, o in mol.bonds:
        nbrs[i].append((j, o))
        nbrs[j].append((i, o))
    fp = set(labels)
    for _ in range(radius):
        new = []
        for i in range(mol.n_atoms):
            env = sorted(f"{o}:{labels[j]}" for j, o in nbrs[i])
            s = labels[i] + "|" + ",".join(env)
            new.append(hashlib.sha1(s.encode()).hexdigest()[:8])
        labels = new
        fp.update(labels)
    return fp


def _sanitize_ok(mol: SimpleMol) -> bool:
    if HAVE_RDKIT:
        from rdkit import Chem
        try:
            rd = mol.to_rdkit()
            Chem.SanitizeMol(rd)
            return True
        except Exception:
            return False
    return mol.check_valency()


class BasicMolecularMetrics:
    """Validity / connectivity / uniqueness / novelty
    (analysis/metrics.py:42-133)."""

    def __init__(self, dataset_info, dataset_smiles_list=None,
                 connectivity_thresh: float = 1.0):
        self.atom_decoder = dataset_info["atom_decoder"]
        self.dataset_smiles_list = (set(dataset_smiles_list)
                                    if dataset_smiles_list is not None else None)
        self.dataset_info = dataset_info
        self.connectivity_thresh = connectivity_thresh

    def compute_validity(self, generated: List[SimpleMol]):
        if len(generated) < 1:
            return [], 0.0
        valid = [m for m in generated if m is not None and _sanitize_ok(m)]
        return valid, len(valid) / len(generated)

    def compute_connectivity(self, valid: List[SimpleMol]):
        """Largest fragment must hold >= connectivity_thresh of all atoms."""
        if len(valid) < 1:
            return [], 0.0, []
        connected, connected_keys = [], []
        for mol in valid:
            largest = mol.largest_fragment()
            if largest.n_atoms / mol.n_atoms >= self.connectivity_thresh:
                key = largest.to_smiles()
                if key is not None:
                    connected_keys.append(key)
                    connected.append(largest)
        return connected, len(connected_keys) / len(valid), connected_keys

    def compute_uniqueness(self, connected_keys: List[str]):
        """Uniqueness needs only the generated set itself
        (analysis/metrics.py:95-97) — it must not be gated on the training
        SMILES list (that gate belongs to novelty alone)."""
        if len(connected_keys) < 1:
            return [], 0.0
        return (list(set(connected_keys)),
                len(set(connected_keys)) / len(connected_keys))

    def compute_novelty(self, unique: List[str]):
        """Novelty vs the training SMILES; without that list the reference
        skips it (analysis/metrics.py:99-101) — reported as the -1.0
        not-computed sentinel, matching kl_div_residue_types."""
        if self.dataset_smiles_list is None:
            return [], -1.0
        if len(unique) < 1:
            return [], 0.0
        novel = [s for s in unique if s not in self.dataset_smiles_list]
        return novel, len(novel) / len(unique)

    def evaluate_mols(self, mols: List[SimpleMol]):
        valid, validity = self.compute_validity(mols)
        connected, connectivity, connected_keys = \
            self.compute_connectivity(valid)
        unique, uniqueness = self.compute_uniqueness(connected_keys)
        _, novelty = self.compute_novelty(unique)
        return [validity, connectivity, uniqueness, novelty], [valid, connected]

    # reference-name alias (it operates on rdmols there)
    evaluate_rdmols = evaluate_mols

    def evaluate(self, generated: List[Tuple[np.ndarray, np.ndarray]]):
        from diffsbdd_tpu.chem.molecule import build_molecule
        mols = [build_molecule(*graph, self.dataset_info)
                for graph in generated]
        return self.evaluate_mols(mols)


class MoleculeProperties:
    """QED / SA / logP / Lipinski / diversity (analysis/metrics.py:136-251)."""

    @staticmethod
    def calculate_qed(mol) -> float:
        if HAVE_RDKIT:
            from rdkit.Chem import QED
            rd = mol.to_rdkit() if isinstance(mol, SimpleMol) else mol
            from rdkit import Chem
            Chem.SanitizeMol(rd)
            return QED.qed(rd)
        # dependency-free approximation with the published QED desirability
        # functions (see chem/descriptors.py) — never NaN
        from diffsbdd_tpu.chem.descriptors import qed_score
        return qed_score(mol)

    @staticmethod
    def calculate_sa(mol) -> float:
        from diffsbdd_tpu.chem.sascore import calculate_score
        if HAVE_RDKIT:
            rd = mol.to_rdkit() if isinstance(mol, SimpleMol) else mol
            from rdkit import Chem
            Chem.SanitizeMol(rd)
            sa = calculate_score(rd)
        else:
            sa = calculate_score(mol)  # Ertl-style fallback scorer
        return round((10 - sa) / 9, 2)  # pocket2mol rescaling

    @staticmethod
    def calculate_logp(mol) -> float:
        if HAVE_RDKIT:
            from rdkit import Chem
            from rdkit.Chem import Crippen
            rd = mol.to_rdkit() if isinstance(mol, SimpleMol) else mol
            Chem.SanitizeMol(rd)
            return Crippen.MolLogP(rd)
        from diffsbdd_tpu.chem.descriptors import logp_estimate
        return logp_estimate(mol)

    @staticmethod
    def molecular_weight(mol: SimpleMol) -> float:
        from diffsbdd_tpu.chem.descriptors import molecular_weight
        return molecular_weight(mol)  # includes implicit hydrogens

    @staticmethod
    def _rotatable_bonds(mol: SimpleMol) -> int:
        from diffsbdd_tpu.chem.descriptors import rotatable_bonds
        return rotatable_bonds(mol)

    @classmethod
    def calculate_lipinski(cls, mol) -> float:
        if HAVE_RDKIT:
            from rdkit import Chem
            from rdkit.Chem import Crippen, Descriptors, Lipinski
            rd = mol.to_rdkit() if isinstance(mol, SimpleMol) else mol
            Chem.SanitizeMol(rd)
            rule_1 = Descriptors.ExactMolWt(rd) < 500
            rule_2 = Lipinski.NumHDonors(rd) <= 5
            rule_3 = Lipinski.NumHAcceptors(rd) <= 10
            logp = Crippen.MolLogP(rd)
            rule_4 = -2 <= logp <= 5
            rule_5 = Chem.rdMolDescriptors.CalcNumRotatableBonds(rd) <= 10
            return float(sum(int(r) for r in (rule_1, rule_2, rule_3, rule_4,
                                              rule_5)))
        # dependency-free approximation on heavy-atom graphs (no explicit H:
        # donors unknown -> counted satisfied; acceptors ~ N+O count)
        rule_1 = cls.molecular_weight(mol) < 500
        rule_2 = True
        rule_3 = sum(1 for s in mol.symbols if s in ("N", "O")) <= 10
        rule_4 = True  # logP unavailable without RDKit
        rule_5 = cls._rotatable_bonds(mol) <= 10
        return float(sum(int(r) for r in (rule_1, rule_2, rule_3, rule_4,
                                          rule_5)))

    @staticmethod
    def similarity(mol_a, mol_b) -> float:
        if HAVE_RDKIT:
            from rdkit import Chem, DataStructs
            ra = mol_a.to_rdkit() if isinstance(mol_a, SimpleMol) else mol_a
            rb = mol_b.to_rdkit() if isinstance(mol_b, SimpleMol) else mol_b
            fp1 = Chem.RDKFingerprint(ra)
            fp2 = Chem.RDKFingerprint(rb)
            return DataStructs.TanimotoSimilarity(fp1, fp2)
        fa, fb = wl_fingerprint(mol_a), wl_fingerprint(mol_b)
        if not fa and not fb:
            return 1.0
        return len(fa & fb) / max(len(fa | fb), 1)

    @classmethod
    def calculate_diversity(cls, pocket_mols) -> float:
        if len(pocket_mols) < 2:
            return 0.0
        div, total = 0.0, 0
        for i in range(len(pocket_mols)):
            for j in range(i + 1, len(pocket_mols)):
                div += 1 - cls.similarity(pocket_mols[i], pocket_mols[j])
                total += 1
        return div / total

    def evaluate(self, pocket_mols: List[List[SimpleMol]]):
        """Per-pocket nested evaluation (analysis/metrics.py:183-227)."""
        all_qed, all_sa, all_logp, all_lipinski, per_pocket_div = \
            [], [], [], [], []
        for pocket in pocket_mols:
            all_qed.append([self.calculate_qed(m) for m in pocket])
            all_sa.append([self.calculate_sa(m) for m in pocket])
            all_logp.append([self.calculate_logp(m) for m in pocket])
            all_lipinski.append([self.calculate_lipinski(m) for m in pocket])
            per_pocket_div.append(self.calculate_diversity(pocket))
        return all_qed, all_sa, all_logp, all_lipinski, per_pocket_div

    def evaluate_mean(self, mols: List[SimpleMol]):
        if len(mols) < 1:
            return 0.0, 0.0, 0.0, 0.0, 0.0
        qed = float(np.mean([self.calculate_qed(m) for m in mols]))
        sa = float(np.mean([self.calculate_sa(m) for m in mols]))
        logp = float(np.mean([self.calculate_logp(m) for m in mols]))
        lipinski = float(np.mean([self.calculate_lipinski(m) for m in mols]))
        diversity = self.calculate_diversity(mols)
        return qed, sa, logp, lipinski, diversity
