"""Synthetic-corpus generator tests (diffsbdd_tpu/data/synth_corpus.py).

The corpus's central guarantee is the metric ceiling: every accepted ligand
round-trips the EDM bond-perception kernel exactly, so the training data
scores Validity 1.0 / Connectivity 1.0 under the repo's own evaluation
stack (VERDICT r04 next #2).
"""
from pathlib import Path

import numpy as np
import pytest

from diffsbdd_tpu.chem.metrics import BasicMolecularMetrics
from diffsbdd_tpu.chem.molecule import SimpleMol, build_molecule
from diffsbdd_tpu.constants import ALLOWED_BONDS, dataset_params
from diffsbdd_tpu.data.synth_corpus import (
    ProteinSource, build_corpus, generate_ligand, place_and_carve,
    sample_graph)

DINFO = dataset_params["crossdock_full"]


@pytest.mark.quick
def test_sample_graph_valence_correct_and_connected():
    rng = np.random.default_rng(0)
    for _ in range(20):
        g = sample_graph(rng, 14, DINFO)
        if g is None:
            continue
        tidx, bonds = g
        symbols = [DINFO["atom_decoder"][t] for t in tidx]
        mol = SimpleMol(symbols=symbols,
                        coords=np.zeros((len(tidx), 3), np.float32),
                        bonds=[(max(i, j), min(i, j), o)
                               for i, j, o in bonds])
        assert mol.is_connected()
        assert mol.check_valency()
        # conservative growth budget: strictly within ALLOWED_BONDS maxima
        for sym, orders in zip(mol.symbols, mol.neighbor_orders()):
            allowed = ALLOWED_BONDS[sym]
            cap = max(allowed) if isinstance(allowed, list) else allowed
            assert sum(orders) <= cap


@pytest.mark.quick
def test_generate_ligand_roundtrips_edm_perception():
    rng = np.random.default_rng(1)
    n_ok = 0
    for _ in range(5):
        lig = generate_ligand(rng, DINFO, n_min=8, n_max=20)
        if lig is None:
            continue
        n_ok += 1
        mol = build_molecule(lig["lig_coords"],
                             lig["lig_one_hot"].argmax(-1), DINFO,
                             use_openbabel=False)
        assert mol.is_connected()
        assert mol.check_valency()
        # CoM-centered
        np.testing.assert_allclose(lig["lig_coords"].mean(0), 0, atol=1e-4)
    assert n_ok >= 3  # acceptance rate is ~100% in practice


def test_place_and_carve_clash_free_8A_pocket():
    rng = np.random.default_rng(2)
    src = ProteinSource("/root/reference/example/3rfm.pdb")
    lig = generate_ligand(rng, DINFO)
    out = place_and_carve(rng, src, lig["lig_coords"], DINFO["aa_encoder"])
    assert out is not None
    d = np.linalg.norm(out["lig_coords"][:, None, :]
                       - out["pocket_coords"][None, :, :], axis=-1)
    assert d.min() >= 2.2 - 1e-5          # clash resolution
    assert d.min() < 8.0                  # the pocket hugs the ligand
    assert 80 <= len(out["pocket_coords"]) <= 310
    assert out["pocket_one_hot"].shape[1] == len(DINFO["aa_encoder"])


def test_build_corpus_ceiling_and_split(tmp_path):
    meta = build_corpus(tmp_path, n_train=6, n_val=2, n_test=2, seed=3,
                        n_min=8, n_max=14)
    assert meta["n_train"] == 6
    assert meta["unique_train_graphs"] >= 5
    for split in ("train", "val", "test"):
        assert (tmp_path / f"{split}.npz").exists()
    assert (tmp_path / "size_distribution.npy").exists()

    # the loadable dataset scores the advertised ceiling
    from diffsbdd_tpu.data.dataset import LigandPocketDataset
    ds = LigandPocketDataset(tmp_path / "train.npz")
    mols = []
    for i in range(len(ds)):
        it = ds[i]
        mols.append(build_molecule(
            it["lig_coords"], it["lig_one_hot"].argmax(-1), DINFO,
            use_openbabel=False))
    (v, c, u, _), _ = BasicMolecularMetrics(DINFO).evaluate_mols(mols)
    assert v == 1.0 and c == 1.0


@pytest.mark.quick
def test_sample_graph_motif_valence_and_connectivity():
    from diffsbdd_tpu.data.synth_corpus import sample_graph_motif

    rng = np.random.default_rng(5)
    ok = 0
    for _ in range(20):
        g = sample_graph_motif(rng, 18, DINFO)
        if g is None:
            continue
        ok += 1
        tidx, bonds = g
        symbols = [DINFO["atom_decoder"][t] for t in tidx]
        mol = SimpleMol(symbols=symbols,
                        coords=np.zeros((len(tidx), 3), np.float32),
                        bonds=[(max(i, j), min(i, j), o)
                               for i, j, o in bonds])
        assert mol.is_connected()
        assert mol.check_valency()
    assert ok >= 15


def test_generate_ligand_motif_roundtrip():
    """Motif-mode ligands (rings + functional groups) still round-trip the
    EDM perception kernel exactly after 3-D embedding."""
    rng = np.random.default_rng(6)
    n_ok = 0
    for _ in range(6):
        lig = generate_ligand(rng, DINFO, n_min=10, n_max=22,
                              graph_mode="motif")
        if lig is None:
            continue
        n_ok += 1
        mol = build_molecule(lig["lig_coords"],
                             lig["lig_one_hot"].argmax(-1), DINFO,
                             use_openbabel=False)
        assert mol.is_connected()
        assert mol.check_valency()
        # motif vocabulary produces rings: at least some molecules have
        # more bonds than a tree
        # (not asserted per-molecule; rings are probabilistic)
    assert n_ok >= 4


@pytest.mark.quick
def test_build_ligand_library_unique_and_verified():
    """Library mode: K WL-distinct ligands, each EDM-round-trip verified."""
    from diffsbdd_tpu.data.synth_corpus import build_ligand_library

    rng = np.random.default_rng(7)
    lib = build_ligand_library(rng, DINFO, vocab_size=6, n_min=8, n_max=20)
    assert len(lib) == 6
    assert len({l["key"] for l in lib}) == 6
    for lig in lib:
        mol = build_molecule(lig["lig_coords"],
                             lig["lig_one_hot"].argmax(-1), DINFO,
                             use_openbabel=False)
        assert mol.is_connected()
        assert mol.check_valency()


def test_build_corpus_library_mode_reuses_vocabulary(tmp_path):
    """graph_mode='library': unique train topologies bounded by vocab_size,
    vocabulary shared across splits, ceiling still holds."""
    meta = build_corpus(tmp_path, n_train=10, n_val=3, n_test=3, seed=8,
                        n_min=8, n_max=14, graph_mode="library",
                        vocab_size=3)
    assert meta["graph_mode"] == "library"
    assert meta["vocab_size"] == 3
    assert meta["unique_train_graphs"] <= 3
    # reuse is real: 10 complexes over a 3-molecule vocabulary
    assert meta["n_train"] == 10

    from diffsbdd_tpu.data.dataset import LigandPocketDataset
    ds = LigandPocketDataset(tmp_path / "train.npz")
    mols = []
    for i in range(len(ds)):
        it = ds[i]
        mols.append(build_molecule(
            it["lig_coords"], it["lig_one_hot"].argmax(-1), DINFO,
            use_openbabel=False))
    (v, c, _, _), _ = BasicMolecularMetrics(DINFO).evaluate_mols(mols)
    assert v == 1.0 and c == 1.0
