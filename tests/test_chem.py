from pathlib import Path

import numpy as np
import pytest

from diffsbdd_tpu.chem import pdb as pdbmod
from diffsbdd_tpu.chem.metrics import (BasicMolecularMetrics,
                                       CategoricalDistribution,
                                       MoleculeProperties, wl_fingerprint)
from diffsbdd_tpu.chem.molecule import (SimpleMol, build_molecule,
                                        filter_rd_mol, get_bond_order_batch,
                                        perceive_bonds_edm, process_molecule)
from diffsbdd_tpu.chem.sdfio import read_sdf, write_sdf_file, write_xyz_file
from diffsbdd_tpu.constants import dataset_params

EXAMPLE_PDB = Path("/root/reference/example/3rfm.pdb")
EXAMPLE_SDF = Path("/root/reference/example/3rfm_B_CFF.sdf")

DINFO = dataset_params["crossdock"]
ENC = DINFO["atom_encoder"]


def ethanol_like():
    """C-C-O chain with table-accurate single bond lengths."""
    coords = np.array([[0.0, 0, 0], [1.54, 0, 0], [1.54 + 1.43, 0, 0]],
                      dtype=np.float32)
    types = np.array([ENC["C"], ENC["C"], ENC["O"]])
    return coords, types


def test_bond_order_batch():
    # C-C at 1.54 A -> single; at 1.33 -> double; at 1.19 -> triple; 2.5 -> none
    a = np.array([ENC["C"]] * 4)
    d = np.array([1.54, 1.33, 1.19, 2.5])
    orders = get_bond_order_batch(a, a, d, DINFO)
    np.testing.assert_array_equal(orders, [1, 2, 3, 0])


def test_build_molecule_edm():
    coords, types = ethanol_like()
    mol = build_molecule(coords, types, DINFO, use_openbabel=False)
    assert mol.n_atoms == 3
    bonds = {(max(i, j), min(i, j)): o for i, j, o in mol.bonds}
    assert bonds == {(1, 0): 1, (2, 1): 1}
    assert mol.is_connected()
    assert mol.check_valency()


def test_valency_check_rejects_overbonded():
    # fluorine with two bonds is invalid
    mol = SimpleMol(symbols=["F", "C", "C"],
                    coords=np.zeros((3, 3), np.float32),
                    bonds=[(0, 1, 1), (0, 2, 1)])
    assert not mol.check_valency()
    # carbon with 4 singles is fine
    mol2 = SimpleMol(symbols=["C", "O", "O"],
                     coords=np.zeros((3, 3), np.float32),
                     bonds=[(0, 1, 2), (0, 2, 2)])
    assert mol2.check_valency()


def test_fragments_and_largest():
    mol = SimpleMol(symbols=["C", "C", "C", "O", "N"],
                    coords=np.arange(15, dtype=np.float32).reshape(5, 3),
                    bonds=[(0, 1, 1), (1, 2, 1), (3, 4, 1)])
    frags = mol.fragments()
    assert sorted(len(f) for f in frags) == [2, 3]
    assert not mol.is_connected()
    big = mol.largest_fragment()
    assert big.n_atoms == 3 and big.symbols == ["C", "C", "C"]
    assert big.is_connected()


def test_canonical_key_isomorphism_invariance():
    coords = np.zeros((3, 3), np.float32)
    m1 = SimpleMol(["C", "O", "N"], coords, [(0, 1, 1), (1, 2, 2)])
    # permuted atom order, same graph
    m2 = SimpleMol(["N", "O", "C"], coords, [(2, 1, 1), (1, 0, 2)])
    # different bond order -> different key
    m3 = SimpleMol(["C", "O", "N"], coords, [(0, 1, 1), (1, 2, 1)])
    assert m1.canonical_key() == m2.canonical_key()
    assert m1.canonical_key() != m3.canonical_key()


def test_filter_rd_mol_fused_3_rings():
    # two triangles sharing an edge -> reject
    mol = SimpleMol(["C"] * 4, np.zeros((4, 3), np.float32),
                    [(0, 1, 1), (1, 2, 1), (2, 0, 1), (1, 3, 1), (3, 2, 1)])
    assert not filter_rd_mol(mol)
    # one triangle -> fine
    mol2 = SimpleMol(["C"] * 3, np.zeros((3, 3), np.float32),
                     [(0, 1, 1), (1, 2, 1), (2, 0, 1)])
    assert filter_rd_mol(mol2)


def test_process_molecule_pipeline():
    coords, types = ethanol_like()
    mol = build_molecule(coords, types, DINFO, use_openbabel=False)
    assert process_molecule(mol, sanitize=True) is not None
    # disconnected molecule, largest_frag keeps the big piece
    far = SimpleMol(mol.symbols + ["N"],
                    np.vstack([mol.coords, [[50, 50, 50]]]).astype(np.float32),
                    list(mol.bonds))
    out = process_molecule(far, largest_frag=True)
    assert out.n_atoms == 3
    assert process_molecule(None) is None


def test_sdf_roundtrip(tmp_path):
    coords, types = ethanol_like()
    mol = build_molecule(coords, types, DINFO, use_openbabel=False)
    mol.name = "test_mol"
    path = tmp_path / "out.sdf"
    write_sdf_file(path, [mol, None, mol])
    back = read_sdf(path)
    assert len(back) == 2
    assert back[0].symbols == mol.symbols
    np.testing.assert_allclose(back[0].coords, mol.coords, atol=1e-3)
    assert sorted(back[0].bonds) == sorted(mol.bonds)


def test_xyz_write(tmp_path):
    coords, types = ethanol_like()
    path = tmp_path / "mol.xyz"
    write_xyz_file(coords, ["C", "C", "O"], path)
    lines = path.read_text().splitlines()
    assert lines[0] == "3"
    assert lines[2].startswith("C ")


def test_categorical_distribution_kl():
    dist = CategoricalDistribution({"C": 80, "N": 20}, {"C": 0, "N": 1})
    # sample from the same distribution -> KL ~ 0
    sample = [0] * 800 + [1] * 200
    assert abs(dist.kl_divergence(sample)) < 1e-3
    # biased sample -> positive KL
    assert dist.kl_divergence([0] * 1000 + [1]) > 0.1


def test_basic_metrics():
    coords, types = ethanol_like()
    good = build_molecule(coords, types, DINFO, use_openbabel=False)
    bad = SimpleMol(["F", "C", "C"], np.zeros((3, 3), np.float32),
                    [(0, 1, 1), (0, 2, 1)])  # overbonded F
    disconnected = SimpleMol(
        ["C", "C"], np.array([[0, 0, 0], [9, 9, 9]], np.float32), [])
    metrics = BasicMolecularMetrics(
        DINFO, dataset_smiles_list=[good.largest_fragment().to_smiles()])
    (validity, connectivity, uniqueness, novelty), (valid, connected) = \
        metrics.evaluate_mols([good, bad, disconnected, good])
    assert validity == pytest.approx(3 / 4)  # 'disconnected' passes valency
    assert connectivity == pytest.approx(2 / 3)
    assert uniqueness == pytest.approx(1 / 2)
    assert novelty == 0.0  # the only unique mol is in the training list


def test_uniqueness_without_train_smiles():
    """Uniqueness must not be gated on the training SMILES list (that gate
    belongs to novelty, analysis/metrics.py:95-101); without the list
    novelty reports the -1.0 not-computed sentinel."""
    coords, types = ethanol_like()
    good = build_molecule(coords, types, DINFO, use_openbabel=False)
    metrics = BasicMolecularMetrics(DINFO)  # no dataset_smiles_list
    (validity, connectivity, uniqueness, novelty), _ = \
        metrics.evaluate_mols([good, good])
    assert validity == 1.0 and connectivity == 1.0
    assert uniqueness == pytest.approx(1 / 2)
    assert novelty == -1.0


def test_molecule_properties_fallbacks():
    coords, types = ethanol_like()
    mol = build_molecule(coords, types, DINFO, use_openbabel=False)
    props = MoleculeProperties()
    mw = props.molecular_weight(mol)
    # ethanol C2H6O with implicit hydrogens
    assert abs(mw - 46.069) < 1e-3
    assert np.isfinite(props.calculate_qed(mol))
    assert np.isfinite(props.calculate_sa(mol))
    lip = props.calculate_lipinski(mol)
    assert 0 <= lip <= 5
    div = props.calculate_diversity([mol, mol])
    assert div == pytest.approx(0.0)  # identical molecules
    other = SimpleMol(["N", "N"], np.zeros((2, 3), np.float32), [(0, 1, 1)])
    assert props.calculate_diversity([mol, other]) > 0.5
    qed, sa, logp, lipinski, diversity = props.evaluate_mean([mol, other])
    assert lipinski >= 0 and diversity >= 0


def test_wl_fingerprint():
    m1 = SimpleMol(["C", "O"], np.zeros((2, 3), np.float32), [(0, 1, 1)])
    m2 = SimpleMol(["C", "O"], np.zeros((2, 3), np.float32), [(0, 1, 2)])
    assert wl_fingerprint(m1) != wl_fingerprint(m2)


@pytest.mark.skipif(not EXAMPLE_PDB.exists(), reason="example PDB unavailable")
def test_parse_pdb_and_pocket():
    struct = pdbmod.parse_pdb(EXAMPLE_PDB)
    residues = struct.get_residues()
    assert len(residues) > 100
    aa = [r for r in residues if r.is_standard_aa]
    assert len(aa) > 100
    assert all(len(r.one_letter()) == 1 for r in aa[:10])
    # CFF ligand at B:330 defines the benchmark pocket
    lig = struct.residue("A", 330)
    assert lig.resname == "CFF"
    pocket = pdbmod.get_pocket_from_ligand(struct, "A:330")
    assert 10 < len(pocket) < 100
    assert all(r.is_standard_aa for r in pocket)
    # every pocket residue within 8A of the ligand
    lig_xyz = np.array([a.coord for a in lig.atoms])
    for r in pocket:
        rc = r.coords(heavy_only=False)
        d = np.sqrt((((rc[:, None] - lig_xyz[None]) ** 2).sum(-1))).min()
        assert d < 8.0


@pytest.mark.skipif(not EXAMPLE_SDF.exists(), reason="example SDF unavailable")
def test_read_reference_sdf_and_rebuild():
    mols = read_sdf(EXAMPLE_SDF)
    assert len(mols) == 1
    mol = mols[0]
    assert mol.n_atoms == 14  # caffeine heavy atoms
    assert set(mol.symbols) <= {"C", "N", "O"}
    # EDM bond perception on the real geometry gives a connected, valid mol
    types = np.array([ENC[s] for s in mol.symbols])
    rebuilt = build_molecule(mol.coords, types, DINFO, use_openbabel=False)
    assert rebuilt.is_connected()


def test_perceive_bonds_covalent_noise_tolerant():
    """The covalent route (in-repo OpenBabel-default equivalent) must
    recover bonds under coordinate noise far beyond the EDM margins, while
    never exceeding valences (r05, SYNTH_DIAG_r05.json)."""
    from diffsbdd_tpu.chem.molecule import perceive_bonds_covalent

    coords, types = ethanol_like()
    rng = np.random.default_rng(0)
    noisy = coords + rng.standard_normal(coords.shape).astype(np.float32) * 0.05
    bonds = perceive_bonds_covalent(noisy, types, DINFO)
    assert {(i, j) for i, j, _ in bonds} == {(1, 0), (2, 1)}
    mol = build_molecule(noisy, types, DINFO, perception="covalent")
    assert mol.is_connected() and mol.check_valency()
    # EDM-strict at the same noise typically loses bonds — the motivating gap
    mol_edm = build_molecule(noisy, types, DINFO, perception="edm")
    assert len(mol.bonds) >= len(mol_edm.bonds)


def test_perceive_bonds_covalent_valence_pruning():
    """A carbon crowded by 6 in-range neighbors keeps at most 4 bonds."""
    from diffsbdd_tpu.chem.molecule import perceive_bonds_covalent

    center = np.zeros((1, 3), np.float32)
    dirs = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                     [0, 0, 1], [0, 0, -1]], np.float32) * 1.54
    coords = np.concatenate([center, dirs])
    types = np.array([ENC["C"]] * 7)
    bonds = perceive_bonds_covalent(coords, types, DINFO)
    deg0 = sum(1 for i, j, _ in bonds if 0 in (i, j))
    assert deg0 <= 4
    sm = SimpleMol(symbols=["C"] * 7, coords=coords, bonds=bonds)
    assert sm.check_valency()


def test_perceive_bonds_covalent_order_assignment():
    """Nearest-length order assignment: C=C at 1.33 comes back double."""
    from diffsbdd_tpu.chem.molecule import perceive_bonds_covalent

    coords = np.array([[0.0, 0, 0], [1.33, 0, 0]], np.float32)
    types = np.array([ENC["C"], ENC["C"]])
    bonds = perceive_bonds_covalent(coords, types, DINFO)
    assert bonds == [(1, 0, 2)]
