"""Data-processing pipelines, backbone geometry, misc utils, debug checks."""
from pathlib import Path

import numpy as np
import pytest

from diffsbdd_tpu.constants import dataset_params
from diffsbdd_tpu.data import proc_bindingmoad as moad
from diffsbdd_tpu.data import proc_crossdock as cd
from diffsbdd_tpu.geom import backbone as bb

EXAMPLE_PDB = Path("/root/reference/example/3rfm.pdb")
EXAMPLE_SDF = Path("/root/reference/example/3rfm_B_CFF.sdf")


# ---------------------------------------------------------------- backbone
def test_backbone_transform_roundtrip():
    rng = np.random.default_rng(0)
    n = 16
    ca = rng.normal(size=(n, 3)) * 10

    # build ideal backbones with random orientations, recover the transform
    quat = rng.normal(size=(n, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    coords, types = bb.get_bb_coords_from_transform(ca, quat)
    assert coords.shape == (3 * n, 3)
    assert types[:3] == ["N", "C", "C"]

    n_xyz = coords[0::3]
    ca_xyz = coords[1::3]
    c_xyz = coords[2::3]
    np.testing.assert_allclose(ca_xyz, ca, atol=1e-9)
    # bond geometry honored
    np.testing.assert_allclose(np.linalg.norm(n_xyz - ca_xyz, axis=1),
                               1.47, atol=1e-9)
    np.testing.assert_allclose(np.linalg.norm(c_xyz - ca_xyz, axis=1),
                               1.53, atol=1e-9)

    q2, t2 = bb.get_bb_transform(n_xyz, ca_xyz, c_xyz)
    np.testing.assert_allclose(t2, ca, atol=1e-9)
    # recovered transform reproduces the same coordinates (quaternion sign
    # ambiguity means we compare reconstructions, not raw quaternions)
    coords2, _ = bb.get_bb_coords_from_transform(ca, q2)
    np.testing.assert_allclose(coords2, coords, atol=1e-7)


def test_quaternion_pi_rotations_exact():
    """Regression: 180-degree rotations (w=0) zero every antisymmetric
    matrix difference, so the old copysign shortcut lost the relative signs
    of the axis components (pi about (1,-1,0) came back as pi about
    (1,1,0))."""
    axes = np.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1],
                     [1, -1, 0], [1, 1, 0], [1, -1, 1], [-1, 2, 0.5]])
    mats = []
    for ax in axes:
        ax = ax / np.linalg.norm(ax)
        K = np.array([[0, -ax[2], ax[1]],
                      [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        mats.append(np.eye(3) + 2.0 * (K @ K))  # R(pi) = I + 2K^2
    mats = np.asarray(mats)
    q = bb.rotation_matrix_to_quaternion(mats)

    def to_rot(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])

    for qi, mi in zip(q, mats):
        np.testing.assert_allclose(to_rot(qi), mi, atol=1e-9)


def test_quaternion_matrix_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q[q[:, 0] < 0] *= -1  # canonical sign
    R = bb.quaternion_to_rotation_matrix(q)
    # orthogonality and det +1
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
    q2 = bb.rotation_matrix_to_quaternion(R)
    np.testing.assert_allclose(q2, q, atol=1e-9)


def test_rotation_matrix_axes():
    R = bb.rotation_matrix(np.array([np.pi / 2]), axis=2)[0]
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]),
                               np.array([0, 1.0, 0]), atol=1e-12)


# ------------------------------------------------------------- crossdocked
@pytest.mark.skipif(not EXAMPLE_PDB.exists(), reason="example unavailable")
def test_process_ligand_and_pocket_both_representations():
    dinfo_ca = dataset_params["crossdock"]
    lig, pkt = cd.process_ligand_and_pocket(
        EXAMPLE_PDB, EXAMPLE_SDF, dinfo_ca["atom_encoder"],
        dinfo_ca["aa_encoder"], dist_cutoff=8.0, ca_only=True)
    assert lig["lig_coords"].shape == (14, 3)
    assert lig["lig_one_hot"].shape == (14, 10)
    assert pkt["pocket_coords"].shape[0] == pkt["pocket_one_hot"].shape[0]
    assert pkt["pocket_one_hot"].shape[1] == 20
    assert len(pkt["pocket_ids"]) > 10

    dinfo_fa = dataset_params["crossdock_full"]
    lig2, pkt2 = cd.process_ligand_and_pocket(
        EXAMPLE_PDB, EXAMPLE_SDF, dinfo_fa["atom_encoder"],
        dinfo_fa["aa_encoder"], dist_cutoff=8.0, ca_only=False)
    assert pkt2["pocket_one_hot"].shape[1] == 11
    assert pkt2["pocket_coords"].shape[0] > pkt["pocket_coords"].shape[0]


@pytest.mark.skipif(not EXAMPLE_PDB.exists(), reason="example unavailable")
def test_crossdock_split_processing(tmp_path):
    # synthesize a 'dataset' out of the example complex
    datadir = tmp_path / "crossdocked_pocket10"
    datadir.mkdir()
    import shutil
    shutil.copy(EXAMPLE_PDB, datadir / "3rfm.pdb")
    shutil.copy(EXAMPLE_SDF, datadir / "3rfm_lig.sdf")

    dinfo = dataset_params["crossdock"]
    names, flat, failed = cd.process_split(
        [("3rfm.pdb", "3rfm_lig.sdf"), ("missing.pdb", "missing.sdf")],
        datadir, tmp_path / "out", "test", dinfo["atom_encoder"],
        dinfo["aa_encoder"], dist_cutoff=8.0, ca_only=True)
    assert len(names) == 1
    assert len(failed) == 1
    assert flat["lig_coords"].shape == (14, 3)
    # val/test extras copied for the benchmark harness
    assert (tmp_path / "out" / "test" / "3rfm.pdb").exists()
    txts = list((tmp_path / "out" / "test").glob("*.txt"))
    assert len(txts) == 1

    cd.saveall(tmp_path / "test.npz", names, **flat)
    from diffsbdd_tpu.data.dataset import LigandPocketDataset
    ds = LigandPocketDataset(tmp_path / "test.npz")
    assert len(ds) == 1


def test_get_n_nodes_histogram():
    lig_mask = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2])
    pkt_mask = np.array([0, 0, 1, 1, 1, 2, 2, 2, 2, 2])
    hist = cd.get_n_nodes(lig_mask, pkt_mask)
    assert hist[3, 2] == 1 and hist[2, 3] == 1 and hist[4, 5] == 1
    smooth = cd.get_n_nodes(lig_mask, pkt_mask, smooth_sigma=1.0)
    assert np.count_nonzero(smooth) > np.count_nonzero(hist)


def test_compute_smiles():
    dinfo = dataset_params["crossdock"]
    # two identical C-C molecules
    pos = np.array([[0, 0, 0], [1.54, 0, 0], [5, 5, 5], [6.54, 5, 5.0]])
    one_hot = np.zeros((4, 10))
    one_hot[:, 0] = 1
    mask = np.array([0, 0, 1, 1])
    smiles = cd.compute_smiles(pos, one_hot, mask, dinfo)
    assert len(smiles) == 2
    assert smiles[0] == smiles[1]


# ------------------------------------------------------------ binding MOAD
def test_moad_label_parsing_and_split(tmp_path):
    csv = tmp_path / "every.csv"
    csv.write_text(
        '1.1.1.1,,,,,,,,,,\n'
        ',,1ABC,,,,,,,,\n'
        ',,,LIG:A:100,valid,,,,,CC(=O)O,\n'
        ',,,BAD:A:101,invalid,,,,,CC,\n'
        ',,2DEF,,,,,,,,\n'
        ',,,MOL:B:200,valid,,,,,CCO,\n'
        '2.7.7.7,,,,,,,,,,\n'
        ',,3GHI,,,,,,,,\n'
        ',,,XYZ:C:300,valid,,,,,c1ccccc1,\n')
    d = moad.read_label_file(csv)
    assert set(d) == {"1.1.1.1", "2.7.7.7"}
    assert len(d["1.1.1.1"]["1ABC"]) == 2

    d = moad.compute_druglikeness(d)
    flat = moad.filter_and_flatten(d, qed_thresh=0.0, max_occurences=10,
                                   seed=0)
    names = {m[0] for _, _, m in flat}
    assert "BAD:A:101" not in names  # invalid filtered
    assert len(flat) >= 2

    split = moad.split_by_ec_number(flat, n_val=1, n_test=1)
    total = sum(len(v) for v in split.values())
    assert total == len(flat)
    # classes don't leak across splits
    val_classes = {c.split(".")[0] for c, _, _ in split["val"]}
    train_classes = {c.split(".")[0] for c, _, _ in split["train"]}
    assert not (val_classes & train_classes)


@pytest.mark.skipif(not EXAMPLE_PDB.exists(), reason="example unavailable")
def test_moad_extraction():
    dinfo = dataset_params["bindingmoad"]
    struct = __import__("diffsbdd_tpu.chem.pdb", fromlist=["parse_pdb"]) \
        .parse_pdb(EXAMPLE_PDB)
    lig, pkt = moad.process_ligand_and_pocket(
        struct, "CFF", "A", 330, dinfo["atom_encoder"],
        dinfo["aa_encoder"], dist_cutoff=8.0, ca_only=True)
    assert lig["lig_coords"].shape == (14, 3)
    assert pkt["pocket_one_hot"].shape[1] == 20
    with pytest.raises(ValueError):
        moad.process_ligand_and_pocket(
            struct, "WRONG", "A", 330, dinfo["atom_encoder"],
            dinfo["aa_encoder"], dist_cutoff=8.0, ca_only=True)


@pytest.mark.skipif(not EXAMPLE_PDB.exists(), reason="example unavailable")
def test_moad_process_split_receptors_and_eval_files(tmp_path):
    """Receptor names land in the npz and val/test get SDF + pocket txt +
    ligand-free receptor PDB (process_bindingmoad.py:522,539-574)."""
    dinfo = dataset_params["bindingmoad"]
    # stage the example as a biounit file under its pdb id
    pdbdir = tmp_path / "pdbs"
    pdbdir.mkdir()
    (pdbdir / "3rfm.bio1").write_text(EXAMPLE_PDB.read_text())
    examples = [("1.1.1.1", "3RFM", ("CFF:A:330", "valid", None))]
    out_dir = tmp_path / "val"
    names, flat, failed = moad.process_split(
        examples, pdbdir, dinfo["atom_encoder"], dinfo["aa_encoder"],
        dist_cutoff=8.0, ca_only=True, out_dir=out_dir,
        dataset_info=dinfo)
    assert not failed
    assert list(flat["receptors"]) == ["3rfm.bio1"]

    sdf = out_dir / "3RFM-bio1_CFF:A:330.sdf"
    txt = out_dir / "3RFM-bio1_CFF:A:330.txt"
    rec = out_dir / "3RFM-bio1.pdb"
    assert sdf.exists() and txt.exists() and rec.exists()
    assert "A:330" not in txt.read_text().split()  # ligand is not its pocket
    assert len(txt.read_text().split()) > 5
    # receptor file no longer contains the ligand, but keeps the protein
    from diffsbdd_tpu.chem.pdb import parse_pdb
    rec_struct = parse_pdb(rec)
    assert all(r.resname != "CFF" for r in rec_struct.get_residues())
    assert sum(r.is_standard_aa for r in rec_struct.get_residues()) > 100
    # the SDF round-trips through the reader with the right atom count
    from diffsbdd_tpu.chem.sdfio import read_sdf
    assert len(read_sdf(sdf)[0].coords) == 14

    # npz -> dataset -> per-item receptor plumbing (evaluator consumes this)
    from diffsbdd_tpu.data.proc_crossdock import saveall
    from diffsbdd_tpu.data.dataset import LigandPocketDataset
    saveall(tmp_path / "val.npz", names, **flat)
    ds = LigandPocketDataset(tmp_path / "val.npz")
    assert ds[0]["receptors"] == "3rfm.bio1"


# -------------------------------------------------------------- misc utils
def test_calc_rmsd():
    from diffsbdd_tpu.chem.molecule import SimpleMol
    from diffsbdd_tpu.utils.misc import Queue, calc_rmsd

    a = SimpleMol(["C", "O"], np.array([[0, 0, 0], [1.4, 0, 0]], np.float32),
                  [(0, 1, 1)])
    # same molecule with swapped atom order
    b = SimpleMol(["O", "C"], np.array([[1.4, 0, 0], [0, 0, 0]], np.float32),
                  [(0, 1, 1)])
    assert calc_rmsd(a, b) == pytest.approx(0.0, abs=1e-6)
    c = SimpleMol(["C", "O"], np.array([[0, 0, 0], [2.4, 0, 0]], np.float32),
                  [(0, 1, 1)])
    assert calc_rmsd(a, c) == pytest.approx(np.sqrt(0.5), abs=1e-6)
    # non-isomorphic
    d = SimpleMol(["C", "N"], np.zeros((2, 3), np.float32), [(0, 1, 1)])
    assert calc_rmsd(a, d) is None

    q = Queue(max_len=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        q.add(v)
    assert len(q) == 3 and q.mean() == 3.0


def test_debug_checks():
    import jax.numpy as jnp
    from diffsbdd_tpu.utils.debug import (check_finite, check_mean_zero,
                                          checked)

    x = jnp.array([[[1.0, 0, 0], [-1.0, 0, 0]]])
    mask = jnp.ones((1, 2))
    check_mean_zero(x, mask)
    with pytest.raises(AssertionError):
        check_mean_zero(x + 1.0, mask)
    check_finite({"a": x})
    with pytest.raises(AssertionError):
        check_finite({"a": x / 0.0})

    def f(v):
        return jnp.log(v)

    err, out = checked(f)(jnp.array(-1.0))
    with pytest.raises(Exception):
        err.throw()


def test_spatial_ordering():
    from diffsbdd_tpu.geom.spatial import morton_codes, morton_order, tile_locality

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 100, size=(256, 3))
    order = morton_order(pts)
    assert sorted(order.tolist()) == list(range(256))
    codes = morton_codes(pts)
    assert np.all(np.diff(codes[order].astype(np.int64)) >= 0)
    # clustered points sort into contiguous runs -> high tile locality
    clusters = np.concatenate([
        rng.normal(size=(64, 3)) + c for c in ([0, 0, 0], [100, 0, 0],
                                               [0, 100, 0], [100, 100, 0])])
    rng.shuffle(clusters)
    frac_raw = tile_locality(clusters, 32, cutoff=10.0)
    frac_sorted = tile_locality(clusters[morton_order(clusters)], 32,
                                cutoff=10.0)
    assert frac_sorted < frac_raw
