"""Native host kernels vs their numpy fallbacks."""
import numpy as np
import pytest

from diffsbdd_tpu import native
from diffsbdd_tpu.constants import dataset_params

DINFO = dataset_params["crossdock"]


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    if not native.available():
        assert native.build(), "failed to build native library"


def test_pad_collate_matches_python():
    rng = np.random.default_rng(0)
    sizes = [4, 7, 2]
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    total = int(offsets[-1])
    coords = rng.normal(size=(total, 3)).astype(np.float32)
    one_hot = np.eye(5)[rng.integers(0, 5, total)].astype(np.float32)

    out = native.pad_collate(coords, one_hot, offsets, n_max=8)
    assert out is not None
    x, oh, mask, size = out
    assert x.shape == (3, 8, 3)
    np.testing.assert_array_equal(size, sizes)
    for b in range(3):
        n = sizes[b]
        np.testing.assert_allclose(x[b, :n], coords[offsets[b]:offsets[b + 1]])
        np.testing.assert_allclose(oh[b, :n],
                                   one_hot[offsets[b]:offsets[b + 1]])
        assert mask[b, :n].sum() == n and mask[b, n:].sum() == 0
        np.testing.assert_array_equal(x[b, n:], 0.0)

    with pytest.raises(ValueError):
        native.pad_collate(coords, one_hot, offsets, n_max=3)


def test_perceive_bonds_matches_numpy():
    from diffsbdd_tpu.chem import molecule as M

    rng = np.random.default_rng(1)
    n = 24
    coords = (rng.normal(size=(n, 3)) * 2.0).astype(np.float32)
    types = rng.integers(0, 10, n).astype(np.int32)

    got = native.perceive_bonds(coords, types, DINFO)

    # numpy reference (the fallback body of perceive_bonds_edm)
    pos = coords.astype(np.float64)
    d = np.sqrt(((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1))
    a1 = np.broadcast_to(types[:, None], (n, n))
    a2 = np.broadcast_to(types[None, :], (n, n))
    orders = M.get_bond_order_batch(a1.ravel(), a2.ravel(), d.ravel(),
                                    DINFO).reshape(n, n)
    orders = np.tril(orders, k=-1)
    expected = [(i, j, int(orders[i, j]))
                for i, j in zip(*np.nonzero(orders))]
    assert sorted(got) == sorted(expected)


def test_build_molecule_uses_native():
    from diffsbdd_tpu.chem.molecule import build_molecule

    coords = np.array([[0.0, 0, 0], [1.54, 0, 0], [1.54 + 1.43, 0, 0]],
                      np.float32)
    types = np.array([0, 0, 2])  # C, C, O
    mol = build_molecule(coords, types, DINFO, use_openbabel=False)
    bonds = {(max(i, j), min(i, j)): o for i, j, o in mol.bonds}
    assert bonds == {(1, 0): 1, (2, 1): 1}


def test_padded_loader_native_with_virtual_nodes(tmp_path, monkeypatch):
    """The native gather-collate fast path stays ACTIVE under the
    virtual-node transform (VERDICT r03 #8): _native_batch is called, its
    batch goes through the vectorized apply_virtual_nodes_batch twin, and
    the result matches the per-item python collate on every deterministic
    field."""
    from test_data import make_npz

    from diffsbdd_tpu.data.dataset import (AppendVirtualNodes,
                                           LigandPocketDataset, PaddedLoader,
                                           pad_batch)

    path = make_npz(tmp_path, a_nf=4)
    encoder = {"C": 0, "N": 1, "O": 2, "S": 3, "Ne": 4}
    max_size, vidx = 12, 4

    tf = AppendVirtualNodes(max_size, encoder, "Ne",
                            rng=np.random.default_rng(0))
    ds = LigandPocketDataset(path, transform=tf)
    loader = PaddedLoader(ds, batch_size=3, lig_bucket=4, pocket_bucket=8,
                          shuffle=False)

    native_calls = []
    orig = PaddedLoader._native_batch

    def spy(self, idx, n_lig, n_pocket):
        out = orig(self, idx, n_lig, n_pocket)
        native_calls.append(out is not None)
        return out

    monkeypatch.setattr(PaddedLoader, "_native_batch", spy)
    batch = next(iter(loader))
    assert native_calls and native_calls[0], \
        "native fast path not taken under the virtual-node transform"

    lig = batch["ligand"]
    # every ligand is padded to the fixed virtual size with the Ne column
    np.testing.assert_array_equal(np.asarray(lig["size"]),
                                  np.full(3, max_size))
    assert lig["one_hot"].shape[-1] == 5
    assert "num_virtual_atoms" in lig

    # deterministic fields match the per-item python collate
    tf2 = AppendVirtualNodes(max_size, encoder, "Ne",
                             rng=np.random.default_rng(0))
    ds2 = LigandPocketDataset(path, transform=tf2)
    truth = pad_batch([ds2[i] for i in range(3)],
                      n_lig=lig["x"].shape[1],
                      n_pocket=batch["pocket"]["x"].shape[1])
    np.testing.assert_array_equal(np.asarray(lig["mask"]),
                                  truth["ligand"]["mask"])
    np.testing.assert_array_equal(np.asarray(lig["num_virtual_atoms"]),
                                  truth["ligand"]["num_virtual_atoms"])
    np.testing.assert_array_equal(np.asarray(lig["one_hot"][..., vidx]),
                                  truth["ligand"]["one_hot"][..., vidx])
    for b in range(3):
        n_real = max_size - int(lig["num_virtual_atoms"][b])
        np.testing.assert_allclose(np.asarray(lig["x"][b, :n_real]),
                                   truth["ligand"]["x"][b, :n_real])
        np.testing.assert_array_equal(
            np.asarray(lig["one_hot"][b, :n_real]),
            truth["ligand"]["one_hot"][b, :n_real])
