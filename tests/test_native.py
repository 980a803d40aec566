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
