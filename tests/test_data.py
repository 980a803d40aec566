import numpy as np
import pytest

from diffsbdd_tpu.data.dataset import (AppendVirtualNodes,
                                       LigandPocketDataset, PaddedLoader,
                                       PrefetchLoader, pad_batch,
                                       round_to_bucket)


def make_npz(tmp_path, n_complexes=7, a_nf=4, r_nf=5, seed=0):
    rng = np.random.default_rng(seed)
    lig_coords, lig_oh, lig_mask = [], [], []
    pkt_coords, pkt_oh, pkt_mask = [], [], []
    names = []
    for i in range(n_complexes):
        nl = rng.integers(3, 9)
        npk = rng.integers(5, 20)
        lig_coords.append(rng.normal(size=(nl, 3)) + 5.0)
        oh = np.eye(a_nf)[rng.integers(0, a_nf, nl)]
        lig_oh.append(oh)
        lig_mask.append(np.full(nl, i, dtype=float))
        pkt_coords.append(rng.normal(size=(npk, 3)) - 5.0)
        pkt_oh.append(np.eye(r_nf)[rng.integers(0, r_nf, npk)])
        pkt_mask.append(np.full(npk, i, dtype=float))
        names.append(f"complex_{i}")
    path = tmp_path / "train.npz"
    np.savez(
        path, names=names,
        lig_coords=np.concatenate(lig_coords),
        lig_one_hot=np.concatenate(lig_oh),
        lig_mask=np.concatenate(lig_mask),
        pocket_coords=np.concatenate(pkt_coords),
        pocket_one_hot=np.concatenate(pkt_oh),
        pocket_mask=np.concatenate(pkt_mask))
    return path


def test_round_to_bucket():
    assert round_to_bucket(5, 8) == 8
    assert round_to_bucket(8, 8) == 8
    assert round_to_bucket(9, 8) == 16
    assert round_to_bucket(0, 8) == 8


def test_dataset_loading_and_centering(tmp_path):
    path = make_npz(tmp_path)
    ds = LigandPocketDataset(path, center=True)
    assert len(ds) == 7
    item = ds[0]
    # joint CoM at zero after centering (dataset.py:35-41 semantics)
    total = item["lig_coords"].sum(0) + item["pocket_coords"].sum(0)
    n = len(item["lig_coords"]) + len(item["pocket_coords"])
    np.testing.assert_allclose(total / n, 0.0, atol=1e-5)
    nl, npk = ds.max_sizes()
    assert nl >= 3 and npk >= 5


def test_padded_loader_shapes(tmp_path):
    path = make_npz(tmp_path)
    ds = LigandPocketDataset(path)
    loader = PaddedLoader(ds, batch_size=3, lig_bucket=8, pocket_bucket=8,
                          shuffle=True, rng=np.random.default_rng(1))
    batches = list(loader)
    assert len(batches) == 3  # ceil(7/3), last batch padded to full size
    for b in batches:
        lig, pkt = b["ligand"], b["pocket"]
        assert lig["x"].shape == (3, loader.n_lig_max, 3)
        assert pkt["x"].shape == (3, loader.n_pocket_max, 3)
        # masks consistent with sizes
        np.testing.assert_array_equal(lig["mask"].sum(1), lig["size"])
        np.testing.assert_array_equal(pkt["mask"].sum(1), pkt["size"])
        # padded lanes are zero
        assert np.all(lig["x"][lig["mask"] == 0] == 0)


@pytest.mark.quick
def test_prefetch_loader_yields_identical_batches(tmp_path):
    """PrefetchLoader (the num_workers analogue) must be a transparent
    wrapper: same batches, same order, same length, reusable across
    epochs."""
    path = make_npz(tmp_path)
    ds = LigandPocketDataset(path)
    loader = PaddedLoader(ds, batch_size=3, lig_bucket=8, pocket_bucket=8,
                          shuffle=True, rng=np.random.default_rng(1))
    ref = PaddedLoader(ds, batch_size=3, lig_bucket=8, pocket_bucket=8,
                       shuffle=True, rng=np.random.default_rng(1))
    pre = PrefetchLoader(loader, depth=2)
    assert len(pre) == len(ref)
    for _epoch in range(2):  # same rng stream -> same shuffles
        got, want = list(pre), list(ref)
        assert len(got) == len(want)
        for b_got, b_want in zip(got, want):
            assert b_got["names"] == b_want["names"]
            for part in ("ligand", "pocket"):
                for k in ("x", "one_hot", "mask", "size"):
                    np.testing.assert_array_equal(b_got[part][k],
                                                  b_want[part][k])


@pytest.mark.quick
def test_prefetch_loader_propagates_errors_and_early_exit():
    class Boom:
        def __iter__(self):
            yield {"i": 0}
            raise RuntimeError("loader exploded")

        def __len__(self):
            return 2

    it = iter(PrefetchLoader(Boom(), depth=1))
    assert next(it)["i"] == 0
    with pytest.raises(RuntimeError, match="loader exploded"):
        next(it)

    # abandoning the iterator mid-epoch must not hang the producer thread
    import threading

    n_before = threading.active_count()
    it2 = iter(PrefetchLoader(({"i": i} for i in range(100)), depth=1))
    assert next(it2)["i"] == 0
    it2.close()  # GeneratorExit -> stop event -> thread joined
    assert threading.active_count() == n_before


def test_pad_batch_overflow_raises(tmp_path):
    path = make_npz(tmp_path)
    ds = LigandPocketDataset(path)
    with pytest.raises(ValueError):
        pad_batch([ds[0]], n_lig=1, n_pocket=1)


def test_virtual_nodes_transform(tmp_path):
    path = make_npz(tmp_path)
    encoder = {"C": 0, "N": 1, "O": 2, "S": 3, "Ne": 4}
    tf = AppendVirtualNodes(12, encoder, "Ne",
                            rng=np.random.default_rng(0))
    ds = LigandPocketDataset(path, transform=tf)
    item = ds[0]
    assert len(item["lig_coords"]) == 12
    assert item["lig_one_hot"].shape == (12, 5)
    n_virt = item["num_virtual_atoms"]
    # virtual rows are one-hot on the Ne column
    np.testing.assert_array_equal(
        item["lig_one_hot"][-n_virt:, 4], np.ones(n_virt))
    # real rows keep their original type (shifted around the inserted column)
    assert item["lig_one_hot"][: 12 - n_virt, 4].sum() == 0


def test_virtual_nodes_batch_matches_transform(tmp_path):
    """apply_virtual_nodes_batch == per-item AppendVirtualNodes on all
    deterministic fields (virtual coords are random draws; compare their
    statistics instead)."""
    from diffsbdd_tpu.data.dataset import apply_virtual_nodes_batch

    path = make_npz(tmp_path)
    encoder = {"C": 0, "N": 1, "O": 2, "S": 3, "Ne": 4}
    max_size, vidx = 12, 4

    ds_plain = LigandPocketDataset(path)
    items = [ds_plain[i] for i in range(3)]
    plain = pad_batch(items, n_lig=16, n_pocket=24)
    out = apply_virtual_nodes_batch(plain["ligand"], max_size, vidx,
                                    np.random.default_rng(0))

    tf = AppendVirtualNodes(max_size, encoder, "Ne",
                            rng=np.random.default_rng(0))
    ds_tf = LigandPocketDataset(path, transform=tf)
    truth = pad_batch([ds_tf[i] for i in range(3)], n_lig=16, n_pocket=24)

    np.testing.assert_array_equal(out["mask"], truth["ligand"]["mask"])
    np.testing.assert_array_equal(out["size"], truth["ligand"]["size"])
    np.testing.assert_array_equal(out["num_virtual_atoms"],
                                  truth["ligand"]["num_virtual_atoms"])
    np.testing.assert_array_equal(out["one_hot"][..., vidx],
                                  truth["ligand"]["one_hot"][..., vidx])
    for b, item in enumerate(items):
        n_real = len(item["lig_coords"])
        # real rows untouched (coords + types, with the inserted column)
        np.testing.assert_allclose(out["x"][b, :n_real],
                                   truth["ligand"]["x"][b, :n_real])
        np.testing.assert_array_equal(
            out["one_hot"][b, :n_real], truth["ligand"]["one_hot"][b, :n_real])
        # virtual rows: correct type column and draws near the ligand
        mu = item["lig_coords"].mean(0)
        sigma = item["lig_coords"].std(0).max()
        virt = out["x"][b, n_real:max_size]
        assert np.all(np.abs(virt - mu) < 8 * sigma)


def test_padded_loader_native_path_with_virtual_nodes(tmp_path):
    """The loader applies virtual nodes on the native fast path (or the
    python fallback) with identical batch semantics."""
    path = make_npz(tmp_path)
    encoder = {"C": 0, "N": 1, "O": 2, "S": 3, "Ne": 4}
    tf = AppendVirtualNodes(12, encoder, "Ne", rng=np.random.default_rng(0))
    ds = LigandPocketDataset(path, transform=tf)
    loader = PaddedLoader(ds, batch_size=3, lig_bucket=16, pocket_bucket=8,
                          shuffle=False)
    assert loader.n_lig_max >= 12
    for batch in loader:
        lig = batch["ligand"]
        assert lig["one_hot"].shape[-1] == 5
        np.testing.assert_array_equal(lig["size"],
                                      np.full(3, 12, np.int32))
        np.testing.assert_array_equal(lig["mask"].sum(1), lig["size"])
        assert "num_virtual_atoms" in lig
        # every item has exactly num_virtual_atoms Ne-typed atoms
        np.testing.assert_array_equal(lig["one_hot"][..., 4].sum(1),
                                      lig["num_virtual_atoms"])


def test_padded_loader_virtual_nodes_bucketed_shapes(tmp_path):
    """fixed_shape=False + virtual nodes: per-batch pad width must cover the
    transform's fixed ligand size (regression: the native-path gate compared
    against the global max and the bucketed python path could under-pad)."""
    path = make_npz(tmp_path)
    encoder = {"C": 0, "N": 1, "O": 2, "S": 3, "Ne": 4}
    tf = AppendVirtualNodes(12, encoder, "Ne", rng=np.random.default_rng(0))
    ds = LigandPocketDataset(path, transform=tf)
    loader = PaddedLoader(ds, batch_size=3, lig_bucket=8, pocket_bucket=8,
                          shuffle=False, fixed_shape=False)
    for batch in loader:
        lig = batch["ligand"]
        assert lig["x"].shape[1] >= 12
        np.testing.assert_array_equal(lig["size"], np.full(3, 12, np.int32))
        np.testing.assert_array_equal(lig["one_hot"][..., 4].sum(1),
                                      lig["num_virtual_atoms"])


def test_padded_loader_process_sharding(tmp_path):
    """Multi-host DP semantics: each process's slices are disjoint, cover the
    global batch exactly, and agree with the single-process loader given the
    same-seeded shuffle rng (train.py:118-119 DistributedSampler analogue)."""
    path = make_npz(tmp_path, n_complexes=8)
    ds = LigandPocketDataset(path)

    def names(loader):
        return [b["names"] for b in loader]

    global_batches = names(PaddedLoader(
        ds, batch_size=4, lig_bucket=8, pocket_bucket=8, shuffle=True,
        rng=np.random.default_rng(3)))
    shards = [names(PaddedLoader(
        ds, batch_size=4, lig_bucket=8, pocket_bucket=8, shuffle=True,
        rng=np.random.default_rng(3), process_index=pi, process_count=2))
        for pi in range(2)]

    assert len(shards[0]) == len(shards[1]) == len(global_batches)
    for gb, s0, s1 in zip(global_batches, shards[0], shards[1]):
        assert len(s0) == len(s1) == 2  # batch_size // process_count
        assert s0 + s1 == gb  # disjoint, exhaustive, order-preserving

    with pytest.raises(AssertionError):
        PaddedLoader(ds, batch_size=3, process_count=2)
