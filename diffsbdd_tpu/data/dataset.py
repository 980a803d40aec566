"""Data pipeline: preprocessed ``.npz`` -> padded fixed-shape TPU batches.

Reads the same ``{train,val,test}.npz`` format as the reference
(/root/reference/dataset.py: flat per-node arrays + graph-id masks) but
replaces the ragged concat-collate (dataset.py:52-70) with padding to
size-bucketed static shapes — the single biggest layout change the TPU
rebuild makes (SURVEY.md §7 design decision 1).  Shape-bucketing bounds both
padding waste and XLA recompilation count.
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


def round_to_bucket(n: int, bucket: int, minimum: int = 0) -> int:
    return max(int(math.ceil(n / bucket)) * bucket, minimum, bucket)


def pad_batch(items: List[dict], n_lig: int, n_pocket: int) -> Dict[str, dict]:
    """Pad a list of per-complex dicts into padded ligand/pocket batch dicts."""
    B = len(items)
    a_nf = items[0]["lig_one_hot"].shape[1]
    r_nf = items[0]["pocket_one_hot"].shape[1]

    lig = {
        "x": np.zeros((B, n_lig, 3), np.float32),
        "one_hot": np.zeros((B, n_lig, a_nf), np.float32),
        "mask": np.zeros((B, n_lig), np.float32),
        "size": np.zeros((B,), np.int32),
    }
    pkt = {
        "x": np.zeros((B, n_pocket, 3), np.float32),
        "one_hot": np.zeros((B, n_pocket, r_nf), np.float32),
        "mask": np.zeros((B, n_pocket), np.float32),
        "size": np.zeros((B,), np.int32),
    }
    if "num_virtual_atoms" in items[0]:
        lig["num_virtual_atoms"] = np.array(
            [it["num_virtual_atoms"] for it in items], np.int32)

    names = []
    receptors = []
    for b, it in enumerate(items):
        nl = len(it["lig_coords"])
        npk = len(it["pocket_coords"])
        if nl > n_lig or npk > n_pocket:
            raise ValueError(
                f"complex ({nl}, {npk}) exceeds padded shape ({n_lig}, {n_pocket})")
        lig["x"][b, :nl] = it["lig_coords"]
        lig["one_hot"][b, :nl] = it["lig_one_hot"]
        lig["mask"][b, :nl] = 1.0
        lig["size"][b] = nl
        pkt["x"][b, :npk] = it["pocket_coords"]
        pkt["one_hot"][b, :npk] = it["pocket_one_hot"]
        pkt["mask"][b, :npk] = 1.0
        pkt["size"][b] = npk
        names.append(it.get("names", ""))
        receptors.append(it.get("receptors", ""))

    return {"ligand": lig, "pocket": pkt, "names": names,
            "receptors": receptors}


class AppendVirtualNodes:
    """Pad every ligand to a fixed size with 'Ne' virtual atoms sampled around
    the real atoms (reference utils.py:207-234)."""

    def __init__(self, max_ligand_size: int, atom_encoder: dict, symbol: str,
                 rng: Optional[np.random.Generator] = None):
        self.max_ligand_size = max_ligand_size
        self.atom_encoder = atom_encoder
        self.vidx = atom_encoder[symbol]
        self.rng = rng or np.random.default_rng()

    def __call__(self, data: dict) -> dict:
        data = dict(data)
        n_real = len(data["lig_coords"])
        n_virt = self.max_ligand_size - n_real
        mu = data["lig_coords"].mean(0, keepdims=True)
        # sample std (ddof=1) like the reference's torch.std (utils.py:216);
        # a 1-atom ligand gets sigma=0 instead of the reference's NaN
        sigma = data["lig_coords"].std(0, ddof=1).max() if n_real > 1 else 0.0
        virt_coords = self.rng.standard_normal((n_virt, 3)).astype(np.float32) \
            * sigma + mu

        one_hot = data["lig_one_hot"]
        # insert the virtual-atom column at vidx
        one_hot = np.concatenate(
            [one_hot[:, :self.vidx],
             np.zeros((n_real, 1), one_hot.dtype),
             one_hot[:, self.vidx:]], axis=1)
        virt_one_hot = np.zeros((n_virt, len(self.atom_encoder)), one_hot.dtype)
        virt_one_hot[:, self.vidx] = 1.0

        data["lig_coords"] = np.concatenate(
            [data["lig_coords"], virt_coords.astype(np.float32)])
        data["lig_one_hot"] = np.concatenate([one_hot, virt_one_hot])
        data["num_virtual_atoms"] = n_virt
        return data


def apply_virtual_nodes_batch(lig: Dict[str, np.ndarray],
                              max_ligand_size: int, vidx: int,
                              rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Vectorized batch-level twin of ``AppendVirtualNodes``.

    Applies the virtual-node augmentation (reference utils.py:207-234) to an
    already-collated padded ligand batch: rows ``[size_b, max_ligand_size)``
    become 'virtual' atoms drawn from N(mu_b, sigma_b^2) around each ligand's
    real atoms, and the one-hot table gains the virtual-atom column at
    ``vidx``.  Lets ``PaddedLoader`` keep the native C++ gather-collate fast
    path when the virtual-nodes transform is active (the per-item python
    transform forces the slow per-item path).
    """
    B, n_pad, _ = lig["one_hot"].shape
    assert max_ligand_size <= n_pad, (max_ligand_size, n_pad)
    sizes = lig["size"].astype(np.int64)
    idx = np.arange(n_pad)[None, :]
    real = idx < sizes[:, None]
    virt = (idx >= sizes[:, None]) & (idx < max_ligand_size)

    x = lig["x"]
    cnt = np.maximum(sizes, 1).astype(np.float64)[:, None]
    mu = x.sum(1) / cnt                                        # (B, 3)
    # sample variance (ddof=1), matching torch.std in the reference
    # transform (utils.py:216); single-atom ligands get sigma=0
    var = ((x - mu[:, None, :]) ** 2 * real[..., None]).sum(1) \
        / np.maximum(cnt - 1, 1)
    sigma = np.sqrt(var).max(1)                                # (B,)
    sigma = np.where(sizes > 1, sigma, 0.0)
    noise = rng.standard_normal((B, n_pad, 3))
    xv = mu[:, None, :] + sigma[:, None, None] * noise
    x = np.where(virt[..., None], xv, x).astype(np.float32)

    one_hot = np.insert(lig["one_hot"], vidx, 0.0, axis=2)
    one_hot[virt] = 0.0
    one_hot[virt, vidx] = 1.0

    mask = np.where(virt, 1.0, lig["mask"]).astype(np.float32)
    out = dict(lig)
    out.update(
        x=x, one_hot=one_hot.astype(np.float32), mask=mask,
        size=np.maximum(sizes, max_ligand_size).astype(np.int32),
        num_virtual_atoms=np.maximum(
            max_ligand_size - sizes, 0).astype(np.int32))
    return out


class LigandPocketDataset:
    """Per-complex view over a preprocessed npz split file.

    Mirrors ProcessedLigandPocketDataset (/root/reference/dataset.py:7-50):
    splits the flat arrays by the graph-id masks and centers each complex at
    the joint ligand+pocket CoM.
    """

    def __init__(self, npz_path, center: bool = True,
                 transform: Optional[Callable] = None):
        self.transform = transform
        with np.load(npz_path, allow_pickle=True) as f:
            data = {key: val for key, val in f.items()}

        self.data: Dict[str, list] = {}
        for k, v in data.items():
            if k in ("names", "receptors"):
                self.data[k] = list(v)
                continue
            mask_key = "lig_mask" if "lig" in k else "pocket_mask"
            sections = np.where(np.diff(data[mask_key]))[0] + 1
            self.data[k] = [x.astype(np.float32) if x.dtype.kind == "f" else x
                            for x in np.split(v, sections)]

        if center:
            for i in range(len(self.data["lig_coords"])):
                lc = self.data["lig_coords"][i]
                pc = self.data["pocket_coords"][i]
                mean = (lc.sum(0) + pc.sum(0)) / (len(lc) + len(pc))
                self.data["lig_coords"][i] = (lc - mean).astype(np.float32)
                self.data["pocket_coords"][i] = (pc - mean).astype(np.float32)

        # flat views + offsets feeding the native gather-collate fast path
        def _flat(key):
            arrs = self.data[key]
            offsets = np.concatenate(
                [[0], np.cumsum([len(a) for a in arrs])]).astype(np.int64)
            return np.concatenate(arrs).astype(np.float32), offsets

        self._flat_lig_x, self._lig_offsets = _flat("lig_coords")
        self._flat_lig_oh, _ = _flat("lig_one_hot")
        self._flat_pkt_x, self._pkt_offsets = _flat("pocket_coords")
        self._flat_pkt_oh, _ = _flat("pocket_one_hot")

    def __len__(self):
        return len(self.data["names"])

    def __getitem__(self, idx) -> dict:
        item = {k: v[idx] for k, v in self.data.items()}
        if self.transform is not None:
            item = self.transform(item)
        return item

    def max_sizes(self):
        nl = max(len(c) for c in self.data["lig_coords"])
        npk = max(len(c) for c in self.data["pocket_coords"])
        return nl, npk


class PaddedLoader:
    """Shuffling batch iterator producing padded numpy batches.

    Complexes are sorted into (lig, pocket) shape buckets so that only a
    handful of distinct padded shapes (= XLA compilations) occur, while
    batches stay dense.  ``fixed_shape=True`` pads everything to the global
    maximum instead — one compilation, more padding.

    Multi-host data parallelism (the TPU equivalent of Lightning DDP's
    per-rank DistributedSampler, train.py:118-119): ``batch_size`` is the
    GLOBAL batch; pass ``process_index``/``process_count`` (normally
    ``jax.process_index()``/``jax.process_count()``) and each host yields its
    contiguous ``batch_size // process_count`` slice of every global batch.
    All hosts must construct the loader with the same-seeded ``rng`` so the
    shuffle order agrees (the default rng(0) does).
    """

    def __init__(self, dataset: LigandPocketDataset, batch_size: int,
                 lig_bucket: int = 8, pocket_bucket: int = 64,
                 shuffle: bool = True, drop_last: bool = False,
                 fixed_shape: bool = True,
                 rng: Optional[np.random.Generator] = None,
                 process_index: int = 0, process_count: int = 1):
        assert batch_size % process_count == 0, (batch_size, process_count)
        assert 0 <= process_index < process_count
        self.dataset = dataset
        self.batch_size = batch_size
        self.lig_bucket = lig_bucket
        self.pocket_bucket = pocket_bucket
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = rng or np.random.default_rng(0)
        self.fixed_shape = fixed_shape
        self.process_index = process_index
        self.process_count = process_count
        nl, npk = dataset.max_sizes()
        if isinstance(dataset.transform, AppendVirtualNodes):
            # the transform pads every ligand to its fixed size; max_sizes()
            # sees only the raw (untransformed) complexes
            nl = max(nl, dataset.transform.max_ligand_size)
        self.n_lig_max = round_to_bucket(nl, lig_bucket)
        self.n_pocket_max = round_to_bucket(npk, pocket_bucket)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def _native_batch(self, idx: np.ndarray, n_lig: int, n_pocket: int):
        """Zero-copy-ish batch assembly via the C++ gather-collate."""
        from diffsbdd_tpu import native

        ds = self.dataset
        lig = native.pad_collate_gather(
            ds._flat_lig_x, ds._flat_lig_oh, ds._lig_offsets, idx, n_lig)
        pkt = native.pad_collate_gather(
            ds._flat_pkt_x, ds._flat_pkt_oh, ds._pkt_offsets, idx, n_pocket)
        if lig is None or pkt is None:
            return None
        names = [ds.data["names"][int(i)] for i in idx]
        receptors = [ds.data.get("receptors", [""] * len(ds))[int(i)]
                     for i in idx] if "receptors" in ds.data else [""] * len(idx)
        def mk(t):
            return {"x": t[0], "one_hot": t[1], "mask": t[2],
                    "size": t[3].astype(np.int32)}
        return {"ligand": mk(lig), "pocket": mk(pkt), "names": names,
                "receptors": receptors}

    def __iter__(self) -> Iterator[Dict[str, dict]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        transform = self.dataset.transform
        vnodes = isinstance(transform, AppendVirtualNodes)
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) < self.batch_size:
                if self.drop_last:
                    continue
                # repeat items so every batch has a static batch dimension;
                # np.resize tiles `order` as often as needed, so the
                # invariant holds even when batch_size > 2*len(dataset)
                idx = np.concatenate(
                    [idx, np.resize(order, self.batch_size - len(idx))])
            if self.process_count > 1:
                # this host's contiguous slice of the global batch; the
                # bucket shapes below are computed from the LOCAL slice only
                # when fixed_shape=False, so multi-host runs should keep
                # fixed_shape=True (identical shapes on every host)
                local = self.batch_size // self.process_count
                idx = idx[self.process_index * local:
                          (self.process_index + 1) * local]
            if self.fixed_shape:
                n_lig, n_pocket = self.n_lig_max, self.n_pocket_max
            else:
                raw_max = max(len(self.dataset.data["lig_coords"][int(i)])
                              for i in idx)
                if vnodes:
                    # the transform pads every ligand to its fixed size
                    raw_max = max(raw_max, transform.max_ligand_size)
                n_lig = round_to_bucket(raw_max, self.lig_bucket)
                n_pocket = round_to_bucket(
                    max(len(self.dataset.data["pocket_coords"][int(i)])
                        for i in idx), self.pocket_bucket)
            # the vnode fast path needs the batch's ACTUAL pad width to fit
            # the fixed virtual-node size (with fixed_shape=False the
            # per-batch n_lig can be smaller than n_lig_max)
            use_native = transform is None or (
                vnodes and transform.max_ligand_size <= n_lig)
            if use_native:
                batch = self._native_batch(idx.astype(np.int64), n_lig,
                                           n_pocket)
                if batch is not None:
                    if vnodes:
                        batch["ligand"] = apply_virtual_nodes_batch(
                            batch["ligand"], transform.max_ligand_size,
                            transform.vidx, transform.rng)
                    yield batch
                    continue
            items = [self.dataset[int(i)] for i in idx]
            yield pad_batch(items, n_lig, n_pocket)


class PrefetchLoader:
    """Background-thread prefetch over any batch iterable.

    The TPU-native analogue of the reference DataLoader's ``num_workers``
    (train.py:76, lightning_modules.py:201): while the device executes the
    current dispatch the host thread assembles the next batches, up to
    ``depth`` in flight on a bounded queue.  Collate is numpy/C++ work that
    releases the GIL, and the consumer blocks in ``block_until_ready`` (GIL
    released too), so producer and device genuinely overlap even on one
    core.  Yields the wrapped loader's batches unchanged and in order.
    """

    _DONE = object()

    def __init__(self, loader, depth: int = 2):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue as queue_mod
        import threading

        q = queue_mod.Queue(maxsize=self.depth)
        stop = threading.Event()
        err: list = []

        def put(item) -> bool:
            # bounded put that aborts when the consumer goes away, so an
            # abandoned epoch (break out of the train loop, exception in the
            # step) cannot leave the producer blocked forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def work():
            try:
                for batch in self.loader:
                    if not put(batch):
                        return
            except BaseException as e:  # loader errors surface on the consumer
                err.append(e)
            finally:
                put(self._DONE)

        thread = threading.Thread(
            target=work, name="diffsbdd-prefetch", daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is self._DONE:
                    break
                yield batch
        finally:
            stop.set()
            thread.join()
        if err:
            raise err[0]


def load_size_histogram(datadir) -> np.ndarray:
    """size_distribution.npy written by the processing scripts."""
    return np.load(Path(datadir, "size_distribution.npy"))
