"""Spatial ordering of point sets for locality-aware tiling.

The fused Pallas EGNN kernels process (row, col) node tiles and can skip a
tile pair entirely when no pair of its nodes is within the distance cutoffs.
That only pays off if consecutive nodes are spatially close, so pockets are
sorted along a Morton (Z-order) curve once at preparation time — the model is
permutation-equivariant, so this is a pure relabeling (the reference's node
order is arbitrary too: whatever PDB atom order the parser produced).
"""
from __future__ import annotations

import numpy as np


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave 10 bits with two zero bits each (for 3-D Morton codes)."""
    v = v.astype(np.uint64) & np.uint64(0x3FF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x030000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x0300F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x030C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x09249249)
    return v


def morton_codes(coords: np.ndarray, bits: int = 10) -> np.ndarray:
    """Z-order curve codes for (N, 3) coordinates.

    ``bits`` is capped at 10 by ``_spread_bits``' interleave masks; a larger
    request would silently discard the high quantization bits and scramble
    the ordering."""
    if bits > 10:
        raise ValueError(f"bits={bits} unsupported: _spread_bits interleaves "
                         f"at most 10 bits per axis")
    coords = np.asarray(coords, np.float64)
    lo = coords.min(0)
    span = np.maximum(coords.max(0) - lo, 1e-9)
    scale = (2**bits - 1) / span
    q = np.clip(((coords - lo) * scale), 0, 2**bits - 1).astype(np.uint64)
    return (_spread_bits(q[:, 0])
            | (_spread_bits(q[:, 1]) << np.uint64(1))
            | (_spread_bits(q[:, 2]) << np.uint64(2)))


def morton_order(coords: np.ndarray) -> np.ndarray:
    """Permutation sorting points along the Z-order curve."""
    return np.argsort(morton_codes(coords), kind="stable")


def tile_locality(coords: np.ndarray, tile: int, cutoff: float) -> float:
    """Diagnostic: fraction of (tile, tile) blocks with at least one pair
    within ``cutoff`` — the fraction of tiles the kernel must compute."""
    coords = np.asarray(coords)
    n = len(coords)
    n_tiles = (n + tile - 1) // tile
    active = 0
    for i in range(n_tiles):
        a = coords[i * tile:(i + 1) * tile]
        for j in range(n_tiles):
            b = coords[j * tile:(j + 1) * tile]
            d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
            if (d2 <= cutoff * cutoff).any():
                active += 1
    return active / (n_tiles * n_tiles)
