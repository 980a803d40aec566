"""Edge-axis sharding: split the EGNN's O(N^2) pairwise work over a mesh axis.

SURVEY §5 design obligation: the reference has no sequence/context
parallelism — its scale dimension is graph size, bounded by distance-cutoff
sparsification and 8 A pocket truncation (utils.py:103-128).  When a pocket
is too large for one device's pairwise memory, the TPU-native answer is to
shard the **column axis** of the dense (B, N, N) edge tensor over a mesh
axis and complete every row-sum aggregation with a ``psum`` — the EGNN's
message aggregation (egnn_new.py:319-335 ``unsorted_segment_sum``) is
associative, so this is the natural "ring-attention analogue" for graphs.

How it composes with the model code (the consumer side lives in
models/egnn.py and models/dynamics.py):

* every node-level tensor (h, x, masks) stays **replicated**; only pairwise
  (B, N, Nc) intermediates are per-shard, so per-device pairwise memory is
  O(N^2 / n_shards);
* ``shard_col_slice`` takes this shard's column block of any pairwise-axis
  array (egnn.py:63-72); ``_col_adjacency`` builds the adjacency block
  without ever materializing (B, N, N) (dynamics.py);
* ``_psum_cols`` completes each masked row-sum across the axis
  (egnn.py:75-79) — the only communication, one psum per aggregation;
* the fused Pallas kernels are single-device; sharded execution uses the
  dense XLA path per shard (dynamics.py switches impl automatically).

Cost model: node-level matmuls (O(N H^2)) are replicated across shards —
they are the cheap part; the O(N^2 H) pairwise MLP work and its HBM traffic
divide by the axis size.  Collectives ride ICI (a 1-D mesh axis maps onto
the torus), so the psum of (B, N, F) activations overlaps well at the sizes
where sharding is worth it at all (N >~ 1000).

Validated by tests/test_edge_shard.py: sharded == unsharded dynamics
(values and gradients) on the 8-virtual-device CPU mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

EDGE_AXIS = "edge"


def make_edge_mesh(n_shards: int = -1, devices=None,
                   axis: str = EDGE_AXIS) -> Mesh:
    """1-D mesh over the edge (pairwise-column) axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_shards == -1:
        n_shards = len(devices)
    if n_shards > len(devices):
        raise ValueError(
            f"requested a {n_shards}-shard edge mesh but only "
            f"{len(devices)} devices are visible")
    return Mesh(np.asarray(devices[:n_shards]), (axis,))


def make_dp_edge_mesh(n_data: int, n_edge: int, devices=None,
                      axes=("data", EDGE_AXIS)) -> Mesh:
    """2-D mesh composing data parallelism with edge-axis sharding.

    The batch shards over ``axes[0]`` (gradient/batch collectives ride that
    axis, as in parallel/mesh.py) while the pairwise column axis shards
    over ``axes[1]`` — per-device pairwise memory is O(N^2 / n_edge) AND
    per-device batch is B / n_data.  On hardware, lay ``n_edge`` along the
    faster/inner ICI dimension: the per-aggregation psum of (B, N, F)
    activations is the hot collective."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_edge
    if need > len(devices):
        raise ValueError(
            f"requested a {n_data}x{n_edge} data-x-edge mesh but only "
            f"{len(devices)} devices are visible")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_edge), axes)


def _pad_pocket(xh_pkt, mask_pkt, n_lig: int, n_shards: int):
    """Pad the pocket node axis so the concatenated axis N = NL + NP is a
    multiple of the shard count (padding nodes carry mask 0 — every op in
    the dense path is mask-gated, so they are inert)."""
    n = n_lig + xh_pkt.shape[1]
    pad = (-n) % n_shards
    if pad:
        xh_pkt = jnp.pad(xh_pkt, ((0, 0), (0, pad), (0, 0)))
        mask_pkt = jnp.pad(mask_pkt, ((0, 0), (0, pad)))
    return xh_pkt, mask_pkt, pad


def edge_sharded_dynamics(dynamics, mesh: Mesh, axis: str = EDGE_AXIS,
                          batch_axis: Optional[str] = None):
    """Wrap an ``EGNNDynamics`` module into a column-sharded apply.

    Returns ``fn(variables, xh_lig, xh_pkt, t, mask_lig, mask_pkt)`` with
    the same output contract as ``dynamics.apply`` (eps_lig, eps_pkt), but
    with the O(N^2) pairwise work sharded over ``mesh``'s ``axis``.  All
    inputs and outputs are replicated; jit-compatible (wrap in jax.jit for
    production use).

    ``batch_axis``: optional second mesh axis (see ``make_dp_edge_mesh``)
    that the BATCH dimension of every array argument shards over — data
    parallelism composed with edge sharding in one shard_map.  Parameters
    stay replicated; the per-aggregation psum runs over ``axis`` only, so
    the two axes never exchange data except through the caller's own
    gradient reduction.  ``mesh.shape[batch_axis]`` must divide the batch.
    """
    n_shards = mesh.shape[axis]
    b = P(batch_axis) if batch_axis is not None else P()

    def apply_fn(variables, xh_lig, xh_pkt, t, mask_lig, mask_pkt):
        if batch_axis is not None:
            n_b = mesh.shape[batch_axis]
            if xh_lig.shape[0] % n_b != 0:
                raise ValueError(
                    f"batch {xh_lig.shape[0]} is not divisible by mesh "
                    f"axis '{batch_axis}' of size {n_b}")
        NL = xh_lig.shape[1]
        xh_pkt_p, mask_pkt_p, pad = _pad_pocket(
            xh_pkt, mask_pkt, NL, n_shards)
        width = (NL + xh_pkt_p.shape[1]) // n_shards

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), b, b, b, b, b),
                 out_specs=(b, b), check_vma=False)
        def sharded(variables, xh_lig, xh_pkt, t, mask_lig, mask_pkt):
            shard_ctx = {"axis": axis,
                         "index": jax.lax.axis_index(axis),
                         "width": width}
            return dynamics.apply(variables, xh_lig, xh_pkt, t,
                                  mask_lig, mask_pkt, shard_ctx=shard_ctx)

        eps_lig, eps_pkt = sharded(variables, xh_lig, xh_pkt_p, t,
                                   mask_lig, mask_pkt_p)
        if pad:
            eps_pkt = eps_pkt[:, :-pad]
        return eps_lig, eps_pkt

    return apply_fn
