"""Dense masked E(3)/SE(3)-equivariant GNN for padded ligand-pocket graphs.

TPU-first re-design of the reference EGNN (behavioral spec:
/root/reference/equivariant_diffusion/egnn_new.py).  Differences forced by the
hardware, none of which change the math on valid nodes:

* Graphs are padded to fixed shapes ``(B, N, .)`` with a node validity mask;
  edges are a dense ``(B, N, N)`` adjacency mask (incl. self-edges, matching
  the reference's ``get_edges`` which keeps the diagonal) instead of a
  dynamic-length edge list — static shapes are what XLA/Mosaic require.
* Scatter-sum aggregation becomes a masked dense row-sum, and every edge MLP's
  first layer is split into per-node projections: for kernel
  ``W = [W_i; W_j; W_e]``, ``W_i h_i + W_j h_j`` is computed with two
  ``(B,N,H)x(H,F)`` matmuls and broadcast over pairs, so only the genuinely
  pairwise ``F x F`` work runs at O(N^2) — exactly the shape the MXU wants.
* The O(N^2) pairwise work has two interchangeable implementations selected
  by ``impl``: a dense XLA path (always available; supports sin embeddings)
  and the fused Pallas kernels of diffsbdd_tpu/ops/egnn_pallas.py, which keep
  the per-pair MLPs in VMEM and rebuild the adjacency on the fly.

Component map (reference -> here):
  GCL (egnn_new.py:6-66)                 -> DenseGCL
  EquivariantUpdate (egnn_new.py:69-132) -> DenseEquivariantUpdate
  EquivariantBlock (egnn_new.py:135-184) -> EquivariantBlock
  EGNN (egnn_new.py:187-244)             -> EGNN
  GNN (egnn_new.py:247-279)              -> GNN
  SinusoidsEmbeddingNew (:282-293)       -> sinusoidal_distance_embedding
  coord2diff / coord2cross (:296-316)    -> coord2diff / coord2cross
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffsbdd_tpu.ops import egnn_pallas as fused

SIN_EMB_MAX_RES = 15.0
SIN_EMB_MIN_RES = 15.0 / 2000.0
SIN_EMB_DIV = 4


def n_sin_frequencies() -> int:
    return int(math.log(SIN_EMB_MAX_RES / SIN_EMB_MIN_RES, SIN_EMB_DIV)) + 1


def sin_embedding_dim() -> int:
    return 2 * n_sin_frequencies()


def sinusoidal_distance_embedding(radial: jnp.ndarray) -> jnp.ndarray:
    """Fourier features of edge distance; input is squared distance (..., 1)."""
    n = n_sin_frequencies()
    freqs = 2 * math.pi * (SIN_EMB_DIV ** jnp.arange(n, dtype=radial.dtype)) / SIN_EMB_MAX_RES
    d = jnp.sqrt(radial + 1e-8)
    emb = d * freqs  # broadcast (..., 1) * (n,) -> (..., n)
    return jax.lax.stop_gradient(jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1))


def shard_col_slice(a: jnp.ndarray, shard_ctx, axis: int) -> jnp.ndarray:
    """This shard's column block of a pairwise-axis array.

    ``shard_ctx = {"axis": mesh-axis name, "index": lax.axis_index(axis),
    "width": N // mesh.shape[axis]}`` — see parallel/edge_shard.py.  Offsets
    are traced values, hence dynamic_slice."""
    if shard_ctx is None:
        return a
    off = shard_ctx["index"] * shard_ctx["width"]
    return jax.lax.dynamic_slice_in_dim(a, off, shard_ctx["width"], axis)


def _psum_cols(agg: jnp.ndarray, shard_ctx) -> jnp.ndarray:
    """Complete a column-sharded row-sum aggregation across the mesh axis."""
    if shard_ctx is None:
        return agg
    return jax.lax.psum(agg, shard_ctx["axis"])


def coord2diff(x: jnp.ndarray, norm_constant: float = 1.0, x_cols=None):
    """Pairwise squared distances and normalized difference vectors.

    x: (B, N, 3) -> radial (B, N, N, 1), coord_diff (B, N, N, 3) where
    coord_diff[b, i, j] = (x_i - x_j) / (|x_i - x_j| + norm_constant).
    With ``x_cols`` (B, Nc, 3) — this shard's column block under edge-axis
    sharding — the pairwise axis j spans only those Nc columns.
    """
    diff = x[:, :, None, :] - (x if x_cols is None else x_cols)[:, None, :, :]
    radial = jnp.sum(diff**2, axis=-1, keepdims=True)
    norm = jnp.sqrt(radial + 1e-8)
    return radial, diff / (norm + norm_constant)


def coord2cross(x: jnp.ndarray, node_mask: jnp.ndarray, norm_constant: float = 1.0,
                x_cols=None):
    """Pairwise normalized cross products about the per-graph CoM
    (egnn_new.py:305-316 with the masked-mean replacing scatter-mean).
    The CoM is always over the FULL node set; ``x_cols`` restricts only the
    pairwise column axis (edge-axis sharding)."""
    count = jnp.maximum(jnp.sum(node_mask, axis=1, keepdims=True), 1e-12)
    mean = jnp.sum(x * node_mask[..., None], axis=1, keepdims=True) / count[..., None]
    xc = x - mean
    xc_cols = xc if x_cols is None else x_cols - mean
    cross = jnp.cross(
        jnp.broadcast_to(xc[:, :, None, :], xc.shape[:1] + (xc.shape[1], xc_cols.shape[1], 3)),
        jnp.broadcast_to(xc_cols[:, None, :, :], xc.shape[:1] + (xc.shape[1], xc_cols.shape[1], 3)),
    )
    # sqrt(.+1e-8) instead of linalg.norm: the cross product is exactly zero
    # on the diagonal (and for coincident padded nodes), where the norm's
    # JAX gradient is inf and inf*0 NaNs the whole backward pass.  torch
    # defines the norm subgradient at 0 as 0, so the reference never hits
    # this (egnn_new.py:105-109).
    norm = jnp.sqrt(jnp.sum(cross**2, axis=-1, keepdims=True) + 1e-8)
    return cross / (norm + norm_constant)


def masked_graph_mean(x, node_mask):
    count = jnp.maximum(jnp.sum(node_mask, axis=1), 1e-12)
    return jnp.sum(x * node_mask[..., None], axis=1) / count[..., None]


class DenseParams(nn.Module):
    """Parameter container with nn.Dense's tree layout ({kernel, bias}) but
    direct array access, so fused kernels can consume the weights."""

    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        return kernel, bias


def _split_pair_dense(kernel, bias, h, edge_feat, node_dim, shard_ctx=None):
    """First layer of a pairwise MLP via the split-kernel trick.

    kernel: (2*node_dim + E, F); returns (B, N, N, F) pre-activation for input
    concat([h_i, h_j, edge_feat]).  Under edge-axis sharding the column (j)
    projection is sliced to this shard's block: the node-level matmul is
    cheap, only the O(N^2) pairwise broadcast is sharded.
    """
    w_i = kernel[:node_dim]
    w_j = kernel[node_dim:2 * node_dim]
    w_e = kernel[2 * node_dim:]
    a_i = h @ w_i  # (B, N, F)
    a_j = shard_col_slice(h @ w_j, shard_ctx, 1)
    pre = a_i[:, :, None, :] + a_j[:, None, :, :]
    pre = pre + jnp.einsum("bije,ef->bijf", edge_feat, w_e)
    return pre + bias


def _split_first_layer(kernel, bias, h):
    """Per-node row/col projections (+bias folded into rows) for the fused
    kernels; also returns the distance-feature rows and edge-embedding rows."""
    H = h.shape[-1]
    a_row = h @ kernel[:H] + bias
    a_col = h @ kernel[H:2 * H]
    w_e = kernel[2 * H:]
    return a_row, a_col, w_e[0], w_e[1], w_e[2:]


def _type_bias_table(type_table, w_types):
    """(3, e_nf) embedding + (e_nf, F) first-layer rows -> (2, 2, F) table
    indexed by (is_lig_i, is_lig_j); types: 0=cross, 1=lig-lig, 2=pkt-pkt."""
    if type_table is None:
        return None
    proj = type_table @ w_types  # (3, F)
    return jnp.stack([
        jnp.stack([proj[2], proj[0]]),   # (pkt, pkt), (pkt, lig)
        jnp.stack([proj[0], proj[1]]),   # (lig, pkt), (lig, lig)
    ])


class DenseGCL(nn.Module):
    """Invariant node update: pairwise edge MLP + masked sum + residual MLP."""

    hidden_nf: int
    edges_in_d: int
    node_nf: int  # input feature width H (params are created in setup)
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"
    attention: bool = False
    impl: str = "xla"
    interpret: bool = False
    compute_dtype: Any = jnp.float32  # pairwise-message compute precision

    def setup(self):
        H = self.node_nf
        self.edge_mlp_0_kernel = self.param(
            "edge_mlp_0_kernel", nn.initializers.lecun_normal(),
            (2 * H + self.edges_in_d, self.hidden_nf))
        self.edge_mlp_0_bias = self.param(
            "edge_mlp_0_bias", nn.initializers.zeros, (self.hidden_nf,))
        self.edge_mlp_2 = DenseParams(self.hidden_nf, self.hidden_nf)
        if self.attention:
            self.att_mlp_0 = DenseParams(self.hidden_nf, 1)
        # DenseParams with nn.Dense's tree layout ({kernel, bias}, same
        # names/shapes/init) so the block-fused kernel can consume the raw
        # node-MLP weights; checkpoint-compatible with the nn.Dense layout
        self.node_mlp_0 = DenseParams(H + self.hidden_nf, self.hidden_nf)
        self.node_mlp_2 = DenseParams(self.hidden_nf, H)

    def node_update(self, h, agg, node_mask):
        """Residual node MLP on the aggregated messages."""
        kn0, bn0 = self.node_mlp_0()
        kn2, bn2 = self.node_mlp_2()
        inp = jnp.concatenate([h, agg], axis=-1)
        upd = jax.nn.silu(inp @ kn0 + bn0) @ kn2 + bn2
        return (h + upd) * node_mask[..., None]

    def fused_pieces(self):
        """Raw weights for the block-fused kernel (ops/egnn_block_fused.py);
        calling this binds the same parameter set the normal path creates."""
        k2, b2 = self.edge_mlp_2()
        k_att, b_att = self.att_mlp_0() if self.attention else (None, None)
        kn0, bn0 = self.node_mlp_0()
        kn2, bn2 = self.node_mlp_2()
        return dict(k1=self.edge_mlp_0_kernel, b1=self.edge_mlp_0_bias,
                    k2=k2, b2=b2, k_att=k_att, b_att=b_att,
                    kn0=kn0, bn0=bn0, kn2=kn2, bn2=bn2)

    def __call__(self, h, edge_feat, adj, node_mask, fused_ctx=None,
                 shard_ctx=None):
        B, N, H = h.shape
        k1 = self.edge_mlp_0_kernel
        b1 = self.edge_mlp_0_bias
        k2, b2 = self.edge_mlp_2()
        if self.attention:
            k_att, b_att = self.att_mlp_0()
        else:
            k_att, b_att = None, None

        if fused_ctx is not None and self.impl == "pallas":
            assert self.aggregation_method == "sum"
            assert shard_ctx is None, \
                "edge-axis sharding uses the dense XLA path per shard"
            a_row, a_col, w_d2, w_d20, w_types = _split_first_layer(k1, b1, h)
            tb = _type_bias_table(fused_ctx["type_table"], w_types)
            kw = dict(
                cutoffs=fused_ctx["cutoffs"], attention=self.attention,
                normalization_factor=self.normalization_factor,
                impl="pallas", tile_i=fused_ctx["tile_i"],
                tile_j=fused_ctx["tile_j"],
                sub_j=fused_ctx.get("sub_j", fused.SUB_J),
                mxu_precision=fused_ctx.get("mxu_precision", "float32"),
                bwd_impl=fused_ctx.get("bwd_impl", "xla"),
                bwd_sub_j=fused_ctx.get("bwd_sub_j"),
                bwd_mxu_precision=fused_ctx.get("bwd_mxu_precision"),
                skip_mode=fused_ctx.get("skip_mode", "bits"),
                interpret=self.interpret)
            x, x0 = fused_ctx["x"], fused_ctx["x0"]
            mask, is_lig = fused_ctx["mask"], fused_ctx["is_lig"]
            if fused_ctx.get("shared_pocket_first_layer"):
                # Sampling workload factorization: one pocket replicated
                # across the batch + a per-step-uniform time channel make the
                # first GCL's pocket-row/pocket-col aggregation identical for
                # every sample, so it is computed once (B=1) and broadcast;
                # only the ligand-touching parts run per sample.  Exact
                # partition of the (row, col) space — see
                # test_shared_pocket_factorization.
                pkt_mask = mask * (1.0 - is_lig)
                lig_cols = mask * is_lig
                one = lambda t: t[:1]
                d2_0s = fused_ctx.get("d2_0")
                agg_pp = fused.gcl_message_agg(
                    one(a_row), one(a_col), one(x), one(x0), one(pkt_mask),
                    one(is_lig), w_d2, w_d20, tb, k2, b2, k_att, b_att,
                    col_mask=one(pkt_mask),
                    d2_0=None if d2_0s is None else one(d2_0s), **kw)
                agg_pl = fused.gcl_message_agg(
                    a_row, a_col, x, x0, pkt_mask, is_lig, w_d2, w_d20, tb,
                    k2, b2, k_att, b_att, col_mask=lig_cols, d2_0=d2_0s,
                    **kw)
                agg_lr = fused.gcl_message_agg(
                    a_row, a_col, x, x0, lig_cols, is_lig, w_d2, w_d20, tb,
                    k2, b2, k_att, b_att, col_mask=mask,
                    update_rows=fused_ctx["n_lig_rows"], d2_0=d2_0s, **kw)
                agg = jnp.broadcast_to(agg_pp, a_row.shape) + agg_pl + agg_lr
            else:
                agg = fused.gcl_message_agg(
                    a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, tb,
                    k2, b2, k_att, b_att, d2_0=fused_ctx.get("d2_0"), **kw)
        else:
            cd = self.compute_dtype
            # bf16 compute halves the HBM traffic of the O(N^2) message
            # tensors; accumulation back to f32 happens in the reduction
            mij = jax.nn.silu(_split_pair_dense(
                k1.astype(cd), b1.astype(cd), h.astype(cd),
                edge_feat.astype(cd), H, shard_ctx))
            mij = jax.nn.silu(mij @ k2.astype(cd) + b2.astype(cd))
            out = mij
            if self.attention:
                out = mij * jax.nn.sigmoid(
                    mij @ k_att.astype(cd) + b_att.astype(cd))
            adj_c = adj.astype(cd)
            num = jnp.einsum("bijh,bij->bih", out, adj_c,
                             preferred_element_type=jnp.float32)
            # under edge-axis sharding adj/edge_feat hold this shard's column
            # block; the psum over the mesh axis completes the row sum
            num = _psum_cols(num, shard_ctx)
            if self.aggregation_method == "sum":
                agg = num / self.normalization_factor
            elif self.aggregation_method == "mean":
                denom = _psum_cols(jnp.sum(adj, axis=2), shard_ctx)
                agg = num / jnp.maximum(denom, 1.0)[..., None]
            else:
                raise ValueError(self.aggregation_method)
            agg = agg.astype(h.dtype)

        # node MLP: Linear(H + F -> F), silu, Linear(F -> H), residual
        return self.node_update(h, agg, node_mask)


def _gain_xavier_uniform(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -a, a)
    return init


class _CoordMLP(nn.Module):
    """Linear(2H+E->F), silu, Linear(F->F), silu, Linear(F->1, no bias).

    The last layer is xavier-uniform with gain 1e-3 as in the reference
    (egnn_new.py:78-79) so fresh models start with near-zero coordinate
    updates.  ``weights()`` exposes the raw arrays for the fused kernels.
    """

    hidden_nf: int
    edges_in_d: int
    node_nf: int
    compute_dtype: Any = jnp.float32
    # the reference shares ONE nn.Linear(hidden, 1) instance as the final
    # head of BOTH coord_mlp and cross_product_mlp (egnn_new.py:78-93);
    # tie_head=True omits the head here so the owner can pass the shared one
    tie_head: bool = False

    def setup(self):
        self.lin0_kernel = self.param(
            "lin0_kernel", nn.initializers.lecun_normal(),
            (2 * self.node_nf + self.edges_in_d, self.hidden_nf))
        self.lin0_bias = self.param(
            "lin0_bias", nn.initializers.zeros, (self.hidden_nf,))
        self.lin1 = DenseParams(self.hidden_nf, self.hidden_nf, name="lin1")
        if not self.tie_head:
            self.lin2 = DenseParams(self.hidden_nf, 1, use_bias=False,
                                    name="lin2",
                                    kernel_init=_gain_xavier_uniform(1e-3))

    def weights(self, shared_head=None):
        k1, b1 = self.lin1()
        if self.tie_head:
            assert shared_head is not None, "tied head requires shared_head"
            k2 = shared_head
        else:
            k2, _ = self.lin2()
        return self.lin0_kernel, self.lin0_bias, k1, b1, k2

    def __call__(self, h, edge_feat, shared_head=None, shard_ctx=None):
        cd = self.compute_dtype
        _, _, k1, b1, k2 = self.weights(shared_head)
        z = jax.nn.silu(_split_pair_dense(
            self.lin0_kernel.astype(cd), self.lin0_bias.astype(cd),
            h.astype(cd), edge_feat.astype(cd), h.shape[-1], shard_ctx))
        z = jax.nn.silu(z @ k1.astype(cd) + b1.astype(cd))
        return (z @ k2.astype(cd)).astype(jnp.float32)  # (B, N, N, 1)


class DenseEquivariantUpdate(nn.Module):
    """Equivariant coordinate update with optional SE(3) cross-product term."""

    hidden_nf: int
    edges_in_d: int
    node_nf: int
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"
    tanh: bool = False
    coords_range: float = 10.0
    reflection_equiv: bool = True
    impl: str = "xla"
    interpret: bool = False
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.coord_mlp = _CoordMLP(self.hidden_nf, self.edges_in_d,
                                   self.node_nf,
                                   compute_dtype=self.compute_dtype,
                                   name="coord_mlp")
        if not self.reflection_equiv:
            # final (hidden, 1) head is TIED to coord_mlp's (same nn.Linear
            # instance in the reference, egnn_new.py:78-93)
            self.cross_product_mlp = _CoordMLP(
                self.hidden_nf, self.edges_in_d, self.node_nf,
                compute_dtype=self.compute_dtype, tie_head=True,
                name="cross_product_mlp")

    def __call__(self, h, coord, coord_diff, coord_cross, edge_feat, adj,
                 node_mask, update_coords_mask=None, fused_ctx=None,
                 shard_ctx=None):
        if fused_ctx is not None and self.impl == "pallas":
            assert shard_ctx is None, \
                "edge-axis sharding uses the dense XLA path per shard"
            agg = self._fused_agg(h, fused_ctx)
        else:
            agg = self._dense_agg(h, coord_diff, coord_cross, edge_feat, adj,
                                  shard_ctx)

        return self.apply_update(coord, agg, node_mask, update_coords_mask)

    def _dense_agg(self, h, coord_diff, coord_cross, edge_feat, adj,
                   shard_ctx=None):
        phi = self.coord_mlp(h, edge_feat, shard_ctx=shard_ctx)
        if self.tanh:
            trans = coord_diff * jnp.tanh(phi) * self.coords_range
        else:
            trans = coord_diff * phi

        if not self.reflection_equiv:
            shared_k2, _ = self.coord_mlp.lin2()
            phi_cross = self.cross_product_mlp(h, edge_feat,
                                               shared_head=shared_k2,
                                               shard_ctx=shard_ctx)
            if self.tanh:
                phi_cross = jnp.tanh(phi_cross) * self.coords_range
            trans = trans + coord_cross * phi_cross

        trans = trans * adj[..., None]
        num = _psum_cols(jnp.sum(trans, axis=2), shard_ctx)
        if self.aggregation_method == "sum":
            return num / self.normalization_factor
        if self.aggregation_method == "mean":
            denom = _psum_cols(jnp.sum(adj, axis=2), shard_ctx)
            return num / jnp.maximum(denom, 1.0)[..., None]
        raise ValueError(self.aggregation_method)

    def apply_update(self, coord, agg, node_mask, update_coords_mask=None):
        if update_coords_mask is not None:
            agg = agg * update_coords_mask[..., None]
        return (coord + agg) * node_mask[..., None]

    def block_pieces(self, type_table):
        """Coordinate (and cross) head weights in block-fused-kernel form:
        the first-layer kernel split into per-node / distance / type rows
        (the in-kernel equivalent of _split_first_layer + _type_bias_table)."""
        H = self.node_nf
        lk0, lb0, lw1, lb1, lw3 = self.coord_mlp.weights()
        coord = dict(k_i=lk0[:H], k_j=lk0[H:2 * H], b0=lb0,
                     w_d2=lk0[2 * H], w_d20=lk0[2 * H + 1],
                     type_bias=_type_bias_table(type_table, lk0[2 * H + 2:]),
                     w1=lw1, b1=lb1, w3=lw3)
        cross = None
        if not self.reflection_equiv:
            ck0, cb0, cw1, cb1, cw3 = self.cross_product_mlp.weights(
                shared_head=lw3)
            cross = dict(k_i=ck0[:H], k_j=ck0[H:2 * H], b0=cb0,
                         w_d2=ck0[2 * H], w_d20=ck0[2 * H + 1],
                         type_bias=_type_bias_table(type_table,
                                                    ck0[2 * H + 2:]),
                         w1=cw1, b1=cb1, w3=cw3)
        return coord, cross

    def _fused_agg(self, h, ctx):
        assert self.aggregation_method == "sum"
        lk0, lb0, lk1, lb1, lk2 = self.coord_mlp.weights()
        a_row, a_col, w_d2, w_d20, w_types = _split_first_layer(lk0, lb0, h)
        tb = _type_bias_table(ctx["type_table"], w_types)
        cross = None
        graph_mean = None
        if not self.reflection_equiv:
            ck0, cb0, ck1, cb1, ck2 = self.cross_product_mlp.weights(
                shared_head=lk2)
            c_row, c_col, cw_d2, cw_d20, cw_types = _split_first_layer(
                ck0, cb0, h)
            cross = dict(
                a_row=c_row, a_col=c_col, w_d2=cw_d2, w_d20=cw_d20,
                type_bias=_type_bias_table(ctx["type_table"], cw_types),
                w2=ck1, b2=cb1, w3=ck2)
            graph_mean = masked_graph_mean(ctx["x"], ctx["mask"])
        return fused.coord_update_agg(
            a_row, a_col, ctx["x"], ctx["x0"], ctx["mask"], ctx["is_lig"],
            w_d2, w_d20, tb, lk1, lb1, lk2,
            cutoffs=ctx["cutoffs"], tanh=self.tanh,
            coords_range=self.coords_range,
            norm_constant=ctx["norm_constant"],
            normalization_factor=self.normalization_factor,
            cross=cross, graph_mean=graph_mean, impl="pallas",
            tile_i=ctx["tile_i"], tile_j=ctx["tile_j"],
            sub_j=ctx.get("sub_j", fused.SUB_J),
            update_rows=ctx.get("update_rows"), d2_0=ctx.get("d2_0"),
            mxu_precision=ctx.get("mxu_precision", "float32"),
            bwd_impl=ctx.get("bwd_impl", "xla"),
            bwd_sub_j=ctx.get("bwd_sub_j"),
            bwd_mxu_precision=ctx.get("bwd_mxu_precision"),
            skip_mode=ctx.get("skip_mode", "bits"),
            interpret=self.interpret)


class EquivariantBlock(nn.Module):
    """``inv_sublayers`` x DenseGCL followed by one coordinate update.

    Distances are recomputed from the current coordinates at block entry
    (egnn_new.py:166) and concatenated with the global edge attributes.
    """

    hidden_nf: int
    edge_feat_nf: int
    n_layers: int = 2
    attention: bool = True
    tanh: bool = False
    coords_range: float = 15.0
    norm_constant: float = 1.0
    sin_embedding: bool = False
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"
    reflection_equiv: bool = True
    impl: str = "xla"
    interpret: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x, adj, node_mask, edge_attr, update_coords_mask=None,
                 fused_ctx=None, shard_ctx=None):
        use_fused = fused_ctx is not None and self.impl == "pallas"
        gcls = [DenseGCL(self.hidden_nf, self.edge_feat_nf,
                         node_nf=self.hidden_nf,
                         normalization_factor=self.normalization_factor,
                         aggregation_method=self.aggregation_method,
                         attention=self.attention, impl=self.impl,
                         interpret=self.interpret,
                         compute_dtype=self.compute_dtype, name=f"gcl_{i}")
                for i in range(self.n_layers)]
        equiv = DenseEquivariantUpdate(
            self.hidden_nf, self.edge_feat_nf, node_nf=self.hidden_nf,
            normalization_factor=self.normalization_factor,
            aggregation_method=self.aggregation_method, tanh=self.tanh,
            coords_range=self.coords_range,
            reflection_equiv=self.reflection_equiv, impl=self.impl,
            interpret=self.interpret, compute_dtype=self.compute_dtype,
            name="gcl_equiv")

        if use_fused:
            # A whole-block single-PASS kernel is impossible — the
            # coordinate MLP consumes the post-GCL h (egnn_new.py:175-178),
            # which depends on the full message aggregation — but the
            # phased single-CALL kernel (ops/egnn_block_fused.py) crosses
            # that barrier with a sequential grid + VMEM scratch.  Used on
            # the sampling path (block_fuse flag); training keeps the split
            # kernels with their fused backward.
            ctx = dict(fused_ctx)
            ctx["norm_constant"] = self.norm_constant
            if (ctx.get("block_fuse") and self.n_layers == 1
                    and not ctx.get("shared_pocket_first_layer")):
                return self._block_fused(h, x, node_mask,
                                         update_coords_mask, ctx,
                                         gcls[0], equiv)
            edge_feat = None
            coord_diff = coord_cross = None
        else:
            ctx = None
            # under edge-axis sharding the pairwise j axis is this shard's
            # column block; x/h/masks stay full (replicated across the axis)
            x_cols = shard_col_slice(x, shard_ctx, 1) \
                if shard_ctx is not None else None
            radial, coord_diff = coord2diff(x, self.norm_constant, x_cols)
            coord_cross = None if self.reflection_equiv else coord2cross(
                x, node_mask, self.norm_constant, x_cols)
            dist_feat = sinusoidal_distance_embedding(radial) \
                if self.sin_embedding else radial
            edge_feat = jnp.concatenate([dist_feat, edge_attr], axis=-1)

        for i in range(self.n_layers):
            if use_fused:
                ctx["x"] = x  # current coordinates for this block's distances
                if i > 0:
                    # the batch-invariant pocket factorization only holds for
                    # the very first GCL (pocket h diverges per sample after)
                    ctx["shared_pocket_first_layer"] = False
            h = gcls[i](h, edge_feat, adj, node_mask, fused_ctx=ctx,
                        shard_ctx=shard_ctx)
        x = equiv(h, x, coord_diff, coord_cross, edge_feat, adj, node_mask,
                  update_coords_mask, fused_ctx=ctx, shard_ctx=shard_ctx)
        return h * node_mask[..., None], x

    def _block_fused(self, h, x, node_mask, update_coords_mask, ctx,
                     gcl, equiv):
        """One phased pallas_call for the whole block (GCL + node MLP +
        coordinate update); see ops/egnn_block_fused.py."""
        from diffsbdd_tpu.ops.egnn_block_fused import egnn_block_step
        from diffsbdd_tpu.ops.egnn_pallas import fold_type_bias

        gp = gcl.fused_pieces()
        a_row, a_col, w_d2, w_d20, w_types = _split_first_layer(
            gp["k1"], gp["b1"], h)
        tb = _type_bias_table(ctx["type_table"], w_types)
        a_row, a_col, type_delta = fold_type_bias(
            a_row, a_col, ctx["is_lig"], tb)
        gcl_d = dict(w_d2=w_d2, w_d20=w_d20, type_delta=type_delta,
                     w2=gp["k2"], b2=gp["b2"], w_att=gp["k_att"],
                     b_att=gp["b_att"])
        H = h.shape[-1]
        node_d = dict(w_h=gp["kn0"][:H], w_a=gp["kn0"][H:], b0=gp["bn0"],
                      w2=gp["kn2"], b2=gp["bn2"])
        coord_d, cross_d = equiv.block_pieces(ctx["type_table"])
        graph_mean = None if cross_d is None \
            else masked_graph_mean(x, ctx["mask"])

        h_new, dx = egnn_block_step(
            h, a_row, a_col, x, ctx["x0"], ctx["mask"], ctx["is_lig"],
            gcl_d, node_d, coord_d, cross_d, graph_mean,
            cutoffs=ctx["cutoffs"], attention=self.attention,
            tanh=self.tanh, coords_range=self.coords_range,
            norm_constant=self.norm_constant,
            normalization_factor=self.normalization_factor,
            impl="pallas", update_rows=ctx.get("update_rows"),
            d2_0=ctx.get("d2_0"), tile_i=ctx["tile_i"],
            tile_j=ctx["tile_j"], sub_j=ctx.get("sub_j", fused.SUB_J),
            mxu_precision=ctx.get("mxu_precision", "float32"),
            interpret=self.interpret)
        x_new = equiv.apply_update(x, dx, node_mask, update_coords_mask)
        return h_new * node_mask[..., None], x_new


class EGNN(nn.Module):
    """Full equivariant stack: embed -> n_layers blocks -> embed_out.

    ``impl='pallas'`` routes the O(N^2) work through the fused kernels; the
    caller provides ``fused_ctx`` with {mask, is_lig, type_table, cutoffs}
    and guarantees N is a multiple of the kernel tiles.
    """

    hidden_nf: int
    out_node_nf: int
    in_edge_nf: int = 0
    n_layers: int = 3
    attention: bool = False
    tanh: bool = False
    coords_range: float = 15.0
    norm_constant: float = 1.0
    inv_sublayers: int = 2
    sin_embedding: bool = False
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"
    reflection_equiv: bool = True
    impl: str = "xla"
    interpret: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x, adj, node_mask, edge_attr=None,
                 update_coords_mask=None, fused_ctx=None, shard_ctx=None):
        dist_dim = sin_embedding_dim() if self.sin_embedding else 1
        edge_feat_nf = 2 * dist_dim + self.in_edge_nf
        # Reference passes the FULL coords_range to every block
        # (egnn_new.py:218 forwards coords_range; :143 stores it undivided;
        # the divided egnn_new.py:197 attribute is never used).
        coords_range_layer = float(self.coords_range)

        use_fused = fused_ctx is not None and self.impl == "pallas"
        if use_fused:
            assert not self.sin_embedding, \
                "sin_embedding requires the XLA implementation"
            ctx = dict(fused_ctx)
            ctx["x0"] = x  # initial coordinates feed the global edge feature
            edge_feat0 = None
        else:
            ctx = None
            # edge_attr (when provided by the caller) must already be
            # column-sliced under edge-axis sharding, matching adj
            x_cols = shard_col_slice(x, shard_ctx, 1) \
                if shard_ctx is not None else None
            radial, _ = coord2diff(x, x_cols=x_cols)
            edge_feat0 = sinusoidal_distance_embedding(radial) \
                if self.sin_embedding else radial
            if edge_attr is not None:
                edge_feat0 = jnp.concatenate([edge_feat0, edge_attr], axis=-1)

        h = nn.Dense(self.hidden_nf, name="embedding")(h)
        for i in range(self.n_layers):
            blk_ctx = ctx
            if use_fused and i > 0:
                blk_ctx = dict(ctx)
                blk_ctx["shared_pocket_first_layer"] = False
            h, x = EquivariantBlock(
                hidden_nf=self.hidden_nf, edge_feat_nf=edge_feat_nf,
                n_layers=self.inv_sublayers, attention=self.attention,
                tanh=self.tanh, coords_range=coords_range_layer,
                norm_constant=self.norm_constant,
                sin_embedding=self.sin_embedding,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                reflection_equiv=self.reflection_equiv, impl=self.impl,
                interpret=self.interpret, compute_dtype=self.compute_dtype,
                name=f"e_block_{i}")(
                h, x, adj, node_mask, edge_feat0, update_coords_mask,
                fused_ctx=blk_ctx, shard_ctx=shard_ctx)

        h = nn.Dense(self.out_node_nf, name="embedding_out")(h)
        return h * node_mask[..., None], x


class GNN(nn.Module):
    """Non-equivariant baseline over concatenated [x, h] node features.

    Mirrors the reference 'gnn_dynamics' mode (egnn_new.py:247-279).
    """

    hidden_nf: int
    out_node_nf: int
    in_edge_nf: int = 0
    n_layers: int = 4
    attention: bool = False
    normalization_factor: float = 1.0
    aggregation_method: str = "sum"

    @nn.compact
    def __call__(self, h, adj, node_mask, edge_attr=None):
        B, N, _ = h.shape
        if edge_attr is None:
            edge_attr = jnp.zeros((B, N, N, 0), dtype=h.dtype)
        h = nn.Dense(self.hidden_nf, name="embedding")(h)
        for i in range(self.n_layers):
            h = DenseGCL(self.hidden_nf, edges_in_d=edge_attr.shape[-1],
                         node_nf=self.hidden_nf,
                         normalization_factor=self.normalization_factor,
                         aggregation_method=self.aggregation_method,
                         attention=self.attention, name=f"gcl_{i}")(
                h, edge_attr, adj, node_mask)
        h = nn.Dense(self.out_node_nf, name="embedding_out")(h)
        return h * node_mask[..., None]
