"""The epsilon-network: encoders + EGNN over the joint ligand/pocket graph.

Behavioral equivalent of the reference ``EGNNDynamics``
(/root/reference/equivariant_diffusion/dynamics.py:10-187) on the padded
layout.  The dynamic-shape ``torch.where`` edge list of ``get_edges``
(dynamics.py:169-187) becomes a dense boolean adjacency built from the node
masks and the three distance cutoffs — a static-shape op that jits cleanly and
feeds the dense EGNN.

Inputs are padded per-domain tensors; node axes are concatenated internally:
  xh_lig:  (B, NL, 3 + atom_nf)    mask_lig: (B, NL)
  xh_pkt:  (B, NP, 3 + residue_nf) mask_pkt: (B, NP)
  t:       (B, 1) normalized time
Returns (eps_lig, eps_pkt) with the same leading shapes.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffsbdd_tpu.models.egnn import EGNN, GNN


def build_adjacency(
    x_lig: jnp.ndarray,
    x_pkt: jnp.ndarray,
    mask_lig: jnp.ndarray,
    mask_pkt: jnp.ndarray,
    cutoff_ligand: Optional[float] = None,
    cutoff_pocket: Optional[float] = None,
    cutoff_interaction: Optional[float] = None,
) -> jnp.ndarray:
    """Dense (B, N, N) adjacency over the concatenated node set.

    Self-edges are kept, matching the reference ``get_edges`` which never
    removes the diagonal (dynamics.py:169-187).  Cutoffs are compared against
    Euclidean distance <= cutoff, evaluated on the *current* coordinates, so
    the graph is rebuilt at every denoising step exactly like the reference.
    """
    B, NL, _ = x_lig.shape
    NP = x_pkt.shape[1]

    def pair_adj(xa, xb, ma, mb, cutoff):
        adj = ma[:, :, None] * mb[:, None, :]
        if cutoff is not None:
            d2 = jnp.sum((xa[:, :, None, :] - xb[:, None, :, :]) ** 2, axis=-1)
            adj = adj * (d2 <= cutoff * cutoff).astype(adj.dtype)
        return adj

    adj_ll = pair_adj(x_lig, x_lig, mask_lig, mask_lig, cutoff_ligand)
    adj_pp = pair_adj(x_pkt, x_pkt, mask_pkt, mask_pkt, cutoff_pocket)
    adj_lp = pair_adj(x_lig, x_pkt, mask_lig, mask_pkt, cutoff_interaction)

    top = jnp.concatenate([adj_ll, adj_lp], axis=2)
    bottom = jnp.concatenate([jnp.swapaxes(adj_lp, 1, 2), adj_pp], axis=2)
    return jnp.concatenate([top, bottom], axis=1)


def _type_edge_attr(is_lig, type_table, is_lig_cols=None):
    """Dense (B, N, N, F) edge-type embedding: 0=cross, 1=lig-lig,
    2=pkt-pkt (dynamics.py:116-121 edge-type channel).  ``is_lig_cols``
    restricts the column axis to this shard's block (edge-axis sharding)."""
    ilc = is_lig if is_lig_cols is None else is_lig_cols
    both_lig = is_lig[:, :, None] * ilc[:, None, :]
    both_pkt = (1 - is_lig[:, :, None]) * (1 - ilc[:, None, :])
    edge_type = (both_lig + 2 * both_pkt).astype(jnp.int32)
    return type_table[edge_type]


def _col_adjacency(x, mask, is_lig, cutoffs, shard_ctx):
    """This shard's (B, N, Nc) column block of ``build_adjacency``'s output,
    built directly from the concatenated node set so per-shard pairwise
    memory stays O(N^2 / n_shards) (see parallel/edge_shard.py).

    Equivalent to ``build_adjacency(...)[:, :, off:off+width]`` — asserted by
    tests/test_edge_shard.py — but never materializes the full (B, N, N)."""
    from diffsbdd_tpu.models.egnn import shard_col_slice

    cutoff_ligand, cutoff_pocket, cutoff_interaction = cutoffs
    x_cols = shard_col_slice(x, shard_ctx, 1)
    mask_cols = shard_col_slice(mask, shard_ctx, 1)
    il_cols = shard_col_slice(is_lig, shard_ctx, 1)

    d2 = jnp.sum((x[:, :, None, :] - x_cols[:, None, :, :]) ** 2, axis=-1)
    inf = jnp.inf
    c_ll = (cutoff_ligand if cutoff_ligand is not None else inf) ** 2
    c_pp = (cutoff_pocket if cutoff_pocket is not None else inf) ** 2
    c_lp = (cutoff_interaction if cutoff_interaction is not None else inf) ** 2
    both_lig = is_lig[:, :, None] * il_cols[:, None, :]
    both_pkt = (1 - is_lig[:, :, None]) * (1 - il_cols[:, None, :])
    cut2 = jnp.where(both_lig > 0, c_ll, jnp.where(both_pkt > 0, c_pp, c_lp))
    adj = mask[:, :, None] * mask_cols[:, None, :]
    return adj * (d2 <= cut2).astype(adj.dtype), il_cols


class _EncoderMLP(nn.Module):
    """Linear(d -> 2*d_ref), silu, Linear(2*d_ref -> out)."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, h):
        h = nn.Dense(self.mid, name="lin0")(h)
        h = jax.nn.silu(h)
        return nn.Dense(self.out, name="lin2")(h)


class EGNNDynamics(nn.Module):
    """Predicts (eps_x, eps_h) for ligand and pocket nodes."""

    atom_nf: int
    residue_nf: int
    joint_nf: int = 16
    hidden_nf: int = 64
    n_layers: int = 4
    attention: bool = False
    tanh: bool = False
    mode: str = "egnn_dynamics"  # or "gnn_dynamics"
    norm_constant: float = 0.0
    inv_sublayers: int = 2
    sin_embedding: bool = False
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"
    update_pocket_coords: bool = True
    edge_cutoff_ligand: Optional[float] = None
    edge_cutoff_pocket: Optional[float] = None
    edge_cutoff_interaction: Optional[float] = None
    reflection_equivariant: bool = True
    edge_embedding_dim: Optional[int] = None
    condition_time: bool = True
    n_dims: int = 3
    zero_nan: bool = False  # training-time NaN guard (dynamics.py:155-158)
    nan_check: bool = False  # eval-time NaN abort (dynamics.py:155-161):
    # raises from a host callback when the EGNN emits NaN velocities, so a
    # numerical blowup aborts with a pointer to the cause instead of
    # emitting garbage molecules; off by default (one host sync per forward)
    impl: str = "auto"  # 'auto' | 'xla' | 'pallas'
    interpret: bool = False
    kernel_tile: int = 128
    kernel_tile_i: Optional[int] = None  # default min(8, kernel_tile):
    # ti8 measured fastest at every batch for sampling AND training once
    # the r05 per-grid-step SMEM index operands removed the B=64 ceiling
    # (PERF_R05.json b64_tiles, TRAIN_BENCH_r05.json); chains bit-identical
    # to ti16 (TILE_AB_checks_r05.json)
    kernel_sub_j: int = 16  # cutoff-skip granularity inside a column tile
    kernel_skip_mode: str = "bits"  # 'bits' (per-block scalar predicates) |
    # 'compact' (prefetched active-block index lists; no branch overhead,
    # supports finer sub_j — see ops/egnn_pallas.py)
    kernel_bwd: str = "auto"  # 'auto'|'pallas'|'xla': training backward via
    # fused Pallas kernels (egnn_pallas_bwd.py) or dense-XLA recompute
    kernel_bwd_sub_j: Optional[int] = None  # backward skip granularity
    kernel_bwd_precision: Optional[str] = None  # backward-only MXU tier
    # (None -> matmul_precision): gradient rounding noise is orders of
    # magnitude below SGD minibatch noise, so training can pair an
    # exact-grade forward with the 1-pass 'bfloat16' backward tier
    kernel_block_fuse: bool = True  # allow sampling-path whole-block fusion
    # (ops/egnn_block_fused.py); False = always use the split kernels
    compute_dtype: Any = jnp.float32  # bf16 halves O(N^2) HBM traffic
    matmul_precision: str = "float32"  # TPU default (bf16 inputs) loses ~1e-2
    # relative on this network's large d^2 edge features; 'float32' restores
    # CPU/CUDA-level parity (measured 3e-5 max deviation)

    def _resolve_impl(self) -> str:
        if self.impl != "auto":
            return self.impl
        if self.sin_embedding or self.mode != "egnn_dynamics" \
                or self.aggregation_method != "sum":
            return "xla"
        # fused kernels are hardware-validated (exact at float32 precision,
        # ~1.6x the dense path on the flagship workload)
        return "pallas" if jax.default_backend() == "tpu" else "xla"

    @nn.compact
    def __call__(self, xh_lig, xh_pkt, t, mask_lig, mask_pkt,
                 shared_pocket: bool = False, zero_nan: bool = False,
                 shard_ctx=None, block_fuse: bool = False):
        # 'float32_x3': exact f32 for the XLA glue, 3-pass bf16-split dots
        # inside the Pallas kernels (fp32-grade except extreme cancellation,
        # half the MXU passes of HIGHEST); 'float32_x2' drops one more pass
        # (~1e-3 relative in-kernel dots, see benchmarks/precision_validation)
        ambient = {"float32_x3": "float32",
                   "float32_x2": "float32"}.get(
            self.matmul_precision, self.matmul_precision)
        with jax.default_matmul_precision(ambient):
            return self._forward(xh_lig, xh_pkt, t, mask_lig, mask_pkt,
                                 shared_pocket, zero_nan, shard_ctx,
                                 block_fuse)

    def _forward(self, xh_lig, xh_pkt, t, mask_lig, mask_pkt,
                 shared_pocket: bool = False, zero_nan: bool = False,
                 shard_ctx=None, block_fuse: bool = False):
        B, NL = mask_lig.shape
        NP = mask_pkt.shape[1]
        nd = self.n_dims

        x_lig, h_lig = xh_lig[..., :nd], xh_lig[..., nd:]
        x_pkt, h_pkt = xh_pkt[..., :nd], xh_pkt[..., nd:]

        # shared-space encoders (dynamics.py:27-49)
        h_lig = _EncoderMLP(2 * self.atom_nf, self.joint_nf, name="atom_encoder")(h_lig)
        h_pkt = _EncoderMLP(2 * self.residue_nf, self.joint_nf, name="residue_encoder")(h_pkt)

        x = jnp.concatenate([x_lig, x_pkt], axis=1)
        h = jnp.concatenate([h_lig, h_pkt], axis=1)
        mask = jnp.concatenate([mask_lig, mask_pkt], axis=1)
        is_lig = jnp.concatenate(
            [jnp.ones((B, NL), x.dtype), jnp.zeros((B, NP), x.dtype)], axis=1)

        if self.condition_time:
            h_time = jnp.broadcast_to(t[:, None, :], (B, NL + NP, 1)).astype(h.dtype)
            h = jnp.concatenate([h, h_time], axis=-1)

        impl = self._resolve_impl()
        if shard_ctx is not None:
            # edge-axis sharding (parallel/edge_shard.py): each mesh shard
            # computes its column block of the O(N^2) pairwise work with the
            # dense XLA path and a psum completes every aggregation; the
            # fused Pallas kernels are single-device
            impl = "xla"
            if self.mode != "egnn_dynamics":
                raise NotImplementedError(
                    "edge-axis sharding supports egnn_dynamics only")
        cutoffs = (self.edge_cutoff_ligand, self.edge_cutoff_pocket,
                   self.edge_cutoff_interaction)

        # learnable 3-way edge-type embedding: 0=cross, 1=lig-lig, 2=pkt-pkt
        edge_attr = None
        type_table = None
        in_edge_nf = 0
        if self.edge_embedding_dim is not None:
            table = nn.Embed(3, self.edge_embedding_dim, name="edge_embedding")
            type_table = table(jnp.arange(3))
            in_edge_nf = self.edge_embedding_dim

        if self.mode == "egnn_dynamics":
            n_orig = NL + NP
            if impl == "pallas":
                # fused kernels rebuild adjacency per tile; pad N to the tile
                pad = (-n_orig) % self.kernel_tile
                if pad:
                    padf = lambda a: jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
                    h, x, mask, is_lig = map(padf, (h, x, mask, is_lig))
                adj = None
                # shared (B, N, N) input-coordinate squared distances feed
                # the SMEM-prefetched block-activity bits of every fused
                # kernel this forward; the per-wrapper bit-pack reduction is
                # CSE'd by XLA for same-mask launches (only the three
                # shared-pocket col_mask variants derive distinct bits),
                # measured inside the 2.9 ms/step fixed overhead at B=32
                diff0 = x[:, :, None, :] - x[:, None, :, :]
                d2_0_full = jnp.sum(diff0 * diff0, axis=-1)
                fused_ctx = dict(mask=mask, is_lig=is_lig, d2_0=d2_0_full,
                                 type_table=type_table, cutoffs=cutoffs,
                                 tile_i=self.kernel_tile_i
                                 or min(8, self.kernel_tile),
                                 tile_j=self.kernel_tile,
                                 sub_j=self.kernel_sub_j,
                                 skip_mode=self.kernel_skip_mode,
                                 # conditional models freeze pocket coords
                                 # (update_coords_mask=is_lig) and nodes are
                                 # ligand-first: the coordinate kernel only
                                 # needs the leading NL rows
                                 update_rows=None
                                 if self.update_pocket_coords else NL,
                                 # sampling-only factorization: valid when
                                 # one pocket is replicated across the batch
                                 # and t is per-step uniform (see DenseGCL)
                                 shared_pocket_first_layer=bool(shared_pocket)
                                 and not self.update_pocket_coords,
                                 n_lig_rows=NL,
                                 mxu_precision=self.matmul_precision,
                                 bwd_impl="pallas"
                                 if self.kernel_bwd == "auto"
                                 else self.kernel_bwd,
                                 bwd_sub_j=self.kernel_bwd_sub_j,
                                 bwd_mxu_precision=self.kernel_bwd_precision,
                                 # sampling-path block fusion (GCL + node
                                 # MLP + coord update in one phased
                                 # pallas_call); training keeps the split
                                 # kernels with their fused backward
                                 block_fuse=bool(block_fuse)
                                 and self.kernel_block_fuse
                                 and self.inv_sublayers == 1)
            elif shard_ctx is not None:
                # edge-axis sharding: this shard owns a column block of the
                # pairwise axis; adjacency and edge attrs are built directly
                # as (B, N, Nc) blocks (parallel/edge_shard.py)
                fused_ctx = None
                adj, il_cols = _col_adjacency(x, mask, is_lig, cutoffs,
                                              shard_ctx)
                if type_table is not None:
                    edge_attr = _type_edge_attr(is_lig, type_table, il_cols)
            else:
                fused_ctx = None
                adj = build_adjacency(x_lig, x_pkt, mask_lig, mask_pkt, *cutoffs)
                if type_table is not None:
                    edge_attr = _type_edge_attr(is_lig, type_table)

            update_coords_mask = None if self.update_pocket_coords else is_lig
            h_final, x_final = EGNN(
                hidden_nf=self.hidden_nf,
                out_node_nf=self.joint_nf + int(self.condition_time),
                in_edge_nf=in_edge_nf, n_layers=self.n_layers,
                attention=self.attention, tanh=self.tanh,
                norm_constant=self.norm_constant,
                inv_sublayers=self.inv_sublayers,
                sin_embedding=self.sin_embedding,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                reflection_equiv=self.reflection_equivariant,
                impl=impl, interpret=self.interpret,
                compute_dtype=self.compute_dtype,
                name="egnn")(
                h, x, adj, mask, edge_attr=edge_attr,
                update_coords_mask=update_coords_mask, fused_ctx=fused_ctx,
                shard_ctx=shard_ctx)
            if impl == "pallas" and h_final.shape[1] != n_orig:
                h_final = h_final[:, :n_orig]
                x_final = x_final[:, :n_orig]
                x = x[:, :n_orig]
                mask = mask[:, :n_orig]
            vel = (x_final - x) * mask[..., None]
        elif self.mode == "gnn_dynamics":
            adj = build_adjacency(x_lig, x_pkt, mask_lig, mask_pkt, *cutoffs)
            if type_table is not None:
                edge_attr = _type_edge_attr(is_lig, type_table)
            xh = jnp.concatenate([x, h], axis=-1)
            out = GNN(hidden_nf=self.hidden_nf,
                      out_node_nf=nd + self.joint_nf + int(self.condition_time),
                      in_edge_nf=in_edge_nf, n_layers=self.n_layers,
                      attention=self.attention,
                      normalization_factor=self.normalization_factor,
                      aggregation_method=self.aggregation_method,
                      name="gnn")(xh, adj, mask, edge_attr=edge_attr)
            vel = out[..., :nd] * mask[..., None]
            h_final = out[..., nd:]
        else:
            raise ValueError(self.mode)

        if self.condition_time:
            h_final = h_final[..., :-1]

        h_final_lig = _EncoderMLP(2 * self.atom_nf, self.atom_nf,
                                  name="atom_decoder")(h_final[:, :NL])
        h_final_pkt = _EncoderMLP(2 * self.residue_nf, self.residue_nf,
                                  name="residue_decoder")(h_final[:, NL:])

        if zero_nan or self.zero_nan:
            # reference training-time guard (dynamics.py:155-158): zero NaN
            # velocities so one numerical blowup corrupts a step instead of
            # NaN-poisoning the parameters; the training loss path passes
            # zero_nan=True per call (flax fields are construction-static)
            vel = jnp.nan_to_num(vel)
        elif self.nan_check:
            # reference eval semantics: abort on NaN velocities rather than
            # silently carrying them through the chain
            def _raise_on_nan(ok):
                if not bool(ok):
                    raise ValueError("NaN detected in EGNN output")
            jax.debug.callback(_raise_on_nan, jnp.all(jnp.isfinite(vel)))

        if self.update_pocket_coords:
            # joint mode removes the CoM of the velocity field (dynamics.py:161-164)
            from diffsbdd_tpu.models.egnn import masked_graph_mean
            vel = (vel - masked_graph_mean(vel, mask)[:, None, :]) \
                * mask[..., None]

        eps_lig = jnp.concatenate([vel[:, :NL], h_final_lig * mask_lig[..., None]], axis=-1)
        eps_pkt = jnp.concatenate([vel[:, NL:], h_final_pkt * mask_pkt[..., None]], axis=-1)
        return eps_lig, eps_pkt
