"""Fused Pallas TPU kernels for the EGNN hot loop.

The dense-XLA EGNN (models/egnn.py) materializes O(B*N^2*H) message tensors
in HBM at every matmul boundary, which makes the T-step sampler HBM-bandwidth
bound (~130 ms/step measured at B=16, N=344, H=256 on v5e).  These kernels
tile the pairwise computation over (row, col) blocks held in VMEM, so the
per-pair MLPs + attention gating + masked aggregation never touch HBM:

* ``gcl_message_agg_pallas``  — edge MLP + sigmoid attention + masked row-sum
  (the fused pairwise part of DenseGCL; reference semantics
  egnn_new.py:31-57).
* ``coord_update_agg_pallas`` — coordinate MLP (+ optional SE(3)
  cross-product MLP) + tanh clamping + masked row-sum of relative-direction
  translations (reference semantics egnn_new.py:96-122).

Both kernels also *rebuild the adjacency on the fly* from coordinates and the
distance cutoffs, so the (B, N, N) adjacency never exists in memory at all.

The cheap O(N) parts (per-node first-layer projections via the split kernel,
node MLP, residuals) stay in XLA where fusion already handles them.

Layout contract: N must be a multiple of the tiles; callers pad the node axis
(padded lanes carry mask=0 and are ignored everywhere).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default tiles: tile_j must be 128 (lane-dim slicing constraint); tile_i=16
# keeps total VMEM under the 16MB scoped limit at F=256 with the ~6 live
# (tile_i, tile_j, F) temporaries Mosaic allocates (measured on v5e).
TILE_I = 16
TILE_J = 128
SUB_J = 32  # column granularity of cutoff-sparsity skipping inside a tile


def _sigmoid(x):
    # jax.nn.sigmoid lowers with a weak-typed f32 scalar constant; on the
    # in-kernel bf16 tier Mosaic rejects broadcasting it into a bf16 vector
    # ('vector.broadcast' element-type verification).  Keep every constant in
    # x.dtype on that tier; f32 tiers keep the stock lowering bit-for-bit.
    if x.dtype == jnp.bfloat16:
        one = jnp.asarray(1.0, jnp.bfloat16)
        return one / (one + jnp.exp(-x))
    return jax.nn.sigmoid(x)


def _silu(x):
    return x * _sigmoid(x)


def _pair_distance2(x_i, x_j_t):
    """Squared distances between a row tile (ti, 3) and a *transposed* column
    tile (3, tj), axis-by-axis so every intermediate is a clean (ti, tj) VPU
    tile built from (ti,1)x(1,tj) broadcasts (no in-kernel transposes)."""
    d2 = None
    for a in range(3):
        diff = x_i[:, a:a + 1] - x_j_t[a:a + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    return d2


def _adjacency_tile(d2, mask_i, mask_j, lig_i, lig_j, cutoffs):
    """Masked adjacency for one tile with per-pair-type distance cutoffs
    (dynamics.py:169-187 semantics; self-edges kept).

    mask_i/lig_i are (ti, 1); mask_j/lig_j are (1, tj)."""
    cutoff_l, cutoff_p, cutoff_i = cutoffs
    valid = mask_i * mask_j
    ll = lig_i * lig_j
    pp = (1.0 - lig_i) * (1.0 - lig_j)
    cross = 1.0 - ll - pp

    ok = jnp.zeros_like(valid)
    ok = ok + (ll if cutoff_l is None
               else ll * (d2 <= cutoff_l * cutoff_l))
    ok = ok + (pp if cutoff_p is None
               else pp * (d2 <= cutoff_p * cutoff_p))
    ok = ok + (cross if cutoff_i is None
               else cross * (d2 <= cutoff_i * cutoff_i))
    return valid * ok


def _edge_bias(d2, d2_0, w_d2, w_d20, lig_i, lig_j, type_bias):
    """Per-pair first-layer contribution of the edge features.

    Edge features are [d2_current, d2_initial(, edge_type_embedding)]; the
    per-node parts of the projected (2, 2, F) edge-type table are folded into
    the row/col projections by ``fold_type_bias`` before the kernel launches
    (the wrappers do this), so only the rank-1 ``lig_i*lig_j`` delta term —
    here a (1, F) row — remains pairwise (one outer product instead of four)."""
    out = d2[:, :, None] * w_d2[None, None, :] \
        + d2_0[:, :, None] * w_d20[None, None, :]
    if type_bias is not None:
        ll = lig_i * lig_j                      # (ti, tj)
        out = out + ll[:, :, None] * type_bias[0][None, None, :]
    return out


def _block_activity_bits(d2_0, mask, col_mask, is_lig, cutoffs,
                         tile_i, sub_j, n_row_tiles, tile_j=TILE_J):
    """Per-row-tile bitmask of cutoff-active ``sub_j``-column blocks.

    Computed in XLA from a shared (B, N, N) squared-distance matrix so the
    kernels' skip decisions resolve from SMEM-prefetched scalars instead of
    in-kernel VPU any-reductions (each of which forces a vector->scalar
    pipeline drain before its branch).  The cutoffs are expanded by 1 ulp's
    worth of slack so a pair exactly at the boundary can never be dropped by
    XLA-vs-kernel fp differences — extra blocks only cost compute, the
    in-kernel adjacency gate keeps results exact.
    """
    B, N, _ = d2_0.shape
    n_sub = N // sub_j
    # one int32 word per (row-tile, COLUMN-tile): the packing width must
    # match the kernel grid's tile_j, or bits_ref[pb, i, j] tests the wrong
    # column blocks for tile_j != 128
    n_per_tile = min(tile_j, N) // sub_j
    assert n_per_tile <= 31, (N, sub_j)  # one int32 word per (row, col) tile
    slack = [None if c is None else c * (1.0 + 1e-6) for c in cutoffs]
    adj = _adjacency_dense(d2_0, mask, is_lig, tuple(slack),
                           col_mask=col_mask)
    blk = adj.reshape(B, N // tile_i, tile_i, n_sub, sub_j)
    act = jnp.max(blk, axis=(2, 4)) > 0          # (B, n_i, n_sub)
    act = act[:, :n_row_tiles].reshape(
        B, n_row_tiles, n_sub // n_per_tile, n_per_tile)
    weights = jnp.left_shift(jnp.int32(1),
                             jnp.arange(n_per_tile, dtype=jnp.int32))
    # (B, n_i, n_tiles_j) int32: bit k of word j = sub-block (j, k) active
    return jnp.sum(act.astype(jnp.int32) * weights[None, None, None, :],
                   axis=-1)


def _compact_block_indices(d2_0, mask, col_mask, is_lig, cutoffs,
                           tile_i, sub_j, n_row_tiles):
    """Compacted per-row-tile active-column-block index lists (+ counts).

    The bits machinery (``_block_activity_bits``) still iterates every
    column block and resolves a scalar predicate per block; this variant
    instead prefetches, per (batch, row tile), the *list* of active
    ``sub_j``-column block ids so the kernel's inner loop runs EXACTLY
    ``count`` iterations — no branches, no skipped-block overhead, and a
    finer practical granularity (sub_j=8: ~25% of pair slots vs ~38% at
    sub_j=32 on the 3rfm pocket).  Indices are packed 4 uint8 per int32
    word for SMEM economy (so N/sub_j must be <= 256).

    Returns (counts (B, n_rows) int32, words (B, n_rows, ceil(n_sub/4))
    int32).  Same 1e-6 cutoff slack as the bits path: boundary-ulp
    XLA-vs-kernel differences can only ADD blocks; the in-kernel adjacency
    gate keeps results exact.
    """
    B, N, _ = d2_0.shape
    n_sub = N // sub_j
    assert n_sub <= 256, (N, sub_j)  # uint8-packed block ids
    slack = [None if c is None else c * (1.0 + 1e-6) for c in cutoffs]
    adj = _adjacency_dense(d2_0, mask, is_lig, tuple(slack),
                           col_mask=col_mask)
    blk = adj.reshape(B, N // tile_i, tile_i, n_sub, sub_j)
    act = jnp.max(blk, axis=(2, 4)) > 0            # (B, n_i, n_sub)
    act = act[:, :n_row_tiles]
    counts = jnp.sum(act, axis=-1).astype(jnp.int32)
    # stable argsort of (inactive, id): active block ids first, ascending
    order = jnp.argsort(~act, axis=-1, stable=True).astype(jnp.uint32)
    pad = (-n_sub) % 4
    if pad:
        order = jnp.pad(order, ((0, 0), (0, 0), (0, pad)))
    order = order.reshape(B, n_row_tiles, -1, 4)
    shifts = (8 * jnp.arange(4, dtype=jnp.uint32))[None, None, None, :]
    words = jnp.sum(order << shifts, axis=-1, dtype=jnp.uint32)
    return counts, jax.lax.bitcast_convert_type(words, jnp.int32)




def _bits_smem_operand(bits):
    """Per-grid-step 4-D SMEM block for the activity-bits operand.

    Same hazard as the compact operands (_compact_smem_operands): Mosaic
    lane-pads a whole-array scalar-prefetch int32 operand to 128 words per
    row, so (B, n_rows, k) prefetched bits cost B*n_rows*512 bytes of SMEM
    regardless of k — 1.5 MB at B=64/tile_i=8, over the ~1 MB budget (the
    exact AOT error r04 hit).  Streaming the (batch, row-tile) slice per
    grid step keeps the resident footprint at one row's words.
    """
    B, n_rows, n_words = bits.shape
    spec = pl.BlockSpec((1, 1, 1, n_words), lambda b, i, *_: (b, i, 0, 0),
                        memory_space=pltpu.SMEM)
    return bits.reshape(B, n_rows, 1, n_words), spec


def _unpack_block_id(words_ref, pb, i, k):
    """k-th uint8 block id from the packed int32 index words."""
    word = words_ref[pb, i, k >> 2]
    return jnp.bitwise_and(
        jax.lax.shift_right_logical(word, 8 * (k & 3)), 0xFF)


def _unpack_word_id(words_ref, k):
    """k-th uint8 block id from a per-grid-step 4-D SMEM words block."""
    word = words_ref[0, 0, 0, k >> 2]
    return jnp.bitwise_and(
        jax.lax.shift_right_logical(word, 8 * (k & 3)), 0xFF)


def _compact_smem_operands(counts, words):
    """Per-grid-step SMEM blocks for the compact counts/words operands.

    r04 passed counts/words as whole-array scalar-prefetch operands; the
    words array for the full batch blew the ~1 MB SMEM budget at B=64 under
    tile_i=8 (NOTES r04), capping the fastest sampling tiles at B<=32.  The
    kernel only ever reads the (batch, row-tile) slice of both, so stream
    exactly that block into SMEM per grid step: the resident footprint
    drops from O(B * n_rows * n_words) to O(n_words) regardless of batch.

    Mosaic's block-shape check requires the LAST TWO dims of a block to be
    (8, 128)-divisible or equal to the array dims, so the sliced (batch,
    row-tile) axes are kept leading and the arrays are reshaped to 4-D with
    trailing dims that the block covers exactly.

    Returns (counts4, words4, counts_spec, words_spec); kernels index both
    refs at the origin: counts_ref[0, 0, 0, 0] / words_ref[0, 0, 0, k>>2].
    """
    B, n_rows = counts.shape
    n_words = words.shape[-1]
    counts4 = counts.reshape(B, n_rows, 1, 1)
    words4 = words.reshape(B, n_rows, 1, n_words)
    counts_spec = pl.BlockSpec((1, 1, 1, 1), lambda b, i, *_: (b, i, 0, 0),
                               memory_space=pltpu.SMEM)
    words_spec = pl.BlockSpec((1, 1, 1, n_words),
                              lambda b, i, *_: (b, i, 0, 0),
                              memory_space=pltpu.SMEM)
    return counts4, words4, counts_spec, words_spec


def _col_tiles(a, sub_j):
    """(B, N, K) column-side array -> (B, N//sub_j, K, sub_j) transposed
    tiles, so the kernel can load one (K, sub_j) block at a dynamic block
    id without lane-dim dynamic slicing (only 128-multiples are sliceable
    on the lane axis; the tiled layout makes the block id an outer index)."""
    B, N, K = a.shape
    return a.reshape(B, N // sub_j, sub_j, K).swapaxes(2, 3)


# in-kernel MXU precision by policy name (the edge features are computed
# elementwise and are always exact; only the hidden-layer dots vary).
# Mosaic supports only DEFAULT (1-pass bf16) and HIGHEST (6-pass bf16 = exact
# f32) dots; "tensorfloat32" is implemented as a manual 3-pass bf16 split
# (drop the lo*lo term), which is *better* than tf32 — fp32-grade except
# under extreme cancellation — at half the MXU passes of HIGHEST.
_PRECISIONS = {
    "float32": jax.lax.Precision.HIGHEST,      # exact (3e-8 vs XLA f32, meas.)
    "float32_x3": "bf16_3x",                   # kernel dots split; glue f32
    "float32_x2": "bf16_2x",                   # 2-pass split (~1e-3 rel dots)
    "tensorfloat32": "bf16_3x",                # manual split, see _dot
    "bfloat16": jax.lax.Precision.DEFAULT,     # 1-pass; fastest, ~3e-3 rel
}


def _prep_w(w, mxu):
    """Weight-side prep for the split-dot modes, hoisted out of the j-tile
    loop so the constant weights are split once per kernel invocation rather
    than once per active sub-block."""
    if w is None:
        return None
    if mxu in ("bf16_3x", "bf16_2x"):
        w_hi = w.astype(jnp.bfloat16)
        w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (w_hi, w_lo)
    if mxu == jax.lax.Precision.DEFAULT:
        # fast tier: weights pre-cast so the whole pair MLP stays in native
        # bf16 (DEFAULT-precision dots truncate to bf16 anyway)
        return (w.astype(jnp.bfloat16),)
    return (w,)


def _dot(m, wp, mxu):
    """Dot of an in-kernel activation against a ``_prep_w``-prepped weight."""
    if mxu in ("bf16_3x", "bf16_2x"):
        # precision must be explicit: an ambient default_matmul_precision
        # (e.g. 'tensorfloat32' -> HIGH) is not lowerable by Mosaic
        dflt = jax.lax.Precision.DEFAULT
        w_hi, w_lo = wp
        m_hi = m.astype(jnp.bfloat16)
        m_lo = (m - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.dot(m_hi, w_hi, preferred_element_type=jnp.float32,
                      precision=dflt)
        acc = acc + jnp.dot(m_lo, w_hi, preferred_element_type=jnp.float32,
                            precision=dflt)
        if mxu == "bf16_2x":
            # drop the m_hi@w_lo term (~2^-9 relative): one fewer MXU pass;
            # activation low bits are kept, weight low bits are not
            return acc
        return acc + jnp.dot(m_hi, w_lo, preferred_element_type=jnp.float32,
                             precision=dflt)
    (w,) = wp
    return jnp.dot(m, w, preferred_element_type=jnp.float32, precision=mxu)


def _pair_mlp(a_i, a_j, d2, d2_0, lig_i, lig_j, wd2, wd20, type_bias,
              w2p, b2, w3p, mxu):
    """silu(first layer) -> silu(dense) -> dense(head): shared tile helper.

    ``w2p``/``w3p`` are ``_prep_w``-prepped weights.  The (F, 1) scalar head
    stays an MXU dot: a VPU multiply-reduce alternative was measured ~25%
    slower end-to-end — the matvec pipelines in parallel with the VPU's
    elementwise work, the lane reduction does not.

    On the bfloat16 fast tier (``mxu`` == DEFAULT) the entire assembly +
    activations run in native bf16 — the pre-activation broadcast-adds and
    the two silus are the kernel's VPU bottleneck (~22 ms/step at B=32),
    and DEFAULT-precision dots truncate to bf16 regardless, so the cast
    costs no additional accuracy on this tier."""
    ti = a_i.shape[0]
    tj = a_j.shape[0]
    bias = _edge_bias(d2, d2_0, wd2, wd20, lig_i, lig_j, type_bias)
    if mxu == jax.lax.Precision.DEFAULT:
        # d2/d2_0 and the (F,) weight rows stay f32 inside _edge_bias: Mosaic
        # only supports minor-dim insertion (d2[:, :, None]) for 32-bit
        # types — build the bias in f32, cast the (ti, tj, F) result once
        bf = jnp.bfloat16
        a_i, a_j = a_i.astype(bf), a_j.astype(bf)
        b2 = b2.astype(bf)
        bias = bias.astype(bf)
    pre = a_i[:, None, :] + a_j[None, :, :] + bias
    m = _silu(pre).reshape(ti * tj, -1)
    z = _dot(m, w2p, mxu) + b2
    if mxu == jax.lax.Precision.DEFAULT:
        z = z.astype(jnp.bfloat16)  # the next dot truncates anyway
    m = _silu(z)
    if w3p is None:
        return m
    return _dot(m, w3p, mxu).reshape(ti, tj)


# ---------------------------------------------------------------------------
# message aggregation kernel
# ---------------------------------------------------------------------------

def _make_gcl_kernel(n_tiles_j, tile_j, cutoffs, attention, has_type_bias,
                     normalization_factor, sub_j=32,
                     mxu=jax.lax.Precision.HIGHEST, use_bits=False):
    sub_j = min(sub_j, tile_j)
    assert tile_j % sub_j == 0, (tile_j, sub_j)
    n_sub = tile_j // sub_j

    def kernel(*refs):
        if use_bits:
            bits_ref, *refs = refs
        (a_row_ref, a_col_ref, x_ref, xt_ref, x0_ref, x0t_ref,
         mask_ref, maskt_ref, lig_ref, ligt_ref,
         wd2_ref, wd20_ref, tbias_ref, w2_ref, b2_ref, watt_ref,
         batt_ref, out_ref) = refs
        pb = pl.program_id(0)
        i = pl.program_id(1)
        ti = a_row_ref.shape[1]
        a_i = a_row_ref[0]
        x_i = x_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        x0_i = x0_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        mask_i = mask_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        lig_i = lig_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        type_bias = tbias_ref[:] if has_type_bias else None
        w2p = _prep_w(w2_ref[:], mxu)
        wattp = _prep_w(watt_ref[:], mxu) if attention else None
        # prefetched skip decisions: one int32 word of per-sub-block
        # activity bits per (batch, row-tile, col-tile), resolved on the
        # scalar core — no in-kernel any-reductions, no vector->scalar
        # pipeline drains

        def body(j, acc):
            tj = tile_j
            F_out = out_ref.shape[2]
            zeros = lambda: jnp.zeros((ti, F_out), jnp.float32)

            def loads():
                a_j = a_col_ref[0, pl.ds(pl.multiple_of(j * tj, tj), tj), :]
                x_j_t = xt_ref[0, :, pl.ds(pl.multiple_of(j * tj, tj), tj)]
                x0_j_t = x0t_ref[0, :, pl.ds(pl.multiple_of(j * tj, tj), tj)]
                mask_j = maskt_ref[0, :,
                                   pl.ds(pl.multiple_of(j * tj, tj), tj)]
                lig_j = ligt_ref[0, :, pl.ds(pl.multiple_of(j * tj, tj), tj)]
                d2 = _pair_distance2(x_i, x_j_t)
                d2_0 = _pair_distance2(x0_i, x0_j_t)
                # adjacency from the EGNN *input* coordinates (d2_0): the
                # reference builds edges once per forward (dynamics.py:
                # 169-187), not per block; current-x distances only feed the
                # edge features
                adj = _adjacency_tile(d2_0, mask_i, mask_j, lig_i, lig_j,
                                      cutoffs)
                return a_j, d2, d2_0, lig_j, adj

            def compute_sub(sl, a_j, d2, d2_0, lig_j, adj):
                m = _pair_mlp(a_i, a_j[sl], d2[:, sl], d2_0[:, sl],
                              lig_i, lig_j[:, sl],
                              wd2_ref[0], wd20_ref[0], type_bias,
                              w2p, b2_ref[0], None, mxu)
                # adjacency folded into the attention gate: adj is exactly
                # {0,1}, so m*(att*adj) == (m*att)*adj bit-for-bit, one
                # F-wide multiply cheaper
                sub = sl.stop - sl.start
                gate = adj[:, sl][:, :, None]
                if attention:
                    att = jax.nn.sigmoid(_dot(m, wattp, mxu) + batt_ref[0])
                    gate = gate * att.reshape(ti, sub, 1)
                return jnp.sum(m.reshape(ti, sub, -1) * gate, axis=1)

            # two-level skipping: a whole-tile predicate skips the loads and
            # the per-sub-block conds on fully edge-free (ti, tj) tiles,
            # then cutoff sparsity skips the MLPs per 32-column block (38%
            # of 16x32 blocks active on the 3rfm pocket at 5 A).  With
            # prefetched bits every predicate is a scalar-core bit test.
            if use_bits:
                word = bits_ref[0, 0, 0, j]

                def tile_work():
                    ops = loads()
                    inner = zeros()
                    for k in range(n_sub):
                        sl = slice(k * sub_j, (k + 1) * sub_j)
                        pred = jnp.bitwise_and(
                            jax.lax.shift_right_logical(word, k), 1) != 0
                        inner = inner + jax.lax.cond(
                            pred, lambda sl=sl: compute_sub(sl, *ops), zeros)
                    return inner

                return acc + jax.lax.cond(word != 0, tile_work, zeros)

            ops = loads()
            adj = ops[-1]

            def all_subs():
                inner = zeros()
                for k in range(n_sub):
                    sl = slice(k * sub_j, (k + 1) * sub_j)
                    inner = inner + jax.lax.cond(
                        jnp.any(adj[:, sl] > 0),
                        lambda sl=sl: compute_sub(sl, *ops), zeros)
                return inner

            if n_sub == 1:
                sl = slice(0, sub_j)
                return acc + jax.lax.cond(
                    jnp.any(adj > 0), lambda: compute_sub(sl, *ops), zeros)
            return acc + jax.lax.cond(jnp.any(adj > 0), all_subs, zeros)

        acc = jnp.zeros((ti, out_ref.shape[2]), jnp.float32)
        acc = jax.lax.fori_loop(0, n_tiles_j, body, acc)
        out_ref[0] = acc / normalization_factor

    return kernel


def _make_gcl_kernel_compact(sub_j, cutoffs, attention, has_type_bias,
                             normalization_factor,
                             mxu=jax.lax.Precision.HIGHEST):
    """Compacted-index GCL kernel: the inner loop runs exactly ``count``
    iterations over prefetched active-block ids (no skip branches); each
    iteration computes one (tile_i, sub_j) pair block."""

    def kernel(counts_ref, words_ref,
               a_row_ref, a_col_ref, x_ref, xt_t_ref, x0_ref, x0t_t_ref,
               mask_ref, maskt_t_ref, lig_ref, ligt_t_ref,
               wd2_ref, wd20_ref, tbias_ref, w2_ref, b2_ref, watt_ref,
               batt_ref, out_ref):
        # counts/words arrive as per-(batch, row-tile) SMEM blocks
        # (_compact_smem_specs), so they are indexed at the origin
        i = pl.program_id(1)
        ti = a_row_ref.shape[1]
        a_i = a_row_ref[0]
        x_i = x_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        x0_i = x0_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        mask_i = mask_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        lig_i = lig_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        type_bias = tbias_ref[:] if has_type_bias else None
        w2p = _prep_w(w2_ref[:], mxu)
        wattp = _prep_w(watt_ref[:], mxu) if attention else None

        def body(k, acc):
            col = _unpack_word_id(words_ref, k)
            off = pl.multiple_of(col * sub_j, sub_j)
            a_j = a_col_ref[0, pl.ds(off, sub_j), :]
            x_j_t = xt_t_ref[0, col]        # (3, sub_j)
            x0_j_t = x0t_t_ref[0, col]
            mask_j = maskt_t_ref[0, col]    # (1, sub_j)
            lig_j = ligt_t_ref[0, col]
            d2 = _pair_distance2(x_i, x_j_t)
            d2_0 = _pair_distance2(x0_i, x0_j_t)
            # adjacency from the EGNN input coordinates, as in the bits path
            adj = _adjacency_tile(d2_0, mask_i, mask_j, lig_i, lig_j,
                                  cutoffs)
            m = _pair_mlp(a_i, a_j, d2, d2_0, lig_i, lig_j,
                          wd2_ref[0], wd20_ref[0], type_bias,
                          w2p, b2_ref[0], None, mxu)
            gate = adj[:, :, None]
            if attention:
                att = jax.nn.sigmoid(_dot(m, wattp, mxu) + batt_ref[0])
                gate = gate * att.reshape(ti, sub_j, 1)
            return acc + jnp.sum(m.reshape(ti, sub_j, -1) * gate, axis=1)

        acc = jnp.zeros((ti, out_ref.shape[2]), jnp.float32)
        acc = jax.lax.fori_loop(0, counts_ref[0, 0, 0, 0], body, acc)
        out_ref[0] = acc / normalization_factor

    return kernel


def _gcl_agg_pallas_compact(
        a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
        w2, b2, w_att, b_att, *, cutoffs, attention, normalization_factor,
        tile_i, sub_j, mxu_precision, col_mask, update_rows, d2_0,
        interpret):
    """Compacted-index launch of the GCL kernel (see
    ``_compact_block_indices``); same contract as the bits path."""
    B, N, F = a_row.shape
    assert N % sub_j == 0 and N % tile_i == 0, (N, tile_i, sub_j)
    n_row_tiles = N // tile_i
    if update_rows is not None:
        n_row_tiles = min(n_row_tiles, -(-int(update_rows) // tile_i))
    n_rows_out = n_row_tiles * tile_i
    a_row, a_col, type_delta = fold_type_bias(a_row, a_col, is_lig, type_bias)
    has_type_bias = type_delta is not None
    if type_delta is None:
        type_delta = jnp.zeros((F,), a_row.dtype)
    if w_att is None:
        w_att = jnp.zeros((F, 1), a_row.dtype)
        b_att = jnp.zeros((1,), a_row.dtype)

    counts, words = _compact_block_indices(
        d2_0, mask, mask if col_mask is None else col_mask, is_lig,
        cutoffs, tile_i, sub_j, n_row_tiles)
    kernel = _make_gcl_kernel_compact(
        sub_j=sub_j, cutoffs=cutoffs, attention=attention,
        has_type_bias=has_type_bias,
        normalization_factor=normalization_factor,
        mxu=_PRECISIONS[mxu_precision])

    n_sub = N // sub_j
    full = lambda b, i, *_: (b, 0, 0)
    full4 = lambda b, i, *_: (b, 0, 0, 0)
    rowmap = lambda b, i, *_: (b, i, 0)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda b, i, *_: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    tiles4 = lambda K: pl.BlockSpec((1, n_sub, K, sub_j), full4,
                                    memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, tile_i, F), rowmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, F), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 3), full, memory_space=pltpu.VMEM),
        tiles4(3),
        pl.BlockSpec((1, N, 3), full, memory_space=pltpu.VMEM),
        tiles4(3),
        pl.BlockSpec((1, N, 1), full, memory_space=pltpu.VMEM),
        tiles4(1),
        pl.BlockSpec((1, N, 1), full, memory_space=pltpu.VMEM),
        tiles4(1),
        const2((1, F)), const2((1, F)), const2((1, F)),
        const2((F, F)), const2((1, F)), const2((F, 1)), const2((1, 1)),
    ]
    out_spec = pl.BlockSpec((1, tile_i, F), rowmap, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, n_rows_out, F), jnp.float32)
    cm = (mask if col_mask is None else col_mask)
    args = (a_row, a_col, x, _col_tiles(x, sub_j), x0, _col_tiles(x0, sub_j),
            mask[..., None], _col_tiles(cm[..., None], sub_j),
            is_lig[..., None], _col_tiles(is_lig[..., None], sub_j),
            w_d2.reshape(1, F), w_d20.reshape(1, F),
            type_delta.reshape(1, F), w2, b2.reshape(1, F), w_att,
            b_att.reshape(1, 1))
    counts4, words4, counts_spec, words_spec = _compact_smem_operands(
        counts, words)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_row_tiles),
        in_specs=[counts_spec, words_spec] + in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts4, words4, *args)
    if n_rows_out < N:
        out = jnp.pad(out, ((0, 0), (0, N - n_rows_out), (0, 0)))
    return out


def gcl_message_agg_pallas(
        a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
        w2, b2, w_att, b_att, *, cutoffs, attention, normalization_factor,
        tile_i=TILE_I, tile_j=TILE_J, sub_j=SUB_J, mxu_precision="float32",
        col_mask=None, update_rows=None, d2_0=None, skip_mode="bits",
        interpret=False):
    """Aggregated attention-gated messages -> (B, N, F).

    a_row/a_col: per-node projections of h through the split first-layer
    kernel (first-layer bias folded into a_row); w_d2/w_d20: first-layer rows
    for the two distance features; type_bias: optional (2, 2, F) projected
    edge-type table.

    ``col_mask``: optional separate validity mask for the column (neighbor)
    side — lets callers aggregate over a node subset (e.g. pocket-only or
    ligand-only columns) without materializing masked copies.

    ``update_rows``: when only the leading ``update_rows`` rows' aggregates
    are consumed, the grid is truncated to those row tiles and the remaining
    rows are returned as exact zeros (nodes are laid out ligand-first, so
    ligand-row-only aggregation is the leading-tiles case).

    ``d2_0``: optional shared (B, N, N) squared distances of the EGNN input
    coordinates — enables SMEM-prefetched block-activity bits so skip
    branches resolve on the scalar core (used only for skipping; the
    in-kernel adjacency gate keeps results exact).

    ``skip_mode``: 'bits' (per-block scalar predicates over every column
    block) or 'compact' (prefetched active-block index lists; the inner
    loop runs exactly ``count`` iterations — supports finer ``sub_j``
    without per-block branch overhead).  'compact' requires ``d2_0``.
    """
    if skip_mode == "compact" and d2_0 is not None:
        return _gcl_agg_pallas_compact(
            a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
            w2, b2, w_att, b_att, cutoffs=cutoffs, attention=attention,
            normalization_factor=normalization_factor, tile_i=tile_i,
            sub_j=sub_j, mxu_precision=mxu_precision, col_mask=col_mask,
            update_rows=update_rows, d2_0=d2_0, interpret=interpret)
    B, N, F = a_row.shape
    assert N % tile_j == 0 and N % tile_i == 0, (N, tile_i, tile_j)
    n_row_tiles = N // tile_i
    if update_rows is not None:
        n_row_tiles = min(n_row_tiles, -(-int(update_rows) // tile_i))
    n_rows_out = n_row_tiles * tile_i
    # per-node parts of the edge-type table move into a_row/a_col; only the
    # rank-1 lig_i*lig_j delta stays pairwise inside the kernel
    a_row, a_col, type_delta = fold_type_bias(a_row, a_col, is_lig, type_bias)
    has_type_bias = type_delta is not None
    if type_delta is None:
        type_delta = jnp.zeros((F,), a_row.dtype)
    if w_att is None:
        w_att = jnp.zeros((F, 1), a_row.dtype)
        b_att = jnp.zeros((1,), a_row.dtype)

    use_bits = d2_0 is not None
    kernel = _make_gcl_kernel(
        n_tiles_j=N // tile_j, tile_j=tile_j, cutoffs=cutoffs,
        attention=attention, has_type_bias=has_type_bias,
        normalization_factor=normalization_factor, sub_j=sub_j,
        mxu=_PRECISIONS[mxu_precision], use_bits=use_bits)

    full = lambda b, i, *_: (b, 0, 0)
    rowmap = lambda b, i, *_: (b, i, 0)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda b, i, *_: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    x_t = jnp.swapaxes(x, 1, 2)      # (B, 3, N): lane-major column layout
    x0_t = jnp.swapaxes(x0, 1, 2)
    mask_row = mask[..., None]       # (B, N, 1): sublane-major row layout
    mask_col = (mask if col_mask is None else col_mask)[:, None, :]  # (B,1,N)
    lig_row = is_lig[..., None]
    lig_col = is_lig[:, None, :]

    in_specs = [
        pl.BlockSpec((1, tile_i, F), rowmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, F), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 3), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, N), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 3), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, N), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 1), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, N), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 1), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, N), full, memory_space=pltpu.VMEM),
        const2((1, F)), const2((1, F)), const2((1, F)),
        const2((F, F)), const2((1, F)), const2((F, 1)), const2((1, 1)),
    ]
    out_spec = pl.BlockSpec((1, tile_i, F), rowmap, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, n_rows_out, F), jnp.float32)
    args = (a_row, a_col, x, x_t, x0, x0_t, mask_row, mask_col, lig_row,
            lig_col, w_d2.reshape(1, F), w_d20.reshape(1, F),
            type_delta.reshape(1, F), w2, b2.reshape(1, F), w_att,
            b_att.reshape(1, 1))

    if use_bits:
        bits = _block_activity_bits(
            d2_0, mask, mask if col_mask is None else col_mask, is_lig,
            cutoffs, tile_i, min(sub_j, tile_j), n_row_tiles, tile_j=tile_j)
        bits4, bits_spec = _bits_smem_operand(bits)
        out = pl.pallas_call(
            kernel,
            grid=(B, n_row_tiles),
            in_specs=[bits_spec] + in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(bits4, *args)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(B, n_row_tiles),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    if n_rows_out < N:
        out = jnp.pad(out, ((0, 0), (0, N - n_rows_out), (0, 0)))
    return out


# ---------------------------------------------------------------------------
# coordinate update kernel
# ---------------------------------------------------------------------------

def _make_coord_kernel(n_tiles_j, tile_j, cutoffs, has_type_bias, tanh,
                       coords_range, reflection_equiv, norm_constant,
                       normalization_factor, sub_j=32,
                       mxu=jax.lax.Precision.HIGHEST, use_bits=False):
    sub_j = min(sub_j, tile_j)
    assert tile_j % sub_j == 0, (tile_j, sub_j)
    n_sub = tile_j // sub_j

    def kernel(*refs):
        if use_bits:
            bits_ref, *refs = refs
        if reflection_equiv:
            (a_row_ref, a_col_ref, x_ref, xt_ref, x0_ref, x0t_ref,
             mask_ref, maskt_ref, lig_ref, ligt_ref,
             wd2_ref, wd20_ref, tbias_ref, w2_ref, b2_ref, w3_ref,
             out_ref) = refs
        else:
            (a_row_ref, a_col_ref, c_row_ref, c_col_ref, x_ref, xt_ref,
             x0_ref, x0t_ref, mean_ref, mask_ref, maskt_ref, lig_ref,
             ligt_ref,
             wd2_ref, wd20_ref, tbias_ref, w2_ref, b2_ref, w3_ref,
             cwd2_ref, cwd20_ref, ctbias_ref, cw2_ref, cb2_ref, cw3_ref,
             out_ref) = refs

        pb = pl.program_id(0)
        i = pl.program_id(1)
        ti = a_row_ref.shape[1]
        a_i = a_row_ref[0]
        x_i = x_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        x0_i = x0_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        mask_i = mask_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        lig_i = lig_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        type_bias = tbias_ref[:] if has_type_bias else None
        w2p = _prep_w(w2_ref[:], mxu)
        w3p = _prep_w(w3_ref[:], mxu)
        if not reflection_equiv:
            c_i = c_row_ref[0]
            mean = mean_ref[0]  # (1, 3)
            ctype_bias = ctbias_ref[:] if has_type_bias else None
            cw2p = _prep_w(cw2_ref[:], mxu)
            cw3p = _prep_w(cw3_ref[:], mxu)

        def body(j, acc):
            tj = tile_j
            zeros = lambda: jnp.zeros((ti, 3), jnp.float32)

            def loads():
                a_j = a_col_ref[0, pl.ds(pl.multiple_of(j * tj, tj), tj), :]
                x_j_t = xt_ref[0, :, pl.ds(pl.multiple_of(j * tj, tj), tj)]
                x0_j_t = x0t_ref[0, :,
                                 pl.ds(pl.multiple_of(j * tj, tj), tj)]
                mask_j = maskt_ref[0, :,
                                   pl.ds(pl.multiple_of(j * tj, tj), tj)]
                lig_j = ligt_ref[0, :, pl.ds(pl.multiple_of(j * tj, tj), tj)]
                d2 = _pair_distance2(x_i, x_j_t)
                d2_0 = _pair_distance2(x0_i, x0_j_t)
                # edges fixed from input coordinates, as in the reference
                adj = _adjacency_tile(d2_0, mask_i, mask_j, lig_i, lig_j,
                                      cutoffs)
                c_j = None
                if not reflection_equiv:
                    c_j = c_col_ref[0,
                                    pl.ds(pl.multiple_of(j * tj, tj), tj), :]
                return a_j, x_j_t, d2, d2_0, lig_j, adj, c_j

            def compute_sub(sl, a_j, x_j_t, d2, d2_0, lig_j, adj, c_j):
                phi = _pair_mlp(a_i, a_j[sl], d2[:, sl], d2_0[:, sl],
                                lig_i, lig_j[:, sl],
                                wd2_ref[0], wd20_ref[0], type_bias,
                                w2p, b2_ref[0], w3p, mxu)
                if tanh:
                    phi = jnp.tanh(phi) * coords_range
                norm = jnp.sqrt(d2[:, sl] + 1e-8) + norm_constant
                w = phi / norm * adj[:, sl]

                if not reflection_equiv:
                    phi_c = _pair_mlp(c_i, c_j[sl], d2[:, sl], d2_0[:, sl],
                                      lig_i, lig_j[:, sl],
                                      cwd2_ref[0], cwd20_ref[0], ctype_bias,
                                      cw2p, cb2_ref[0], cw3p, mxu)
                    if tanh:
                        phi_c = jnp.tanh(phi_c) * coords_range
                    # centered coordinates: rows (ti, 1), cols (1, sub_j)
                    xi = [x_i[:, a:a + 1] - mean[:, a:a + 1] for a in range(3)]
                    xj = [x_j_t[a:a + 1, sl] - mean[:, a:a + 1]
                          for a in range(3)]
                    cx = xi[1] * xj[2] - xi[2] * xj[1]
                    cy = xi[2] * xj[0] - xi[0] * xj[2]
                    cz = xi[0] * xj[1] - xi[1] * xj[0]
                    cnorm = jnp.sqrt(cx * cx + cy * cy + cz * cz + 1e-8) \
                        + norm_constant
                    wc = phi_c / cnorm * adj[:, sl]
                    cross = (cx, cy, cz)

                cols = []
                for a in range(3):
                    diff_a = x_i[:, a:a + 1] - x_j_t[a:a + 1, sl]
                    t_a = jnp.sum(w * diff_a, axis=1, keepdims=True)
                    if not reflection_equiv:
                        t_a = t_a + jnp.sum(wc * cross[a], axis=1,
                                            keepdims=True)
                    cols.append(t_a)
                return jnp.concatenate(cols, axis=1)

            # two-level skipping as in the GCL kernel: whole-tile
            # predicate, then per-32-column-block predicates; with
            # prefetched bits every predicate is a scalar-core bit test
            if use_bits:
                word = bits_ref[0, 0, 0, j]

                def tile_work():
                    ops = loads()
                    inner = zeros()
                    for k in range(n_sub):
                        sl = slice(k * sub_j, (k + 1) * sub_j)
                        pred = jnp.bitwise_and(
                            jax.lax.shift_right_logical(word, k), 1) != 0
                        inner = inner + jax.lax.cond(
                            pred, lambda sl=sl: compute_sub(sl, *ops), zeros)
                    return inner

                return acc + jax.lax.cond(word != 0, tile_work, zeros)

            ops = loads()
            adj = ops[5]

            def all_subs():
                inner = zeros()
                for k in range(n_sub):
                    sl = slice(k * sub_j, (k + 1) * sub_j)
                    inner = inner + jax.lax.cond(
                        jnp.any(adj[:, sl] > 0),
                        lambda sl=sl: compute_sub(sl, *ops), zeros)
                return inner

            if n_sub == 1:
                sl = slice(0, sub_j)
                return acc + jax.lax.cond(
                    jnp.any(adj > 0), lambda: compute_sub(sl, *ops), zeros)
            return acc + jax.lax.cond(jnp.any(adj > 0), all_subs, zeros)

        acc = jnp.zeros((ti, 3), jnp.float32)
        acc = jax.lax.fori_loop(0, n_tiles_j, body, acc)
        out_ref[0] = acc / normalization_factor

    return kernel


def _make_coord_kernel_compact(sub_j, cutoffs, has_type_bias, tanh,
                               coords_range, reflection_equiv, norm_constant,
                               normalization_factor,
                               mxu=jax.lax.Precision.HIGHEST):
    """Compacted-index coordinate-update kernel (see the GCL twin)."""

    def kernel(*refs):
        counts_ref, words_ref, *refs = refs
        if reflection_equiv:
            (a_row_ref, a_col_ref, x_ref, xt_t_ref, x0_ref, x0t_t_ref,
             mask_ref, maskt_t_ref, lig_ref, ligt_t_ref,
             wd2_ref, wd20_ref, tbias_ref, w2_ref, b2_ref, w3_ref,
             out_ref) = refs
        else:
            (a_row_ref, a_col_ref, c_row_ref, c_col_ref, x_ref, xt_t_ref,
             x0_ref, x0t_t_ref, mean_ref, mask_ref, maskt_t_ref, lig_ref,
             ligt_t_ref,
             wd2_ref, wd20_ref, tbias_ref, w2_ref, b2_ref, w3_ref,
             cwd2_ref, cwd20_ref, ctbias_ref, cw2_ref, cb2_ref, cw3_ref,
             out_ref) = refs

        # counts/words are per-(batch, row-tile) SMEM blocks
        # (_compact_smem_specs) indexed at the origin
        i = pl.program_id(1)
        ti = a_row_ref.shape[1]
        a_i = a_row_ref[0]
        x_i = x_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        x0_i = x0_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        mask_i = mask_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        lig_i = lig_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        type_bias = tbias_ref[:] if has_type_bias else None
        w2p = _prep_w(w2_ref[:], mxu)
        w3p = _prep_w(w3_ref[:], mxu)
        if not reflection_equiv:
            c_i = c_row_ref[0]
            mean = mean_ref[0]  # (1, 3)
            ctype_bias = ctbias_ref[:] if has_type_bias else None
            cw2p = _prep_w(cw2_ref[:], mxu)
            cw3p = _prep_w(cw3_ref[:], mxu)

        def body(k, acc):
            col = _unpack_word_id(words_ref, k)
            off = pl.multiple_of(col * sub_j, sub_j)
            a_j = a_col_ref[0, pl.ds(off, sub_j), :]
            x_j_t = xt_t_ref[0, col]
            x0_j_t = x0t_t_ref[0, col]
            mask_j = maskt_t_ref[0, col]
            lig_j = ligt_t_ref[0, col]
            d2 = _pair_distance2(x_i, x_j_t)
            d2_0 = _pair_distance2(x0_i, x0_j_t)
            adj = _adjacency_tile(d2_0, mask_i, mask_j, lig_i, lig_j,
                                  cutoffs)
            phi = _pair_mlp(a_i, a_j, d2, d2_0, lig_i, lig_j,
                            wd2_ref[0], wd20_ref[0], type_bias,
                            w2p, b2_ref[0], w3p, mxu)
            if tanh:
                phi = jnp.tanh(phi) * coords_range
            norm = jnp.sqrt(d2 + 1e-8) + norm_constant
            w = phi / norm * adj

            if not reflection_equiv:
                c_j = c_col_ref[0, pl.ds(off, sub_j), :]
                phi_c = _pair_mlp(c_i, c_j, d2, d2_0, lig_i, lig_j,
                                  cwd2_ref[0], cwd20_ref[0], ctype_bias,
                                  cw2p, cb2_ref[0], cw3p, mxu)
                if tanh:
                    phi_c = jnp.tanh(phi_c) * coords_range
                xi = [x_i[:, a:a + 1] - mean[:, a:a + 1] for a in range(3)]
                xj = [x_j_t[a:a + 1, :] - mean[:, a:a + 1]
                      for a in range(3)]
                cx = xi[1] * xj[2] - xi[2] * xj[1]
                cy = xi[2] * xj[0] - xi[0] * xj[2]
                cz = xi[0] * xj[1] - xi[1] * xj[0]
                cnorm = jnp.sqrt(cx * cx + cy * cy + cz * cz + 1e-8) \
                    + norm_constant
                wc = phi_c / cnorm * adj
                cross = (cx, cy, cz)

            cols = []
            for a in range(3):
                diff_a = x_i[:, a:a + 1] - x_j_t[a:a + 1, :]
                t_a = jnp.sum(w * diff_a, axis=1, keepdims=True)
                if not reflection_equiv:
                    t_a = t_a + jnp.sum(wc * cross[a], axis=1,
                                        keepdims=True)
                cols.append(t_a)
            return acc + jnp.concatenate(cols, axis=1)

        acc = jnp.zeros((ti, 3), jnp.float32)
        acc = jax.lax.fori_loop(0, counts_ref[0, 0, 0, 0], body, acc)
        out_ref[0] = acc / normalization_factor

    return kernel


def _coord_agg_pallas_compact(
        a_row, a_col, x, x0, mask, is_lig,
        w_d2, w_d20, type_bias, w2, b2, w3, *,
        cutoffs, tanh, coords_range, norm_constant, normalization_factor,
        cross, graph_mean, tile_i, sub_j, update_rows, d2_0, mxu_precision,
        interpret):
    B, N, F = a_row.shape
    assert N % sub_j == 0 and N % tile_i == 0, (N, tile_i, sub_j)
    n_row_tiles = N // tile_i
    if update_rows is not None:
        n_row_tiles = min(n_row_tiles, -(-int(update_rows) // tile_i))
    n_rows_out = n_row_tiles * tile_i
    reflection_equiv = cross is None
    a_row, a_col, type_delta = fold_type_bias(a_row, a_col, is_lig, type_bias)
    has_type_bias = type_delta is not None
    if type_delta is None:
        type_delta = jnp.zeros((F,), a_row.dtype)

    counts, words = _compact_block_indices(
        d2_0, mask, mask, is_lig, cutoffs, tile_i, sub_j, n_row_tiles)
    kernel = _make_coord_kernel_compact(
        sub_j=sub_j, cutoffs=cutoffs, has_type_bias=has_type_bias,
        tanh=tanh, coords_range=coords_range,
        reflection_equiv=reflection_equiv, norm_constant=norm_constant,
        normalization_factor=normalization_factor,
        mxu=_PRECISIONS[mxu_precision])

    n_sub = N // sub_j
    full = lambda b, i, *_: (b, 0, 0)
    full4 = lambda b, i, *_: (b, 0, 0, 0)
    row_spec = pl.BlockSpec((1, tile_i, F), lambda b, i, *_: (b, i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, N, F), full, memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, N, 3), full, memory_space=pltpu.VMEM)
    nrow_spec = pl.BlockSpec((1, N, 1), full, memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda b, i, *_: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    tiles4 = lambda K: pl.BlockSpec((1, n_sub, K, sub_j), full4,
                                    memory_space=pltpu.VMEM)

    in_specs = [row_spec, col_spec]
    args = [a_row, a_col]
    if not reflection_equiv:
        c_row, c_col, c_delta = fold_type_bias(
            cross["a_row"], cross["a_col"], is_lig, cross["type_bias"])
        if c_delta is None:
            c_delta = jnp.zeros((F,), a_row.dtype)
        in_specs += [row_spec, col_spec]
        args += [c_row, c_col]
    in_specs += [x_spec, tiles4(3), x_spec, tiles4(3)]
    args += [x, _col_tiles(x, sub_j), x0, _col_tiles(x0, sub_j)]
    if not reflection_equiv:
        in_specs += [pl.BlockSpec((1, 1, 3), lambda b, i, *_: (b, 0, 0),
                                  memory_space=pltpu.VMEM)]
        args += [graph_mean.reshape(B, 1, 3)]
    in_specs += [nrow_spec, tiles4(1), nrow_spec, tiles4(1),
                 const2((1, F)), const2((1, F)), const2((1, F)),
                 const2((F, F)), const2((1, F)), const2((F, 1))]
    args += [mask[..., None], _col_tiles(mask[..., None], sub_j),
             is_lig[..., None], _col_tiles(is_lig[..., None], sub_j),
             w_d2.reshape(1, F), w_d20.reshape(1, F),
             type_delta.reshape(1, F), w2, b2.reshape(1, F), w3]
    if not reflection_equiv:
        in_specs += [const2((1, F)), const2((1, F)), const2((1, F)),
                     const2((F, F)), const2((1, F)), const2((F, 1))]
        args += [cross["w_d2"].reshape(1, F), cross["w_d20"].reshape(1, F),
                 c_delta.reshape(1, F), cross["w2"],
                 cross["b2"].reshape(1, F), cross["w3"]]

    out_spec = pl.BlockSpec((1, tile_i, 3), lambda b, i, *_: (b, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, n_rows_out, 3), jnp.float32)
    counts4, words4, counts_spec, words_spec = _compact_smem_operands(
        counts, words)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_row_tiles),
        in_specs=[counts_spec, words_spec] + in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts4, words4, *args)
    if n_rows_out < N:
        out = jnp.pad(out, ((0, 0), (0, N - n_rows_out), (0, 0)))
    return out


def coord_update_agg_pallas(
        a_row, a_col, x, x0, mask, is_lig,
        w_d2, w_d20, type_bias, w2, b2, w3, *,
        cutoffs, tanh, coords_range, norm_constant, normalization_factor,
        cross=None, graph_mean=None, tile_i=TILE_I, tile_j=TILE_J,
        sub_j=SUB_J, update_rows=None, d2_0=None, mxu_precision="float32",
        skip_mode="bits", interpret=False):
    """Aggregated coordinate translations -> (B, N, 3).

    ``cross``: optional dict with the cross-product MLP pieces
    {a_row, a_col, w_d2, w_d20, type_bias, w2, b2, w3} for the
    reflection-symmetry-breaking SE(3) term; requires ``graph_mean`` (B, 3).

    ``update_rows``: when only the leading ``update_rows`` rows' translations
    are consumed (conditional models freeze pocket coordinates via
    update_coords_mask, and nodes are laid out ligand-first), the kernel grid
    is truncated to those row tiles and the remaining rows are returned as
    exact zeros — skipping ~85%% of this kernel's work on the flagship
    pocket-conditional shape.

    ``skip_mode``: 'bits' | 'compact' — see ``gcl_message_agg_pallas``.
    """
    if skip_mode == "compact" and d2_0 is not None:
        return _coord_agg_pallas_compact(
            a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
            w2, b2, w3, cutoffs=cutoffs, tanh=tanh,
            coords_range=coords_range, norm_constant=norm_constant,
            normalization_factor=normalization_factor, cross=cross,
            graph_mean=graph_mean, tile_i=tile_i, sub_j=sub_j,
            update_rows=update_rows, d2_0=d2_0,
            mxu_precision=mxu_precision, interpret=interpret)
    B, N, F = a_row.shape
    assert N % tile_j == 0 and N % tile_i == 0, (N, tile_i, tile_j)
    n_row_tiles = N // tile_i
    if update_rows is not None:
        n_row_tiles = min(n_row_tiles, -(-int(update_rows) // tile_i))
    n_rows_out = n_row_tiles * tile_i
    reflection_equiv = cross is None
    a_row, a_col, type_delta = fold_type_bias(a_row, a_col, is_lig, type_bias)
    has_type_bias = type_delta is not None
    if type_delta is None:
        type_delta = jnp.zeros((F,), a_row.dtype)

    use_bits = d2_0 is not None
    kernel = _make_coord_kernel(
        n_tiles_j=N // tile_j, tile_j=tile_j, cutoffs=cutoffs,
        has_type_bias=has_type_bias,
        tanh=tanh, coords_range=coords_range,
        reflection_equiv=reflection_equiv, norm_constant=norm_constant,
        normalization_factor=normalization_factor, sub_j=sub_j,
        mxu=_PRECISIONS[mxu_precision], use_bits=use_bits)

    full = lambda b, i, *_: (b, 0, 0)
    row_spec = pl.BlockSpec((1, tile_i, F), lambda b, i, *_: (b, i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, N, F), full, memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, N, 3), full, memory_space=pltpu.VMEM)
    xt_spec = pl.BlockSpec((1, 3, N), full, memory_space=pltpu.VMEM)
    nrow_spec = pl.BlockSpec((1, N, 1), full, memory_space=pltpu.VMEM)
    ncol_spec = pl.BlockSpec((1, 1, N), full, memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda b, i, *_: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    x_t = jnp.swapaxes(x, 1, 2)
    x0_t = jnp.swapaxes(x0, 1, 2)

    in_specs = [row_spec, col_spec]
    args = [a_row, a_col]
    if not reflection_equiv:
        c_row, c_col, c_delta = fold_type_bias(
            cross["a_row"], cross["a_col"], is_lig, cross["type_bias"])
        if c_delta is None:
            c_delta = jnp.zeros((F,), a_row.dtype)
        in_specs += [row_spec, col_spec]
        args += [c_row, c_col]
    in_specs += [x_spec, xt_spec, x_spec, xt_spec]
    args += [x, x_t, x0, x0_t]
    if not reflection_equiv:
        in_specs += [pl.BlockSpec((1, 1, 3), lambda b, i, *_: (b, 0, 0),
                                  memory_space=pltpu.VMEM)]
        args += [graph_mean.reshape(B, 1, 3)]
    in_specs += [nrow_spec, ncol_spec, nrow_spec, ncol_spec,
                 const2((1, F)), const2((1, F)), const2((1, F)),
                 const2((F, F)), const2((1, F)), const2((F, 1))]
    args += [mask[..., None], mask[:, None, :],
             is_lig[..., None], is_lig[:, None, :],
             w_d2.reshape(1, F), w_d20.reshape(1, F),
             type_delta.reshape(1, F), w2, b2.reshape(1, F), w3]
    if not reflection_equiv:
        in_specs += [const2((1, F)), const2((1, F)), const2((1, F)),
                     const2((F, F)), const2((1, F)), const2((F, 1))]
        args += [cross["w_d2"].reshape(1, F), cross["w_d20"].reshape(1, F),
                 c_delta.reshape(1, F), cross["w2"],
                 cross["b2"].reshape(1, F), cross["w3"]]

    out_spec = pl.BlockSpec((1, tile_i, 3), lambda b, i, *_: (b, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, n_rows_out, 3), jnp.float32)
    if use_bits:
        bits = _block_activity_bits(
            d2_0, mask, mask, is_lig, cutoffs, tile_i, min(sub_j, tile_j),
            n_row_tiles, tile_j=tile_j)
        bits4, bits_spec = _bits_smem_operand(bits)
        out = pl.pallas_call(
            kernel,
            grid=(B, n_row_tiles),
            in_specs=[bits_spec] + in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(bits4, *args)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(B, n_row_tiles),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    if n_rows_out < N:
        out = jnp.pad(out, ((0, 0), (0, N - n_rows_out), (0, 0)))
    return out


# ---------------------------------------------------------------------------
# XLA mirrors (used for the custom-VJP backward pass and correctness tests)
# ---------------------------------------------------------------------------

def _adjacency_dense(d2, mask, is_lig, cutoffs, col_mask=None):
    cutoff_l, cutoff_p, cutoff_i = cutoffs
    cm = mask if col_mask is None else col_mask
    valid = mask[:, :, None] * cm[:, None, :]
    ll = is_lig[:, :, None] * is_lig[:, None, :]
    pp = (1 - is_lig)[:, :, None] * (1 - is_lig)[:, None, :]
    cross = 1.0 - ll - pp
    ok = jnp.zeros_like(valid)
    ok = ok + (ll if cutoff_l is None else ll * (d2 <= cutoff_l**2))
    ok = ok + (pp if cutoff_p is None else pp * (d2 <= cutoff_p**2))
    ok = ok + (cross if cutoff_i is None else cross * (d2 <= cutoff_i**2))
    return valid * ok


def _edge_bias_dense(d2, d2_0, w_d2, w_d20, is_lig, type_bias):
    out = d2[..., None] * w_d2 + d2_0[..., None] * w_d20
    if type_bias is not None:
        li = is_lig[:, :, None, None]
        lj = is_lig[:, None, :, None]
        out = out + (1 - li) * (1 - lj) * type_bias[0, 0] \
            + (1 - li) * lj * type_bias[0, 1] \
            + li * (1 - lj) * type_bias[1, 0] \
            + li * lj * type_bias[1, 1]
    return out


def gcl_message_agg_xla(a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20,
                        type_bias, w2, b2, w_att, b_att, *, cutoffs,
                        attention, normalization_factor, col_mask=None,
                        update_rows=None, tile_i=TILE_I):
    """Dense-XLA twin of the fused GCL kernel (same math, O(N^2) in HBM)."""
    d2 = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, -1)
    d2_0 = jnp.sum((x0[:, :, None, :] - x0[:, None, :, :]) ** 2, -1)
    pre = a_row[:, :, None, :] + a_col[:, None, :, :] + _edge_bias_dense(
        d2, d2_0, w_d2, w_d20, is_lig, type_bias)
    m = _silu(pre)
    m = _silu(m @ w2 + b2)
    if attention:
        m = m * jax.nn.sigmoid(m @ w_att + b_att)
    adj = _adjacency_dense(d2_0, mask, is_lig, cutoffs, col_mask=col_mask)
    m = m * adj[..., None]
    agg = jnp.sum(m, axis=2) / normalization_factor
    if update_rows is not None:
        n_rows_out = min(agg.shape[1],
                         -(-int(update_rows) // tile_i) * tile_i)
        keep = (jnp.arange(agg.shape[1]) < n_rows_out)
        agg = agg * keep[None, :, None]
    return agg


def coord_update_agg_xla(a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20,
                         type_bias, w2, b2, w3, *, cutoffs, tanh,
                         coords_range, norm_constant, normalization_factor,
                         cross=None, graph_mean=None, update_rows=None,
                         tile_i=TILE_I):
    """Dense-XLA twin of the fused coordinate-update kernel."""
    d2 = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, -1)
    d2_0 = jnp.sum((x0[:, :, None, :] - x0[:, None, :, :]) ** 2, -1)
    adj = _adjacency_dense(d2_0, mask, is_lig, cutoffs)

    pre = a_row[:, :, None, :] + a_col[:, None, :, :] + _edge_bias_dense(
        d2, d2_0, w_d2, w_d20, is_lig, type_bias)
    m = _silu(pre)
    m = _silu(m @ w2 + b2)
    phi = (m @ w3)[..., 0]
    if tanh:
        phi = jnp.tanh(phi) * coords_range
    diff = x[:, :, None, :] - x[:, None, :, :]
    norm = jnp.sqrt(d2 + 1e-8) + norm_constant
    trans = diff / norm[..., None] * phi[..., None]

    if cross is not None:
        pre_c = cross["a_row"][:, :, None, :] + cross["a_col"][:, None, :, :] \
            + _edge_bias_dense(d2, d2_0, cross["w_d2"], cross["w_d20"],
                               is_lig, cross["type_bias"])
        mc = _silu(pre_c)
        mc = _silu(mc @ cross["w2"] + cross["b2"])
        phi_c = (mc @ cross["w3"])[..., 0]
        if tanh:
            phi_c = jnp.tanh(phi_c) * coords_range
        xc = x - graph_mean[:, None, :]
        cr = jnp.cross(
            jnp.broadcast_to(xc[:, :, None, :], d2.shape + (3,)),
            jnp.broadcast_to(xc[:, None, :, :], d2.shape + (3,)))
        # guarded norm: zero cross products (diagonal, coincident padded
        # nodes) otherwise NaN the backward pass (this mirror IS the
        # backward of the fused kernel)
        cnorm = jnp.sqrt(jnp.sum(cr**2, axis=-1, keepdims=True) + 1e-8) \
            + norm_constant
        trans = trans + cr / cnorm * phi_c[..., None]

    trans = trans * adj[..., None]
    agg = jnp.sum(trans, axis=2) / normalization_factor
    if update_rows is not None:
        # rows beyond the truncated kernel grid are exact zeros
        n_rows_out = min(agg.shape[1],
                         -(-int(update_rows) // tile_i) * tile_i)
        keep = (jnp.arange(agg.shape[1]) < n_rows_out)
        agg = agg * keep[None, :, None]
    return agg


# ---------------------------------------------------------------------------
# differentiable public entry points: Pallas forward, XLA-recompute backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gcl_agg_cvjp(cfg, operands):
    (cutoffs, attention, nf, tile_i, tile_j, sub_j, update_rows,
     mxu_precision, interpret, _bwd_impl, _bwd_sub_j, _bwd_prec,
     skip_mode) = cfg
    main, col_mask, d2_0 = operands
    return gcl_message_agg_pallas(
        *main, cutoffs=cutoffs, attention=attention,
        normalization_factor=nf, tile_i=tile_i, tile_j=tile_j, sub_j=sub_j,
        col_mask=col_mask, update_rows=update_rows, d2_0=d2_0,
        mxu_precision=mxu_precision, skip_mode=skip_mode,
        interpret=interpret)


def _gcl_agg_fwd(cfg, operands):
    return _gcl_agg_cvjp(cfg, operands), operands


def _gcl_agg_bwd(cfg, operands, g):
    (cutoffs, attention, nf, tile_i, tile_j, sub_j, update_rows,
     mxu_precision, interpret, bwd_impl, bwd_sub_j, bwd_prec,
     _skip_mode) = cfg
    if bwd_impl == "pallas":
        from . import egnn_pallas_bwd as bwd
        main, col_mask, d2_0 = operands
        return (bwd.gcl_agg_bwd(
            g, main, col_mask, d2_0, cutoffs=cutoffs, attention=attention,
            normalization_factor=nf, tile_i=tile_i, tile_j=tile_j,
            sub_j=bwd_sub_j or sub_j,
            mxu_precision=bwd_prec or mxu_precision,
            update_rows=update_rows, interpret=interpret),)

    def f(ops):
        # d2_0 (ops[2]) only drives the forward's skip decisions; the mirror
        # recomputes distances from x0, so its cotangent is correctly zero
        main, col_mask, _ = ops
        return gcl_message_agg_xla(
            *main, cutoffs=cutoffs, attention=attention,
            normalization_factor=nf, col_mask=col_mask,
            update_rows=update_rows, tile_i=tile_i)

    _, vjp = jax.vjp(f, operands)
    return vjp(g)


_gcl_agg_cvjp.defvjp(_gcl_agg_fwd, _gcl_agg_bwd)


def gcl_message_agg(a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20,
                    type_bias, w2, b2, w_att, b_att, *, cutoffs, attention,
                    normalization_factor, impl="pallas", tile_i=TILE_I,
                    tile_j=TILE_J, sub_j=SUB_J, mxu_precision="float32",
                    col_mask=None, update_rows=None, d2_0=None,
                    bwd_impl="xla", bwd_sub_j=None, bwd_mxu_precision=None,
                    skip_mode="bits", interpret=False):
    """Fused (or dense) GCL message aggregation, differentiable either way.

    ``bwd_impl``: 'pallas' runs the fused backward kernels
    (egnn_pallas_bwd.py); 'xla' (default) recomputes through the dense
    mirror.  ``bwd_sub_j`` overrides the skip granularity for the backward
    kernel only (None -> same as forward).  ``bwd_mxu_precision`` overrides
    the MXU tier for the backward kernels only (None -> same as forward):
    gradients tolerate far more rounding than the sampling chain — bf16
    dot noise is orders of magnitude below SGD minibatch noise — so
    training can keep an exact-grade forward while the backward runs the
    1-pass fast tier."""
    if impl == "xla":
        return gcl_message_agg_xla(
            a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias, w2,
            b2, w_att, b_att, cutoffs=cutoffs, attention=attention,
            normalization_factor=normalization_factor, col_mask=col_mask,
            update_rows=update_rows, tile_i=tile_i)
    cfg = (tuple(cutoffs), attention, float(normalization_factor),
           tile_i, tile_j, sub_j,
           None if update_rows is None else int(update_rows),
           mxu_precision, interpret, bwd_impl, bwd_sub_j,
           bwd_mxu_precision, skip_mode)
    main = (a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
            w2, b2, w_att, b_att)
    return _gcl_agg_cvjp(cfg, (main, col_mask, d2_0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _coord_agg_cvjp(cfg, operands):
    (cutoffs, tanh, coords_range, norm_constant, nf, tile_i, tile_j, sub_j,
     update_rows, mxu_precision, interpret, _bwd_impl, _bwd_sub_j,
     _bwd_prec, skip_mode) = cfg
    main, cross, graph_mean, d2_0 = operands
    return coord_update_agg_pallas(
        *main, cutoffs=cutoffs, tanh=tanh, coords_range=coords_range,
        norm_constant=norm_constant, normalization_factor=nf,
        cross=cross, graph_mean=graph_mean, tile_i=tile_i, tile_j=tile_j,
        sub_j=sub_j, update_rows=update_rows, d2_0=d2_0,
        mxu_precision=mxu_precision, skip_mode=skip_mode,
        interpret=interpret)


def _coord_agg_fwd(cfg, operands):
    return _coord_agg_cvjp(cfg, operands), operands


def _coord_agg_bwd(cfg, operands, g):
    (cutoffs, tanh, coords_range, norm_constant, nf, tile_i, tile_j, sub_j,
     update_rows, mxu_precision, interpret, bwd_impl, bwd_sub_j,
     bwd_prec, _skip_mode) = cfg
    if bwd_impl == "pallas":
        from . import egnn_pallas_bwd as bwd
        main, cross, graph_mean, d2_0 = operands
        return (bwd.coord_agg_bwd(
            g, main, cross, graph_mean, d2_0, cutoffs=cutoffs, tanh=tanh,
            coords_range=coords_range, norm_constant=norm_constant,
            normalization_factor=nf, tile_i=tile_i, tile_j=tile_j,
            sub_j=bwd_sub_j or sub_j,
            mxu_precision=bwd_prec or mxu_precision,
            update_rows=update_rows, interpret=interpret),)

    def f(ops):
        # d2_0 (ops[3]) only drives skip decisions; cotangent correctly zero
        main, cross, graph_mean, _ = ops
        return coord_update_agg_xla(
            *main, cutoffs=cutoffs, tanh=tanh, coords_range=coords_range,
            norm_constant=norm_constant, normalization_factor=nf,
            cross=cross, graph_mean=graph_mean, update_rows=update_rows,
            tile_i=tile_i)

    _, vjp = jax.vjp(f, operands)
    return vjp(g)


_coord_agg_cvjp.defvjp(_coord_agg_fwd, _coord_agg_bwd)


def coord_update_agg(a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20,
                     type_bias, w2, b2, w3, *, cutoffs, tanh, coords_range,
                     norm_constant, normalization_factor, cross=None,
                     graph_mean=None, impl="pallas", tile_i=TILE_I,
                     tile_j=TILE_J, sub_j=SUB_J, update_rows=None,
                     d2_0=None, mxu_precision="float32", bwd_impl="xla",
                     bwd_sub_j=None, bwd_mxu_precision=None,
                     skip_mode="bits", interpret=False):
    """Fused (or dense) coordinate-update aggregation, differentiable.

    ``bwd_impl``/``bwd_sub_j``/``bwd_mxu_precision``: see
    ``gcl_message_agg``."""
    if impl == "xla":
        return coord_update_agg_xla(
            a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias, w2,
            b2, w3, cutoffs=cutoffs, tanh=tanh, coords_range=coords_range,
            norm_constant=norm_constant,
            normalization_factor=normalization_factor, cross=cross,
            graph_mean=graph_mean, update_rows=update_rows, tile_i=tile_i)
    cfg = (tuple(cutoffs), tanh, float(coords_range), float(norm_constant),
           float(normalization_factor), tile_i, tile_j, sub_j,
           None if update_rows is None else int(update_rows),
           mxu_precision, interpret, bwd_impl, bwd_sub_j,
           bwd_mxu_precision, skip_mode)
    main = (a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
            w2, b2, w3)
    return _coord_agg_cvjp(cfg, (main, cross, graph_mean, d2_0))


# ---------------------------------------------------------------------------
# edge-type-table folding
# ---------------------------------------------------------------------------
#
# NOTE a whole-block (GCL + coordinate-update) mega-kernel was prototyped and
# rejected: the reference's coordinate MLP consumes the post-GCL h
# (egnn_new.py:175-178), which depends on the full message aggregation — a
# global barrier no single-pass kernel can cross.  The folding below remains
# useful on its own: it moves the (2,2,F) edge-type table into the per-node
# projections, leaving only a rank-1 lig_i*lig_j correction per pair and
# cutting first-layer assembly from ~12 to ~7 VPU ops per pair-feature.


def fold_type_bias(a_row, a_col, is_lig, type_bias):
    """Fold the (2,2,F) edge-type table into per-node row/col projections.

    tb[li, lj] == t00 + li*(t10-t00) + lj*(t01-t00) + li*lj*delta with
    delta = t11 - t10 - t01 + t00; the first three terms are per-node, only
    the rank-1 product term stays pairwise.  Returns (a_row', a_col', delta)
    with delta None when there is no table.
    """
    if type_bias is None:
        return a_row, a_col, None
    t00, t01 = type_bias[0, 0], type_bias[0, 1]
    t10, t11 = type_bias[1, 0], type_bias[1, 1]
    lig = is_lig[..., None]
    a_row = a_row + t00 + lig * (t10 - t00)
    a_col = a_col + lig * (t01 - t00)
    return a_row, a_col, (t11 - t10 - t01 + t00)
