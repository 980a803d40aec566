"""Block-fused Pallas kernel: GCL + node MLP + coordinate update in ONE pass.

The split kernels (egnn_pallas.py) launch two pallas_calls per EGNN block
(message aggregation, then — after the XLA node MLP — the coordinate
update).  The coordinate MLP consumes the post-GCL h (egnn_new.py:175-178),
which depends on the full message aggregation, so a single-*pass* kernel is
impossible; but a single *call* with a PHASED sequential grid is not:

  phase A (one step per row tile): GCL message loop -> agg, then the node
    MLP in-kernel (split-concat dots: h_i @ W_h + agg @ W_a) -> h'_i, and
    the coordinate head's first-layer projections of h'_i, written to VMEM
    scratch that persists across grid steps;
  phase B (row tiles whose coordinates update — the leading ligand tiles in
    conditional mode): the coordinate-update loop, reading this batch
    item's scratch projections instead of HBM inputs.

TPU pallas grids execute sequentially in row-major order, so with grid
(B, nA + nB) every phase-A step of a batch item completes before its
phase-B steps — the aggregation barrier is crossed *inside* one kernel
launch.  What this buys over the split kernels: the coordinate kernel's
dispatch + input-copy overhead and the XLA glue (node MLP + projections as
separate HLOs with HBM round-trips) disappear; the O(N^2) math is
unchanged and bit-compatible.

Used on the sampling path (no gradient); the custom-VJP backward recomputes
through the dense XLA mirror for correctness if a gradient is ever taken.
Training keeps the split kernels with their fused backward
(egnn_pallas_bwd.py).

Reference semantics: equivariant_diffusion/egnn_new.py:6-132 (GCL +
EquivariantUpdate), :163-184 (block wiring).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffsbdd_tpu.ops.egnn_pallas import (
    SUB_J, TILE_I, TILE_J, _PRECISIONS, _block_activity_bits, _dot,
    _pair_distance2, _adjacency_tile, _pair_mlp, _prep_w, _silu,
    coord_update_agg_xla, fold_type_bias, gcl_message_agg_xla)


def _make_block_kernel(n_tiles_a, n_tiles_b, n_tiles_j, tile_i, tile_j,
                       cutoffs, attention, has_type_bias, tanh, coords_range,
                       reflection_equiv, norm_constant, normalization_factor,
                       sub_j, mxu):
    sub_j = min(sub_j, tile_j)
    assert tile_j % sub_j == 0, (tile_j, sub_j)
    n_sub = tile_j // sub_j

    def kernel(bits_ref,
               # phase-A inputs
               h_ref, a_row_ref, a_col_ref,
               x_ref, xt_ref, x0_ref, x0t_ref,
               mask_ref, maskt_ref, lig_ref, ligt_ref,
               wd2_ref, wd20_ref, tdelta_ref, w2_ref, b2_ref,
               watt_ref, batt_ref,
               # node MLP
               nw_h_ref, nw_a_ref, nb0_ref, nw2_ref, nb2_ref,
               # coord head first-layer pieces + MLP
               lk_i_ref, lk_j_ref, lb0_ref, lwd2_ref, lwd20_ref, ltb_ref,
               lw1_ref, lb1_ref, lw3_ref,
               # cross head (refs always present; zeros when unused)
               ck_i_ref, ck_j_ref, cb0_ref, cwd2_ref, cwd20_ref, ctb_ref,
               cw1_ref, cb1_ref, cw3_ref, mean_ref,
               # outputs
               out_h_ref, out_dx_ref,
               # scratch (persists across grid steps; per batch item)
               la_row_s, la_col_s, lc_row_s, lc_col_s):
        pb = pl.program_id(0)
        step = pl.program_id(1)
        ti = tile_i

        type_delta = tdelta_ref[:] if has_type_bias else None  # (1, F)
        w2p = _prep_w(w2_ref[:], mxu)
        wattp = _prep_w(watt_ref[:], mxu) if attention else None

        def phase_a():
            i = step
            row = pl.ds(pl.multiple_of(i * ti, ti), ti)
            h_i = h_ref[0]                      # (ti, H) row-mapped block
            a_i = a_row_ref[0]                  # (ti, F)
            x_i = x_ref[0, row, :]
            x0_i = x0_ref[0, row, :]
            mask_i = mask_ref[0, row, :]
            lig_i = lig_ref[0, row, :]

            def body(j, acc):
                tj = tile_j
                F_out = acc.shape[1]
                zeros = lambda: jnp.zeros((ti, F_out), jnp.float32)

                def loads():
                    col = pl.ds(pl.multiple_of(j * tj, tj), tj)
                    a_j = a_col_ref[0, col, :]
                    x_j_t = xt_ref[0, :, col]
                    x0_j_t = x0t_ref[0, :, col]
                    mask_j = maskt_ref[0, :, col]
                    lig_j = ligt_ref[0, :, col]
                    d2 = _pair_distance2(x_i, x_j_t)
                    d2_0 = _pair_distance2(x0_i, x0_j_t)
                    adj = _adjacency_tile(d2_0, mask_i, mask_j, lig_i,
                                          lig_j, cutoffs)
                    return a_j, d2, d2_0, lig_j, adj

                def compute_sub(sl, a_j, d2, d2_0, lig_j, adj):
                    m = _pair_mlp(a_i, a_j[sl], d2[:, sl], d2_0[:, sl],
                                  lig_i, lig_j[:, sl],
                                  wd2_ref[0], wd20_ref[0], type_delta,
                                  w2p, b2_ref[0], None, mxu)
                    sub = sl.stop - sl.start
                    gate = adj[:, sl][:, :, None]
                    if attention:
                        att = jax.nn.sigmoid(_dot(m, wattp, mxu)
                                             + batt_ref[0])
                        gate = gate * att.reshape(ti, sub, 1)
                    return jnp.sum(m.reshape(ti, sub, -1) * gate, axis=1)

                word = bits_ref[pb, i, j]

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

            F = a_row_ref.shape[2]
            acc = jnp.zeros((ti, F), jnp.float32)
            acc = jax.lax.fori_loop(0, n_tiles_j, body, acc)
            agg = acc / normalization_factor

            # node MLP (split concat: [h, agg] @ W0 == h @ W_h + agg @ W_a)
            nwhp = _prep_w(nw_h_ref[:], mxu)
            nwap = _prep_w(nw_a_ref[:], mxu)
            nw2p = _prep_w(nw2_ref[:], mxu)
            pre_n = _dot(h_i, nwhp, mxu) + _dot(agg, nwap, mxu) + nb0_ref[0]
            upd = _dot(_silu(pre_n), nw2p, mxu) + nb2_ref[0]
            h_new = (h_i + upd) * mask_i
            out_h_ref[0] = h_new

            # coordinate-head first-layer projections of h' -> scratch.
            # per-node parts of the (2,2,F) type tables fold in here
            # (fold_type_bias semantics); the rank-1 delta stays pairwise.
            lkip = _prep_w(lk_i_ref[:], mxu)
            lkjp = _prep_w(lk_j_ref[:], mxu)
            la_i = _dot(h_new, lkip, mxu) + lb0_ref[0]
            la_j = _dot(h_new, lkjp, mxu)
            if has_type_bias:
                t00, t01 = ltb_ref[0, 0], ltb_ref[0, 1]
                t10 = ltb_ref[1, 0]
                la_i = la_i + t00 + lig_i * (t10 - t00)
                la_j = la_j + lig_i * (t01 - t00)
            la_row_s[row, :] = la_i
            la_col_s[row, :] = la_j
            if not reflection_equiv:
                ckip = _prep_w(ck_i_ref[:], mxu)
                ckjp = _prep_w(ck_j_ref[:], mxu)
                lc_i = _dot(h_new, ckip, mxu) + cb0_ref[0]
                lc_j = _dot(h_new, ckjp, mxu)
                if has_type_bias:
                    s00, s01 = ctb_ref[0, 0], ctb_ref[0, 1]
                    s10 = ctb_ref[1, 0]
                    lc_i = lc_i + s00 + lig_i * (s10 - s00)
                    lc_j = lc_j + lig_i * (s01 - s00)
                lc_row_s[row, :] = lc_i
                lc_col_s[row, :] = lc_j

            # keep the dx output block (revisited by every phase-A step)
            # deterministic even if the pipeline copies it out early
            out_dx_ref[0] = jnp.zeros((ti, 3), jnp.float32)

        def phase_b():
            i = step - n_tiles_a
            row = pl.ds(pl.multiple_of(i * ti, ti), ti)
            a_i = la_row_s[row, :]
            x_i = x_ref[0, row, :]
            x0_i = x0_ref[0, row, :]
            mask_i = mask_ref[0, row, :]
            lig_i = lig_ref[0, row, :]
            ltype_delta = None
            ctype_delta = None
            if has_type_bias:
                t = ltb_ref[:]
                ltype_delta = (t[1, 1] - t[1, 0] - t[0, 1]
                               + t[0, 0]).reshape(1, -1)
                if not reflection_equiv:
                    c = ctb_ref[:]
                    ctype_delta = (c[1, 1] - c[1, 0] - c[0, 1]
                                   + c[0, 0]).reshape(1, -1)
            lw1p = _prep_w(lw1_ref[:], mxu)
            lw3p = _prep_w(lw3_ref[:], mxu)
            if not reflection_equiv:
                c_i = lc_row_s[row, :]
                cw1p = _prep_w(cw1_ref[:], mxu)
                cw3p = _prep_w(cw3_ref[:], mxu)
                mean = mean_ref[0]              # (1, 3)

            def body(j, acc):
                tj = tile_j
                zeros = lambda: jnp.zeros((ti, 3), jnp.float32)

                def loads():
                    col = pl.ds(pl.multiple_of(j * tj, tj), tj)
                    a_j = la_col_s[col, :]
                    x_j_t = xt_ref[0, :, col]
                    x0_j_t = x0t_ref[0, :, col]
                    mask_j = maskt_ref[0, :, col]
                    lig_j = ligt_ref[0, :, col]
                    d2 = _pair_distance2(x_i, x_j_t)
                    d2_0 = _pair_distance2(x0_i, x0_j_t)
                    adj = _adjacency_tile(d2_0, mask_i, mask_j, lig_i,
                                          lig_j, cutoffs)
                    c_j = lc_col_s[col, :] if not reflection_equiv else None
                    return a_j, x_j_t, d2, d2_0, lig_j, adj, c_j

                def compute_sub(sl, a_j, x_j_t, d2, d2_0, lig_j, adj, c_j):
                    phi = _pair_mlp(a_i, a_j[sl], d2[:, sl], d2_0[:, sl],
                                    lig_i, lig_j[:, sl],
                                    lwd2_ref[0], lwd20_ref[0], ltype_delta,
                                    lw1p, lb1_ref[0], lw3p, mxu)
                    if tanh:
                        phi = jnp.tanh(phi) * coords_range
                    norm = jnp.sqrt(d2[:, sl] + 1e-8) + norm_constant
                    w = phi / norm * adj[:, sl]

                    if not reflection_equiv:
                        phi_c = _pair_mlp(c_i, c_j[sl], d2[:, sl],
                                          d2_0[:, sl], lig_i, lig_j[:, sl],
                                          cwd2_ref[0], cwd20_ref[0],
                                          ctype_delta, cw1p, cb1_ref[0],
                                          cw3p, mxu)
                        if tanh:
                            phi_c = jnp.tanh(phi_c) * coords_range
                        xi = [x_i[:, a:a + 1] - mean[:, a:a + 1]
                              for a in range(3)]
                        xj = [x_j_t[a:a + 1, sl] - mean[:, a:a + 1]
                              for a in range(3)]
                        cx = xi[1] * xj[2] - xi[2] * xj[1]
                        cy = xi[2] * xj[0] - xi[0] * xj[2]
                        cz = xi[0] * xj[1] - xi[1] * xj[0]
                        cnorm = jnp.sqrt(cx * cx + cy * cy + cz * cz
                                         + 1e-8) + norm_constant
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

                word = bits_ref[pb, i, j]

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

            acc = jnp.zeros((ti, 3), jnp.float32)
            acc = jax.lax.fori_loop(0, n_tiles_j, body, acc)
            out_dx_ref[0] = acc / normalization_factor
            # out_h maps to the last phase-A row tile during phase B and is
            # not written: the VMEM buffer still holds that tile's values,
            # so any pipeline copy-out rewrites identical content

        jax.lax.cond(step < n_tiles_a, phase_a, phase_b)

    return kernel


def block_fused_pallas(
        h, a_row, a_col, x, x0, mask, is_lig,
        gcl, node, coord, cross=None, graph_mean=None, *,
        cutoffs, attention, tanh, coords_range, norm_constant,
        normalization_factor, update_rows=None, d2_0=None,
        tile_i=TILE_I, tile_j=TILE_J, sub_j=SUB_J,
        mxu_precision="float32", interpret=False):
    """One EGNN block (inv_sublayers=1) in a single phased pallas_call.

    h: (B, N, H) block-entry node features; a_row/a_col: GCL first-layer
    projections of h with the edge-type table already folded
    (fold_type_bias).  Parameter dicts:

      gcl   = {w_d2, w_d20, type_delta(F,)|None, w2, b2, w_att|None,
               b_att|None}
      node  = {w_h (H,F), w_a (F,F), b0 (F,), w2 (F,H), b2 (H,)}
      coord = {k_i (H,F), k_j (H,F), b0 (F,), w_d2 (F,), w_d20 (F,),
               type_bias (2,2,F)|None, w1 (F,F), b1 (F,), w3 (F,1)}
      cross = same fields as coord (requires graph_mean (B, 3))

    Returns (h_new (B,N,H), dx (B,N,3)); dx rows beyond ``update_rows``
    (rounded up to the row tile) are exact zeros.
    """
    B, N, H = h.shape
    F = a_row.shape[-1]
    assert N % tile_j == 0 and N % tile_i == 0, (N, tile_i, tile_j)
    n_tiles_a = N // tile_i
    n_tiles_b = n_tiles_a if update_rows is None \
        else min(n_tiles_a, -(-int(update_rows) // tile_i))
    n_dx_rows = n_tiles_b * tile_i
    reflection_equiv = cross is None
    has_type_bias = gcl.get("type_delta") is not None

    if d2_0 is None:
        diff0 = x0[:, :, None, :] - x0[:, None, :, :]
        d2_0 = jnp.sum(diff0 * diff0, axis=-1)
    bits = _block_activity_bits(d2_0, mask, mask, is_lig, cutoffs, tile_i,
                                min(sub_j, tile_j), n_tiles_a, tile_j=tile_j)

    kernel = _make_block_kernel(
        n_tiles_a=n_tiles_a, n_tiles_b=n_tiles_b, n_tiles_j=N // tile_j,
        tile_i=tile_i, tile_j=tile_j, cutoffs=cutoffs, attention=attention,
        has_type_bias=has_type_bias, tanh=tanh, coords_range=coords_range,
        reflection_equiv=reflection_equiv, norm_constant=norm_constant,
        normalization_factor=normalization_factor, sub_j=sub_j,
        mxu=_PRECISIONS[mxu_precision])

    full = lambda b, s, *_: (b, 0, 0)
    # phase A steps walk the row tiles; phase B revisits the leading tiles
    a_map = lambda b, s, *_: (b, jnp.minimum(s, n_tiles_a - 1), 0)
    dx_map = lambda b, s, *_: (b, jnp.clip(s - n_tiles_a, 0, n_tiles_b - 1), 0)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, s, *_: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    x_t = jnp.swapaxes(x, 1, 2)
    x0_t = jnp.swapaxes(x0, 1, 2)

    zf = jnp.zeros((F,), jnp.float32)
    zFF = jnp.zeros((F, F), jnp.float32)
    zHF = jnp.zeros((H, F), jnp.float32)
    ztb = jnp.zeros((2, 2, F), jnp.float32)
    gcl_delta = gcl.get("type_delta")
    w_att = gcl.get("w_att")
    c = cross or {}

    in_specs = [
        pl.BlockSpec((1, tile_i, H), a_map, memory_space=pltpu.VMEM),  # h
        pl.BlockSpec((1, tile_i, F), a_map, memory_space=pltpu.VMEM),  # a_row
        pl.BlockSpec((1, N, F), full, memory_space=pltpu.VMEM),        # a_col
        pl.BlockSpec((1, N, 3), full, memory_space=pltpu.VMEM),        # x
        pl.BlockSpec((1, 3, N), full, memory_space=pltpu.VMEM),        # x_t
        pl.BlockSpec((1, N, 3), full, memory_space=pltpu.VMEM),        # x0
        pl.BlockSpec((1, 3, N), full, memory_space=pltpu.VMEM),        # x0_t
        pl.BlockSpec((1, N, 1), full, memory_space=pltpu.VMEM),        # mask
        pl.BlockSpec((1, 1, N), full, memory_space=pltpu.VMEM),        # maskt
        pl.BlockSpec((1, N, 1), full, memory_space=pltpu.VMEM),        # lig
        pl.BlockSpec((1, 1, N), full, memory_space=pltpu.VMEM),        # ligt
        const((1, F)), const((1, F)), const((1, F)),                   # wd2/20/delta
        const((F, F)), const((1, F)),                                  # w2, b2
        const((F, 1)), const((1, 1)),                                  # att
        const((H, F)), const((F, F)), const((1, F)),                   # node w_h/w_a/b0
        const((F, H)), const((1, H)),                                  # node w2/b2
        const((H, F)), const((H, F)), const((1, F)),                   # lk_i/lk_j/lb0
        const((1, F)), const((1, F)), const((2, 2, F)),                # lwd2/lwd20/ltb
        const((F, F)), const((1, F)), const((F, 1)),                   # lw1/lb1/lw3
        const((H, F)), const((H, F)), const((1, F)),                   # ck_i/ck_j/cb0
        const((1, F)), const((1, F)), const((2, 2, F)),                # cwd2/cwd20/ctb
        const((F, F)), const((1, F)), const((F, 1)),                   # cw1/cb1/cw3
        pl.BlockSpec((1, 1, 3), lambda b, s, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),                         # mean
    ]
    args = [
        h, a_row, a_col, x, x_t, x0, x0_t,
        mask[..., None], mask[:, None, :],
        is_lig[..., None], is_lig[:, None, :],
        gcl["w_d2"].reshape(1, F), gcl["w_d20"].reshape(1, F),
        (gcl_delta if gcl_delta is not None else zf).reshape(1, F),
        gcl["w2"], gcl["b2"].reshape(1, F),
        (w_att if w_att is not None else jnp.zeros((F, 1))),
        (gcl.get("b_att") if gcl.get("b_att") is not None
         else jnp.zeros((1,))).reshape(1, 1),
        node["w_h"], node["w_a"], node["b0"].reshape(1, F),
        node["w2"], node["b2"].reshape(1, H),
        coord["k_i"], coord["k_j"], coord["b0"].reshape(1, F),
        coord["w_d2"].reshape(1, F), coord["w_d20"].reshape(1, F),
        (coord.get("type_bias") if coord.get("type_bias") is not None
         else ztb),
        coord["w1"], coord["b1"].reshape(1, F), coord["w3"],
        c.get("k_i", zHF), c.get("k_j", zHF),
        c.get("b0", zf).reshape(1, F),
        c.get("w_d2", zf).reshape(1, F), c.get("w_d20", zf).reshape(1, F),
        (c.get("type_bias") if c.get("type_bias") is not None else ztb),
        c.get("w1", zFF), c.get("b1", zf).reshape(1, F),
        c.get("w3", jnp.zeros((F, 1))),
        (graph_mean if graph_mean is not None
         else jnp.zeros((B, 3))).reshape(B, 1, 3),
    ]

    out_specs = [
        pl.BlockSpec((1, tile_i, H), a_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_i, 3), dx_map, memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, N, H), jnp.float32),
        jax.ShapeDtypeStruct((B, n_dx_rows, 3), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((N, F), jnp.float32),  # la_row
        pltpu.VMEM((N, F), jnp.float32),  # la_col
        pltpu.VMEM((N, F), jnp.float32),  # lc_row
        pltpu.VMEM((N, F), jnp.float32),  # lc_col
    ]
    h_new, dx = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, n_tiles_a + n_tiles_b),
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(bits, *args)
    if n_dx_rows < N:
        dx = jnp.pad(dx, ((0, 0), (0, N - n_dx_rows), (0, 0)))
    return h_new, dx


def block_fused_xla(h, a_row, a_col, x, x0, mask, is_lig, gcl, node, coord,
                    cross=None, graph_mean=None, *, cutoffs, attention, tanh,
                    coords_range, norm_constant, normalization_factor,
                    update_rows=None, tile_i=TILE_I):
    """Dense-XLA mirror of ``block_fused_pallas`` (same math, O(N^2) in
    HBM) — correctness twin and custom-VJP backward."""
    gcl_delta = gcl.get("type_delta")
    type_bias_gcl = None
    if gcl_delta is not None:
        # gcl type bias is pre-folded into a_row/a_col; reconstruct the
        # rank-1-only table the dense twin expects
        F = gcl_delta.shape[-1]
        z = jnp.zeros((F,), gcl_delta.dtype)
        type_bias_gcl = jnp.stack(
            [jnp.stack([z, z]), jnp.stack([z, gcl_delta])])
    agg = gcl_message_agg_xla(
        a_row, a_col, x, x0, mask, is_lig, gcl["w_d2"], gcl["w_d20"],
        type_bias_gcl, gcl["w2"], gcl["b2"], gcl.get("w_att"),
        gcl.get("b_att"), cutoffs=cutoffs, attention=attention,
        normalization_factor=normalization_factor)

    pre_n = h @ node["w_h"] + agg @ node["w_a"] + node["b0"]
    h_new = (h + _silu(pre_n) @ node["w2"] + node["b2"]) * mask[..., None]

    la_row = h_new @ coord["k_i"] + coord["b0"]
    la_col = h_new @ coord["k_j"]
    la_row, la_col, l_delta = fold_type_bias(
        la_row, la_col, is_lig, coord.get("type_bias"))
    l_tb = None
    if l_delta is not None:
        F = l_delta.shape[-1]
        z = jnp.zeros((F,), l_delta.dtype)
        l_tb = jnp.stack([jnp.stack([z, z]), jnp.stack([z, l_delta])])
    cross_arg = None
    if cross is not None:
        c_row = h_new @ cross["k_i"] + cross["b0"]
        c_col = h_new @ cross["k_j"]
        c_row, c_col, c_delta = fold_type_bias(
            c_row, c_col, is_lig, cross.get("type_bias"))
        c_tb = None
        if c_delta is not None:
            F = c_delta.shape[-1]
            z = jnp.zeros((F,), c_delta.dtype)
            c_tb = jnp.stack([jnp.stack([z, z]), jnp.stack([z, c_delta])])
        cross_arg = dict(a_row=c_row, a_col=c_col, w_d2=cross["w_d2"],
                         w_d20=cross["w_d20"], type_bias=c_tb,
                         w2=cross["w1"], b2=cross["b1"], w3=cross["w3"])
    dx = coord_update_agg_xla(
        la_row, la_col, x, x0, mask, is_lig, coord["w_d2"], coord["w_d20"],
        l_tb, coord["w1"], coord["b1"], coord["w3"], cutoffs=cutoffs,
        tanh=tanh, coords_range=coords_range, norm_constant=norm_constant,
        normalization_factor=normalization_factor, cross=cross_arg,
        graph_mean=graph_mean, update_rows=update_rows, tile_i=tile_i)
    return h_new, dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _block_cvjp(cfg, operands):
    (cutoffs, attention, tanh, coords_range, norm_constant, nf, tile_i,
     tile_j, sub_j, update_rows, mxu_precision, interpret) = cfg
    (h, a_row, a_col, x, x0, mask, is_lig, gcl, node, coord, cross,
     graph_mean, d2_0) = operands
    return block_fused_pallas(
        h, a_row, a_col, x, x0, mask, is_lig, gcl, node, coord, cross,
        graph_mean, cutoffs=cutoffs, attention=attention, tanh=tanh,
        coords_range=coords_range, norm_constant=norm_constant,
        normalization_factor=nf, update_rows=update_rows, d2_0=d2_0,
        tile_i=tile_i, tile_j=tile_j, sub_j=sub_j,
        mxu_precision=mxu_precision, interpret=interpret)


def _block_fwd(cfg, operands):
    return _block_cvjp(cfg, operands), operands


def _block_bwd(cfg, operands, g):
    (cutoffs, attention, tanh, coords_range, norm_constant, nf, tile_i,
     _tile_j, _sub_j, update_rows, _mxu, _interp) = cfg

    def f(ops):
        (h, a_row, a_col, x, x0, mask, is_lig, gcl, node, coord, cross,
         graph_mean, _) = ops
        return block_fused_xla(
            h, a_row, a_col, x, x0, mask, is_lig, gcl, node, coord, cross,
            graph_mean, cutoffs=cutoffs, attention=attention, tanh=tanh,
            coords_range=coords_range, norm_constant=norm_constant,
            normalization_factor=nf, update_rows=update_rows, tile_i=tile_i)

    _, vjp = jax.vjp(f, operands)
    return vjp(g)


_block_cvjp.defvjp(_block_fwd, _block_bwd)


def egnn_block_step(h, a_row, a_col, x, x0, mask, is_lig, gcl, node, coord,
                    cross=None, graph_mean=None, *, cutoffs, attention, tanh,
                    coords_range, norm_constant, normalization_factor,
                    impl="pallas", update_rows=None, d2_0=None,
                    tile_i=TILE_I, tile_j=TILE_J, sub_j=SUB_J,
                    mxu_precision="float32", interpret=False):
    """Differentiable block-fused step (Pallas forward, XLA-mirror VJP)."""
    if impl == "xla":
        return block_fused_xla(
            h, a_row, a_col, x, x0, mask, is_lig, gcl, node, coord, cross,
            graph_mean, cutoffs=cutoffs, attention=attention, tanh=tanh,
            coords_range=coords_range, norm_constant=norm_constant,
            normalization_factor=normalization_factor,
            update_rows=update_rows, tile_i=tile_i)
    cfg = (tuple(cutoffs), attention, tanh, float(coords_range),
           float(norm_constant), float(normalization_factor), tile_i,
           tile_j, sub_j, None if update_rows is None else int(update_rows),
           mxu_precision, interpret)
    return _block_cvjp(cfg, (h, a_row, a_col, x, x0, mask, is_lig, gcl,
                             node, coord, cross, graph_mean, d2_0))
