"""Fused Pallas TPU backward kernels for the EGNN hot loop.

The forward kernels (egnn_pallas.py) carry a custom VJP whose backward
originally recomputed through the dense-XLA mirrors — materializing the
O(B*N^2*F) message tensors in HBM that the forward kernels exist to avoid,
making the training step ~10x slower than the sampling step.  These kernels
compute the same cotangents tile-by-tile in VMEM (reference semantics:
autodiff of egnn_new.py:31-57 / 96-122 under the masked dense layout).

Structure mirrors the forward: grid (B, row-tiles), fori_loop over column
tiles, per-``sub_j``-column-block cutoff skipping driven by the same
SMEM-prefetched block-activity bits (a fully edge-free block contributes
exactly zero gradient, so skipping is exact).  Gradient outputs that are
shared across grid steps (weight grads, column-side node grads) use the
TPU-sequential-grid accumulation pattern: their BlockSpec index map ignores
the grid axes being reduced over, the block stays resident in VMEM, and the
kernel zero-initializes it on first visit.

Layout notes (learned on v5e, see NOTES.md):
* (ti*s, 1) <-> (ti, s) reshapes are supported; bare (ti*s,) 1-D casts are
  not — every per-pair scalar stays 2-D.
* Column-side x/x0 grads accumulate in (3, N) transposed layout (lane-major
  N, dynamic-sliced at 128-multiples) and are transposed once in XLA.
* No in-kernel transposes: dm1 uses a pre-transposed W2^T input; weight-grad
  dots contract over rows via dot_general dimension_numbers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .egnn_pallas import (
    TILE_I, TILE_J, SUB_J, _PRECISIONS, _adjacency_tile, _bits_smem_operand,
    _block_activity_bits,
    _dot, _edge_bias, _pair_distance2, _prep_w, _silu, fold_type_bias)


def _dsilu(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _dotT(a, b, mxu):
    """(R, F1)^T @ (R, F2) -> (F1, F2): weight-gradient dot, contracting over
    the pair-row axis of both operands (MXU transposed-lhs matmul)."""
    dn = (((0,), (0,)), ((), ()))
    if mxu in ("bf16_3x", "bf16_2x"):
        dflt = jax.lax.Precision.DEFAULT
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        acc = jax.lax.dot_general(a_hi, b_hi, dn, precision=dflt,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(a_lo, b_hi, dn, precision=dflt,
                                        preferred_element_type=jnp.float32)
        if mxu == "bf16_2x":
            return acc
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(a_hi, b_lo, dn, precision=dflt,
                                         preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, dn, precision=mxu,
                               preferred_element_type=jnp.float32)


def _sum_axis0(x):
    """Sum over the leading axis without a cross-sublane reduce op (Mosaic:
    "unsupported output implicit dimension" for vector.multi_reduction over
    sublanes).  A halving-add tree of static slices keeps everything as
    plain VPU adds, exact in f32; the sub-8 tail unrolls into row selects.
    Works for 2-D (rows, C) and 3-D (rows, s, F) values alike."""
    r = x.shape[0]
    while r > 8 and r % 2 == 0:
        h = r // 2
        x = x[:h] + x[h:]
        r = h
    acc = x[0:1]
    for k in range(1, r):
        acc = acc + x[k:k + 1]
    return acc


def _mlp_fwd(a_i, a_js, d2s, d20s, lig_i, lig_js, wd2, wd20, type_bias,
             w2p, b2, mxu):
    """Recompute the shared 2-layer pair MLP: returns (pre_f, m1, z2, m2),
    all flattened to (ti*s, F)."""
    ti, s = d2s.shape
    pre = a_i[:, None, :] + a_js[None, :, :] + _edge_bias(
        d2s, d20s, wd2, wd20, lig_i, lig_js, type_bias)
    pre_f = pre.reshape(ti * s, -1)
    m1 = _silu(pre_f)
    z2 = _dot(m1, w2p, mxu) + b2
    return pre_f, m1, z2, _silu(z2)


def _mlp_bwd(dm2, pre_f, m1, z2, d2s, d20s, ll, wd2, wd20, w2tp, mxu,
             has_tb):
    """Backward of the shared pair MLP below ``m2``.

    Returns per-sub-block gradient pieces:
      da_i (ti,F), dacol (s,F), dwd2/dwd20/dtb (1,F), dw2 (F,F), db2 (1,F),
      dd2/dd20 (ti,s) — cotangents of the two squared-distance features.
    """
    ti, s = d2s.shape
    F = m1.shape[-1]
    dz2 = dm2 * _dsilu(z2)
    dw2_d = _dotT(m1, dz2, mxu)
    db2_d = _sum_axis0(dz2)
    dm1 = _dot(dz2, w2tp, mxu)
    dpre_f = dm1 * _dsilu(pre_f)
    dpre3 = dpre_f.reshape(ti, s, F)
    da_i_d = jnp.sum(dpre3, axis=1)
    # axis=0 reduces of 3-D values must keep the implicit dim (Mosaic:
    # "unsupported output implicit dimension" otherwise); the (1,s,F)
    # column piece stays 3-D all the way to its ref store
    dacol_d = _sum_axis0(dpre3)
    # NOTE Mosaic layout rule: (ti,s)->(ti*s,1) casts are unsupported
    # (lane values move to sublanes); pair scalars therefore enter F-space
    # via trailing-unit broadcasts, and (ti,s,F)->(ti*s,F) flattens (which
    # ARE supported) do the row reductions.
    dwd2_d = _sum_axis0((dpre3 * d2s[:, :, None]).reshape(ti * s, F))
    dwd20_d = _sum_axis0((dpre3 * d20s[:, :, None]).reshape(ti * s, F))
    dtb_d = None
    if has_tb:
        dtb_d = _sum_axis0((dpre3 * ll[:, :, None]).reshape(ti * s, F))
    dd2 = jnp.sum(dpre_f * wd2[None, :], axis=1, keepdims=True)
    dd20 = jnp.sum(dpre_f * wd20[None, :], axis=1, keepdims=True)
    return (da_i_d, dacol_d, dwd2_d, dwd20_d, dtb_d, dw2_d, db2_d,
            dd2.reshape(ti, s), dd20.reshape(ti, s))


def _d2_to_x(dd2, dd20, x_i, x_j_t, x0_i, x0_j_t, sl):
    """Chain squared-distance cotangents to coordinate grads.

    Returns lists over the 3 axes: dxi_a (ti,1), dxcol_a (1,s) [for the
    (3,N) transposed column accumulator], same for x0."""
    dxi, dxcol, dx0i, dx0col = [], [], [], []
    for a in range(3):
        diff = x_i[:, a:a + 1] - x_j_t[a:a + 1, sl]
        t = 2.0 * dd2 * diff
        dxi.append(jnp.sum(t, axis=1, keepdims=True))
        dxcol.append(-_sum_axis0(t))
        diff0 = x0_i[:, a:a + 1] - x0_j_t[a:a + 1, sl]
        t0 = 2.0 * dd20 * diff0
        dx0i.append(jnp.sum(t0, axis=1, keepdims=True))
        dx0col.append(-_sum_axis0(t0))
    return dxi, dxcol, dx0i, dx0col


# ---------------------------------------------------------------------------
# GCL message-aggregation backward
# ---------------------------------------------------------------------------

def _make_gcl_bwd_kernel(n_tiles_j, tile_j, cutoffs, attention, has_type_bias,
                         inv_nf, sub_j, mxu, use_bits):
    sub_j = min(sub_j, tile_j)
    assert tile_j % sub_j == 0, (tile_j, sub_j)
    n_sub = tile_j // sub_j

    def kernel(*refs):
        if use_bits:
            bits_ref, *refs = refs
        (g_ref, a_row_ref, a_col_ref, x_ref, xt_ref, x0_ref, x0t_ref,
         mask_ref, maskt_ref, lig_ref, ligt_ref,
         wd2_ref, wd20_ref, tbias_ref, w2_ref, w2t_ref, b2_ref,
         watt_ref, wattr_ref, batt_ref) = refs[:20]
        outs = refs[20:]
        (da_row_ref, da_col_ref, dxr_ref, dxc_ref, dx0r_ref, dx0c_ref,
         dwd2_ref, dwd20_ref, dtb_ref, dw2_ref, db2_ref,
         dwatt_ref, dbatt_ref) = outs

        pb = pl.program_id(0)
        i = pl.program_id(1)
        ti = a_row_ref.shape[1]
        F = a_row_ref.shape[2]
        N = a_col_ref.shape[1]

        @pl.when(i == 0)
        def _zero_per_batch():
            da_col_ref[...] = jnp.zeros((1, N, F), jnp.float32)
            dxc_ref[...] = jnp.zeros((1, 3, N), jnp.float32)
            dx0c_ref[...] = jnp.zeros((1, 3, N), jnp.float32)

        @pl.when((pb == 0) & (i == 0))
        def _zero_global():
            dwd2_ref[...] = jnp.zeros((1, F), jnp.float32)
            dwd20_ref[...] = jnp.zeros((1, F), jnp.float32)
            dtb_ref[...] = jnp.zeros((1, F), jnp.float32)
            dw2_ref[...] = jnp.zeros((F, F), jnp.float32)
            db2_ref[...] = jnp.zeros((1, F), jnp.float32)
            dwatt_ref[...] = jnp.zeros((1, F), jnp.float32)
            dbatt_ref[...] = jnp.zeros((1, 1), jnp.float32)

        g_i = g_ref[0] * inv_nf
        a_i = a_row_ref[0]
        x_i = x_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        x0_i = x0_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        mask_i = mask_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        lig_i = lig_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        type_bias = tbias_ref[:] if has_type_bias else None
        w2p = _prep_w(w2_ref[:], mxu)
        w2tp = _prep_w(w2t_ref[:], mxu)
        wattp = _prep_w(watt_ref[:], mxu) if attention else None
        watt_row = wattr_ref[:]  # (1, F)
        wd2 = wd2_ref[0]
        wd20 = wd20_ref[0]
        b2 = b2_ref[:]

        def zeros_tile():
            return (jnp.zeros((ti, F), jnp.float32),       # da_i
                    jnp.zeros((1, tile_j, F), jnp.float32),  # dacol
                    jnp.zeros((ti, 3), jnp.float32),       # dxi
                    jnp.zeros((3, tile_j), jnp.float32),   # dxcolT
                    jnp.zeros((ti, 3), jnp.float32),       # dx0i
                    jnp.zeros((3, tile_j), jnp.float32),   # dx0colT
                    jnp.zeros((1, F), jnp.float32),        # dwd2
                    jnp.zeros((1, F), jnp.float32),        # dwd20
                    jnp.zeros((1, F), jnp.float32),        # dtb
                    jnp.zeros((F, F), jnp.float32),        # dw2
                    jnp.zeros((1, F), jnp.float32),        # db2
                    jnp.zeros((1, F), jnp.float32),        # dwatt
                    jnp.zeros((1, 1), jnp.float32))        # dbatt

        def body(j, carry):
            tj = tile_j

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
                adj = _adjacency_tile(d2_0, mask_i, mask_j, lig_i, lig_j,
                                      cutoffs)
                return a_j, x_j_t, x0_j_t, d2, d2_0, lig_j, adj

            def compute_sub(sl, a_j, x_j_t, x0_j_t, d2, d2_0, lig_j, adj):
                s = sl.stop - sl.start
                a_js = a_j[sl]
                d2s = d2[:, sl]
                d20s = d2_0[:, sl]
                adjs = adj[:, sl]
                lig_js = lig_j[:, sl]
                ll = lig_i * lig_js
                pre_f, m1, z2, m2 = _mlp_fwd(
                    a_i, a_js, d2s, d20s, lig_i, lig_js, wd2, wd20,
                    type_bias, w2p, b2, mxu)
                if attention:
                    attz = _dot(m2, wattp, mxu) + batt_ref[0]
                    att = jax.nn.sigmoid(attz)          # (ti*s, 1)
                    att2 = att.reshape(ti, s)
                    gate = adjs * att2
                else:
                    gate = adjs
                gate3 = gate[:, :, None]
                dm2 = (g_i[:, None, :] * gate3).reshape(ti * s, F)
                dwatt_d = jnp.zeros((1, F), jnp.float32)
                dbatt_d = jnp.zeros((1, 1), jnp.float32)
                if attention:
                    # att cotangent: d(out)/d(att) = m2 * adj per pair
                    m2_3 = m2.reshape(ti, s, F)
                    gm3 = g_i[:, None, :] * m2_3
                    gm = jnp.sum(gm3.reshape(ti * s, F), axis=1,
                                 keepdims=True).reshape(ti, s)
                    dattz = gm * adjs * att2 * (1.0 - att2)   # (ti, s)
                    dm2 = dm2 + (dattz[:, :, None]
                                 * watt_row[None, :, :]).reshape(ti * s, F)
                    dwatt_d = _sum_axis0(
                        (m2_3 * dattz[:, :, None]).reshape(ti * s, F))
                    dbatt_d = _sum_axis0(
                        jnp.sum(dattz, axis=1, keepdims=True))
                (da_i_d, dacol_d, dwd2_d, dwd20_d, dtb_d, dw2_d, db2_d,
                 dd2, dd20) = _mlp_bwd(dm2, pre_f, m1, z2, d2s, d20s, ll,
                                       wd2, wd20, w2tp, mxu, has_type_bias)
                dxi_l, dxcol_l, dx0i_l, dx0col_l = _d2_to_x(
                    dd2, dd20, x_i, x_j_t, x0_i, x0_j_t, sl)
                dxi = jnp.concatenate(dxi_l, axis=1)
                dx0i = jnp.concatenate(dx0i_l, axis=1)
                if dtb_d is None:
                    dtb_d = jnp.zeros((1, F), jnp.float32)
                return (da_i_d, dacol_d, dxi, dxcol_l, dx0i, dx0col_l,
                        dwd2_d, dwd20_d, dtb_d, dw2_d, db2_d, dwatt_d,
                        dbatt_d)

            def accum_subs(preds, ops):
                # sub-blocks tile the column axis contiguously, so the
                # column-side pieces concatenate instead of scatter-adding
                # (in-kernel scatters don't lower on Mosaic)
                (da_i, _, dxi, _, dx0i, _, dwd2_a, dwd20_a,
                 dtb_a, dw2_a, db2_a, dwatt_a, dbatt_a) = zeros_tile()
                acol_parts, xcol_parts, x0col_parts = [], [], []
                for k in range(n_sub):
                    sl = slice(k * sub_j, (k + 1) * sub_j)

                    def zero_sub(s=sub_j):
                        return (jnp.zeros((ti, F), jnp.float32),
                                jnp.zeros((1, s, F), jnp.float32),
                                jnp.zeros((ti, 3), jnp.float32),
                                [jnp.zeros((1, s), jnp.float32)] * 3,
                                jnp.zeros((ti, 3), jnp.float32),
                                [jnp.zeros((1, s), jnp.float32)] * 3,
                                jnp.zeros((1, F), jnp.float32),
                                jnp.zeros((1, F), jnp.float32),
                                jnp.zeros((1, F), jnp.float32),
                                jnp.zeros((F, F), jnp.float32),
                                jnp.zeros((1, F), jnp.float32),
                                jnp.zeros((1, F), jnp.float32),
                                jnp.zeros((1, 1), jnp.float32))

                    d = jax.lax.cond(preds[k],
                                     lambda sl=sl: compute_sub(sl, *ops),
                                     zero_sub)
                    da_i = da_i + d[0]
                    acol_parts.append(d[1])
                    dxi = dxi + d[2]
                    dx0i = dx0i + d[4]
                    xcol_parts.append(d[3])
                    x0col_parts.append(d[5])
                    dwd2_a = dwd2_a + d[6]
                    dwd20_a = dwd20_a + d[7]
                    dtb_a = dtb_a + d[8]
                    dw2_a = dw2_a + d[9]
                    db2_a = db2_a + d[10]
                    dwatt_a = dwatt_a + d[11]
                    dbatt_a = dbatt_a + d[12]
                dacol = (acol_parts[0] if n_sub == 1
                         else jnp.concatenate(acol_parts, axis=1))
                cat_t = lambda parts: jnp.concatenate(
                    [jnp.concatenate([parts[k][a] for k in range(n_sub)],
                                     axis=1) if n_sub > 1 else parts[0][a]
                     for a in range(3)], axis=0)
                return (da_i, dacol, dxi, cat_t(xcol_parts), dx0i,
                        cat_t(x0col_parts), dwd2_a, dwd20_a, dtb_a, dw2_a,
                        db2_a, dwatt_a, dbatt_a)

            if use_bits:
                word = bits_ref[0, 0, 0, j]

                def tile_work():
                    ops = loads()
                    preds = [
                        jnp.bitwise_and(
                            jax.lax.shift_right_logical(word, k), 1) != 0
                        for k in range(n_sub)]
                    return accum_subs(preds, ops)

                d = jax.lax.cond(word != 0, tile_work, zeros_tile)
            else:
                ops = loads()
                adj = ops[-1]
                preds = [jnp.any(adj[:, k * sub_j:(k + 1) * sub_j] > 0)
                         for k in range(n_sub)]
                d = jax.lax.cond(jnp.any(adj > 0),
                                 lambda: accum_subs(preds, ops), zeros_tile)

            sl_col = pl.ds(pl.multiple_of(j * tj, tj), tj)
            da_col_ref[0, sl_col, :] = da_col_ref[0, sl_col, :] + d[1][0]
            dxc_ref[0, :, sl_col] = dxc_ref[0, :, sl_col] + d[3]
            dx0c_ref[0, :, sl_col] = dx0c_ref[0, :, sl_col] + d[5]
            dwd2_ref[...] = dwd2_ref[...] + d[6]
            dwd20_ref[...] = dwd20_ref[...] + d[7]
            dtb_ref[...] = dtb_ref[...] + d[8]
            dw2_ref[...] = dw2_ref[...] + d[9]
            db2_ref[...] = db2_ref[...] + d[10]
            dwatt_ref[...] = dwatt_ref[...] + d[11]
            dbatt_ref[...] = dbatt_ref[...] + d[12]
            return (carry[0] + d[0], carry[1] + d[2], carry[2] + d[4])

        carry = (jnp.zeros((ti, F), jnp.float32),
                 jnp.zeros((ti, 3), jnp.float32),
                 jnp.zeros((ti, 3), jnp.float32))
        da_i, dxi, dx0i = jax.lax.fori_loop(0, n_tiles_j, body, carry)
        da_row_ref[0] = da_i
        dxr_ref[0] = dxi
        dx0r_ref[0] = dx0i

    return kernel


def gcl_agg_bwd_pallas(
        g, a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
        w2, b2, w_att, b_att, *, cutoffs, attention, normalization_factor,
        tile_i=TILE_I, tile_j=TILE_J, sub_j=SUB_J, mxu_precision="float32",
        col_mask=None, update_rows=None, d2_0=None, interpret=False):
    """Pallas backward of ``gcl_message_agg_pallas``.

    Returns the cotangent tuple for the forward's ``main`` operands plus
    zeros/None for the non-differentiable ones; see ``gcl_agg_bwd``.
    """
    B, N, F = a_row.shape
    n_row_tiles = N // tile_i
    if update_rows is not None:
        n_row_tiles = min(n_row_tiles, -(-int(update_rows) // tile_i))
    n_rows_out = n_row_tiles * tile_i

    # fold the (2,2,F) edge-type table exactly as the forward does; the
    # chain back through the fold runs in XLA afterwards
    def fold(ar, ac, tb):
        return fold_type_bias(ar, ac, is_lig, tb)

    (a_row_f, a_col_f, delta), fold_vjp = jax.vjp(
        fold, a_row, a_col, type_bias)
    has_tb = delta is not None
    delta_arr = delta if has_tb else jnp.zeros((F,), a_row.dtype)
    if w_att is None:
        w_att_k = jnp.zeros((F, 1), a_row.dtype)
        b_att_k = jnp.zeros((1,), a_row.dtype)
    else:
        w_att_k, b_att_k = w_att, b_att

    mxu = _PRECISIONS[mxu_precision]
    kernel = _make_gcl_bwd_kernel(
        n_tiles_j=N // tile_j, tile_j=tile_j, cutoffs=cutoffs,
        attention=attention, has_type_bias=has_tb,
        inv_nf=1.0 / float(normalization_factor), sub_j=sub_j, mxu=mxu,
        use_bits=d2_0 is not None)

    full = lambda b, i, *_: (b, 0, 0)
    rowmap = lambda b, i, *_: (b, i, 0)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda b, i, *_: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    x_t = jnp.swapaxes(x, 1, 2)
    x0_t = jnp.swapaxes(x0, 1, 2)
    g_in = g[:, :n_rows_out].astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((1, tile_i, F), rowmap, memory_space=pltpu.VMEM),   # g
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
        const2((F, F)), const2((F, F)), const2((1, F)),
        const2((F, 1)), const2((1, F)), const2((1, 1)),
    ]
    args = (g_in, a_row_f, a_col_f, x, x_t, x0, x0_t,
            mask[..., None], (mask if col_mask is None else col_mask)[:, None, :],
            is_lig[..., None], is_lig[:, None, :],
            w_d2.reshape(1, F), w_d20.reshape(1, F),
            delta_arr.reshape(1, F), w2, jnp.swapaxes(w2, 0, 1),
            b2.reshape(1, F), w_att_k, w_att_k.reshape(1, F),
            b_att_k.reshape(1, 1))

    out_shapes = [
        jax.ShapeDtypeStruct((B, n_rows_out, F), jnp.float32),  # da_row
        jax.ShapeDtypeStruct((B, N, F), jnp.float32),           # da_col
        jax.ShapeDtypeStruct((B, n_rows_out, 3), jnp.float32),  # dx rows
        jax.ShapeDtypeStruct((B, 3, N), jnp.float32),           # dx cols^T
        jax.ShapeDtypeStruct((B, n_rows_out, 3), jnp.float32),  # dx0 rows
        jax.ShapeDtypeStruct((B, 3, N), jnp.float32),           # dx0 cols^T
        jax.ShapeDtypeStruct((1, F), jnp.float32),              # dwd2
        jax.ShapeDtypeStruct((1, F), jnp.float32),              # dwd20
        jax.ShapeDtypeStruct((1, F), jnp.float32),              # dtb (delta)
        jax.ShapeDtypeStruct((F, F), jnp.float32),              # dw2
        jax.ShapeDtypeStruct((1, F), jnp.float32),              # db2
        jax.ShapeDtypeStruct((1, F), jnp.float32),              # dwatt
        jax.ShapeDtypeStruct((1, 1), jnp.float32),              # dbatt
    ]
    bmap3 = lambda b, i, *_: (b, 0, 0)
    out_specs = [
        pl.BlockSpec((1, tile_i, F), rowmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, F), bmap3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_i, 3), rowmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, N), bmap3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_i, 3), rowmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, N), bmap3, memory_space=pltpu.VMEM),
        const2((1, F)), const2((1, F)), const2((1, F)),
        const2((F, F)), const2((1, F)), const2((1, F)), const2((1, 1)),
    ]

    if d2_0 is not None:
        bits = _block_activity_bits(
            d2_0, mask, mask if col_mask is None else col_mask, is_lig,
            cutoffs, tile_i, min(sub_j, tile_j), n_row_tiles, tile_j=tile_j)
        bits4, bits_spec = _bits_smem_operand(bits)
        outs = pl.pallas_call(
            kernel,
            grid=(B, n_row_tiles),
            in_specs=[bits_spec] + in_specs,
            out_specs=out_specs,
            out_shape=out_shapes, interpret=interpret,
        )(bits4, *args)
    else:
        outs = pl.pallas_call(
            kernel, grid=(B, n_row_tiles), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shapes, interpret=interpret,
        )(*args)

    (da_row_k, da_col_k, dxr, dxc, dx0r, dx0c, dwd2, dwd20, dtb, dw2, db2,
     dwatt, dbatt) = outs

    pad_rows = lambda t: (jnp.pad(t, ((0, 0), (0, N - n_rows_out), (0, 0)))
                          if n_rows_out < N else t)
    da_row_full = pad_rows(da_row_k)
    dx = pad_rows(dxr) + jnp.swapaxes(dxc, 1, 2)
    dx0 = pad_rows(dx0r) + jnp.swapaxes(dx0c, 1, 2)
    da_row_u, da_col_u, dtb_u = fold_vjp(
        (da_row_full, da_col_k,
         dtb.reshape(F) if has_tb else None))
    if w_att is None:
        dwatt_u, dbatt_u = None, None
    else:
        dwatt_u = jnp.swapaxes(dwatt, 0, 1)
        dbatt_u = dbatt.reshape(1)
    return (da_row_u, da_col_u, dx, dx0,
            jnp.zeros_like(mask), jnp.zeros_like(is_lig),
            dwd2.reshape(F), dwd20.reshape(F), dtb_u,
            dw2, db2.reshape(F), dwatt_u, dbatt_u)


def gcl_agg_bwd(g, main, col_mask, d2_0, *, cutoffs, attention,
                normalization_factor, tile_i, tile_j, sub_j, mxu_precision,
                update_rows, interpret):
    """Cotangent of ``(main, col_mask, d2_0)`` for the GCL custom VJP."""
    main_cot = gcl_agg_bwd_pallas(
        g, *main, cutoffs=cutoffs, attention=attention,
        normalization_factor=normalization_factor, tile_i=tile_i,
        tile_j=tile_j, sub_j=sub_j, mxu_precision=mxu_precision,
        col_mask=col_mask, update_rows=update_rows, d2_0=d2_0,
        interpret=interpret)
    col_mask_cot = None if col_mask is None else jnp.zeros_like(col_mask)
    d2_0_cot = None if d2_0 is None else jnp.zeros_like(d2_0)
    return (main_cot, col_mask_cot, d2_0_cot)


# ---------------------------------------------------------------------------
# coordinate-update backward
# ---------------------------------------------------------------------------

def _make_coord_bwd_kernel(n_tiles_j, tile_j, cutoffs, has_type_bias, tanh,
                           coords_range, reflection_equiv, norm_constant,
                           inv_nf, sub_j, mxu, use_bits):
    sub_j = min(sub_j, tile_j)
    assert tile_j % sub_j == 0, (tile_j, sub_j)
    n_sub = tile_j // sub_j
    nc = norm_constant

    def kernel(*refs):
        if use_bits:
            bits_ref, *refs = refs
        if reflection_equiv:
            (g_ref, a_row_ref, a_col_ref, x_ref, xt_ref, x0_ref, x0t_ref,
             mask_ref, maskt_ref, lig_ref, ligt_ref,
             wd2_ref, wd20_ref, tbias_ref, w2_ref, w2t_ref, b2_ref,
             w3_ref, w3r_ref) = refs[:19]
            outs = refs[19:]
            (da_row_ref, da_col_ref, dxr_ref, dxc_ref, dx0r_ref, dx0c_ref,
             dwd2_ref, dwd20_ref, dtb_ref, dw2_ref, db2_ref, dw3_ref) = outs
        else:
            (g_ref, a_row_ref, a_col_ref, c_row_ref, c_col_ref,
             x_ref, xt_ref, x0_ref, x0t_ref, mean_ref,
             mask_ref, maskt_ref, lig_ref, ligt_ref,
             wd2_ref, wd20_ref, tbias_ref, w2_ref, w2t_ref, b2_ref,
             w3_ref, w3r_ref,
             cwd2_ref, cwd20_ref, ctbias_ref, cw2_ref, cw2t_ref, cb2_ref,
             cw3_ref, cw3r_ref) = refs[:30]
            outs = refs[30:]
            (da_row_ref, da_col_ref, dc_row_ref, dc_col_ref,
             dxr_ref, dxc_ref, dx0r_ref, dx0c_ref, dmean_ref,
             dwd2_ref, dwd20_ref, dtb_ref, dw2_ref, db2_ref, dw3_ref,
             dcwd2_ref, dcwd20_ref, dctb_ref, dcw2_ref, dcb2_ref,
             dcw3_ref) = outs

        pb = pl.program_id(0)
        i = pl.program_id(1)
        ti = a_row_ref.shape[1]
        F = a_row_ref.shape[2]
        N = a_col_ref.shape[1]

        @pl.when(i == 0)
        def _zero_per_batch():
            da_col_ref[...] = jnp.zeros((1, N, F), jnp.float32)
            dxc_ref[...] = jnp.zeros((1, 3, N), jnp.float32)
            dx0c_ref[...] = jnp.zeros((1, 3, N), jnp.float32)
            if not reflection_equiv:
                dc_col_ref[...] = jnp.zeros((1, N, F), jnp.float32)
                dmean_ref[...] = jnp.zeros((1, 1, 3), jnp.float32)

        @pl.when((pb == 0) & (i == 0))
        def _zero_global():
            for r in ([dwd2_ref, dwd20_ref, dtb_ref, db2_ref, dw3_ref]
                      + ([] if reflection_equiv else
                         [dcwd2_ref, dcwd20_ref, dctb_ref, dcb2_ref,
                          dcw3_ref])):
                r[...] = jnp.zeros((1, F), jnp.float32)
            dw2_ref[...] = jnp.zeros((F, F), jnp.float32)
            if not reflection_equiv:
                dcw2_ref[...] = jnp.zeros((F, F), jnp.float32)

        g_i = g_ref[0] * inv_nf                    # (ti, 3)
        a_i = a_row_ref[0]
        x_i = x_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        x0_i = x0_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        mask_i = mask_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        lig_i = lig_ref[0, pl.ds(pl.multiple_of(i * ti, ti), ti), :]
        type_bias = tbias_ref[:] if has_type_bias else None
        w2p = _prep_w(w2_ref[:], mxu)
        w2tp = _prep_w(w2t_ref[:], mxu)
        w3p = _prep_w(w3_ref[:], mxu)
        w3_row = w3r_ref[:]
        wd2 = wd2_ref[0]
        wd20 = wd20_ref[0]
        b2 = b2_ref[:]
        if not reflection_equiv:
            c_i = c_row_ref[0]
            mean = mean_ref[0]                      # (1, 3)
            ctype_bias = ctbias_ref[:] if has_type_bias else None
            cw2p = _prep_w(cw2_ref[:], mxu)
            cw2tp = _prep_w(cw2t_ref[:], mxu)
            cw3p = _prep_w(cw3_ref[:], mxu)
            cw3_row = cw3r_ref[:]
            cwd2 = cwd2_ref[0]
            cwd20 = cwd20_ref[0]
            cb2 = cb2_ref[:]

        def zf(*shape):
            return jnp.zeros(shape, jnp.float32)

        def zeros_tile():
            z = [zf(ti, F), zf(1, tile_j, F), zf(ti, 3), zf(3, tile_j),
                 zf(ti, 3), zf(3, tile_j),
                 zf(1, F), zf(1, F), zf(1, F), zf(F, F), zf(1, F),
                 zf(1, F)]
            if not reflection_equiv:
                z += [zf(ti, F), zf(1, tile_j, F), zf(ti, 3),
                      zf(1, F), zf(1, F), zf(1, F), zf(F, F), zf(1, F),
                      zf(1, F)]
            return tuple(z)

        def body(j, carry):
            tj = tile_j

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
                adj = _adjacency_tile(d2_0, mask_i, mask_j, lig_i, lig_j,
                                      cutoffs)
                c_j = None
                if not reflection_equiv:
                    c_j = c_col_ref[0,
                                    pl.ds(pl.multiple_of(j * tj, tj), tj), :]
                return a_j, x_j_t, x0_j_t, d2, d2_0, lig_j, adj, c_j

            def compute_sub(sl, a_j, x_j_t, x0_j_t, d2, d2_0, lig_j, adj,
                            c_j):
                s = sl.stop - sl.start
                a_js = a_j[sl]
                d2s = d2[:, sl]
                d20s = d2_0[:, sl]
                adjs = adj[:, sl]
                lig_js = lig_j[:, sl]
                ll = lig_i * lig_js
                pre_f, m1, z2, m2 = _mlp_fwd(
                    a_i, a_js, d2s, d20s, lig_i, lig_js, wd2, wd20,
                    type_bias, w2p, b2, mxu)
                rawm = _dot(m2, w3p, mxu).reshape(ti, s)
                if tanh:
                    th = jnp.tanh(rawm)
                    phi = th * coords_range
                else:
                    phi = rawm
                sq = jnp.sqrt(d2s + 1e-8)
                norm = sq + nc
                q = adjs / norm
                w = phi * q

                diffs = [x_i[:, a:a + 1] - x_j_t[a:a + 1, sl]
                         for a in range(3)]
                dw = g_i[:, 0:1] * diffs[0] + g_i[:, 1:2] * diffs[1] \
                    + g_i[:, 2:3] * diffs[2]
                wsum = jnp.sum(w, axis=1, keepdims=True)
                dxi_l = [g_i[:, a:a + 1] * wsum for a in range(3)]
                dxcol_l = [-_sum_axis0(w * g_i[:, a:a + 1])
                           for a in range(3)]
                dphi = dw * q
                dd2 = -(w / norm) * dw * (0.5 / sq)
                if tanh:
                    draw = dphi * (1.0 - th * th) * coords_range
                else:
                    draw = dphi
                m2_3 = m2.reshape(ti, s, F)
                dw3_d = _sum_axis0(
                    (m2_3 * draw[:, :, None]).reshape(ti * s, F))
                dm2 = (draw[:, :, None]
                       * w3_row[None, :, :]).reshape(ti * s, F)
                (da_i_d, dacol_d, dwd2_d, dwd20_d, dtb_d, dw2_d, db2_d,
                 dd2_m, dd20) = _mlp_bwd(dm2, pre_f, m1, z2, d2s, d20s, ll,
                                         wd2, wd20, w2tp, mxu, has_type_bias)
                dd2 = dd2 + dd2_m
                if dtb_d is None:
                    dtb_d = zf(1, F)

                extra = ()
                if not reflection_equiv:
                    c_js = c_j[sl]
                    prec_f, mc1, cz2, mc2 = _mlp_fwd(
                        c_i, c_js, d2s, d20s, lig_i, lig_js, cwd2, cwd20,
                        ctype_bias, cw2p, cb2, mxu)
                    rawc = _dot(mc2, cw3p, mxu).reshape(ti, s)
                    if tanh:
                        thc = jnp.tanh(rawc)
                        phic = thc * coords_range
                    else:
                        phic = rawc
                    u = [x_i[:, a:a + 1] - mean[:, a:a + 1]
                         for a in range(3)]
                    v = [x_j_t[a:a + 1, sl] - mean[:, a:a + 1]
                         for a in range(3)]
                    c = [u[1] * v[2] - u[2] * v[1],
                         u[2] * v[0] - u[0] * v[2],
                         u[0] * v[1] - u[1] * v[0]]
                    cn = jnp.sqrt(c[0] * c[0] + c[1] * c[1] + c[2] * c[2]
                                  + 1e-8)
                    cnorm = cn + nc
                    qc = adjs / cnorm
                    wc = phic * qc
                    dwc = g_i[:, 0:1] * c[0] + g_i[:, 1:2] * c[1] \
                        + g_i[:, 2:3] * c[2]
                    dphic = dwc * qc
                    dcnorm = -(wc / cnorm) * dwc
                    dc = [wc * g_i[:, a:a + 1] + dcnorm * c[a] / cn
                          for a in range(3)]
                    du = [v[1] * dc[2] - v[2] * dc[1],
                          v[2] * dc[0] - v[0] * dc[2],
                          v[0] * dc[1] - v[1] * dc[0]]
                    dv = [dc[1] * u[2] - dc[2] * u[1],
                          dc[2] * u[0] - dc[0] * u[2],
                          dc[0] * u[1] - dc[1] * u[0]]
                    dmean_rows_l = []
                    for a in range(3):
                        du_rows = jnp.sum(du[a], axis=1, keepdims=True)
                        dv_rows = jnp.sum(dv[a], axis=1, keepdims=True)
                        dxi_l[a] = dxi_l[a] + du_rows
                        dxcol_l[a] = dxcol_l[a] + _sum_axis0(dv[a])
                        dmean_rows_l.append(-(du_rows + dv_rows))
                    dmean_rows = jnp.concatenate(dmean_rows_l, axis=1)
                    if tanh:
                        drawc = dphic * (1.0 - thc * thc) * coords_range
                    else:
                        drawc = dphic
                    mc2_3 = mc2.reshape(ti, s, F)
                    dcw3_d = _sum_axis0(
                        (mc2_3 * drawc[:, :, None]).reshape(ti * s, F))
                    dmc2 = (drawc[:, :, None]
                            * cw3_row[None, :, :]).reshape(ti * s, F)
                    (dc_i_d, dccol_d, dcwd2_d, dcwd20_d, dctb_d, dcw2_d,
                     dcb2_d, dd2_c, dd20_c) = _mlp_bwd(
                        dmc2, prec_f, mc1, cz2, d2s, d20s, ll, cwd2, cwd20,
                        cw2tp, mxu, has_type_bias)
                    dd2 = dd2 + dd2_c
                    dd20 = dd20 + dd20_c
                    if dctb_d is None:
                        dctb_d = zf(1, F)
                    extra = (dc_i_d, dccol_d, dmean_rows, dcwd2_d,
                             dcwd20_d, dctb_d, dcw2_d, dcb2_d, dcw3_d)

                dxi2_l, dxcol2_l, dx0i_l, dx0col_l = _d2_to_x(
                    dd2, dd20, x_i, x_j_t, x0_i, x0_j_t, sl)
                dxi = jnp.concatenate(
                    [dxi_l[a] + dxi2_l[a] for a in range(3)], axis=1)
                dx0i = jnp.concatenate(dx0i_l, axis=1)
                dxcol3 = [dxcol_l[a] + dxcol2_l[a] for a in range(3)]
                return (da_i_d, dacol_d, dxi, dxcol3, dx0i, dx0col_l,
                        dwd2_d, dwd20_d, dtb_d, dw2_d, db2_d, dw3_d) + extra

            def accum_subs(preds, ops):
                zt = zeros_tile()
                da_i, dxi, dx0i = zt[0], zt[2], zt[4]
                dwd2_a, dwd20_a, dtb_a, dw2_a, db2_a, dw3_a = zt[6:12]
                if not reflection_equiv:
                    dc_i, dmean_rows = zt[12], zt[14]
                    dcwd2_a, dcwd20_a, dctb_a, dcw2_a, dcb2_a, dcw3_a = \
                        zt[15:21]
                acol_parts, xcol_parts, x0col_parts, ccol_parts = \
                    [], [], [], []
                for k in range(n_sub):
                    sl = slice(k * sub_j, (k + 1) * sub_j)

                    def zero_sub(s=sub_j):
                        z = [zf(ti, F), zf(1, s, F), zf(ti, 3),
                             [zf(1, s)] * 3, zf(ti, 3), [zf(1, s)] * 3,
                             zf(1, F), zf(1, F), zf(1, F), zf(F, F),
                             zf(1, F), zf(1, F)]
                        if not reflection_equiv:
                            z += [zf(ti, F), zf(1, s, F), zf(ti, 3),
                                  zf(1, F), zf(1, F), zf(1, F), zf(F, F),
                                  zf(1, F), zf(1, F)]
                        return tuple(z)

                    d = jax.lax.cond(preds[k],
                                     lambda sl=sl: compute_sub(sl, *ops),
                                     zero_sub)
                    da_i = da_i + d[0]
                    acol_parts.append(d[1])
                    dxi = dxi + d[2]
                    xcol_parts.append(d[3])
                    dx0i = dx0i + d[4]
                    x0col_parts.append(d[5])
                    dwd2_a = dwd2_a + d[6]
                    dwd20_a = dwd20_a + d[7]
                    dtb_a = dtb_a + d[8]
                    dw2_a = dw2_a + d[9]
                    db2_a = db2_a + d[10]
                    dw3_a = dw3_a + d[11]
                    if not reflection_equiv:
                        dc_i = dc_i + d[12]
                        ccol_parts.append(d[13])
                        dmean_rows = dmean_rows + d[14]
                        dcwd2_a = dcwd2_a + d[15]
                        dcwd20_a = dcwd20_a + d[16]
                        dctb_a = dctb_a + d[17]
                        dcw2_a = dcw2_a + d[18]
                        dcb2_a = dcb2_a + d[19]
                        dcw3_a = dcw3_a + d[20]
                cat = lambda ps: ps[0] if n_sub == 1 else jnp.concatenate(
                    ps, axis=1)
                cat_t = lambda ps: jnp.concatenate(
                    [jnp.concatenate([ps[k][a] for k in range(n_sub)],
                                     axis=1) if n_sub > 1 else ps[0][a]
                     for a in range(3)], axis=0)
                out = (da_i, cat(acol_parts), dxi, cat_t(xcol_parts),
                       dx0i, cat_t(x0col_parts), dwd2_a, dwd20_a, dtb_a,
                       dw2_a, db2_a, dw3_a)
                if not reflection_equiv:
                    out = out + (dc_i, cat(ccol_parts), dmean_rows,
                                 dcwd2_a, dcwd20_a, dctb_a, dcw2_a, dcb2_a,
                                 dcw3_a)
                return out

            if use_bits:
                word = bits_ref[0, 0, 0, j]

                def tile_work():
                    ops = loads()
                    preds = [
                        jnp.bitwise_and(
                            jax.lax.shift_right_logical(word, k), 1) != 0
                        for k in range(n_sub)]
                    return accum_subs(preds, ops)

                d = jax.lax.cond(word != 0, tile_work, zeros_tile)
            else:
                ops = loads()
                adj = ops[6]
                preds = [jnp.any(adj[:, k * sub_j:(k + 1) * sub_j] > 0)
                         for k in range(n_sub)]
                d = jax.lax.cond(jnp.any(adj > 0),
                                 lambda: accum_subs(preds, ops), zeros_tile)

            sl_col = pl.ds(pl.multiple_of(j * tj, tj), tj)
            da_col_ref[0, sl_col, :] = da_col_ref[0, sl_col, :] + d[1][0]
            dxc_ref[0, :, sl_col] = dxc_ref[0, :, sl_col] + d[3]
            dx0c_ref[0, :, sl_col] = dx0c_ref[0, :, sl_col] + d[5]
            dwd2_ref[...] = dwd2_ref[...] + d[6]
            dwd20_ref[...] = dwd20_ref[...] + d[7]
            dtb_ref[...] = dtb_ref[...] + d[8]
            dw2_ref[...] = dw2_ref[...] + d[9]
            db2_ref[...] = db2_ref[...] + d[10]
            dw3_ref[...] = dw3_ref[...] + d[11]
            if not reflection_equiv:
                dc_col_ref[0, sl_col, :] = dc_col_ref[0, sl_col, :] + d[13][0]
                dcwd2_ref[...] = dcwd2_ref[...] + d[15]
                dcwd20_ref[...] = dcwd20_ref[...] + d[16]
                dctb_ref[...] = dctb_ref[...] + d[17]
                dcw2_ref[...] = dcw2_ref[...] + d[18]
                dcb2_ref[...] = dcb2_ref[...] + d[19]
                dcw3_ref[...] = dcw3_ref[...] + d[20]
                return (carry[0] + d[0], carry[1] + d[2], carry[2] + d[4],
                        carry[3] + d[12], carry[4] + d[14])
            return (carry[0] + d[0], carry[1] + d[2], carry[2] + d[4])

        if reflection_equiv:
            carry = (zf(ti, F), zf(ti, 3), zf(ti, 3))
            da_i, dxi, dx0i = jax.lax.fori_loop(0, n_tiles_j, body, carry)
        else:
            carry = (zf(ti, F), zf(ti, 3), zf(ti, 3), zf(ti, F), zf(ti, 3))
            da_i, dxi, dx0i, dc_i, dmean_rows = jax.lax.fori_loop(
                0, n_tiles_j, body, carry)
            dc_row_ref[0] = dc_i
            dmean_ref[0] = dmean_ref[0] + _sum_axis0(dmean_rows)
        da_row_ref[0] = da_i
        dxr_ref[0] = dxi
        dx0r_ref[0] = dx0i

    return kernel


def coord_agg_bwd_pallas(
        g, a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
        w2, b2, w3, *, cutoffs, tanh, coords_range, norm_constant,
        normalization_factor, cross=None, graph_mean=None,
        tile_i=TILE_I, tile_j=TILE_J, sub_j=SUB_J, mxu_precision="float32",
        update_rows=None, d2_0=None, interpret=False):
    """Pallas backward of ``coord_update_agg_pallas``.

    Returns ``(main_cot, cross_cot, dmean, d2_0_cot)`` matching the forward
    custom-VJP operand structure."""
    B, N, F = a_row.shape
    n_row_tiles = N // tile_i
    if update_rows is not None:
        n_row_tiles = min(n_row_tiles, -(-int(update_rows) // tile_i))
    n_rows_out = n_row_tiles * tile_i
    reflection_equiv = cross is None

    def fold(ar, ac, tb):
        return fold_type_bias(ar, ac, is_lig, tb)

    (a_row_f, a_col_f, delta), fold_vjp = jax.vjp(
        fold, a_row, a_col, type_bias)
    has_tb = delta is not None
    delta_arr = delta if has_tb else jnp.zeros((F,), a_row.dtype)
    if not reflection_equiv:
        (c_row_f, c_col_f, c_delta), cfold_vjp = jax.vjp(
            fold, cross["a_row"], cross["a_col"], cross["type_bias"])
        c_delta_arr = c_delta if has_tb else jnp.zeros((F,), a_row.dtype)

    mxu = _PRECISIONS[mxu_precision]
    kernel = _make_coord_bwd_kernel(
        n_tiles_j=N // tile_j, tile_j=tile_j, cutoffs=cutoffs,
        has_type_bias=has_tb, tanh=tanh, coords_range=float(coords_range),
        reflection_equiv=reflection_equiv,
        norm_constant=float(norm_constant),
        inv_nf=1.0 / float(normalization_factor), sub_j=sub_j, mxu=mxu,
        use_bits=d2_0 is not None)

    full = lambda b, i, *_: (b, 0, 0)
    rowmap = lambda b, i, *_: (b, i, 0)
    bmap3 = lambda b, i, *_: (b, 0, 0)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda b, i, *_: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    row_spec_F = pl.BlockSpec((1, tile_i, F), rowmap,
                              memory_space=pltpu.VMEM)
    col_spec_F = pl.BlockSpec((1, N, F), full, memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, N, 3), full, memory_space=pltpu.VMEM)
    xt_spec = pl.BlockSpec((1, 3, N), full, memory_space=pltpu.VMEM)
    nrow_spec = pl.BlockSpec((1, N, 1), full, memory_space=pltpu.VMEM)
    ncol_spec = pl.BlockSpec((1, 1, N), full, memory_space=pltpu.VMEM)

    x_t = jnp.swapaxes(x, 1, 2)
    x0_t = jnp.swapaxes(x0, 1, 2)
    g_in = g[:, :n_rows_out, :].astype(jnp.float32)

    in_specs = [pl.BlockSpec((1, tile_i, 3), rowmap,
                             memory_space=pltpu.VMEM),
                row_spec_F, col_spec_F]
    args = [g_in, a_row_f, a_col_f]
    if not reflection_equiv:
        in_specs += [row_spec_F, col_spec_F]
        args += [c_row_f, c_col_f]
    in_specs += [x_spec, xt_spec, x_spec, xt_spec]
    args += [x, x_t, x0, x0_t]
    if not reflection_equiv:
        in_specs += [pl.BlockSpec((1, 1, 3), bmap3,
                                  memory_space=pltpu.VMEM)]
        args += [graph_mean.reshape(B, 1, 3)]
    in_specs += [nrow_spec, ncol_spec, nrow_spec, ncol_spec,
                 const2((1, F)), const2((1, F)), const2((1, F)),
                 const2((F, F)), const2((F, F)), const2((1, F)),
                 const2((F, 1)), const2((1, F))]
    args += [mask[..., None], mask[:, None, :],
             is_lig[..., None], is_lig[:, None, :],
             w_d2.reshape(1, F), w_d20.reshape(1, F),
             delta_arr.reshape(1, F), w2, jnp.swapaxes(w2, 0, 1),
             b2.reshape(1, F), w3, w3.reshape(1, F)]
    if not reflection_equiv:
        in_specs += [const2((1, F)), const2((1, F)), const2((1, F)),
                     const2((F, F)), const2((F, F)), const2((1, F)),
                     const2((F, 1)), const2((1, F))]
        args += [cross["w_d2"].reshape(1, F), cross["w_d20"].reshape(1, F),
                 c_delta_arr.reshape(1, F), cross["w2"],
                 jnp.swapaxes(cross["w2"], 0, 1),
                 cross["b2"].reshape(1, F), cross["w3"],
                 cross["w3"].reshape(1, F)]

    sd = jax.ShapeDtypeStruct
    out_shapes = [sd((B, n_rows_out, F), jnp.float32),
                  sd((B, N, F), jnp.float32)]
    out_specs = [row_spec_F,
                 pl.BlockSpec((1, N, F), bmap3, memory_space=pltpu.VMEM)]
    if not reflection_equiv:
        out_shapes += [sd((B, n_rows_out, F), jnp.float32),
                       sd((B, N, F), jnp.float32)]
        out_specs += [row_spec_F,
                      pl.BlockSpec((1, N, F), bmap3,
                                   memory_space=pltpu.VMEM)]
    out_shapes += [sd((B, n_rows_out, 3), jnp.float32),
                   sd((B, 3, N), jnp.float32),
                   sd((B, n_rows_out, 3), jnp.float32),
                   sd((B, 3, N), jnp.float32)]
    out_specs += [pl.BlockSpec((1, tile_i, 3), rowmap,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3, N), bmap3, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_i, 3), rowmap,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3, N), bmap3, memory_space=pltpu.VMEM)]
    if not reflection_equiv:
        out_shapes += [sd((B, 1, 3), jnp.float32)]
        out_specs += [pl.BlockSpec((1, 1, 3), bmap3,
                                   memory_space=pltpu.VMEM)]
    out_shapes += [sd((1, F), jnp.float32)] * 3 \
        + [sd((F, F), jnp.float32)] + [sd((1, F), jnp.float32)] * 2
    out_specs += [const2((1, F))] * 3 + [const2((F, F))] \
        + [const2((1, F))] * 2
    if not reflection_equiv:
        out_shapes += [sd((1, F), jnp.float32)] * 3 \
            + [sd((F, F), jnp.float32)] + [sd((1, F), jnp.float32)] * 2
        out_specs += [const2((1, F))] * 3 + [const2((F, F))] \
            + [const2((1, F))] * 2

    if d2_0 is not None:
        bits = _block_activity_bits(
            d2_0, mask, mask, is_lig, cutoffs, tile_i,
            min(sub_j, tile_j), n_row_tiles, tile_j=tile_j)
        bits4, bits_spec = _bits_smem_operand(bits)
        outs = pl.pallas_call(
            kernel,
            grid=(B, n_row_tiles),
            in_specs=[bits_spec] + in_specs,
            out_specs=out_specs,
            out_shape=out_shapes, interpret=interpret,
        )(bits4, *args)
    else:
        outs = pl.pallas_call(
            kernel, grid=(B, n_row_tiles), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shapes, interpret=interpret,
        )(*args)

    outs = list(outs)
    da_row_k = outs.pop(0)
    da_col_k = outs.pop(0)
    if not reflection_equiv:
        dc_row_k = outs.pop(0)
        dc_col_k = outs.pop(0)
    dxr = outs.pop(0)
    dxc = outs.pop(0)
    dx0r = outs.pop(0)
    dx0c = outs.pop(0)
    if not reflection_equiv:
        dmean = outs.pop(0)
    dwd2, dwd20, dtb, dw2, db2, dw3 = outs[:6]
    if not reflection_equiv:
        dcwd2, dcwd20, dctb, dcw2, dcb2, dcw3 = outs[6:12]

    pad_rows = lambda t: (jnp.pad(t, ((0, 0), (0, N - n_rows_out), (0, 0)))
                          if n_rows_out < N else t)
    dx = pad_rows(dxr) + jnp.swapaxes(dxc, 1, 2)
    dx0 = pad_rows(dx0r) + jnp.swapaxes(dx0c, 1, 2)
    da_row_u, da_col_u, dtb_u = fold_vjp(
        (pad_rows(da_row_k), da_col_k,
         dtb.reshape(F) if has_tb else None))
    main_cot = (da_row_u, da_col_u, dx, dx0,
                jnp.zeros_like(mask), jnp.zeros_like(is_lig),
                dwd2.reshape(F), dwd20.reshape(F), dtb_u,
                dw2, db2.reshape(F), dw3.reshape(F, 1))
    cross_cot = None
    mean_cot = None
    if not reflection_equiv:
        dc_row_u, dc_col_u, dctb_u = cfold_vjp(
            (pad_rows(dc_row_k), dc_col_k,
             dctb.reshape(F) if has_tb else None))
        cross_cot = dict(
            a_row=dc_row_u, a_col=dc_col_u, w_d2=dcwd2.reshape(F),
            w_d20=dcwd20.reshape(F), type_bias=dctb_u, w2=dcw2,
            b2=dcb2.reshape(F), w3=dcw3.reshape(F, 1))
        mean_cot = dmean.reshape(B, 3)
    return main_cot, cross_cot, mean_cot


def coord_agg_bwd(g, main, cross, graph_mean, d2_0, *, cutoffs, tanh,
                  coords_range, norm_constant, normalization_factor,
                  tile_i, tile_j, sub_j, mxu_precision, update_rows,
                  interpret):
    """Cotangent of ``(main, cross, graph_mean, d2_0)`` for the coordinate
    custom VJP."""
    main_cot, cross_cot, mean_cot = coord_agg_bwd_pallas(
        g, *main, cutoffs=cutoffs, tanh=tanh, coords_range=coords_range,
        norm_constant=norm_constant,
        normalization_factor=normalization_factor, cross=cross,
        graph_mean=graph_mean, tile_i=tile_i, tile_j=tile_j, sub_j=sub_j,
        mxu_precision=mxu_precision, update_rows=update_rows, d2_0=d2_0,
        interpret=interpret)
    d2_0_cot = None if d2_0 is None else jnp.zeros_like(d2_0)
    return (main_cot, cross_cot, mean_cot, d2_0_cot)
