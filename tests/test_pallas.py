"""Fused Pallas kernels vs their dense-XLA twins (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsbdd_tpu.ops import egnn_pallas as ep

B, N, F = 2, 256, 32


def make_inputs(key, with_type_bias=True):
    ks = jax.random.split(key, 12)
    a_row = jax.random.normal(ks[0], (B, N, F)) * 0.3
    a_col = jax.random.normal(ks[1], (B, N, F)) * 0.3
    x = jax.random.normal(ks[2], (B, N, 3)) * 3.0
    x0 = x + 0.1 * jax.random.normal(ks[3], (B, N, 3))
    mask = (jax.random.uniform(ks[4], (B, N)) > 0.2).astype(jnp.float32)
    is_lig = (jax.random.uniform(ks[5], (B, N)) > 0.7).astype(jnp.float32)
    w_d2 = jax.random.normal(ks[6], (F,)) * 0.1
    w_d20 = jax.random.normal(ks[7], (F,)) * 0.1
    type_bias = jax.random.normal(ks[8], (2, 2, F)) * 0.2 \
        if with_type_bias else None
    w2 = jax.random.normal(ks[9], (F, F)) * 0.3
    b2 = jax.random.normal(ks[10], (F,)) * 0.1
    w_att = jax.random.normal(ks[11], (F, 1)) * 0.3
    b_att = jnp.array([0.1])
    return (a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
            w2, b2, w_att, b_att)


@pytest.mark.quick
@pytest.mark.parametrize("cutoffs", [(None, None, None), (None, 5.0, 5.0)])
@pytest.mark.parametrize("attention", [True, False])
def test_gcl_agg_matches_xla(cutoffs, attention):
    ops = make_inputs(jax.random.PRNGKey(0))
    kw = dict(cutoffs=cutoffs, attention=attention, normalization_factor=100.0)
    ref = ep.gcl_message_agg_xla(*ops, **kw)
    got = ep.gcl_message_agg(*ops, **kw, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("tile_j", [64, 128])
def test_gcl_agg_bits_nondefault_tile_j(tile_j):
    """Regression: the block-activity bit packing must match the kernel's
    tile_j — with the packing hard-coded to 128, tile_j=64 read the wrong
    int32 word per column tile and silently skipped active blocks."""
    ops = make_inputs(jax.random.PRNGKey(4))
    x0 = ops[3]
    d2_0 = jnp.sum((x0[:, :, None, :] - x0[:, None, :, :]) ** 2, -1)
    kw = dict(cutoffs=(None, 4.0, 4.0), attention=True,
              normalization_factor=100.0)
    ref = ep.gcl_message_agg_xla(*ops, **kw)
    got = ep.gcl_message_agg(*ops, **kw, impl="pallas", interpret=True,
                             tile_j=tile_j, d2_0=d2_0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_gcl_agg_no_type_bias():
    ops = make_inputs(jax.random.PRNGKey(1), with_type_bias=False)
    kw = dict(cutoffs=(None, 4.0, 6.0), attention=True,
              normalization_factor=100.0)
    ref = ep.gcl_message_agg_xla(*ops, **kw)
    got = ep.gcl_message_agg(*ops, **kw, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_gcl_agg_gradients_match():
    ops = make_inputs(jax.random.PRNGKey(2))
    kw = dict(cutoffs=(None, None, None), attention=True,
              normalization_factor=100.0)

    def loss_pallas(a_row, w2):
        o = (a_row,) + ops[1:9] + (w2,) + ops[10:]
        return jnp.sum(ep.gcl_message_agg(*o, **kw, impl="pallas",
                                          interpret=True) ** 2)

    def loss_xla(a_row, w2):
        o = (a_row,) + ops[1:9] + (w2,) + ops[10:]
        return jnp.sum(ep.gcl_message_agg_xla(*o, **kw) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1))(ops[0], ops[9])
    g_x = jax.grad(loss_xla, argnums=(0, 1))(ops[0], ops[9])
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def coord_inputs(key, with_cross):
    ks = jax.random.split(key, 4)
    (a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
     w2, b2, _, _) = make_inputs(ks[0])
    w3 = jax.random.normal(ks[1], (F, 1)) * 0.05
    cross = None
    graph_mean = None
    if with_cross:
        (ca_row, ca_col, _, _, _, _, cw_d2, cw_d20, ctype_bias,
         cw2, cb2, _, _) = make_inputs(ks[2])
        cross = dict(a_row=ca_row, a_col=ca_col, w_d2=cw_d2, w_d20=cw_d20,
                     type_bias=ctype_bias, w2=cw2, b2=cb2,
                     w3=jax.random.normal(ks[3], (F, 1)) * 0.05)
        graph_mean = jnp.sum(x * mask[..., None], 1) \
            / jnp.sum(mask, 1)[..., None]
    main = (a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias, w2,
            b2, w3)
    return main, cross, graph_mean


@pytest.mark.quick
@pytest.mark.parametrize("with_cross", [False, True])
@pytest.mark.parametrize("tanh", [True, False])
def test_coord_agg_matches_xla(with_cross, tanh):
    main, cross, graph_mean = coord_inputs(jax.random.PRNGKey(3), with_cross)
    kw = dict(cutoffs=(None, 5.0, 5.0), tanh=tanh, coords_range=2.5,
              norm_constant=1.0, normalization_factor=100.0)
    ref = ep.coord_update_agg_xla(*main, **kw, cross=cross,
                                  graph_mean=graph_mean)
    got = ep.coord_update_agg(*main, **kw, cross=cross,
                              graph_mean=graph_mean, impl="pallas",
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_coord_agg_gradients_match():
    main, cross, graph_mean = coord_inputs(jax.random.PRNGKey(4), True)
    kw = dict(cutoffs=(None, None, None), tanh=True, coords_range=2.5,
              norm_constant=1.0, normalization_factor=100.0)

    def loss(x, impl):
        m = main[:2] + (x,) + main[3:]
        return jnp.sum(ep.coord_update_agg(
            *m, **kw, cross=cross, graph_mean=graph_mean, impl=impl,
            interpret=True) ** 2)

    g_p = jax.grad(functools.partial(loss, impl="pallas"))(main[2])
    g_x = jax.grad(functools.partial(loss, impl="xla"))(main[2])
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=1e-4, rtol=1e-3)


def test_dynamics_pallas_matches_xla():
    """Full EGNNDynamics forward: fused path == dense path with shared params."""
    from diffsbdd_tpu.models.dynamics import EGNNDynamics

    key = jax.random.PRNGKey(0)
    Bd, NL, NP, A, R = 2, 6, 11, 4, 5
    ks = jax.random.split(key, 5)
    m_l = jnp.ones((Bd, NL)).at[0, -2:].set(0.0)
    m_p = jnp.ones((Bd, NP)).at[1, -3:].set(0.0)
    xh_lig = jax.random.normal(ks[0], (Bd, NL, 3 + A)) * m_l[..., None]
    xh_pkt = jax.random.normal(ks[1], (Bd, NP, 3 + R)) * m_p[..., None]
    t = jnp.full((Bd, 1), 0.3)

    common = dict(atom_nf=A, residue_nf=R, joint_nf=8, hidden_nf=16,
                  n_layers=2, attention=True, tanh=True, inv_sublayers=1,
                  norm_constant=1.0, update_pocket_coords=False,
                  reflection_equivariant=False, edge_embedding_dim=4,
                  edge_cutoff_pocket=5.0, edge_cutoff_interaction=7.0)
    dyn_x = EGNNDynamics(**common, impl="xla")
    dyn_p = EGNNDynamics(**common, impl="pallas", interpret=True,
                         kernel_tile=8)  # tiny tile so the test pads little

    params = dyn_x.init(jax.random.PRNGKey(1), xh_lig, xh_pkt, t, m_l, m_p)
    e_l_x, e_p_x = dyn_x.apply(params, xh_lig, xh_pkt, t, m_l, m_p)
    e_l_p, e_p_p = dyn_p.apply(params, xh_lig, xh_pkt, t, m_l, m_p)

    np.testing.assert_allclose(np.asarray(e_l_p), np.asarray(e_l_x),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(e_p_p), np.asarray(e_p_x),
                               atol=3e-5)


@pytest.mark.parametrize("update_pocket", [False, True])
def test_dynamics_block_fused_matches_xla(update_pocket):
    """block_fuse=True (one phased pallas_call per block) == dense path."""
    from diffsbdd_tpu.models.dynamics import EGNNDynamics

    key = jax.random.PRNGKey(5)
    Bd, NL, NP, A, R = 2, 6, 11, 4, 5
    ks = jax.random.split(key, 5)
    m_l = jnp.ones((Bd, NL)).at[0, -2:].set(0.0)
    m_p = jnp.ones((Bd, NP)).at[1, -3:].set(0.0)
    xh_lig = jax.random.normal(ks[0], (Bd, NL, 3 + A)) * m_l[..., None]
    xh_pkt = jax.random.normal(ks[1], (Bd, NP, 3 + R)) * m_p[..., None]
    t = jnp.full((Bd, 1), 0.3)

    common = dict(atom_nf=A, residue_nf=R, joint_nf=8, hidden_nf=16,
                  n_layers=2, attention=True, tanh=True, inv_sublayers=1,
                  norm_constant=1.0, update_pocket_coords=update_pocket,
                  reflection_equivariant=False, edge_embedding_dim=4,
                  edge_cutoff_pocket=5.0, edge_cutoff_interaction=7.0)
    dyn_x = EGNNDynamics(**common, impl="xla")
    dyn_p = EGNNDynamics(**common, impl="pallas", interpret=True,
                         kernel_tile=8)

    params = dyn_x.init(jax.random.PRNGKey(1), xh_lig, xh_pkt, t, m_l, m_p)
    e_l_x, e_p_x = dyn_x.apply(params, xh_lig, xh_pkt, t, m_l, m_p)
    e_l_b, e_p_b = dyn_p.apply(params, xh_lig, xh_pkt, t, m_l, m_p,
                               block_fuse=True)

    np.testing.assert_allclose(np.asarray(e_l_b), np.asarray(e_l_x),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(e_p_b), np.asarray(e_p_x),
                               atol=3e-5)


def test_dynamics_block_fused_shared_pocket():
    """shared_pocket + block_fuse: block 0 keeps the factorized split path,
    later blocks run the phased block kernel; must equal the dense path on
    the replicated-pocket layout."""
    from diffsbdd_tpu.models.dynamics import EGNNDynamics

    key = jax.random.PRNGKey(6)
    Bd, NL, NP, A, R = 3, 6, 11, 4, 5
    ks = jax.random.split(key, 5)
    m_l = jnp.ones((Bd, NL)).at[0, -2:].set(0.0)
    m_p = jnp.broadcast_to(
        jnp.ones((1, NP)).at[0, -3:].set(0.0), (Bd, NP))
    xh_lig = jax.random.normal(ks[0], (Bd, NL, 3 + A)) * m_l[..., None]
    xh_pkt = jnp.broadcast_to(
        jax.random.normal(ks[1], (1, NP, 3 + R)), (Bd, NP, 3 + R)) \
        * m_p[..., None]
    t = jnp.full((Bd, 1), 0.3)

    common = dict(atom_nf=A, residue_nf=R, joint_nf=8, hidden_nf=16,
                  n_layers=2, attention=True, tanh=True, inv_sublayers=1,
                  norm_constant=1.0, update_pocket_coords=False,
                  reflection_equivariant=False, edge_embedding_dim=4,
                  edge_cutoff_pocket=5.0, edge_cutoff_interaction=7.0)
    dyn_x = EGNNDynamics(**common, impl="xla")
    dyn_p = EGNNDynamics(**common, impl="pallas", interpret=True,
                         kernel_tile=8)
    params = dyn_x.init(jax.random.PRNGKey(1), xh_lig, xh_pkt, t, m_l, m_p)
    e_l_x, e_p_x = dyn_x.apply(params, xh_lig, xh_pkt, t, m_l, m_p)
    e_l_b, e_p_b = dyn_p.apply(params, xh_lig, xh_pkt, t, m_l, m_p,
                               shared_pocket=True, block_fuse=True)
    np.testing.assert_allclose(np.asarray(e_l_b), np.asarray(e_l_x),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(e_p_b), np.asarray(e_p_x),
                               atol=3e-5)


def test_dynamics_pallas_gradients():
    """Gradients flow through the fused path (custom VJP, XLA recompute)."""
    from diffsbdd_tpu.models.dynamics import EGNNDynamics

    key = jax.random.PRNGKey(2)
    Bd, NL, NP, A, R = 1, 4, 6, 3, 4
    ks = jax.random.split(key, 3)
    m_l = jnp.ones((Bd, NL))
    m_p = jnp.ones((Bd, NP))
    xh_lig = jax.random.normal(ks[0], (Bd, NL, 3 + A))
    xh_pkt = jax.random.normal(ks[1], (Bd, NP, 3 + R))
    t = jnp.full((Bd, 1), 0.3)

    common = dict(atom_nf=A, residue_nf=R, joint_nf=8, hidden_nf=16,
                  n_layers=1, attention=True, tanh=True, inv_sublayers=1,
                  norm_constant=1.0, update_pocket_coords=False)
    dyn_x = EGNNDynamics(**common, impl="xla")
    dyn_p = EGNNDynamics(**common, impl="pallas", interpret=True,
                         kernel_tile=8)
    params = dyn_x.init(jax.random.PRNGKey(3), xh_lig, xh_pkt, t, m_l, m_p)

    def loss(p, dyn):
        e_l, e_p = dyn.apply(p, xh_lig, xh_pkt, t, m_l, m_p)
        return jnp.sum(e_l ** 2) + jnp.sum(e_p ** 2)

    g_x = jax.grad(lambda p: loss(p, dyn_x))(params)
    g_p = jax.grad(lambda p: loss(p, dyn_p))(params)
    flat_x = jax.tree_util.tree_leaves(g_x)
    flat_p = jax.tree_util.tree_leaves(g_p)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-3)


def test_auto_impl_resolution():
    """'auto' -> XLA on CPU, and for configs the kernels don't support."""
    from diffsbdd_tpu.models.dynamics import EGNNDynamics

    base = dict(atom_nf=4, residue_nf=5, joint_nf=8, hidden_nf=16)
    assert EGNNDynamics(**base, impl="auto")._resolve_impl() == "xla"
    assert EGNNDynamics(**base, impl="xla")._resolve_impl() == "xla"
    assert EGNNDynamics(**base, impl="pallas")._resolve_impl() == "pallas"
    assert EGNNDynamics(**base, impl="auto",
                        sin_embedding=True)._resolve_impl() == "xla"
    assert EGNNDynamics(**base, impl="auto",
                        mode="gnn_dynamics")._resolve_impl() == "xla"
    assert EGNNDynamics(**base, impl="auto",
                        aggregation_method="mean")._resolve_impl() == "xla"


@pytest.mark.parametrize("precision,atol", [("float32_x3", 5e-4),
                                            ("bfloat16", 5e-2)])
def test_gcl_agg_reduced_precision(precision, atol):
    """The bf16-split (x3) and 1-pass bf16 dot paths stay close to exact f32
    (on TPU hardware x3 measures 3.8e-6 max eps deviation at the flagship
    shape; interpret-mode emulation is looser)."""
    ops = make_inputs(jax.random.PRNGKey(3))
    kw = dict(cutoffs=(None, 5.0, 5.0), attention=True,
              normalization_factor=100.0)
    ref = ep.gcl_message_agg_xla(*ops, **kw)
    got = ep.gcl_message_agg(*ops, **kw, impl="pallas", interpret=True,
                             mxu_precision=precision)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=atol * scale)


def test_fold_type_bias_equivalence():
    """Folded projections + rank-1 pair term == full (2,2,F) table."""
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    a_row = jax.random.normal(ks[0], (1, 8, 4))
    a_col = jax.random.normal(ks[1], (1, 8, 4))
    is_lig = (jax.random.uniform(ks[2], (1, 8)) > 0.5).astype(jnp.float32)
    tb = jax.random.normal(ks[3], (2, 2, 4))
    ar, ac, delta = ep.fold_type_bias(a_row, a_col, is_lig, tb)
    pre_folded = ar[:, :, None, :] + ac[:, None, :, :] \
        + (is_lig[:, :, None] * is_lig[:, None, :])[..., None] * delta
    li = is_lig[:, :, None, None]
    lj = is_lig[:, None, :, None]
    pre_full = a_row[:, :, None, :] + a_col[:, None, :, :] \
        + (1 - li) * (1 - lj) * tb[0, 0] + (1 - li) * lj * tb[0, 1] \
        + li * (1 - lj) * tb[1, 0] + li * lj * tb[1, 1]
    np.testing.assert_allclose(np.asarray(pre_folded), np.asarray(pre_full),
                               atol=1e-6)


def test_coord_agg_update_rows_truncation():
    """With update_rows=R, rows < R match the full kernel and rows >= the
    covering tile are exact zeros (conditional models discard them)."""
    (a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias,
     w2, b2, w_att, b_att) = make_inputs(jax.random.PRNGKey(6))
    w3 = jax.random.normal(jax.random.PRNGKey(7), (F, 1)) * 0.3
    kw = dict(cutoffs=(None, 5.0, 5.0), tanh=True, coords_range=15.0,
              norm_constant=1.0, normalization_factor=100.0)
    full = ep.coord_update_agg(
        a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias, w2, b2,
        w3, impl="pallas", interpret=True, **kw)
    R = 24  # covered by 2 x tile_i=16 -> 32 rows
    trunc = ep.coord_update_agg(
        a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias, w2, b2,
        w3, impl="pallas", interpret=True, update_rows=R, **kw)
    np.testing.assert_allclose(np.asarray(trunc[:, :32]),
                               np.asarray(full[:, :32]), atol=1e-6)
    assert float(jnp.abs(trunc[:, 32:]).max()) == 0.0
    # XLA twin agrees with the truncation semantics
    twin = ep.coord_update_agg_xla(
        a_row, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias, w2, b2,
        w3, update_rows=R, **kw)
    np.testing.assert_allclose(np.asarray(trunc), np.asarray(twin),
                               atol=2e-5)
    # gradients flow through the truncated path
    def loss(ar):
        out = ep.coord_update_agg(
            ar, a_col, x, x0, mask, is_lig, w_d2, w_d20, type_bias, w2, b2,
            w3, impl="pallas", interpret=True, update_rows=R, **kw)
        return jnp.sum(out ** 2)
    g = jax.grad(loss)(a_row)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_shared_pocket_factorization():
    """shared_pocket=True (B=1 pocket-pocket block + per-sample ligand
    parts) must equal the plain fused forward on the replicated-pocket
    sampling layout — including per-sample rigid translations of the system,
    which the conditional sampler's ligand-CoM frame introduces (pairwise
    distances are translation-invariant, so the pocket block stays
    batch-invariant)."""
    from diffsbdd_tpu.models.dynamics import EGNNDynamics

    key = jax.random.PRNGKey(7)
    Bd, NL, NP, A, R = 3, 6, 11, 4, 5
    ks = jax.random.split(key, 4)
    m_l = jnp.ones((Bd, NL)).at[0, -2:].set(0.0)  # per-sample ligand sizes
    m_p = jnp.ones((Bd, NP)).at[:, -3:].set(0.0)  # same pocket mask everywhere
    xh_lig = jax.random.normal(ks[0], (Bd, NL, 3 + A)) * m_l[..., None]
    one_pocket = jax.random.normal(ks[1], (1, NP, 3 + R)) * m_p[:1, ..., None]
    xh_pkt = jnp.broadcast_to(one_pocket, (Bd, NP, 3 + R))
    # per-sample translation of ligand+pocket (the ligand-CoM frame shift)
    shift = jax.random.normal(ks[2], (Bd, 1, 3)) * 4.0
    xh_lig = xh_lig.at[..., :3].add(shift * m_l[..., None])
    xh_pkt = xh_pkt.at[..., :3].add(shift * m_p[..., None])
    t = jnp.full((Bd, 1), 0.4)

    common = dict(atom_nf=A, residue_nf=R, joint_nf=8, hidden_nf=16,
                  n_layers=2, attention=True, tanh=True, inv_sublayers=1,
                  norm_constant=1.0, update_pocket_coords=False,
                  reflection_equivariant=False, edge_embedding_dim=4,
                  edge_cutoff_pocket=5.0, edge_cutoff_interaction=7.0)
    dyn = EGNNDynamics(**common, impl="pallas", interpret=True,
                       kernel_tile=8)
    params = dyn.init(jax.random.PRNGKey(8), xh_lig, xh_pkt, t, m_l, m_p)

    e_l0, e_p0 = dyn.apply(params, xh_lig, xh_pkt, t, m_l, m_p)
    e_l1, e_p1 = dyn.apply(params, xh_lig, xh_pkt, t, m_l, m_p,
                           shared_pocket=True)
    np.testing.assert_allclose(np.asarray(e_l1), np.asarray(e_l0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(e_p1), np.asarray(e_p0), atol=2e-5)
