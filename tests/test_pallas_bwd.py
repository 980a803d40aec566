"""Fused Pallas backward kernels vs autodiff of the dense-XLA mirrors.

The forward kernels' custom VJP can run its backward either through the
dense mirror (``bwd_impl='xla'``) or the fused backward kernels
(``bwd_impl='pallas'``, egnn_pallas_bwd.py).  These tests pin the two
implementations together, gradient-by-gradient, across the feature matrix
the models use (attention, edge-type table, activity bits, row truncation,
column masks, SE(3) cross term, tanh clamping).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsbdd_tpu.ops import egnn_pallas as ep
from tests.test_pallas import make_inputs, coord_inputs, B, N, F


def _d2_0_of(x0):
    return jnp.sum((x0[:, :, None, :] - x0[:, None, :, :]) ** 2, -1)


def _compare(gp, gx, atol=1e-4, rtol=1e-3):
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=atol, rtol=rtol)


@pytest.mark.parametrize(
    "cutoffs,attention,with_tb,use_bits,update_rows,col_mask_on", [
        ((None, None, None), True, True, True, None, False),
        ((None, 5.0, 5.0), True, True, True, None, False),
        ((None, 5.0, 5.0), False, True, False, None, False),
        ((None, 5.0, 5.0), True, False, True, 40, False),
        ((None, 4.0, 6.0), False, False, False, 40, True),
    ])
def test_gcl_bwd_matches_mirror(cutoffs, attention, with_tb, use_bits,
                                update_rows, col_mask_on):
    ops = list(make_inputs(jax.random.PRNGKey(0), with_type_bias=with_tb))
    if not attention:
        ops[11] = ops[12] = None
    d2_0 = _d2_0_of(ops[3]) if use_bits else None
    col_mask = ((jax.random.uniform(jax.random.PRNGKey(9), (B, N)) > 0.3)
                .astype(jnp.float32) if col_mask_on else None)
    kw = dict(cutoffs=cutoffs, attention=attention,
              normalization_factor=100.0, update_rows=update_rows,
              col_mask=col_mask)
    diff_idx = sorted([0, 1, 2, 3, 6, 7, 9, 10]
                      + ([8] if with_tb else [])
                      + ([11, 12] if attention else []))

    def loss(impl, *dargs):
        full = list(ops)
        for i, v in zip(diff_idx, dargs):
            full[i] = v
        if impl == "xla":
            return jnp.sum(ep.gcl_message_agg_xla(*full, **kw) ** 2)
        return jnp.sum(ep.gcl_message_agg(
            *full, **kw, impl="pallas", bwd_impl="pallas", d2_0=d2_0,
            interpret=True) ** 2)

    dargs = [ops[i] for i in diff_idx]
    ax = tuple(range(len(dargs)))
    gx = jax.grad(functools.partial(loss, "xla"), argnums=ax)(*dargs)
    gp = jax.grad(functools.partial(loss, "pallas"), argnums=ax)(*dargs)
    _compare(gp, gx)


@pytest.mark.parametrize("with_cross,tanh,use_bits,update_rows", [
    (False, True, True, None),
    (True, True, True, None),
    (True, False, False, None),
    (True, True, True, 40),
])
def test_coord_bwd_matches_mirror(with_cross, tanh, use_bits, update_rows):
    main, cross, graph_mean = coord_inputs(jax.random.PRNGKey(3), with_cross)
    d2_0 = _d2_0_of(main[3]) if use_bits else None
    kw = dict(cutoffs=(None, 5.0, 5.0), tanh=tanh, coords_range=2.5,
              norm_constant=1.0, normalization_factor=100.0,
              update_rows=update_rows)
    mi = [0, 1, 2, 3, 6, 7, 8, 9, 10, 11]
    ck = ["a_row", "a_col", "w_d2", "w_d20", "type_bias", "w2", "b2", "w3"]

    def loss(impl, margs, cargs):
        m = list(main)
        for i, v in zip(mi, margs):
            m[i] = v
        c = None
        if with_cross:
            c = dict(cross)
            for k, v in zip(ck, cargs):
                c[k] = v
        if impl == "xla":
            return jnp.sum(ep.coord_update_agg_xla(
                *m, **kw, cross=c, graph_mean=graph_mean) ** 2)
        return jnp.sum(ep.coord_update_agg(
            *m, **kw, cross=c, graph_mean=graph_mean, impl="pallas",
            bwd_impl="pallas", d2_0=d2_0, interpret=True) ** 2)

    margs = [main[i] for i in mi]
    cargs = [cross[k] for k in ck] if with_cross else []
    gx = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1))(
        margs, cargs)
    gp = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1))(
        margs, cargs)
    _compare(gp, gx)


def test_coord_bwd_graph_mean_cotangent():
    """The SE(3) cross term's graph-mean cotangent flows back through
    masked_graph_mean (outer autodiff), matching the mirror."""
    main, cross, graph_mean = coord_inputs(jax.random.PRNGKey(5), True)
    kw = dict(cutoffs=(None, None, None), tanh=True, coords_range=2.5,
              norm_constant=1.0, normalization_factor=100.0)

    def loss(impl, gm):
        f = (ep.coord_update_agg_xla if impl == "xla"
             else functools.partial(ep.coord_update_agg, impl="pallas",
                                    bwd_impl="pallas", interpret=True))
        return jnp.sum(f(*main, **kw, cross=cross, graph_mean=gm) ** 2)

    gx = jax.grad(functools.partial(loss, "xla"))(graph_mean)
    gp = jax.grad(functools.partial(loss, "pallas"))(graph_mean)
    _compare(gp, gx)


def test_dynamics_pallas_bwd_gradients():
    """Full EGNNDynamics: fused forward + fused backward == dense autodiff."""
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
                  norm_constant=1.0, update_pocket_coords=False,
                  reflection_equivariant=False, edge_embedding_dim=4,
                  edge_cutoff_pocket=5.0, edge_cutoff_interaction=7.0)
    dyn_x = EGNNDynamics(**common, impl="xla")
    dyn_p = EGNNDynamics(**common, impl="pallas", interpret=True,
                         kernel_tile=8, kernel_bwd="pallas")
    params = dyn_x.init(jax.random.PRNGKey(3), xh_lig, xh_pkt, t, m_l, m_p)

    def loss(p, dyn):
        e_l, e_p = dyn.apply(p, xh_lig, xh_pkt, t, m_l, m_p)
        return jnp.sum(e_l ** 2) + jnp.sum(e_p ** 2)

    g_x = jax.grad(lambda p: loss(p, dyn_x))(params)
    g_p = jax.grad(lambda p: loss(p, dyn_p))(params)
    _compare(g_p, g_x)


def test_gcl_bwd_precision_override():
    """``bwd_mxu_precision='bfloat16'`` keeps the forward tier while the
    backward kernels drop to 1-pass bf16 dots: gradients must stay within
    bf16-rounding distance of the exact mirror (training-noise-irrelevant),
    NOT bit-equal."""
    ops = list(make_inputs(jax.random.PRNGKey(7)))
    d2_0 = _d2_0_of(ops[3])
    kw = dict(cutoffs=(None, 5.0, 5.0), attention=True,
              normalization_factor=100.0)

    def loss(impl, a_row, w2):
        full = list(ops)
        full[0], full[9] = a_row, w2
        if impl == "xla":
            return jnp.sum(ep.gcl_message_agg_xla(*full, **kw) ** 2)
        return jnp.sum(ep.gcl_message_agg(
            *full, **kw, impl="pallas", bwd_impl="pallas", d2_0=d2_0,
            bwd_mxu_precision="bfloat16", interpret=True) ** 2)

    gx = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1))(
        ops[0], ops[9])
    gp = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1))(
        ops[0], ops[9])
    for a, b in zip(gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 3e-2  # bf16-grade, not garbage
        # direction must agree: cosine similarity ~1
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999


def test_coord_bwd_precision_override():
    main, cross, graph_mean = coord_inputs(jax.random.PRNGKey(8), True)
    d2_0 = _d2_0_of(main[3])
    kw = dict(cutoffs=(None, 5.0, 5.0), tanh=True, coords_range=2.5,
              norm_constant=1.0, normalization_factor=100.0)

    def loss(impl, a_row, w2):
        m = list(main)
        m[0], m[9] = a_row, w2
        if impl == "xla":
            return jnp.sum(ep.coord_update_agg_xla(
                *m, **kw, cross=cross, graph_mean=graph_mean) ** 2)
        return jnp.sum(ep.coord_update_agg(
            *m, **kw, cross=cross, graph_mean=graph_mean, impl="pallas",
            bwd_impl="pallas", d2_0=d2_0, bwd_mxu_precision="bfloat16",
            interpret=True) ** 2)

    gx = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1))(
        main[0], main[9])
    gp = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1))(
        main[0], main[9])
    for a, b in zip(gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 3e-2
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999
