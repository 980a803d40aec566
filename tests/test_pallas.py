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


@pytest.mark.parametrize("cutoffs", [(None, None, None), (None, 5.0, 5.0)])
@pytest.mark.parametrize("attention", [True, False])
def test_gcl_agg_matches_xla(cutoffs, attention):
    ops = make_inputs(jax.random.PRNGKey(0))
    kw = dict(cutoffs=cutoffs, attention=attention, normalization_factor=100.0)
    ref = ep.gcl_message_agg_xla(*ops, **kw)
    got = ep.gcl_message_agg(*ops, **kw, impl="pallas", interpret=True)
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
