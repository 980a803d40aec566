"""Block-fused kernel (GCL + node MLP + coord update in one pallas_call):
interpret-mode values and VJP plumbing vs the dense XLA mirror."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsbdd_tpu.ops.egnn_block_fused import (block_fused_pallas,
                                               block_fused_xla,
                                               egnn_block_step)

B, N, H, F = 2, 256, 32, 32
NL = 24
CUTOFFS = (None, 2.5, 2.0)


def make_inputs(key, with_cross=True, with_type=True):
    ks = iter(jax.random.split(key, 40))
    nrm = lambda *s: jax.random.normal(next(ks), s) * 0.3
    h = nrm(B, N, H)
    a_row, a_col = nrm(B, N, F), nrm(B, N, F)
    x = nrm(B, N, 3) * 3.0
    x0 = x + nrm(B, N, 3) * 0.1
    mask = (jax.random.uniform(next(ks), (B, N)) > 0.1).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    is_lig = (jnp.arange(N)[None, :] < NL).astype(jnp.float32) \
        * jnp.ones((B, 1))
    gcl = dict(w_d2=nrm(F), w_d20=nrm(F),
               type_delta=nrm(F) if with_type else None,
               w2=nrm(F, F), b2=nrm(F), w_att=nrm(F, 1), b_att=nrm(1))
    node = dict(w_h=nrm(H, F), w_a=nrm(F, F), b0=nrm(F),
                w2=nrm(F, H), b2=nrm(H))

    def head():
        return dict(k_i=nrm(H, F), k_j=nrm(H, F), b0=nrm(F),
                    w_d2=nrm(F), w_d20=nrm(F),
                    type_bias=nrm(2, 2, F) if with_type else None,
                    w1=nrm(F, F), b1=nrm(F), w3=nrm(F, 1) * 1e-2)

    coord = head()
    cross = head() if with_cross else None
    graph_mean = nrm(B, 3) if with_cross else None
    return (h, a_row, a_col, x, x0, mask, is_lig, gcl, node, coord, cross,
            graph_mean)


KW = dict(cutoffs=CUTOFFS, attention=True, tanh=True, coords_range=10.0,
          norm_constant=1.0, normalization_factor=100.0)


@pytest.mark.quick
@pytest.mark.parametrize("with_cross", [True, False])
@pytest.mark.parametrize("update_rows", [NL, None])
def test_block_fused_matches_mirror(with_cross, update_rows):
    ins = make_inputs(jax.random.PRNGKey(0), with_cross=with_cross)
    ref_h, ref_dx = block_fused_xla(*ins, update_rows=update_rows, **KW)
    got_h, got_dx = block_fused_pallas(*ins, update_rows=update_rows,
                                       interpret=True, **KW)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               atol=2e-5, rtol=1e-4)


def test_block_fused_no_attention_no_type():
    ins = list(make_inputs(jax.random.PRNGKey(1), with_cross=False,
                           with_type=False))
    kw = dict(KW, attention=False)
    ins[7] = dict(ins[7], w_att=None, b_att=None)
    ref = block_fused_xla(*ins, update_rows=NL, **kw)
    got = block_fused_pallas(*ins, update_rows=NL, interpret=True, **kw)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-5, rtol=1e-4)


def test_block_fused_gradients_match_mirror():
    """The custom VJP routes through the XLA mirror; gradients through the
    pallas-interpret forward must equal differentiating the mirror."""
    ins = make_inputs(jax.random.PRNGKey(2))

    def loss(impl, h, a_row, coord):
        full = (h, a_row) + ins[2:9] + (coord,) + ins[10:]
        h_new, dx = egnn_block_step(*full, update_rows=NL, impl=impl,
                                    interpret=True, **KW)
        return jnp.sum(h_new ** 2) + jnp.sum(dx ** 2)

    args = (ins[0], ins[1], ins[9])
    g_ref = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(*args)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(*args)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)
