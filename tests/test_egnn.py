import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsbdd_tpu.models.egnn import (
    EGNN, coord2diff, coord2cross, sinusoidal_distance_embedding,
    sin_embedding_dim)
from diffsbdd_tpu.models.dynamics import EGNNDynamics, build_adjacency


def random_rotation(key):
    """Proper rotation built from exactly-representable Givens angles.

    QR in f32 gives orthogonality errors ~1e-3 which swamp equivariance
    checks; Pythagorean-triple sines/cosines are exact in f32.
    """
    del key
    c1, s1 = 0.6, 0.8          # 3-4-5 triple
    c2, s2 = 5 / 13, 12 / 13   # 5-12-13 triple
    rz = jnp.array([[c1, -s1, 0.0], [s1, c1, 0.0], [0.0, 0.0, 1.0]])
    rx = jnp.array([[1.0, 0.0, 0.0], [0.0, c2, -s2], [0.0, s2, c2]])
    return rz @ rx


def make_graph(key, B=2, N=9, H=6):
    k1, k2, k3 = jax.random.split(key, 3)
    h = jax.random.normal(k1, (B, N, H))
    x = jax.random.normal(k2, (B, N, 3)) * 2.0
    mask = jnp.ones((B, N))
    mask = mask.at[0, -2:].set(0.0)  # some padding in sample 0
    h = h * mask[..., None]
    x = x * mask[..., None]
    adj = mask[:, :, None] * mask[:, None, :]
    return h, x, adj, mask


@pytest.fixture(scope="module")
def egnn_setup():
    model = EGNN(hidden_nf=32, out_node_nf=6, n_layers=2, attention=True,
                 tanh=True, coords_range=15.0, norm_constant=1.0,
                 inv_sublayers=1, reflection_equiv=True)
    h, x, adj, mask = make_graph(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), h, x, adj, mask)
    return model, params, (h, x, adj, mask)


@pytest.mark.quick
def test_coord2diff():
    x = jnp.array([[[0.0, 0, 0], [3.0, 4.0, 0]]])
    radial, diff = coord2diff(x, norm_constant=1.0)
    np.testing.assert_allclose(float(radial[0, 0, 1, 0]), 25.0, rtol=1e-5)
    # normalized by (norm + 1)
    np.testing.assert_allclose(
        np.asarray(diff[0, 0, 1]), np.array([-3, -4, 0.0]) / 6.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(diff[0, 0, 0]), 0.0, atol=1e-6)


def test_sin_embedding_shape():
    r = jnp.ones((1, 4, 4, 1))
    e = sinusoidal_distance_embedding(r)
    assert e.shape == (1, 4, 4, sin_embedding_dim())


@pytest.mark.quick
def test_rotation_translation_equivariance(egnn_setup):
    model, params, (h, x, adj, mask) = egnn_setup
    R = random_rotation(jax.random.PRNGKey(7))
    tvec = jnp.array([1.5, -2.0, 0.5])

    h1, x1 = model.apply(params, h, x, adj, mask)
    xr = (x @ R.T + tvec) * mask[..., None]
    h2, x2 = model.apply(params, h, xr, adj, mask)

    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-4)
    expected = (x1 @ R.T + tvec) * mask[..., None]
    np.testing.assert_allclose(np.asarray(x2), np.asarray(expected), atol=1e-4)


def test_cross_product_head_is_tied():
    """The reference shares ONE nn.Linear(hidden, 1) as the final head of
    both coord_mlp and cross_product_mlp (egnn_new.py:78-93); the flax tree
    must hold a single parameter so training keeps them tied."""
    h, x, adj, mask = make_graph(jax.random.PRNGKey(3))
    m = EGNN(hidden_nf=16, out_node_nf=6, n_layers=1, inv_sublayers=1,
             reflection_equiv=False)
    p = m.init(jax.random.PRNGKey(5), h, x, adj, mask)
    equiv = p["params"]["e_block_0"]["gcl_equiv"]
    assert "lin2" in equiv["coord_mlp"]
    assert "lin2" not in equiv["cross_product_mlp"]

    # gradients from BOTH the coord and cross paths flow into the one head
    def loss(params):
        _, xo = m.apply(params, h, x, adj, mask)
        return jnp.sum(xo ** 2)

    g = jax.grad(loss)(p)
    gn = float(jnp.linalg.norm(
        g["params"]["e_block_0"]["gcl_equiv"]["coord_mlp"]["lin2"]["kernel"]))
    assert np.isfinite(gn) and gn > 0


def test_reflection_equivariance_and_breaking():
    h, x, adj, mask = make_graph(jax.random.PRNGKey(3))
    P = jnp.diag(jnp.array([-1.0, 1.0, 1.0]))  # reflection

    # E(3) model: equivariant under reflection
    m1 = EGNN(hidden_nf=16, out_node_nf=6, n_layers=1, inv_sublayers=1,
              reflection_equiv=True)
    p1 = m1.init(jax.random.PRNGKey(4), h, x, adj, mask)
    _, xa = m1.apply(p1, h, x, adj, mask)
    _, xb = m1.apply(p1, h, (x @ P.T) * mask[..., None], adj, mask)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xa @ P.T), atol=1e-4)

    # SE(3) model (cross-product term): reflection must NOT commute ...
    m2 = EGNN(hidden_nf=16, out_node_nf=6, n_layers=1, inv_sublayers=1,
              reflection_equiv=False)
    p2 = m2.init(jax.random.PRNGKey(5), h, x, adj, mask)
    _, xc = m2.apply(p2, h, x, adj, mask)
    _, xd = m2.apply(p2, h, (x @ P.T) * mask[..., None], adj, mask)
    assert float(jnp.max(jnp.abs(xd - xc @ P.T))) > 1e-6

    # ... but proper rotations still commute
    R = random_rotation(jax.random.PRNGKey(8))
    _, xe = m2.apply(p2, h, (x @ R.T) * mask[..., None], adj, mask)
    np.testing.assert_allclose(np.asarray(xe), np.asarray(xc @ R.T), atol=1e-4)


def test_padding_invariance(egnn_setup):
    """Outputs on valid nodes must be independent of the amount of padding."""
    model, params, (h, x, adj, mask) = egnn_setup
    h1, x1 = model.apply(params, h, x, adj, mask)

    pad = 5
    h_p = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    x_p = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    mask_p = jnp.pad(mask, ((0, 0), (0, pad)))
    adj_p = mask_p[:, :, None] * mask_p[:, None, :]
    h2, x2 = model.apply(params, h_p, x_p, adj_p, mask_p)

    N = h.shape[1]
    np.testing.assert_allclose(np.asarray(h2[:, :N]), np.asarray(h1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2[:, :N]), np.asarray(x1), atol=1e-5)


def test_permutation_equivariance(egnn_setup):
    model, params, (h, x, adj, mask) = egnn_setup
    N = h.shape[1]
    perm = np.array([3, 1, 0, 2, 4, 6, 5, 8, 7])
    h1, x1 = model.apply(params, h, x, adj, mask)
    hp = h[:, perm]
    xp = x[:, perm]
    mp = mask[:, perm]
    ap = adj[:, perm][:, :, perm]
    h2, x2 = model.apply(params, hp, xp, ap, mp)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1[:, perm]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1[:, perm]), atol=1e-5)


def test_update_coords_mask_freezes(egnn_setup):
    model, params, (h, x, adj, mask) = egnn_setup
    ucm = jnp.zeros_like(mask).at[:, :4].set(1.0)  # only first 4 nodes move
    _, x2 = model.apply(params, h, x, adj, mask, update_coords_mask=ucm)
    np.testing.assert_allclose(
        np.asarray(x2[:, 4:]), np.asarray(x[:, 4:]), atol=1e-7)
    assert float(jnp.max(jnp.abs(x2[:, :4] - x[:, :4]))) > 1e-8


def test_coord2cross_antisymmetry():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 3))
    mask = jnp.ones((1, 5))
    c = coord2cross(x, mask, norm_constant=1.0)
    np.testing.assert_allclose(np.asarray(c), -np.asarray(jnp.swapaxes(c, 1, 2)),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# dynamics-level tests
# ---------------------------------------------------------------------------

def make_complex(key, B=2, NL=5, NP=8, A=4, R=6):
    ks = jax.random.split(key, 6)
    xh_lig = jax.random.normal(ks[0], (B, NL, 3 + A))
    xh_pkt = jax.random.normal(ks[1], (B, NP, 3 + R))
    mask_lig = jnp.ones((B, NL)).at[0, -1:].set(0.0)
    mask_pkt = jnp.ones((B, NP)).at[0, -2:].set(0.0)
    xh_lig = xh_lig * mask_lig[..., None]
    xh_pkt = xh_pkt * mask_pkt[..., None]
    t = jnp.full((B, 1), 0.4)
    return xh_lig, xh_pkt, t, mask_lig, mask_pkt


def test_build_adjacency_cutoffs():
    x_l = jnp.array([[[0.0, 0, 0], [10.0, 0, 0]]])
    x_p = jnp.array([[[0.0, 1.0, 0], [0, 30.0, 0]]])
    m = jnp.ones((1, 2))
    adj = build_adjacency(x_l, x_p, m, m, cutoff_ligand=None,
                          cutoff_pocket=5.0, cutoff_interaction=2.0)
    a = np.asarray(adj[0])
    # ligand-ligand: no cutoff -> all 1 (incl. diagonal)
    assert a[0, 1] == 1 and a[0, 0] == 1
    # interaction: lig0-pkt0 at distance 1 <= 2 -> edge; lig1-pkt0 far -> none
    assert a[0, 2] == 1 and a[1, 2] == 0
    # pocket-pocket: distance 29 > 5 -> no cross edge, diagonal stays
    assert a[2, 3] == 0 and a[2, 2] == 1
    # symmetry
    np.testing.assert_array_equal(a, a.T)


@pytest.mark.parametrize("update_pocket", [True, False])
def test_dynamics_shapes_and_pocket_freeze(update_pocket):
    xh_lig, xh_pkt, t, m_l, m_p = make_complex(jax.random.PRNGKey(0))
    dyn = EGNNDynamics(
        atom_nf=4, residue_nf=6, joint_nf=8, hidden_nf=16, n_layers=2,
        attention=True, tanh=True, inv_sublayers=1,
        update_pocket_coords=update_pocket, edge_embedding_dim=4,
        norm_constant=1.0)
    params = dyn.init(jax.random.PRNGKey(1), xh_lig, xh_pkt, t, m_l, m_p)
    eps_lig, eps_pkt = dyn.apply(params, xh_lig, xh_pkt, t, m_l, m_p)
    assert eps_lig.shape == xh_lig.shape
    assert eps_pkt.shape == xh_pkt.shape
    if not update_pocket:
        # conditional mode: pocket velocity is identically zero
        np.testing.assert_allclose(np.asarray(eps_pkt[..., :3]), 0.0, atol=1e-7)
    else:
        # joint mode: combined velocity field is CoM-free
        v = (jnp.sum(eps_lig[..., :3] * m_l[..., None], axis=1)
             + jnp.sum(eps_pkt[..., :3] * m_p[..., None], axis=1))
        np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-5)


def test_dynamics_equivariance():
    """eps_x rotates with the input; eps_h invariant (conditional mode)."""
    xh_lig, xh_pkt, t, m_l, m_p = make_complex(jax.random.PRNGKey(2))
    dyn = EGNNDynamics(
        atom_nf=4, residue_nf=6, joint_nf=8, hidden_nf=16, n_layers=2,
        attention=True, tanh=True, inv_sublayers=1,
        update_pocket_coords=False, reflection_equivariant=False,
        norm_constant=1.0)
    params = dyn.init(jax.random.PRNGKey(3), xh_lig, xh_pkt, t, m_l, m_p)
    e_l1, e_p1 = dyn.apply(params, xh_lig, xh_pkt, t, m_l, m_p)

    R = random_rotation(jax.random.PRNGKey(4))
    rot = lambda xh, m: jnp.concatenate(
        [(xh[..., :3] @ R.T) * m[..., None], xh[..., 3:]], axis=-1)
    e_l2, e_p2 = dyn.apply(params, rot(xh_lig, m_l), rot(xh_pkt, m_p), t, m_l, m_p)

    np.testing.assert_allclose(
        np.asarray(e_l2[..., :3]), np.asarray(e_l1[..., :3] @ R.T), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(e_l2[..., 3:]), np.asarray(e_l1[..., 3:]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(e_p2[..., 3:]), np.asarray(e_p1[..., 3:]), atol=1e-4)


def test_dynamics_gnn_mode():
    xh_lig, xh_pkt, t, m_l, m_p = make_complex(jax.random.PRNGKey(5))
    dyn = EGNNDynamics(
        atom_nf=4, residue_nf=6, joint_nf=8, hidden_nf=16, n_layers=2,
        mode="gnn_dynamics", update_pocket_coords=True, norm_constant=1.0)
    params = dyn.init(jax.random.PRNGKey(6), xh_lig, xh_pkt, t, m_l, m_p)
    eps_lig, eps_pkt = dyn.apply(params, xh_lig, xh_pkt, t, m_l, m_p)
    assert eps_lig.shape == xh_lig.shape
    assert eps_pkt.shape == xh_pkt.shape


def test_bf16_compute_close_to_f32():
    """compute_dtype=bf16 output tracks the f32 path within bf16 tolerance."""
    import jax.numpy as jnp
    h, x, adj, mask = make_graph(jax.random.PRNGKey(9))
    m32 = EGNN(hidden_nf=32, out_node_nf=6, n_layers=2, attention=True,
               tanh=True, inv_sublayers=1, norm_constant=1.0)
    m16 = EGNN(hidden_nf=32, out_node_nf=6, n_layers=2, attention=True,
               tanh=True, inv_sublayers=1, norm_constant=1.0,
               compute_dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(10), h, x, adj, mask)
    h1, x1 = m32.apply(params, h, x, adj, mask)
    h2, x2 = m16.apply(params, h, x, adj, mask)
    assert h2.dtype == h1.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1),
                               atol=0.05, rtol=0.1)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=0.05)


def test_cross_product_grads_finite():
    """Backward through the SE(3) cross-product term must be NaN-free.

    cross(xc_i, xc_j) is exactly zero on the diagonal and for coincident
    padded nodes; an unguarded norm has an infinite gradient there and inf*0
    poisons every parameter grad (torch's norm subgradient at 0 is 0, so the
    reference never sees this).  NOTE the unguarded form only NaNs under the
    TPU backward lowering — CPU's happens to cancel — so on the CPU test
    platform this is a property check; the measured TPU repro is recorded in
    NOTES.md (110 non-finite grad leaves at the flagship config pre-fix)."""
    h, x, adj, mask = make_graph(jax.random.PRNGKey(11))
    # coincident nodes: two padded rows at the origin + a duplicated pair
    x = x.at[0, 3].set(x[0, 2])
    m = EGNN(hidden_nf=16, out_node_nf=6, n_layers=1, inv_sublayers=1,
             reflection_equiv=False, attention=True, tanh=True)
    params = m.init(jax.random.PRNGKey(12), h, x, adj, mask)

    def loss(p, xx):
        ho, xo = m.apply(p, h, xx, adj, mask)
        return jnp.sum(ho**2) + jnp.sum(xo**2)

    grads, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    for leaf in jax.tree_util.tree_leaves((grads, gx)):
        assert np.all(np.isfinite(leaf)), "NaN/inf in cross-product backward"
