"""Edge-axis sharding: sharded == unsharded dynamics on the CPU mesh.

The producer (parallel/edge_shard.py) splits the O(N^2) pairwise column
axis over a mesh axis; every aggregation is completed by a psum.  These
tests pin the contract the consumer plumbing in models/egnn.py and
models/dynamics.py documents: the sharded forward (and its gradients) is
numerically the unsharded forward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsbdd_tpu.models.dynamics import (EGNNDynamics, _col_adjacency,
                                          build_adjacency)
from diffsbdd_tpu.parallel.edge_shard import (edge_sharded_dynamics,
                                              make_edge_mesh)

CUTOFFS = (None, 2.5, 2.0)


def _inputs(key, B=2, NL=8, NP=24, atom_nf=5, residue_nf=7):
    ks = jax.random.split(key, 6)
    xh_lig = jnp.concatenate([
        jax.random.normal(ks[0], (B, NL, 3)),
        jax.nn.one_hot(jax.random.randint(ks[1], (B, NL), 0, atom_nf),
                       atom_nf)], axis=-1)
    xh_pkt = jnp.concatenate([
        jax.random.normal(ks[2], (B, NP, 3)) * 1.5,
        jax.nn.one_hot(jax.random.randint(ks[3], (B, NP), 0, residue_nf),
                       residue_nf)], axis=-1)
    mask_lig = (jax.random.uniform(ks[4], (B, NL)) > 0.2).astype(jnp.float32)
    mask_pkt = (jax.random.uniform(ks[5], (B, NP)) > 0.2).astype(jnp.float32)
    mask_lig = mask_lig.at[:, 0].set(1.0)
    mask_pkt = mask_pkt.at[:, 0].set(1.0)
    t = jnp.full((B, 1), 0.3)
    return xh_lig, xh_pkt, t, mask_lig, mask_pkt


def _model(update_pocket_coords, atom_nf=5, residue_nf=7):
    return EGNNDynamics(
        atom_nf=atom_nf, residue_nf=residue_nf, joint_nf=8, hidden_nf=16,
        n_layers=2, attention=True, tanh=True, norm_constant=1.0,
        inv_sublayers=1, reflection_equivariant=False,
        edge_embedding_dim=8, edge_cutoff_ligand=CUTOFFS[0],
        edge_cutoff_pocket=CUTOFFS[1], edge_cutoff_interaction=CUTOFFS[2],
        update_pocket_coords=update_pocket_coords, impl="xla")


def test_col_adjacency_matches_full_slices():
    """_col_adjacency == build_adjacency[:, :, off:off+width] (the docstring
    contract), without materializing (B, N, N)."""
    key = jax.random.PRNGKey(0)
    xh_lig, xh_pkt, _, m_l, m_p = _inputs(key)
    x_l, x_p = xh_lig[..., :3], xh_pkt[..., :3]
    B, NL = m_l.shape
    NP = m_p.shape[1]
    x = jnp.concatenate([x_l, x_p], axis=1)
    mask = jnp.concatenate([m_l, m_p], axis=1)
    is_lig = jnp.concatenate(
        [jnp.ones((B, NL)), jnp.zeros((B, NP))], axis=1)

    full = build_adjacency(x_l, x_p, m_l, m_p, *CUTOFFS)
    n_shards, width = 4, (NL + NP) // 4
    for k in range(n_shards):
        ctx = {"axis": "edge", "index": k, "width": width}
        block, il_cols = _col_adjacency(x, mask, is_lig, CUTOFFS, ctx)
        np.testing.assert_allclose(
            np.asarray(block),
            np.asarray(full[:, :, k * width:(k + 1) * width]), atol=0)
        np.testing.assert_allclose(
            np.asarray(il_cols),
            np.asarray(is_lig[:, k * width:(k + 1) * width]), atol=0)


@pytest.mark.parametrize("update_pocket_coords", [False, True])
def test_sharded_dynamics_matches_unsharded(update_pocket_coords):
    key = jax.random.PRNGKey(1)
    inputs = _inputs(key)  # NL + NP = 32, divides the 8-device mesh
    dyn = _model(update_pocket_coords)
    variables = dyn.init(jax.random.PRNGKey(2), *inputs)

    ref_lig, ref_pkt = dyn.apply(variables, *inputs)
    mesh = make_edge_mesh(8)
    sharded = jax.jit(edge_sharded_dynamics(dyn, mesh))
    got_lig, got_pkt = sharded(variables, *inputs)

    np.testing.assert_allclose(np.asarray(got_lig), np.asarray(ref_lig),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_pkt), np.asarray(ref_pkt),
                               atol=2e-5, rtol=1e-4)


def test_sharded_dynamics_pads_indivisible_n():
    """NL + NP = 29 not divisible by 8: the producer pads the pocket axis
    with mask-0 nodes and strips them from the output."""
    key = jax.random.PRNGKey(3)
    inputs = _inputs(key, NL=7, NP=22)
    dyn = _model(update_pocket_coords=False)
    variables = dyn.init(jax.random.PRNGKey(4), *inputs)

    ref_lig, ref_pkt = dyn.apply(variables, *inputs)
    sharded = jax.jit(edge_sharded_dynamics(dyn, make_edge_mesh(8)))
    got_lig, got_pkt = sharded(variables, *inputs)

    assert got_pkt.shape == ref_pkt.shape
    np.testing.assert_allclose(np.asarray(got_lig), np.asarray(ref_lig),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_pkt), np.asarray(ref_pkt),
                               atol=2e-5, rtol=1e-4)


def test_sharded_dynamics_gradients_match():
    key = jax.random.PRNGKey(5)
    inputs = _inputs(key)
    dyn = _model(update_pocket_coords=False)
    variables = dyn.init(jax.random.PRNGKey(6), *inputs)
    sharded = edge_sharded_dynamics(dyn, make_edge_mesh(8))

    def loss(apply_fn, variables):
        eps_lig, eps_pkt = apply_fn(variables, *inputs)
        return jnp.sum(eps_lig ** 2) + jnp.sum(eps_pkt ** 2)

    g_ref = jax.grad(lambda v: loss(dyn.apply, v))(variables)
    g_shard = jax.jit(jax.grad(lambda v: loss(sharded, v)))(variables)

    flat_ref = jax.tree.leaves(g_ref)
    flat_shard = jax.tree.leaves(g_shard)
    assert len(flat_ref) == len(flat_shard)
    for a, b in zip(flat_ref, flat_shard):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-3)


def test_dp_x_edge_mesh_matches_unsharded():
    """Composed 2-D (data x edge) mesh: batch sharded over 'data', pairwise
    columns over 'edge' — values AND gradients equal the unsharded apply
    (the dryrun_multichip dp_x_edge tier runs this same composition)."""
    from diffsbdd_tpu.parallel.edge_shard import make_dp_edge_mesh

    key = jax.random.PRNGKey(7)
    inputs = _inputs(key, B=4)  # divides the 4-way data axis
    dyn = _model(update_pocket_coords=False)
    variables = dyn.init(jax.random.PRNGKey(8), *inputs)

    mesh = make_dp_edge_mesh(4, 2)
    sharded = edge_sharded_dynamics(dyn, mesh, batch_axis="data")

    ref_lig, ref_pkt = dyn.apply(variables, *inputs)
    got_lig, got_pkt = jax.jit(sharded)(variables, *inputs)
    np.testing.assert_allclose(np.asarray(got_lig), np.asarray(ref_lig),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_pkt), np.asarray(ref_pkt),
                               atol=2e-5, rtol=1e-4)

    def loss(apply_fn, variables):
        eps_lig, eps_pkt = apply_fn(variables, *inputs)
        return jnp.sum(eps_lig ** 2) + jnp.sum(eps_pkt ** 2)

    g_ref = jax.grad(lambda v: loss(dyn.apply, v))(variables)
    g_shard = jax.jit(jax.grad(lambda v: loss(sharded, v)))(variables)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_shard)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-3)
