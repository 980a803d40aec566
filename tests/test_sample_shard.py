"""DP-sharded sampling chain == unsharded, bit-for-bit (VERDICT r04 #5).

Two tiers (parallel/sample_shard.py), pinned on the 8-virtual-device CPU
mesh the same way tests/test_edge_shard.py pins the edge axis:

* GSPMD: the plain ``sample_given_pocket_segmented`` on batch-sharded
  inputs must equal the unsharded chain exactly (same logical program,
  full-batch noise draws with step-folded keys).
* shard_map: row block ``r`` of ``ShardedSampler`` output must equal
  ``reference_shard_chain`` on the local slice with shard-folded keys.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsbdd_tpu.diffusion.ddpm import ConditionalDDPM, num_nodes_to_mask
from diffsbdd_tpu.diffusion.size_prior import SizeDistribution
from diffsbdd_tpu.models.dynamics import EGNNDynamics
from diffsbdd_tpu.parallel.mesh import make_mesh
from diffsbdd_tpu.parallel.sample_shard import (
    ShardedSampler, gspmd_sample_given_pocket_segmented,
    reference_shard_chain)

A, R = 4, 5
NL, NP, B = 6, 8, 4
T = 8


def _setup():
    dyn = EGNNDynamics(
        atom_nf=A, residue_nf=R, joint_nf=8, hidden_nf=16, n_layers=1,
        attention=True, tanh=True, inv_sublayers=1, norm_constant=1.0,
        update_pocket_coords=False)
    hist = np.ones((NL + 1, NP + 1))
    ddpm = ConditionalDDPM(
        dynamics=dyn, atom_nf=A, residue_nf=R, n_dims=3,
        size_distribution=SizeDistribution(hist), timesteps=T,
        noise_schedule="polynomial_2", noise_precision=5e-4,
        loss_type="l2", norm_values=(1.0, 4.0))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    lig_sizes = np.array([4, 6, 5, 3])
    pkt_sizes = np.array([8, 5, 7, 6])
    m_l = jnp.asarray(num_nodes_to_mask(lig_sizes, NL))
    m_p = jnp.asarray(num_nodes_to_mask(pkt_sizes, NP))
    pocket = {
        "x": jax.random.normal(ks[0], (B, NP, 3)) * m_p[..., None],
        "one_hot": jax.nn.one_hot(
            jax.random.randint(ks[1], (B, NP), 0, R), R) * m_p[..., None],
        "mask": m_p, "size": jnp.asarray(pkt_sizes),
    }
    ligand = {"x": jnp.zeros((B, NL, 3)),
              "one_hot": jnp.zeros((B, NL, A)), "mask": m_l,
              "size": jnp.asarray(lig_sizes)}
    params = ddpm.init_params(jax.random.PRNGKey(1), ligand, pocket)
    return ddpm, params, pocket, m_l


@pytest.mark.parametrize("n_dev", [2, 4])
def test_gspmd_sampling_bit_identical(n_dev):
    ddpm, params, pocket, lig_mask = _setup()
    mesh = make_mesh(n_dev, devices=jax.devices()[:n_dev])
    rng = jax.random.PRNGKey(7)
    base = ddpm.sample_given_pocket_segmented(
        params, rng, pocket, lig_mask, timesteps=T, segment=3)
    sharded = gspmd_sample_given_pocket_segmented(
        ddpm, mesh, params, rng, pocket, lig_mask, timesteps=T, segment=3)
    for a, b in zip(base, sharded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shard_map_sampling_matches_reference_shards():
    ddpm, params, pocket, lig_mask = _setup()
    n_dev = 4
    mesh = make_mesh(n_dev, devices=jax.devices()[:n_dev])
    rng = jax.random.PRNGKey(9)
    sampler = ShardedSampler(ddpm, mesh)
    out_lig, out_pkt = sampler.sample_given_pocket_segmented(
        params, rng, pocket, lig_mask, timesteps=T, segment=3)
    per = B // n_dev
    for r in range(n_dev):
        sl = slice(r * per, (r + 1) * per)
        pocket_l = {k: v[sl] for k, v in pocket.items()}
        ref_lig, ref_pkt = reference_shard_chain(
            ddpm, params, rng, pocket_l, lig_mask[sl], shard_index=r,
            timesteps=T, segment=3)
        np.testing.assert_array_equal(np.asarray(out_lig[sl]),
                                      np.asarray(ref_lig))
        np.testing.assert_array_equal(np.asarray(out_pkt[sl]),
                                      np.asarray(ref_pkt))


def test_batch_divisibility_error():
    ddpm, params, pocket, lig_mask = _setup()
    mesh = make_mesh(3, devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="not divisible"):
        ShardedSampler(ddpm, mesh).sample_given_pocket_segmented(
            params, jax.random.PRNGKey(0), pocket, lig_mask, timesteps=T)
    with pytest.raises(ValueError, match="not divisible"):
        gspmd_sample_given_pocket_segmented(
            ddpm, mesh, params, jax.random.PRNGKey(0), pocket, lig_mask,
            timesteps=T)
