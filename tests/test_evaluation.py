"""Chain samplers + in-training sampling evaluation."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask
from diffsbdd_tpu.train.evaluation import SamplingEvaluator, residues_to_atoms

from test_ddpm import A, B, NL, NP, R, T, make_batches, make_ddpm
from test_ddpm import ConditionalDDPM, JointDDPM


def test_conditional_chain_sampler():
    ligand, pocket = make_batches(jax.random.PRNGKey(0))
    ddpm = make_ddpm(ConditionalDDPM)
    params = ddpm.init_params(jax.random.PRNGKey(1), ligand, pocket)
    lig_mask = jnp.asarray(num_nodes_to_mask(np.array([5, 3]), NL))
    frames_lig, frames_pkt = ddpm.sample_given_pocket_chain(
        params, jax.random.PRNGKey(2), pocket, lig_mask, return_frames=5)
    assert frames_lig.shape == (5, B, NL, 3 + A)
    assert frames_pkt.shape == (5, B, NP, 3 + R)
    assert bool(jnp.all(jnp.isfinite(frames_lig)))
    # last frame is the decoded sample: exact one-hot
    oh = np.asarray(frames_lig[-1, ..., 3:])
    m = np.asarray(lig_mask)
    assert np.all(oh.sum(-1)[m > 0] == 1.0)
    # last frame must match the plain sampler with the same key
    xh_lig, _ = ddpm.sample_given_pocket(
        params, jax.random.PRNGKey(2), pocket, lig_mask)
    # plain sampler applies the extra final CoM re-projection; compare the
    # relative geometry instead of the absolute frame
    a = np.asarray(frames_lig[-1, ..., :3])
    b = np.asarray(xh_lig[..., :3])
    for bi in range(B):
        v = m[bi] > 0
        np.testing.assert_allclose(a[bi][v] - a[bi][v].mean(0),
                                   b[bi][v] - b[bi][v].mean(0), atol=1e-3)


def test_joint_chain_sampler():
    ligand, pocket = make_batches(jax.random.PRNGKey(3))
    ddpm = make_ddpm(JointDDPM)
    params = ddpm.init_params(jax.random.PRNGKey(4), ligand, pocket)
    lig_mask = jnp.asarray(num_nodes_to_mask(np.array([5, 3]), NL))
    pkt_mask = jnp.asarray(num_nodes_to_mask(np.array([6, 7]), NP))
    frames_lig, frames_pkt = ddpm.sample_chain(
        params, jax.random.PRNGKey(5), (lig_mask, pkt_mask), return_frames=2)
    assert frames_lig.shape == (2, B, NL, 3 + A)
    assert bool(jnp.all(jnp.isfinite(frames_pkt)))


def test_residues_to_atoms():
    enc = {"C": 0, "N": 1}
    oh = residues_to_atoms(np.zeros((4, 3)), enc)
    np.testing.assert_array_equal(oh[:, 0], 1.0)


@pytest.fixture
def eval_setup(tmp_path):
    from diffsbdd_tpu.config import load_config
    from diffsbdd_tpu.data.dataset import LigandPocketDataset
    from diffsbdd_tpu.train.module import build_module_from_config
    from test_data import make_npz

    datadir = tmp_path / "data"
    datadir.mkdir()
    make_npz(datadir, n_complexes=6, a_nf=10, r_nf=20, seed=3)
    cfg = load_config(overrides={
        "dataset": "crossdock", "mode": "pocket_conditioning",
        "pocket_representation": "CA",
        "egnn_params": {"joint_nf": 8, "hidden_nf": 16, "n_layers": 1,
                        "inv_sublayers": 1, "attention": True, "tanh": True,
                        "norm_constant": 1},
        "diffusion_params": {"diffusion_steps": 10,
                             "normalize_factors": [1, 4]},
        "tpu": {"n_lig_max": 16, "n_pocket_max": 32, "lig_bucket": 8,
                "pocket_bucket": 32},
    })
    module = build_module_from_config(cfg, np.ones((17, 33)))
    params = module.init_params(jax.random.PRNGKey(0))
    ds = LigandPocketDataset(datadir / "train.npz")
    evaluator = SamplingEvaluator(module, dataset=ds,
                                  outdir=tmp_path / "eval")
    return module, params, evaluator


def test_sample_and_analyze_given_pocket(eval_setup):
    module, params, evaluator = eval_setup
    out = evaluator.sample_and_analyze(
        params, jax.random.PRNGKey(1), n_samples=3, batch_size=3,
        size_rng=np.random.default_rng(0))
    for key in ("Validity", "Connectivity", "QED", "kl_div_atom_types",
                "kl_div_residue_types", "Diversity"):
        assert key in out


def test_sample_and_save_and_chain(eval_setup, tmp_path):
    module, params, evaluator = eval_setup
    outdir = evaluator.sample_and_save(
        params, jax.random.PRNGKey(2), n_samples=2, epoch=0,
        size_rng=np.random.default_rng(0))
    xyz = list(Path(outdir).glob("*.txt"))
    assert len(xyz) == 2
    pngs = list(Path(outdir).glob("*.png"))
    assert len(pngs) == 2

    gif = evaluator.sample_chain_and_save(
        params, jax.random.PRNGKey(3), keep_frames=5, epoch=0,
        size_rng=np.random.default_rng(0))
    assert gif is not None and Path(gif).exists()
