"""Checkpoint converter tests: torch<->jax layer equivalence and round trips."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsbdd_tpu.config import load_config
from diffsbdd_tpu.convert.torch_ckpt import (convert_lightning_checkpoint,
                                             convert_state_dict,
                                             export_state_dict)
from diffsbdd_tpu.train.module import build_module_from_config

torch = pytest.importorskip("torch")

NL, NP = 8, 12


def tiny_cfg():
    return load_config(overrides={
        "dataset": "crossdock",
        "mode": "pocket_conditioning",
        "pocket_representation": "CA",
        "egnn_params": {"joint_nf": 8, "hidden_nf": 16, "n_layers": 2,
                        "inv_sublayers": 1, "attention": True, "tanh": True,
                        "norm_constant": 1, "reflection_equivariant": False},
        "diffusion_params": {"diffusion_steps": 10,
                             "normalize_factors": [1, 4]},
        "tpu": {"n_lig_max": NL, "n_pocket_max": NP},
    })


def test_dense_equals_torch_linear():
    """flax Dense with a transposed torch weight gives identical outputs."""
    lin = torch.nn.Linear(6, 4)
    x = np.random.default_rng(0).standard_normal((5, 6)).astype(np.float32)
    expected = lin(torch.from_numpy(x)).detach().numpy()

    import flax.linen as nn
    dense = nn.Dense(4)
    params = {"params": {
        "kernel": jnp.asarray(lin.weight.detach().numpy().T),
        "bias": jnp.asarray(lin.bias.detach().numpy())}}
    got = np.asarray(dense.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_split_pair_dense_equals_concat():
    """The split-kernel trick == torch Linear on concat([h_i, h_j, e])."""
    from diffsbdd_tpu.models.egnn import _split_pair_dense

    rng = np.random.default_rng(1)
    B, N, H, E, F = 2, 5, 6, 3, 7
    h = rng.standard_normal((B, N, H)).astype(np.float32)
    e = rng.standard_normal((B, N, N, E)).astype(np.float32)
    lin = torch.nn.Linear(2 * H + E, F)

    # torch: explicit pairwise concat
    hi = np.broadcast_to(h[:, :, None, :], (B, N, N, H))
    hj = np.broadcast_to(h[:, None, :, :], (B, N, N, H))
    inp = np.concatenate([hi, hj, e], axis=-1)
    expected = lin(torch.from_numpy(inp)).detach().numpy()

    kernel = jnp.asarray(lin.weight.detach().numpy().T)
    bias = jnp.asarray(lin.bias.detach().numpy())
    got = np.asarray(_split_pair_dense(kernel, bias, jnp.asarray(h),
                                       jnp.asarray(e), H))
    np.testing.assert_allclose(got, expected, atol=1e-4)


@pytest.mark.quick
def test_state_dict_roundtrip():
    """params -> reference state_dict -> params is the identity."""
    cfg = tiny_cfg()
    module = build_module_from_config(cfg, np.ones((NL + 1, NP + 1)))
    params = module.init_params(jax.random.PRNGKey(0))

    sd = export_state_dict(params, attention=True, reflection_equiv=False)
    back = convert_state_dict(
        sd, n_layers=2, inv_sublayers=1, attention=True,
        reflection_equiv=False, has_edge_embedding=False)

    flat_a = jax.tree_util.tree_flatten_with_path(
        {"dynamics": params["dynamics"]})[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    paths_a = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat_a}
    paths_b = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat_b}
    assert set(paths_a) == set(paths_b)
    for k in paths_a:
        np.testing.assert_allclose(paths_a[k], paths_b[k], atol=1e-6, err_msg=k)


def make_lightning_ckpt(tmp_path, cfg, module, params,
                        name="ref.ckpt"):
    """Write a synthetic reference-format Lightning checkpoint (the exact
    tensor naming/layout of /root/reference lightning_modules.py
    save_hyperparameters + state_dict) from this framework's params."""
    from argparse import Namespace

    gamma = np.asarray(module.ddpm.gamma_table.gammas)
    sd_np = export_state_dict(params, attention=True, reflection_equiv=False,
                              gamma_table=gamma)
    state_dict = {k: torch.from_numpy(np.array(v)) for k, v in sd_np.items()}

    hparams = {
        "dataset": "crossdock",
        "mode": "pocket_conditioning",
        "pocket_representation": "CA",
        "virtual_nodes": False,
        "batch_size": 4, "lr": 1e-3, "clip_grad": True,
        "augment_noise": 0, "augment_rotation": False,
        "auxiliary_loss": False,
        "eval_epochs": 50, "visualize_sample_epoch": 50,
        "visualize_chain_epoch": 50,
        "egnn_params": Namespace(
            joint_nf=8, hidden_nf=16, n_layers=2, inv_sublayers=1,
            attention=True, tanh=True, norm_constant=1,
            sin_embedding=False, normalization_factor=100,
            aggregation_method="sum", reflection_equivariant=False,
            device="cuda"),
        "diffusion_params": Namespace(
            diffusion_steps=10, diffusion_noise_schedule="polynomial_2",
            diffusion_noise_precision=5e-4, diffusion_loss_type="l2",
            normalize_factors=[1, 4]),
        "loss_params": Namespace(max_weight=0.001, schedule="linear",
                                 clamp_lj=3.0),
        "eval_params": Namespace(n_eval_samples=10, eval_batch_size=10,
                                 smiles_file=None, n_visualize_samples=5,
                                 keep_frames=10),
        "node_histogram": np.ones((NL + 1, NP + 1)).tolist(),
    }
    ckpt_path = tmp_path / name
    torch.save({"state_dict": state_dict, "hyper_parameters": hparams},
               ckpt_path)
    return ckpt_path


def test_full_lightning_checkpoint_conversion(tmp_path):
    """Synthetic Lightning ckpt (reference naming) -> converted model that
    loads and runs a forward pass."""
    cfg = tiny_cfg()
    module = build_module_from_config(cfg, np.ones((NL + 1, NP + 1)))
    params = module.init_params(jax.random.PRNGKey(0))
    ckpt_path = make_lightning_ckpt(tmp_path, cfg, module, params)

    out_dir = tmp_path / "converted"
    mod2, state2, cfg2 = convert_lightning_checkpoint(ckpt_path, out_dir)
    assert (out_dir / "best.config.json").exists()

    # converted params match the originals exactly
    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        params["dynamics"], state2.params["dynamics"])
    assert all(jax.tree.leaves(same))

    # and the converted model runs
    from diffsbdd_tpu.checkpoint import load_model
    mod3, state3, _ = load_model(out_dir, name="best")
    lig, pkt = mod3.example_batch(2, n_lig=NL, n_pocket=NP)
    loss, _ = mod3.loss_fn(state3.params, jax.random.PRNGKey(1), lig, pkt,
                           training=True)
    assert np.isfinite(float(loss))


def test_zenodo_day_one_path(tmp_path):
    """The documented day-one command chain for a published checkpoint:

        python -m diffsbdd_tpu.convert.torch_ckpt <ckpt> --outdir <dir>
        python -m diffsbdd_tpu.cli.generate_ligands <dir> --pdbfile ...

    driven end-to-end through both CLI mains on a reference-format
    Lightning ckpt (random-init weights — Zenodo is unreachable offline,
    generate_ligands.py:39 is the reference semantics being mirrored)."""
    from pathlib import Path

    pdb = Path("/root/reference/example/3rfm.pdb")
    if not pdb.exists():
        pytest.skip("example pdb unavailable")

    cfg = tiny_cfg()
    module = build_module_from_config(cfg, np.ones((NL + 1, NP + 1)))
    params = module.init_params(jax.random.PRNGKey(0))
    ckpt_path = make_lightning_ckpt(tmp_path, cfg, module, params,
                                    name="crossdocked_fullatom_cond.ckpt")

    out_dir = tmp_path / "converted"
    from diffsbdd_tpu.convert.torch_ckpt import main as convert_main
    convert_main([str(ckpt_path), "--outdir", str(out_dir)])
    assert (out_dir / "best.config.json").exists()

    from diffsbdd_tpu.cli.generate_ligands import main as gen_main
    outfile = tmp_path / "out.sdf"
    gen_main([str(out_dir), "--pdbfile", str(pdb), "--ref_ligand", "A:330",
              "--outfile", str(outfile), "--n_samples", "2",
              "--num_nodes_lig", "6", "--all_frags"])
    assert outfile.exists()


def test_gamma_mismatch_detected(tmp_path):
    """A wrong gamma buffer in the checkpoint must be caught."""
    from argparse import Namespace
    cfg = tiny_cfg()
    module = build_module_from_config(cfg, np.ones((NL + 1, NP + 1)))
    params = module.init_params(jax.random.PRNGKey(0))
    sd_np = export_state_dict(params, attention=True, reflection_equiv=False,
                              gamma_table=np.linspace(-5, 5, 11))
    state_dict = {k: torch.from_numpy(np.array(v)) for k, v in sd_np.items()}
    hparams = {
        "dataset": "crossdock", "mode": "pocket_conditioning",
        "pocket_representation": "CA", "virtual_nodes": False,
        "batch_size": 4, "lr": 1e-3,
        "egnn_params": Namespace(
            joint_nf=8, hidden_nf=16, n_layers=2, inv_sublayers=1,
            attention=True, tanh=True, norm_constant=1, sin_embedding=False,
            normalization_factor=100, aggregation_method="sum",
            reflection_equivariant=False),
        "diffusion_params": Namespace(
            diffusion_steps=10, diffusion_noise_schedule="polynomial_2",
            diffusion_noise_precision=5e-4, diffusion_loss_type="l2",
            normalize_factors=[1, 4]),
        "node_histogram": np.ones((NL + 1, NP + 1)).tolist(),
    }
    ckpt_path = tmp_path / "bad.ckpt"
    torch.save({"state_dict": state_dict, "hyper_parameters": hparams},
               ckpt_path)
    with pytest.raises(ValueError, match="gamma schedule mismatch"):
        convert_lightning_checkpoint(ckpt_path, tmp_path / "out")
