"""CLI-level smoke tests: train on synthetic data, checkpoint, reload, sample."""
import json
from pathlib import Path

import jax
import numpy as np
import pytest

from diffsbdd_tpu.checkpoint import load_model, save_model
from diffsbdd_tpu.config import load_config
from diffsbdd_tpu.data.dataset import LigandPocketDataset, PaddedLoader
from diffsbdd_tpu.train.loop import Trainer, create_train_state
from diffsbdd_tpu.train.module import build_module_from_config

from test_data import make_npz

EXAMPLE_PDB = Path("/root/reference/example/3rfm.pdb")


def small_cfg(tmp_path, datadir):
    return load_config(overrides={
        "run_name": "smoke",
        "logdir": str(tmp_path / "runs"),
        "datadir": str(datadir),
        "dataset": "crossdock",
        "mode": "pocket_conditioning",
        "pocket_representation": "CA",
        "batch_size": 4,
        "lr": 1e-3,
        "n_epochs": 1,
        "egnn_params": {"joint_nf": 8, "hidden_nf": 16, "n_layers": 1,
                        "inv_sublayers": 1, "attention": True, "tanh": True,
                        "norm_constant": 1},
        "diffusion_params": {"diffusion_steps": 10,
                             "normalize_factors": [1, 4]},
        "tpu": {"n_lig_max": 16, "n_pocket_max": 64, "lig_bucket": 8,
                "pocket_bucket": 64},
    })


def test_train_checkpoint_reload_sample(tmp_path):
    datadir = tmp_path / "data"
    datadir.mkdir()
    # synthetic dataset with the crossdock type spaces (10 atom, 20 aa types)
    make_npz(datadir, n_complexes=8, a_nf=10, r_nf=20, seed=0)
    (datadir / "train.npz").write_bytes((datadir / "train.npz").read_bytes())
    import shutil
    shutil.copy(datadir / "train.npz", datadir / "val.npz")
    np.save(datadir / "size_distribution.npy", np.ones((17, 65)))

    cfg = small_cfg(tmp_path, datadir)
    hist = np.ones((17, 65))
    module = build_module_from_config(cfg, hist)

    train_ds = LigandPocketDataset(datadir / "train.npz")
    loader = PaddedLoader(train_ds, cfg.batch_size, lig_bucket=8,
                          pocket_bucket=64)
    trainer = Trainer(module, cfg, loader, loader)

    rng = jax.random.PRNGKey(0)
    params = module.init_params(rng, batch_size=2)
    state = create_train_state(params, lr=cfg.lr)
    state, rng = trainer.fit(state, rng, n_epochs=1, eval_every=1)
    assert int(state.step) == len(loader)

    ckpt_dir = trainer.ckpt_dir
    assert (ckpt_dir / "last.config.json").exists()
    cfg_json = json.loads((ckpt_dir / "last.config.json").read_text())
    assert "node_histogram" in cfg_json

    # reload and verify params match
    module2, state2, cfg2 = load_model(ckpt_dir, name="last")
    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        state.params, state2.params)
    assert all(jax.tree.leaves(same))

    # sample from the reloaded model
    if EXAMPLE_PDB.exists():
        mols, raw = module2.generate_ligands(
            state2.params, jax.random.PRNGKey(1), EXAMPLE_PDB, n_samples=2,
            ref_ligand="A:330", num_nodes_lig=np.array([6, 6]),
            return_raw=True)
        assert len(raw) == 2


@pytest.mark.skipif(not EXAMPLE_PDB.exists(), reason="example unavailable")
def test_generate_cli_main(tmp_path):
    """Drive the generate_ligands CLI main() against a saved checkpoint."""
    datadir = tmp_path / "data"
    datadir.mkdir()
    make_npz(datadir, n_complexes=4, a_nf=10, r_nf=20, seed=1)
    np.save(datadir / "size_distribution.npy", np.ones((17, 65)))

    cfg = small_cfg(tmp_path, datadir)
    module = build_module_from_config(cfg, np.ones((17, 65)))
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    state = create_train_state(params, lr=1e-3)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    save_model(ckpt_dir, module, state, cfg, name="best")

    from diffsbdd_tpu.cli.generate_ligands import main as gen_main
    outfile = tmp_path / "out.sdf"
    gen_main([str(ckpt_dir), "--pdbfile", str(EXAMPLE_PDB),
              "--ref_ligand", "A:330", "--outfile", str(outfile),
              "--n_samples", "2", "--num_nodes_lig", "6", "--all_frags"])
    assert outfile.exists()

    from diffsbdd_tpu.chem.sdfio import read_sdf
    mols = read_sdf(outfile)
    assert len(mols) >= 1


@pytest.mark.skipif(not Path("/root/reference/example/5ndu.pdb").exists(),
                    reason="example unavailable")
def test_inpaint_cli_main(tmp_path):
    datadir = tmp_path / "data"
    datadir.mkdir()
    cfg = small_cfg(tmp_path, datadir)
    module = build_module_from_config(cfg, np.ones((17, 65)))
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    state = create_train_state(params, lr=1e-3)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    save_model(ckpt_dir, module, state, cfg, name="best")

    from diffsbdd_tpu.cli.inpaint import main as inpaint_main
    outfile = tmp_path / "inpainted.sdf"
    inpaint_main([str(ckpt_dir),
                  "--pdbfile", "/root/reference/example/5ndu.pdb",
                  "--ref_ligand", "A:201",
                  "--fix_atoms", "C1", "N1",
                  "--outfile", str(outfile), "--n_samples", "2",
                  "--add_n_nodes", "4",
                  "--timesteps", "5", "--resamplings", "2"])
    assert outfile.exists()


@pytest.mark.skipif(not Path("/root/reference/example/5ndu.pdb").exists(),
                    reason="example unavailable")
def test_inpaint_save_traj(tmp_path):
    datadir = tmp_path / "data"
    datadir.mkdir()
    cfg = small_cfg(tmp_path, datadir)
    module = build_module_from_config(cfg, np.ones((17, 65)))
    params = module.init_params(jax.random.PRNGKey(0))
    state = create_train_state(params, lr=1e-3)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    save_model(ckpt_dir, module, state, cfg, name="best")

    from diffsbdd_tpu.cli.inpaint import main as inpaint_main
    outfile = tmp_path / "traj.sdf"
    inpaint_main([str(ckpt_dir),
                  "--pdbfile", "/root/reference/example/5ndu.pdb",
                  "--ref_ligand", "A:201",
                  "--fix_atoms", "C1", "N1",
                  "--outfile", str(outfile), "--n_samples", "1",
                  "--add_n_nodes", "4",
                  "--timesteps", "5", "--resamplings", "2", "--save_traj"])
    assert outfile.exists()
    from diffsbdd_tpu.chem.sdfio import read_sdf
    mols = read_sdf(outfile)
    assert len(mols) == 5  # one molecule per denoising frame
