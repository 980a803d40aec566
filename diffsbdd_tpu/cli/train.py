"""Training CLI — equivalent of /root/reference/train.py.

    python -m diffsbdd_tpu.cli.train --config configs/crossdock_fullatom_cond.yml
    python -m diffsbdd_tpu.cli.train --config ... --resume <ckpt_dir>

YAML presets are field-compatible with the reference's configs/; resume
restores weights, optimizer and the checkpoint's hyperparameters
(checkpoint config takes precedence, with warnings — train.py:29-38).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from diffsbdd_tpu.config import load_config, merge_configs
from diffsbdd_tpu.data.dataset import (LigandPocketDataset, PaddedLoader,
                                       AppendVirtualNodes,
                                       load_size_histogram)
from diffsbdd_tpu.train.loop import Trainer, create_train_state, restore_checkpoint
from diffsbdd_tpu.train.module import build_module_from_config


class WandbLogger:
    def __init__(self, cfg):
        self.run = None
        mode = cfg.wandb_params.get("mode", "disabled") \
            if hasattr(cfg.wandb_params, "get") else "disabled"
        if mode != "disabled":
            try:
                import wandb
                self.run = wandb.init(
                    project="ligand-pocket-ddpm",
                    name=cfg.run_name, id=cfg.run_name,
                    group=cfg.wandb_params.get("group"),
                    entity=cfg.wandb_params.get("entity"),
                    mode=mode, dir=cfg.logdir)
            except ImportError:
                print("wandb not installed; logging to stdout")

    def log(self, metrics, step):
        if self.run is not None:
            self.run.log(metrics, step=step)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--resume", type=str, default=None)
    args = p.parse_args(argv)

    cfg = load_config(args.config)
    if args.resume is not None:
        resume_cfg_file = sorted(Path(args.resume).glob("*.config.json"))
        if resume_cfg_file:
            resume_config = json.loads(resume_cfg_file[-1].read_text())
            resume_config.pop("node_histogram", None)
            cfg = load_config(
                args.config,
                overrides=merge_configs(cfg.to_dict(), resume_config))

    # multi-host pod: sets up jax multi-process mode when a coordinator is
    # configured; single-host runs are unaffected
    from diffsbdd_tpu.parallel.mesh import maybe_initialize_distributed
    n_proc = maybe_initialize_distributed(cfg)

    histogram = load_size_histogram(cfg.datadir)
    module = build_module_from_config(cfg, histogram)

    transform = None
    if cfg.virtual_nodes:
        transform = AppendVirtualNodes(
            module.max_num_nodes, module.lig_type_encoder, "Ne")

    train_ds = LigandPocketDataset(
        Path(cfg.datadir, "train.npz"), transform=transform)
    val_ds = LigandPocketDataset(
        Path(cfg.datadir, "val.npz"), transform=transform)
    # same-seeded rng on every host -> identical shuffle order; each host
    # yields its process_index slice of the global batch
    rng_np = np.random.default_rng(cfg.seed)
    pi = jax.process_index()
    train_loader = PaddedLoader(
        train_ds, cfg.batch_size, lig_bucket=cfg.tpu.lig_bucket,
        pocket_bucket=cfg.tpu.pocket_bucket, shuffle=True, rng=rng_np,
        process_index=pi, process_count=n_proc)
    val_loader = PaddedLoader(
        val_ds, cfg.batch_size, lig_bucket=cfg.tpu.lig_bucket,
        pocket_bucket=cfg.tpu.pocket_bucket, shuffle=False,
        process_index=pi, process_count=n_proc)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    params = module.init_params(init_rng, batch_size=2)
    state = create_train_state(params, lr=cfg.lr)
    if args.resume is not None:
        state, _ = restore_checkpoint(args.resume, state, name="last")
        print(f"resumed from {args.resume} at step {int(state.step)}")

    # periodic sampling-quality eval + visualization during training
    # (lightning_modules.py:382-410): molecule metrics on val pockets every
    # eval_epochs, rendered samples / chain GIFs on the visualize schedules
    from diffsbdd_tpu.train.evaluation import SamplingEvaluator
    logger = WandbLogger(cfg)
    smiles_file = Path(cfg.datadir, "train_smiles.npy")
    train_smiles = np.load(smiles_file, allow_pickle=True) \
        if smiles_file.exists() else None
    wandb_mod = None
    if logger.run is not None:
        import wandb as wandb_mod  # noqa: F811 — module for Image/Video
    evaluator = SamplingEvaluator(
        module, dataset=val_ds, dataset_smiles=train_smiles,
        outdir=Path(cfg.logdir) / cfg.run_name / "eval", wandb=wandb_mod,
        datadir=cfg.datadir)

    trainer = Trainer(module, cfg, train_loader, val_loader,
                      logger=logger, evaluator=evaluator)
    trainer.fit(state, rng, n_epochs=cfg.n_epochs)


if __name__ == "__main__":
    main()
