"""Model checkpoint IO: build a model + params back from a saved run.

The reference restores both weights and the full hyperparameter namespace
from one Lightning checkpoint (train.py:56-63, generate_ligands.py:39).
Here a checkpoint is an Orbax directory + a JSON sidecar holding the config
and the size histogram, so ``load_model`` is the one-call equivalent of
``LigandPocketDDPM.load_from_checkpoint``.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np

from diffsbdd_tpu.config import Config, load_config
from diffsbdd_tpu.train.loop import (TrainState, create_train_state,
                                     restore_checkpoint)
from diffsbdd_tpu.train.module import LigandPocketDDPM, build_module_from_config


def save_model(ckpt_dir, module: LigandPocketDDPM, state: TrainState,
               cfg: Config, name: str = "last"):
    from diffsbdd_tpu.train.loop import save_checkpoint

    cfg_dict = cfg.to_dict()
    # Persist the RAW histogram: SizeDistribution smooths (+1e-3/cell) and
    # normalizes at construction, so saving .prob would double-smooth on load
    # and flatten the size prior toward uniform.
    cfg_dict["node_histogram"] = np.asarray(
        module.ddpm.size_distribution.raw_histogram).tolist()
    save_checkpoint(ckpt_dir, state, cfg_dict, name=name)


def load_model(ckpt_dir, name: str = "best",
               lr: Optional[float] = None
               ) -> Tuple[LigandPocketDDPM, TrainState, Config]:
    """Rebuild (module, state, config) from a checkpoint directory.

    ``lr``: optimizer learning rate for the rebuilt train state; defaults to
    the TRAINED run's cfg.lr so continued training steps at the recorded
    rate, not a hardcoded default."""
    ckpt_dir = Path(ckpt_dir)
    cfg_file = ckpt_dir / f"{name}.config.json"
    if not cfg_file.exists():
        # fall back to 'last' if the requested name is missing
        alt = "last" if name != "last" else "best"
        if (ckpt_dir / f"{alt}.config.json").exists():
            name = alt
            cfg_file = ckpt_dir / f"{name}.config.json"
        else:
            raise FileNotFoundError(f"no checkpoint config under {ckpt_dir}")
    cfg_dict = json.loads(cfg_file.read_text())
    histogram = np.asarray(cfg_dict.pop("node_histogram"))
    cfg = load_config(overrides=cfg_dict)
    module = build_module_from_config(cfg, histogram)

    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    template = create_train_state(
        params, lr=float(cfg.lr) if lr is None else lr)
    state, _ = restore_checkpoint(ckpt_dir, template, name=name)
    return module, state, cfg
