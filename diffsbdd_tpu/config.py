"""Config system: YAML presets compatible with the reference's config files.

The reference merges YAML dicts into an argparse Namespace with nested dicts
promoted to Namespaces (/root/reference/train.py:14-38).  Here configs are a
light recursive namespace with the same field names, so the eight reference
presets under configs/ load unchanged, plus TPU-specific additions
(padding/bucketing sizes, mesh shape, dtype policy).
"""
from __future__ import annotations

import copy
import warnings
from pathlib import Path
from typing import Any, Dict, Optional

import yaml


class Config:
    """Recursive attribute namespace over a dict."""

    def __init__(self, d: Optional[Dict[str, Any]] = None):
        if d:
            for k, v in d.items():
                setattr(self, k, Config(v) if isinstance(v, dict) else v)

    def get(self, key, default=None):
        return getattr(self, key, default)

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self.__dict__.items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    def __contains__(self, key):
        return key in self.__dict__

    def __repr__(self):
        return f"Config({self.to_dict()})"


# fields every training config must resolve; values are the reference's
# defaults where it defines them
_DEFAULTS: Dict[str, Any] = {
    "run_name": "run",
    "logdir": "runs",
    "dataset": "crossdock",
    "datadir": None,
    "mode": "pocket_conditioning",
    "pocket_representation": "CA",
    "virtual_nodes": False,
    "batch_size": 16,
    "lr": 1.0e-3,
    "n_epochs": 1000,
    "num_workers": 0,
    "gpus": 1,          # kept for config compatibility; mesh size on TPU
    "clip_grad": True,
    "augment_rotation": False,
    "augment_noise": 0,
    "accumulate_grad_batches": 1,
    "log_every_n_steps": 1,
    "auxiliary_loss": False,
    "eval_epochs": 50,
    "visualize_sample_epoch": 50,
    "visualize_chain_epoch": 50,
    "enable_progress_bar": True,
    "num_sanity_val_steps": 0,
    "seed": 42,
    "loss_params": {
        "max_weight": 0.001,
        "schedule": "linear",
        "clamp_lj": 3.0,
    },
    "egnn_params": {
        "device": "tpu",
        "edge_cutoff_ligand": None,
        "edge_cutoff_pocket": None,
        "edge_cutoff_interaction": None,
        "reflection_equivariant": True,
        "edge_embedding_dim": None,
        "joint_nf": 32,
        "hidden_nf": 128,
        "n_layers": 5,
        "attention": True,
        "tanh": True,
        "norm_constant": 1,
        "inv_sublayers": 1,
        "sin_embedding": False,
        "aggregation_method": "sum",
        "normalization_factor": 100,
    },
    "diffusion_params": {
        "diffusion_steps": 500,
        "diffusion_noise_schedule": "polynomial_2",
        "diffusion_noise_precision": 5.0e-4,
        "diffusion_loss_type": "l2",
        "normalize_factors": [1, 4],
    },
    "eval_params": {
        "n_eval_samples": 100,
        "eval_batch_size": 100,
        "smiles_file": None,
        "n_visualize_samples": 5,
        "keep_frames": 100,
    },
    "wandb_params": {"mode": "disabled", "entity": None, "group": None},
    # TPU-specific knobs (absent from reference configs; defaults apply)
    "tpu": {
        "n_lig_max": 48,          # ligand padding (virtual-node histogram max)
        "n_pocket_max": 512,      # pocket padding (full-atom worst case)
        "lig_bucket": 8,          # shape-bucket granularity
        "pocket_bucket": 64,
        "mesh_data": -1,          # -1: all visible devices on the data axis
        "compute_dtype": "float32",
        "matmul_precision": "float32",  # 'bfloat16' trades ~1e-2 eps noise for speed
        "remat": True,            # rematerialize EGNN blocks in training
        "egnn_impl": "auto",      # 'auto' | 'xla' | 'pallas'
        "kernel_tile_i": 16,      # fused-kernel row-tile height; 16 beats 32
                                  # at chain level (56.5 vs 59.4 ms/step, B=32)
        "kernel_skip_mode": "compact",  # 'compact' (prefetched active-block
        # index lists; no per-inactive-block branches — 1.016x over the
        # bits path at the same sub_j=16, 31.03 vs 31.53 ms/step at B=32
        # bf16, alternating A/B benchmarks/SKIP_AB_bits16_r04.json;
        # full-T500 bits-vs-compact deviation 1.5e-4 A, 0 type flips)
        # | 'bits' (per-column-block scalar predicates, the r03 path)
        "kernel_sub_j": 16,       # cutoff-skip granularity; 16 beats 32 with
                                  # prefetched bits (47.2 vs 50.7 ms/step)
        "kernel_bwd": "auto",     # training backward: 'auto'(->pallas) |
                                  # 'pallas' | 'xla' (dense-mirror recompute)
        "kernel_bwd_sub_j": None, # backward skip granularity (None -> fwd's)
        "kernel_bwd_precision": None,  # backward-only MXU tier (None -> fwd's)
        "kernel_block_fuse": False,  # sampling-path whole-block kernel fusion:
        # measured NEUTRAL on v5e (38.3 vs 37.9 ms/step at B=32, x2 tier:
        # the in-kernel node-MLP/projection dots cost what the deleted
        # coord-kernel dispatch saved) - available but off by default
        "steps_per_dispatch": 1,  # K>1: run K optimizer steps per device
                                  # dispatch (lax.scan over stacked batches),
                                  # bit-identical to K single steps; amortizes
                                  # per-dispatch host latency (~23 ms/call on
                                  # the remote tunnel, loss_glue_probe.py)
        "multihost": False,       # force jax.distributed.initialize() even
                                  # without coordinator env vars
        "nan_check": False,       # abort (host callback) on NaN EGNN
                                  # velocities, reference eval semantics
                                  # (dynamics.py:155-161); costs one host
                                  # sync per forward
    },
}


def _merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for k, v in (override or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path=None, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load a YAML config over the defaults (reference presets compatible)."""
    d: Dict[str, Any] = {}
    if path is not None:
        with open(path) as f:
            d = yaml.safe_load(f) or {}
    merged = _merge(_DEFAULTS, d)
    if overrides:
        merged = _merge(merged, overrides)
    return Config(merged)


def merge_configs(config: Dict[str, Any], resume_config: Dict[str, Any]):
    """Checkpoint config takes precedence, with warnings (train.py:29-38)."""
    for key, value in resume_config.items():
        if key in config and config[key] != value:
            warnings.warn(
                f"Config parameter '{key}' (value: {config[key]}) will be "
                f"overwritten with value {value} from the checkpoint.")
        config[key] = value
    return config
