"""Chain-level A/B of the block-fused kernel vs the split kernels.

Runs the flagship conditional sampler (same pocket/masks/keys) with
tpu.kernel_block_fuse on and off, ALTERNATING runs back-to-back so both
arms see the same tunnel state (single measurements are +-25%,
NOTES.md).  Prints per-arm ms/step medians.

    python benchmarks/block_fuse_ab.py [--t 200] [--batch 32] [--rounds 3]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build(block_fuse, T, precision):
    from diffsbdd_tpu.config import load_config
    from diffsbdd_tpu.train.module import build_module_from_config
    cfg = load_config(overrides={
        "dataset": "crossdock", "mode": "pocket_conditioning",
        "pocket_representation": "full-atom",
        "egnn_params": {"joint_nf": 128, "hidden_nf": 256, "n_layers": 6,
                        "attention": True, "tanh": True, "norm_constant": 1,
                        "inv_sublayers": 1, "reflection_equivariant": False,
                        "edge_cutoff_ligand": None, "edge_cutoff_pocket": 5.0,
                        "edge_cutoff_interaction": 5.0},
        "diffusion_params": {"diffusion_steps": T,
                             "normalize_factors": [1, 4]},
        "tpu": {"n_lig_max": 24, "n_pocket_max": 320,
                "matmul_precision": precision, "egnn_impl": "pallas",
                "kernel_block_fuse": block_fuse},
    })
    return build_module_from_config(cfg, np.ones((25, 321)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=200)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--precision", default="float32_x2")
    args = p.parse_args()

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    import bench
    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask

    T, B = args.t, args.batch
    arms = {True: build(True, T, args.precision),
            False: build(False, T, args.precision)}
    params = arms[True].init_params(jax.random.PRNGKey(0), batch_size=2)
    pocket = bench.get_pocket(arms[True], B)
    rng_np = np.random.default_rng(0)
    num_nodes = np.clip(arms[True].ddpm.size_distribution.sample_conditional(
        n2=np.asarray(pocket["size"]), rng=rng_np), 8, 24)
    lig_mask = jnp.asarray(num_nodes_to_mask(num_nodes, 24))

    def run(module, key):
        out = module.ddpm.sample_given_pocket_segmented(
            params, key, pocket, lig_mask, timesteps=T, segment=50,
            shared_pocket=True)
        return float(jnp.sum(out[0]))

    # compile+warm both arms
    for fuse, module in arms.items():
        t0 = time.perf_counter()
        run(module, jax.random.PRNGKey(1))
        print(f"warm fuse={fuse}: {time.perf_counter()-t0:.1f}s", flush=True)

    times = {True: [], False: []}
    for r in range(args.rounds):
        for fuse in (True, False) if r % 2 == 0 else (False, True):
            t0 = time.perf_counter()
            run(arms[fuse], jax.random.PRNGKey(2 + r))
            times[fuse].append(time.perf_counter() - t0)

    out = {"t": T, "batch": B, "precision": args.precision,
           "ms_per_step": {
               "block_fused": round(np.median(times[True]) / T * 1e3, 2),
               "split": round(np.median(times[False]) / T * 1e3, 2)},
           "all_s": {"block_fused": [round(x, 2) for x in times[True]],
                     "split": [round(x, 2) for x in times[False]]}}
    out["speedup"] = round(out["ms_per_step"]["split"]
                           / out["ms_per_step"]["block_fused"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
