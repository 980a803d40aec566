"""Sweep the segmented-sampler chunk length at the bench configuration.

Separates real compute from per-dispatch tunnel overhead: the chain is
numerically identical for every segment length, so wall-clock differences are
pure dispatch/RPC cost.  Keep segments under ~60 s device time (tunnel
watchdog).

    python benchmarks/segment_sweep.py [--batch 32] [--segments 50 100 250]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--T", type=int, default=500)
    p.add_argument("--segments", type=int, nargs="+", default=[50, 100, 250])
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--shared-pocket", action="store_true")
    p.add_argument("--tile-i", type=int, default=None)
    p.add_argument("--sub-j", type=int, default=None)
    args = p.parse_args()

    from benchmarks.kernel_bench import _cache
    _cache()
    import jax
    import jax.numpy as jnp

    import bench
    from __graft_entry__ import _flagship_module
    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask

    n_lig = 24
    cfg, module = _flagship_module(
        n_lig_max=n_lig, n_pocket_max=320, T=args.T,
        matmul_precision="float32_x3", egnn_impl="pallas",
        kernel_tile_i=args.tile_i, kernel_sub_j=args.sub_j)
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    pocket = bench.get_pocket(module, args.batch)
    rng_np = np.random.default_rng(0)
    num_nodes = np.clip(module.ddpm.size_distribution.sample_conditional(
        n2=np.asarray(pocket["size"]), rng=rng_np), 8, n_lig)
    lig_mask = jnp.asarray(num_nodes_to_mask(num_nodes, n_lig))

    out = {}
    for seg in args.segments:
        def sample(key):
            return module.ddpm.sample_given_pocket_segmented(
                params, key, pocket, lig_mask, timesteps=args.T, segment=seg,
                shared_pocket=args.shared_pocket)

        r = sample(jax.random.PRNGKey(1))
        float(jnp.sum(r[0]))  # compile + warm
        ts = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            r = sample(jax.random.PRNGKey(2 + i))
            float(jnp.sum(r[0]))
            ts.append(round(time.perf_counter() - t0, 2))
        out[f"seg{seg}"] = {"wall_s": ts, "ms_per_step":
                            round(min(ts) / args.T * 1e3, 2)}
        print(json.dumps({f"seg{seg}": out[f"seg{seg}"]}), flush=True)

    print(json.dumps({"batch": args.batch, "T": args.T, **out}))


if __name__ == "__main__":
    main()
