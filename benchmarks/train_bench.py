"""Training-step micro-benchmark at the flagship configuration.

Times the full jitted train step (loss + grads + AdamW + adaptive clipping)
on the real-pocket workload, for the Pallas-forward path (whose backward
currently recomputes through the dense-XLA twins) and optionally the dense
path, and reports steps/sec plus device-memory feasibility per batch size.

    python benchmarks/train_bench.py [--batch 8] [--impl pallas|xla]
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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--impl", default="pallas")
    p.add_argument("--bwd", default="auto",
                   help="'auto'(->pallas) | 'pallas' | 'xla' backward")
    p.add_argument("--bwd-sub-j", type=int, default=None)
    p.add_argument("--precision", default="float32_x3")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from benchmarks.kernel_bench import _cache
    _cache()
    import jax
    import jax.numpy as jnp

    import bench
    from __graft_entry__ import _flagship_module
    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask
    from diffsbdd_tpu.train.loop import create_train_state, make_train_step

    B = args.batch
    cfg, module = _flagship_module(
        n_lig_max=24, n_pocket_max=320, T=500,
        matmul_precision=args.precision, egnn_impl=args.impl,
        kernel_bwd=args.bwd, kernel_bwd_sub_j=args.bwd_sub_j)
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    state = create_train_state(params, lr=1e-4)
    step = make_train_step(module, lr=1e-4)

    pocket = bench.get_pocket(module, B)
    rng_np = np.random.default_rng(0)
    num_nodes = np.clip(module.ddpm.size_distribution.sample_conditional(
        n2=np.asarray(pocket["size"]), rng=rng_np), 8, 24)
    m_l = jnp.asarray(num_nodes_to_mask(num_nodes, 24))
    k = jax.random.PRNGKey(1)
    ligand = {
        "x": jax.random.normal(k, (B, 24, 3)) * m_l[..., None],
        "one_hot": jax.nn.one_hot(
            jax.random.randint(k, (B, 24), 0, module.atom_nf),
            module.atom_nf) * m_l[..., None],
        "mask": m_l, "size": jnp.asarray(num_nodes, jnp.int32),
    }

    def sync(s):
        return float(jnp.sum(s.params["dynamics"]["params"]["egnn"]
                             ["embedding"]["kernel"]))

    t0 = time.time()
    state2, info = step(state, jax.random.PRNGKey(2), ligand, pocket)
    sync(state2)
    compile_s = time.time() - t0

    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        state2, info = step(state2, jax.random.PRNGKey(3 + i), ligand, pocket)
        sync(state2)
        times.append(time.perf_counter() - t0)

    dt = float(np.median(times))
    print(json.dumps({
        "impl": args.impl, "bwd": args.bwd, "precision": args.precision,
        "batch": B,
        "ms_per_train_step": round(dt * 1e3, 1),
        "steps_per_sec": round(1.0 / dt, 3),
        "samples_per_sec": round(B / dt, 2),
        "compile_s": round(compile_s, 1),
        "loss": float(info["loss"]),
    }))


if __name__ == "__main__":
    main()
