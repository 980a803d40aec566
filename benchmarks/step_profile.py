"""Step-time breakdown for the flagship sampler at the bench shape.

Separates the per-step cost into (a) the full denoise step, (b) the eps-net
forward alone, and (c) sampler math overhead = (a) - (b); combine with
kernel_bench.py numbers for the kernel-vs-XLA-glue split inside (b).

    python benchmarks/step_profile.py [--batch 32] [--steps 50]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--precision", default="float32_x3")
    p.add_argument("--impl", default="pallas")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--shared-pocket", action="store_true", default=True)
    p.add_argument("--layers", type=int, default=6,
                   help="EGNN depth; sweep {1,3,6} to split per-layer cost "
                        "from fixed per-forward overhead (encoders, d2_0 "
                        "bits)")
    p.add_argument("--skip-full", action="store_true",
                   help="only time the eps-net forward (ablation sweeps)")
    p.add_argument("--sub-j", type=int, default=None)
    p.add_argument("--tile-i", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_module
    from bench import get_pocket
    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask, _xh

    cfg, module = _flagship_module(n_lig_max=24, n_pocket_max=320, T=500,
                                   n_layers=args.layers,
                                   matmul_precision=args.precision,
                                   egnn_impl=args.impl,
                                   kernel_sub_j=args.sub_j,
                                   kernel_tile_i=args.tile_i)
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    ddpm = module.ddpm

    B = args.batch
    pocket = get_pocket(module, B)
    rng_np = np.random.default_rng(0)
    num_nodes = np.clip(ddpm.size_distribution.sample_conditional(
        n2=np.asarray(pocket["size"]), rng=rng_np), 8, 24)
    m_l = jnp.asarray(num_nodes_to_mask(num_nodes, 24))
    m_p = pocket["mask"]
    xh_pkt = _xh(pocket)
    # normalized pocket representation as the sampler sees it
    xh_pkt = jnp.concatenate(
        [xh_pkt[..., :3] / ddpm.norm_values[0],
         xh_pkt[..., 3:] / ddpm.norm_values[1]], -1)
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (B, 24, 3 + ddpm.atom_nf)) * m_l[..., None]

    S = args.steps
    sp = args.shared_pocket

    @jax.jit
    def seg_full(params, z, key):
        """S real denoise steps (the production segment body)."""
        def body(carry, i):
            z, key = carry
            key, sub = jax.random.split(key)
            t = (500.0 - i) / 500.0
            s = (499.0 - i) / 500.0
            tb = jnp.full((B, 1), t)
            sb = jnp.full((B, 1), s)
            z, _ = ddpm._denoise_step(params, sub, z, xh_pkt, m_l, m_p,
                                      sb, tb, shared_pocket=sp)
            return (z, key), None
        (z, _), _ = jax.lax.scan(body, (z, key), jnp.arange(S))
        return z

    @jax.jit
    def seg_eps(params, z, key):
        """S eps-net forwards only (same t trajectory, no sampler math)."""
        def body(carry, i):
            z, key = carry
            t = (500.0 - i) / 500.0
            tb = jnp.full((B, 1), t)
            eps, _ = ddpm.apply_dynamics(params, z, xh_pkt, tb, m_l, m_p,
                                         shared_pocket=sp)
            # feed back a small perturbation so the loop isn't dead code
            return (z + 1e-3 * eps, key), None
        (z, _), _ = jax.lax.scan(body, (z, key), jnp.arange(S))
        return z

    def sync(out):
        return float(jnp.sum(out))

    def timeit(fn, label):
        sync(fn(params, z, jax.random.PRNGKey(2)))  # compile+warm
        times = []
        for r in range(args.repeats):
            t0 = time.perf_counter()
            sync(fn(params, z, jax.random.PRNGKey(3 + r)))
            times.append(time.perf_counter() - t0)
        ms = np.median(times) / S * 1e3
        print(f"{label}: {ms:.2f} ms/step  (all: "
              f"{[round(t / S * 1e3, 2) for t in times]})")
        return ms

    if args.skip_full:
        timeit(seg_eps, f"eps-net forward (layers={args.layers})")
        return
    full = timeit(seg_full, "full denoise step")
    eps = timeit(seg_eps, "eps-net forward  ")
    print(f"sampler math overhead: {full - eps:.2f} ms/step")


if __name__ == "__main__":
    main()
