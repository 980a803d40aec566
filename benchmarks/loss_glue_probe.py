"""Probe: why is the training-layout dynamics forward ~2x a sampling step?

First run (2026-08-19, B=32, x2): dynamics fwd (per-sample t, no
shared_pocket) 65.6 ms; loss_terms end-to-end 64.8 ms -> the VLB glue is
FREE (the old 'fixed 24.6 ms of loss glue' reading of train_profile's
layer sweep was wrong).  The cost is in the dynamics call itself, so this
A/Bs the layout differences vs the sampling path back-to-back on one
tunnel state:

* per-sample t vs uniform t
* shared_pocket=False vs True (batch-invariant pocket factorization)
* a full _denoise_step (what the chain benchmark actually runs per step)

    python benchmarks/loss_glue_probe.py --batch 32
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
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--precision", default="float32_x2")
    args = p.parse_args()

    from benchmarks.kernel_bench import _cache
    _cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_module
    from benchmarks.train_profile import _make_batch

    B = args.batch
    cfg, module = _flagship_module(
        n_lig_max=24, n_pocket_max=320, T=500,
        matmul_precision=args.precision, egnn_impl="pallas",
        n_layers=args.layers)
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    ligand, pocket = _make_batch(module, B, 24)
    ddpm = module.ddpm
    nd = ddpm.n_dims

    lign, pktn = ddpm.normalize(ligand, pocket)
    xh_lig = jnp.concatenate([lign["x"], lign["one_hot"]], -1)
    xh_pkt = jnp.concatenate([pktn["x"], pktn["one_hot"]], -1)
    m_l, m_p = lign["mask"], pktn["mask"]
    t_per_sample = jnp.linspace(0.1, 0.9, B)[:, None]
    t_uniform = jnp.full((B, 1), 0.42)

    def timeit(fn, label):
        r = fn()
        jax.tree_util.tree_leaves(r)[0].block_until_ready()
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            r = fn()
            jax.tree_util.tree_leaves(r)[0].block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {np.median(ts)*1e3:.1f} ms "
              f"({min(ts)*1e3:.1f}-{max(ts)*1e3:.1f})", flush=True)
        return float(np.median(ts) * 1e3)

    dyn = {}
    for label, t, sp in [
            ("train layout (per-sample t, sp=F)", t_per_sample, False),
            ("uniform t, sp=F", t_uniform, False),
            ("uniform t, sp=T", t_uniform, True)]:
        dyn[label] = jax.jit(
            lambda p_, t_=t, sp_=sp: ddpm.apply_dynamics(
                p_, xh_lig, xh_pkt, t_, m_l, m_p, shared_pocket=sp_))

    step = jax.jit(lambda p_, k: ddpm._denoise_step(
        p_, k, xh_lig, xh_pkt, m_l, m_p,
        jnp.full((B, 1), 0.4), jnp.full((B, 1), 0.402),
        shared_pocket=True))
    loss = jax.jit(lambda p_, k: ddpm.loss_terms(
        p_, k, ligand, pocket, True)["error_t_lig"])
    key = jax.random.PRNGKey(2)

    K = 10

    @jax.jit
    def step_scan(p_, k):
        def body(z, kk):
            out_l, out_p = ddpm._denoise_step(
                p_, kk, z, xh_pkt, m_l, m_p,
                jnp.full((B, 1), 0.4), jnp.full((B, 1), 0.402),
                shared_pocket=True)
            return out_l, 0
        z, _ = jax.lax.scan(body, xh_lig, jax.random.split(k, K))
        return z

    @jax.jit
    def loss_scan(p_, k):
        def body(c, kk):
            return c + ddpm.loss_terms(
                p_, kk, ligand, pocket, True)["error_t_lig"], 0
        c, _ = jax.lax.scan(
            body, jnp.zeros((B,)), jax.random.split(k, K))
        return c

    for label, fn in dyn.items():
        timeit(lambda f=fn: f(params), f"dynamics {label}")
    timeit(lambda: step(params, key), "full _denoise_step (sp=T)")
    ms = timeit(lambda: step_scan(params, key), f"{K}x _denoise_step scan")
    print(f"  -> {ms / K:.1f} ms/step in-scan "
          f"(dispatch overhead ~{max(0.0, 60.0 - ms / K):.0f} ms if chain-parity)",
          flush=True)
    timeit(lambda: loss(params, key), "loss_terms fwd")
    ms = timeit(lambda: loss_scan(params, key), f"{K}x loss_terms scan")
    print(f"  -> {ms / K:.1f} ms/loss in-scan", flush=True)
    # repeat the first point to expose tunnel drift within the run
    timeit(lambda: dyn["train layout (per-sample t, sp=F)"](params),
           "dynamics train layout (repeat)")


if __name__ == "__main__":
    main()
