"""Training-step time breakdown at the flagship configuration.

Splits the full train step (loss + backward + AdamW + adaptive clipping,
``train/loop.py::make_train_step``) into:

* loss forward alone (no grad),
* value_and_grad (forward + backward, no optimizer),
* the full step (adds AdamW + clip),
* optional depth sweep (--layers 1 3 6) separating per-layer backward cost
  from fixed overhead, and a kernel_bwd='xla' point for the Pallas-vs-XLA
  backward split.

The forward half of value_and_grad equals the loss-forward time (the VJP
recompute strategy stores row/col projections, not (B,N,N,F) messages), so
``bwd = grad - fwd`` is the backward kernel + glue cost.

    python benchmarks/train_profile.py --batch 32 [--layers 6] [--bwd auto]
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


def _make_batch(module, batch, n_lig, seed=1):
    import jax
    import jax.numpy as jnp

    from bench import get_pocket
    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask

    pocket = get_pocket(module, batch)
    rng_np = np.random.default_rng(0)
    num_nodes = np.clip(module.ddpm.size_distribution.sample_conditional(
        n2=np.asarray(pocket["size"]), rng=rng_np), 8, n_lig)
    m_l = jnp.asarray(num_nodes_to_mask(num_nodes, n_lig))
    k = jax.random.PRNGKey(seed)
    ligand = {
        "x": jax.random.normal(k, (batch, n_lig, 3)) * m_l[..., None],
        "one_hot": jax.nn.one_hot(
            jax.random.randint(k, (batch, n_lig), 0, module.atom_nf),
            module.atom_nf) * m_l[..., None],
        "mask": m_l, "size": jnp.asarray(num_nodes, jnp.int32),
    }
    return ligand, pocket


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--impl", default="pallas")
    p.add_argument("--bwd", default="auto")
    p.add_argument("--precision", default="float32_x2")
    p.add_argument("--layers", type=int, nargs="+", default=[6])
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--T", type=int, default=500)
    p.add_argument("--cpu", action="store_true",
                   help="smoke mode: force the CPU platform")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--with-xla-bwd", action="store_true",
                   help="also time the kernel_bwd='xla' full step")
    args = p.parse_args()

    if args.cpu:
        import os
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from benchmarks.kernel_bench import _cache
    if not args.cpu:
        _cache()
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _flagship_module
    from diffsbdd_tpu.train.loop import create_train_state, make_train_step

    B = args.batch
    out = {"batch": B, "impl": args.impl, "precision": args.precision,
           "bwd": args.bwd, "points": {}}

    def timeit(fn, sync, label, repeats=args.repeats):
        t0 = time.time()
        r = fn()
        sync(r)
        compile_s = time.time() - t0
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            r = fn()
            sync(r)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) * 1e3)
        print(f"{label}: {ms:.1f} ms (compile {compile_s:.1f}s, "
              f"spread {min(ts)*1e3:.1f}-{max(ts)*1e3:.1f})", flush=True)
        return ms

    for n_layers in args.layers:
        cfg, module = _flagship_module(
            n_lig_max=24, n_pocket_max=320, T=args.T,
            hidden_nf=args.hidden, n_layers=n_layers,
            matmul_precision=args.precision, egnn_impl=args.impl,
            kernel_bwd=args.bwd)
        params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
        state = create_train_state(params, lr=1e-4)
        ligand, pocket = _make_batch(module, B, 24)

        loss_j = jax.jit(lambda p, k: module.loss_fn(
            p, k, ligand, pocket, training=True)[0])
        grad_j = jax.jit(lambda p, k: jax.value_and_grad(
            lambda q: module.loss_fn(q, k, ligand, pocket,
                                     training=True)[0])(p)[1])
        step = make_train_step(module, lr=1e-4)

        key = jax.random.PRNGKey(2)
        pt = {}
        pt["fwd_ms"] = timeit(
            lambda: loss_j(state.params, key),
            lambda r: r.block_until_ready(), f"L{n_layers} loss fwd")
        pt["grad_ms"] = timeit(
            lambda: grad_j(state.params, key),
            lambda r: jax.tree_util.tree_leaves(r)[0].block_until_ready(),
            f"L{n_layers} value_and_grad")
        pt["step_ms"] = timeit(
            lambda: step(state, key, ligand, pocket),
            lambda r: jax.tree_util.tree_leaves(
                r[0].params)[0].block_until_ready(),
            f"L{n_layers} full step")
        pt["bwd_ms"] = round(pt["grad_ms"] - pt["fwd_ms"], 2)
        pt["opt_ms"] = round(pt["step_ms"] - pt["grad_ms"], 2)
        out["points"][f"layers{n_layers}"] = pt

        if args.with_xla_bwd and n_layers == max(args.layers):
            _, mod_x = _flagship_module(
                n_lig_max=24, n_pocket_max=320, T=args.T,
                hidden_nf=args.hidden, n_layers=n_layers,
                matmul_precision=args.precision, egnn_impl=args.impl,
                kernel_bwd="xla")
            grad_x = jax.jit(lambda p, k: jax.value_and_grad(
                lambda q: mod_x.loss_fn(q, k, ligand, pocket,
                                        training=True)[0])(p)[1])
            out["points"][f"layers{n_layers}"]["grad_xla_bwd_ms"] = timeit(
                lambda: grad_x(state.params, key),
                lambda r: jax.tree_util.tree_leaves(r)[0].block_until_ready(),
                f"L{n_layers} value_and_grad (xla bwd)")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
