"""Micro-benchmark for the fused Pallas EGNN kernels at the bench shape.

Times one gcl_message_agg and one coord_update_agg call on realistic data
(the 3rfm pocket's coordinates, so cutoff sparsity matches production) and
compares against the dense-XLA twins.  Use to evaluate kernel changes before
a full bench.py run.

    python benchmarks/kernel_bench.py [--batch 8] [--n 384] [--f 256]
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


def _cache():
    import jax
    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def realistic_inputs(B, N, F, anf_lig=32, seed=0):
    """Pocket coords from 3rfm (spatially realistic) + random ligand blob."""
    import jax.numpy as jnp

    from diffsbdd_tpu.chem.pdb import get_pocket_from_ligand, parse_pdb

    struct = parse_pdb("/root/reference/example/3rfm.pdb")
    residues = get_pocket_from_ligand(struct, "A:330")
    coords = np.concatenate([r.coords() for r in residues], 0)[: N - anf_lig]
    n_pkt = coords.shape[0]
    rng = np.random.default_rng(seed)
    lig = coords.mean(0) + rng.standard_normal((anf_lig, 3)) * 2.0

    x = np.zeros((B, N, 3), np.float32)
    mask = np.zeros((B, N), np.float32)
    is_lig = np.zeros((B, N), np.float32)
    x[:, :anf_lig] = lig
    x[:, anf_lig:anf_lig + n_pkt] = coords
    mask[:, :anf_lig + n_pkt] = 1.0
    is_lig[:, :anf_lig] = 1.0

    a_row = rng.standard_normal((B, N, F)).astype(np.float32) * 0.3
    a_col = rng.standard_normal((B, N, F)).astype(np.float32) * 0.3
    w_d2 = rng.standard_normal((F,)).astype(np.float32) * 0.1
    w_d20 = rng.standard_normal((F,)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((F, F)).astype(np.float32) / np.sqrt(F)
    b2 = rng.standard_normal((F,)).astype(np.float32) * 0.1
    w_att = rng.standard_normal((F, 1)).astype(np.float32) / np.sqrt(F)
    b_att = np.zeros((1,), np.float32)
    w3 = rng.standard_normal((F, 1)).astype(np.float32) / np.sqrt(F)
    tb = rng.standard_normal((2, 2, F)).astype(np.float32) * 0.1
    j = jnp.asarray
    return dict(a_row=j(a_row), a_col=j(a_col), x=j(x), x0=j(x),
                mask=j(mask), is_lig=j(is_lig), w_d2=j(w_d2), w_d20=j(w_d20),
                w2=j(w2), b2=j(b2), w_att=j(w_att), b_att=j(b_att), w3=j(w3),
                tb=j(tb))


def timeit(step, init, iters=16, repeats=3):
    """True per-call time via chained execution + host-transfer sync.

    On this host's TPU tunnel ``jax.block_until_ready`` does NOT wait for
    device completion (measured: 30 chained 4k matmuls "ready" in 3.7 ms,
    real compute surfacing only on transfer), and an independently timed
    small call measures the ~30 ms RPC round-trip instead of kernel time.
    So: run the op chained into itself inside one jitted fori_loop at two
    iteration counts, sync each by transferring a scalar, and difference out
    the fixed dispatch+transfer cost.
    """
    import jax
    import jax.numpy as jnp

    def chained(n):
        f = jax.jit(lambda x0: jax.lax.fori_loop(
            0, n, lambda i, x: step(x), x0), static_argnums=())
        g = jax.jit(lambda x0: jnp.sum(f(x0) * 1e-6))
        float(g(init))  # compile + warm
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(init))  # transfer forces full sync
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_long = chained(iters)
    t_short = chained(1)
    return (t_long - t_short) / (iters - 1) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n", type=int, default=384)
    p.add_argument("--f", type=int, default=256)
    p.add_argument("--skip-xla", action="store_true")
    p.add_argument("--precision", default="float32",
                   choices=["float32", "float32_x3", "float32_x2",
                            "bfloat16", "tensorfloat32"])
    p.add_argument("--with-cross", action="store_true",
                   help="time the coordinate kernel with the SE(3) "
                        "cross-product MLP (flagship configs enable it)")
    p.add_argument("--sub-j", type=int, default=32)
    p.add_argument("--tile-i", type=int, default=16)
    p.add_argument("--type-bias", action="store_true",
                   help="include the (2,2,F) edge-type table (flagship "
                        "configs have one; its per-node parts are folded)")
    p.add_argument("--skip-mode", default="bits",
                   choices=["bits", "compact"],
                   help="cutoff-skip machinery (requires --bits for the "
                        "d2_0 input; 'compact' = prefetched index lists)")
    p.add_argument("--bits", action="store_true",
                   help="SMEM-prefetched block-activity bits (production "
                        "sampler path passes d2_0)")
    p.add_argument("--update-rows", type=int, default=None,
                   help="truncate the coord kernel grid to the leading rows "
                        "(production conditional path uses the ligand count)")
    args = p.parse_args()

    _cache()
    import jax
    import jax.numpy as jnp

    from diffsbdd_tpu.ops import egnn_pallas as K

    inp = realistic_inputs(args.batch, args.n, args.f)
    tb = inp["tb"] if args.type_bias else None
    cutoffs = (None, 5.0, 5.0)
    kw = dict(cutoffs=cutoffs, attention=True, normalization_factor=100.0)
    d2_0 = None
    if args.bits:
        d2_0 = jnp.sum((inp["x0"][:, :, None, :]
                        - inp["x0"][:, None, :, :]) ** 2, -1)

    def gcl_step(a_row):
        out = K.gcl_message_agg_pallas(
            a_row, inp["a_col"], inp["x"], inp["x0"], inp["mask"],
            inp["is_lig"], inp["w_d2"], inp["w_d20"], tb, inp["w2"],
            inp["b2"], inp["w_att"], inp["b_att"], d2_0=d2_0,
            mxu_precision=args.precision, sub_j=args.sub_j,
            tile_i=args.tile_i, skip_mode=args.skip_mode, **kw)
        return out * 0.05 + 0.1  # keep activations bounded across the chain

    ms_gcl = timeit(gcl_step, inp["a_row"])

    ckw = dict(cutoffs=cutoffs, tanh=True, coords_range=15.0,
               norm_constant=1.0, normalization_factor=100.0)

    cross = None
    graph_mean = None
    if args.with_cross:
        cross = dict(a_row=inp["a_row"], a_col=inp["a_col"],
                     w_d2=inp["w_d2"], w_d20=inp["w_d20"], type_bias=None,
                     w2=inp["w2"], b2=inp["b2"], w3=inp["w3"])
        graph_mean = (jnp.sum(inp["x"] * inp["mask"][..., None], 1)
                      / jnp.sum(inp["mask"], 1)[:, None])

    def coord_step(x):
        out = K.coord_update_agg_pallas(
            inp["a_row"], inp["a_col"], x, inp["x0"], inp["mask"],
            inp["is_lig"], inp["w_d2"], inp["w_d20"], tb, inp["w2"],
            inp["b2"], inp["w3"], mxu_precision=args.precision,
            sub_j=args.sub_j, tile_i=args.tile_i, cross=cross,
            graph_mean=graph_mean, d2_0=d2_0,
            update_rows=args.update_rows, skip_mode=args.skip_mode, **ckw)
        return x + out * 0.01  # adjacency comes from x0, so drift is safe

    ms_coord = timeit(coord_step, inp["x"])

    result = {"shape": [args.batch, args.n, args.f],
              "precision": args.precision, "sub_j": args.sub_j,
              "tile_i": args.tile_i, "with_cross": args.with_cross,
              "bits": args.bits, "skip_mode": args.skip_mode,
              "update_rows": args.update_rows,
              "gcl_ms": round(ms_gcl, 2), "coord_ms": round(ms_coord, 2)}

    if not args.skip_xla:
        def gclx_step(a_row):
            with jax.default_matmul_precision("float32"):
                out = K.gcl_message_agg_xla(
                    a_row, inp["a_col"], inp["x"], inp["x0"], inp["mask"],
                    inp["is_lig"], inp["w_d2"], inp["w_d20"], tb,
                    inp["w2"], inp["b2"], inp["w_att"], inp["b_att"], **kw)
            return out * 0.05 + 0.1

        ms_x = timeit(gclx_step, inp["a_row"])
        err = float(jnp.abs(
            gcl_step(inp["a_row"]) - gclx_step(inp["a_row"])).max())
        result.update({"gcl_xla_f32_ms": round(ms_x, 2),
                       "gcl_max_err_vs_xla_f32": err})
    print(json.dumps(result))


if __name__ == "__main__":
    main()
