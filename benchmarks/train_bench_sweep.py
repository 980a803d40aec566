"""Training-throughput sweep -> benchmarks/TRAIN_BENCH_r03.json.

Runs the full jitted train step (loss + fused Pallas backward + AdamW +
adaptive clipping, the same workload as train_bench.py) at several batch
sizes in ONE process (shared warm compile cache, one device handle), with
short rests between points to keep the tunnel out of its sustained-load
degradation, and records the sweep plus the measured reference anchor.

    python benchmarks/train_bench_sweep.py [--batches 8 32 64] \
        [--precision float32_x2] [--repeats 3]
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
    p.add_argument("--batches", type=int, nargs="+", default=[8, 32, 64])
    p.add_argument("--impl", default="pallas")
    p.add_argument("--bwd", default="auto")
    p.add_argument("--precision", default="float32_x2")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--ab-bwd-precision", default="bfloat16",
                   help="after the batch sweep, re-measure the best batch "
                        "with this backward-only MXU tier "
                        "(kernel_bwd_precision); '' skips the A/B")
    p.add_argument("--chain-steps", type=int, default=8,
                   help="after the batch sweep, re-measure the best batch "
                        "with K optimizer steps chained into one dispatch "
                        "(make_train_step(chain_steps=K), bit-identical "
                        "math); 0 skips the A/B")
    p.add_argument("--out", type=Path,
                   default=REPO / "benchmarks" / "TRAIN_BENCH_r03.json")
    args = p.parse_args()

    from benchmarks.kernel_bench import _cache
    _cache()
    import jax
    import jax.numpy as jnp

    from benchmarks.train_profile import _make_batch
    from __graft_entry__ import _flagship_module
    from diffsbdd_tpu.train.loop import create_train_state, make_train_step

    cfg, module = _flagship_module(
        n_lig_max=24, n_pocket_max=320, T=500,
        matmul_precision=args.precision, egnn_impl=args.impl,
        kernel_bwd=args.bwd)
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    state = create_train_state(params, lr=1e-4)
    step = make_train_step(module, lr=1e-4)

    def sync(s):
        jax.tree_util.tree_leaves(s.params)[0].block_until_ready()

    def mfu_for(dt, B, ligand, pocket, bwd_precision=None):
        """FLOP/MFU accounting per point (VERDICT r03 #4) — the same hand
        model as train_bench.py: 3x forward-FLOPs for the train step
        (forward + recompute-and-grad backward), activity from the real
        pocket geometry.  Accounting must never sink a measurement."""
        try:
            from diffsbdd_tpu.utils.flops import (TIER_PASSES,
                                                  block_activity,
                                                  eps_net_flops, mfu_report)
            x_p = np.asarray(pocket["x"][:1])
            m_p = np.asarray(pocket["mask"][:1])
            n_pkt = x_p.shape[1]
            n_pad = -(-(24 + n_pkt) // 128) * 128
            xx = np.zeros((1, n_pad, 3), np.float32)
            mm = np.zeros((1, n_pad), np.float32)
            il = np.zeros((1, n_pad), np.float32)
            xx[:, :24] = np.asarray(ligand["x"][:1])
            xx[:, 24:24 + n_pkt] = x_p
            mm[:, :24] = np.asarray(ligand["mask"][:1])
            mm[:, 24:24 + n_pkt] = m_p
            il[:, :24] = 1.0
            act = block_activity(xx, mm, il, (None, 5.0, 5.0))
            fl = eps_net_flops(batch=B, n_lig_rows=24, n_pocket=n_pkt,
                               n_pad=n_pad, hidden_nf=256, n_layers=6,
                               activity=act, shared_pocket=False)
            fwd = mfu_report(fl, dt, args.precision)
            bwd_passes = TIER_PASSES.get(bwd_precision or args.precision, 1)
            executed = (fl["mxu_flops_pairwise"]
                        * (TIER_PASSES.get(args.precision, 1)
                           + 2 * bwd_passes)
                        + 3 * fl["mxu_flops_node_level"])
            return {
                "block_activity": round(act, 4),
                "flops_per_train_step_model": 3 * fl["mxu_flops_total"],
                "flops_per_train_step_mxu_executed": executed,
                "mfu_model": round(3 * fl["mxu_flops_total"] / dt
                                   / fwd["peaks"]["mxu_f32"], 4),
                "mxu_utilization_executed": round(
                    executed / dt / fwd["peaks"]["mxu_bf16"], 4),
                "vpu_ops_per_train_step_est": 3 * fl["vpu_ops"],
                "vpu_utilization_est": round(3 * fl["vpu_ops"] / dt
                                             / fwd["peaks"]["vpu_est"], 4),
                "note": "3x forward multiplier (fwd + recompute-and-grad "
                        "bwd)",
            }
        except Exception as e:
            return {"error": f"{type(e).__name__}: {e}"[:200]}

    points = {}
    for i, B in enumerate(args.batches):
        if i:
            time.sleep(15)
        try:
            ligand, pocket = _make_batch(module, B, 24)
            t0 = time.time()
            s2, info = step(state, jax.random.PRNGKey(2), ligand, pocket)
            sync(s2)
            compile_s = time.time() - t0
            ts = []
            for r in range(args.repeats):
                t0 = time.perf_counter()
                s2, info = step(s2, jax.random.PRNGKey(3 + r), ligand,
                                pocket)
                sync(s2)
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            points[f"b{B}"] = {
                "batch": B, "ms_per_train_step": round(dt * 1e3, 1),
                "samples_per_sec": round(B / dt, 2),
                "compile_s": round(compile_s, 1),
                "loss": round(float(info["loss"]), 4),
                "mfu": mfu_for(dt, B, ligand, pocket),
            }
            print(f"b{B}: {json.dumps(points[f'b{B}'])}", flush=True)
        except Exception as e:
            points[f"b{B}"] = {"batch": B,
                               "error": f"{type(e).__name__}: {e}"[:200]}
            print(f"b{B} failed: {points[f'b{B}']['error']}", flush=True)

    ok = {k: v for k, v in points.items() if "samples_per_sec" in v}
    best = max(ok, key=lambda k: ok[k]["samples_per_sec"]) if ok else None

    bwd_ab = None
    if best and args.ab_bwd_precision:
        # backward-only fast tier at the winning batch: same forward tier,
        # bf16 dots in the fused backward kernels (kernel_bwd_precision)
        time.sleep(15)
        try:
            B = ok[best]["batch"]
            _, mod_ab = _flagship_module(
                n_lig_max=24, n_pocket_max=320, T=500,
                matmul_precision=args.precision, egnn_impl=args.impl,
                kernel_bwd=args.bwd,
                kernel_bwd_precision=args.ab_bwd_precision)
            step_ab = make_train_step(mod_ab, lr=1e-4)
            ligand, pocket = _make_batch(mod_ab, B, 24)
            s2, info = step_ab(state, jax.random.PRNGKey(2), ligand, pocket)
            sync(s2)
            ts = []
            for r in range(args.repeats):
                t0 = time.perf_counter()
                s2, info = step_ab(s2, jax.random.PRNGKey(3 + r), ligand,
                                   pocket)
                sync(s2)
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            bwd_ab = {
                "batch": B, "bwd_precision": args.ab_bwd_precision,
                "ms_per_train_step": round(dt * 1e3, 1),
                "samples_per_sec": round(B / dt, 2),
                "loss": round(float(info["loss"]), 4),
                "speedup_vs_default_bwd": round(
                    (B / dt) / ok[best]["samples_per_sec"], 3),
                "mfu": mfu_for(dt, B, ligand, pocket,
                               bwd_precision=args.ab_bwd_precision),
            }
            print(f"bwd-ab: {json.dumps(bwd_ab)}", flush=True)
        except Exception as e:
            bwd_ab = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"bwd-ab failed: {bwd_ab['error']}", flush=True)

    chain_ab = None
    if best and args.chain_steps > 1:
        # chained dispatch at the winning batch: K full optimizer steps per
        # execute call (lax.scan over stacked batches) — bit-identical math,
        # pays the per-dispatch host/tunnel latency (~23 ms measured,
        # loss_glue_probe.py) once per K steps instead of per step
        time.sleep(15)
        try:
            K = args.chain_steps
            B = ok[best]["batch"]
            step_k = make_train_step(module, lr=1e-4, chain_steps=K)
            ligand, pocket = _make_batch(module, B, 24)
            stack = lambda d: jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (K,) + a.shape), d)
            lig_k, pkt_k = stack(ligand), stack(pocket)
            keys = jax.random.split(jax.random.PRNGKey(2), K)
            t0 = time.time()
            s2, infos = step_k(state, keys, lig_k, pkt_k)
            sync(s2)
            compile_s = time.time() - t0
            ts = []
            for r in range(args.repeats):
                keys = jax.random.split(jax.random.PRNGKey(3 + r), K)
                t0 = time.perf_counter()
                s2, infos = step_k(s2, keys, lig_k, pkt_k)
                sync(s2)
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts)) / K
            chain_ab = {
                "batch": B, "chain_steps": K,
                "ms_per_train_step": round(dt * 1e3, 1),
                "samples_per_sec": round(B / dt, 2),
                "compile_s": round(compile_s, 1),
                "loss": round(float(infos["loss"][-1]), 4),
                "speedup_vs_single_dispatch": round(
                    (B / dt) / ok[best]["samples_per_sec"], 3),
                "mfu": mfu_for(dt, B, ligand, pocket),
            }
            print(f"chain-ab: {json.dumps(chain_ab)}", flush=True)
        except Exception as e:
            chain_ab = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"chain-ab failed: {chain_ab['error']}", flush=True)

    out = {
        "workload": "full train step: loss + fused Pallas backward + AdamW "
                    "+ adaptive clip, flagship model, real pocket (N=344)",
        "impl": args.impl, "bwd": args.bwd, "precision": args.precision,
        "repeats": args.repeats,
        "points": points,
        "headline_samples_per_sec": ok[best]["samples_per_sec"] if best
        else None,
        "headline_batch": ok[best]["batch"] if best else None,
        "bwd_precision_ab": bwd_ab,
        "chain_dispatch_ab": chain_ab,
    }
    if bwd_ab and "samples_per_sec" in bwd_ab and \
            bwd_ab["samples_per_sec"] > out["headline_samples_per_sec"]:
        out["headline_samples_per_sec"] = bwd_ab["samples_per_sec"]
        out["headline_bwd_precision"] = bwd_ab["bwd_precision"]
    if chain_ab and "samples_per_sec" in chain_ab and \
            chain_ab["samples_per_sec"] > out["headline_samples_per_sec"]:
        out["headline_samples_per_sec"] = chain_ab["samples_per_sec"]
        out["headline_chain_steps"] = chain_ab["chain_steps"]
    # measured anchor: reference training step on this host's CPU core
    # (benchmarks/measure_reference_cpu.py --train, BASELINE.json)
    try:
        anchor = json.loads((REPO / "BASELINE.json").read_text())[
            "measured"]["reference_cpu_train"]["value"]
        out["reference_cpu_samples_per_sec"] = anchor
        if best:
            out["vs_reference_cpu"] = round(
                ok[best]["samples_per_sec"] / anchor, 1)
    except Exception:
        pass
    args.out.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    print(f"written: {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
