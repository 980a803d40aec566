"""Chemical A/B of kernel precision tiers on a TRAINED checkpoint.

PRECISION_r02.json established coordinate-level tier fidelity (bf16: 0.09 A
full-chain max dev, 0 type flips) on random-init weights.  This script
answers the metric-level question: are bf16 samples *chemically*
distinguishable from the validated float32_x2 tier?  It samples the same
molecule set (identical PRNG keys, identical size draws) from one trained
checkpoint at each tier and compares validity / connectivity / uniqueness /
QED / atom-type KL — the reference's own eval metrics
(/root/reference/lightning_modules.py:412-478, analysis/metrics.py).

    python benchmarks/precision_chem_ab.py --ckpt <run>/checkpoints \
        --datadir <processed dir with val.npz> --n 64 \
        --tiers float32 float32_x2 bfloat16

Writes benchmarks/PRECISION_r03.json ({"chem_ab": ..., "trajectory": ...};
the trajectory section is merged in from precision_validation.py output via
--trajectory-json).
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
    p.add_argument("--ckpt", type=Path, required=True,
                   help="checkpoint dir (holds last.config.json + Orbax)")
    p.add_argument("--name", default="last")
    p.add_argument("--datadir", type=Path, required=True,
                   help="processed dir with val.npz (pockets to condition on)")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--tiers", nargs="+",
                   default=["float32_x2", "bfloat16"])
    p.add_argument("--impl", default="pallas")
    p.add_argument("--trajectory-json", type=Path, default=None,
                   help="precision_validation.py output to embed")
    p.add_argument("--out", type=Path,
                   default=REPO / "benchmarks" / "PRECISION_r03.json")
    args = p.parse_args()

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from diffsbdd_tpu.checkpoint import load_model
    from diffsbdd_tpu.config import load_config
    from diffsbdd_tpu.data.dataset import LigandPocketDataset
    from diffsbdd_tpu.train.evaluation import SamplingEvaluator
    from diffsbdd_tpu.train.module import build_module_from_config

    # one param restore; per-tier modules rebuilt from the same config with
    # only tpu.matmul_precision (and impl) changed
    _, state, _ = load_model(args.ckpt, name=args.name)
    cfg_dict = json.loads((args.ckpt / f"{args.name}.config.json").read_text())
    hist = np.asarray(cfg_dict.pop("node_histogram"))
    val_ds = LigandPocketDataset(args.datadir / "val.npz")

    results = {}
    t0 = time.time()
    for tier in args.tiers:
        cfg_dict.setdefault("tpu", {})
        cfg_dict["tpu"]["matmul_precision"] = tier
        cfg_dict["tpu"]["egnn_impl"] = args.impl
        cfg = load_config(overrides=cfg_dict)
        module = build_module_from_config(cfg, hist)
        evaluator = SamplingEvaluator(
            module, dataset=val_ds,
            outdir=Path("/tmp/precision_chem_ab") / tier)
        # identical keys per tier: same noise stream, same size draws
        metrics = evaluator.sample_and_analyze(
            state.params, jax.random.PRNGKey(11), args.n,
            batch_size=args.batch, size_rng=np.random.default_rng(5))
        results[tier] = {k: round(float(v), 4) for k, v in metrics.items()}
        print(f"{tier}: {json.dumps(results[tier])}", flush=True)

    base = args.tiers[0]
    deltas = {
        tier: {k: round(results[tier][k] - results[base][k], 4)
               for k in results[base]}
        for tier in args.tiers[1:]
    }
    out = {
        "chem_ab": {
            "checkpoint": str(args.ckpt), "n_samples": args.n,
            "impl": args.impl, "base_tier": base,
            "metrics": results, "deltas_vs_base": deltas,
            "wall_s": round(time.time() - t0, 1),
        },
        "trajectory": (json.loads(args.trajectory_json.read_text())
                       if args.trajectory_json
                       and args.trajectory_json.exists() else None),
    }
    args.out.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out["chem_ab"]["deltas_vs_base"]))
    print(f"written: {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
