"""Evaluate a (possibly still-training) overfit-demo run from its checkpoint.

``overfit_demo.py`` writes Orbax checkpoints every epoch; on a single CPU
core the full 800-step run takes many hours.  This script produces the
OVERFIT_*.json artifact from whatever the latest checkpoint holds, without
interrupting the trainer: load ``last`` (or ``best``), sample with the
segmented sampler, run the metrics stack, and record the step count the
snapshot corresponds to.

    python benchmarks/overfit_snapshot_eval.py \
        --ckpt /tmp/diffsbdd_overfit_demo/runs/overfit_cpu_r02/checkpoints \
        --tag cpu_r02 --n-eval 8
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=Path, required=True,
                   help="checkpoints directory of the overfit run")
    p.add_argument("--name", default="last", choices=("last", "best"))
    p.add_argument("--tag", default="cpu_r02")
    p.add_argument("--n-eval", type=int, default=8)
    p.add_argument("--device", choices=("tpu", "cpu"), default="cpu")
    p.add_argument("--fresh-init-metrics", type=Path, default=None,
                   help="JSON file with the fresh-init metrics to embed")
    p.add_argument("--outdir", type=Path,
                   default=Path("/tmp/diffsbdd_overfit_snapshot"))
    args = p.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from diffsbdd_tpu.checkpoint import load_model
    from diffsbdd_tpu.data.dataset import LigandPocketDataset
    from diffsbdd_tpu.train.evaluation import SamplingEvaluator

    module, state, cfg = load_model(args.ckpt, name=args.name)
    step = int(state.step)
    print(f"loaded {args.name} checkpoint at step {step}", flush=True)

    val_ds = LigandPocketDataset(Path(cfg.datadir) / "val.npz")
    evaluator = SamplingEvaluator(module, dataset=val_ds,
                                  outdir=args.outdir / "eval")
    t0 = time.time()
    metrics = evaluator.sample_and_analyze(
        state.params, jax.random.PRNGKey(17), args.n_eval,
        batch_size=min(args.n_eval, 8))
    eval_s = time.time() - t0
    print(f"metrics ({eval_s:.0f}s):", json.dumps(metrics), flush=True)

    fresh = None
    if args.fresh_init_metrics and args.fresh_init_metrics.exists():
        fresh = json.loads(args.fresh_init_metrics.read_text())

    result = {
        "workload": "overfit two example complexes (3rfm+CFF, 5ndu+8V2) — "
                    f"snapshot of a still-training run at step {step}",
        "device": args.device,
        "model": {"joint_nf": cfg.egnn_params.joint_nf,
                  "hidden_nf": cfg.egnn_params.hidden_nf,
                  "n_layers": cfg.egnn_params.n_layers},
        "T": cfg.diffusion_params.diffusion_steps,
        "steps": step,
        "batch": cfg.batch_size,
        "lr": cfg.lr,
        "metrics_fresh_init": fresh,
        "metrics_trained": metrics,
    }
    out = REPO / "benchmarks" / f"OVERFIT_{args.tag}.json"
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(f"written: {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
