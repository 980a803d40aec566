"""Rebuild side of the reference A/B (VERDICT r03 #2) — see
overfit_ab_reference.py for the question being settled.

Trains diffsbdd_tpu at the IDENTICAL configuration on the IDENTICAL data as
the reference-side run (hidden 128 / joint 128 / 4 layers / T=500 / batch 8 /
l2 / polynomial_2 / adaptive clip / AdamW(amsgrad, wd=1e-12) / the same
50%-80% lr anneal) with NO augmentation (the reference implements none —
lightning_modules.py:338-347 raises NotImplementedError), and records the
same Validity/Connectivity/KL trajectory at the same step counts through the
same molecule/metric stack.

    python benchmarks/overfit_ab_ours.py --steps 3000            # TPU
    python benchmarks/overfit_ab_ours.py --steps 20 --tiny --device cpu

Writes benchmarks/OVERFIT_AB_ours_r04.json progressively, and merges both
sides into benchmarks/OVERFIT_AB_r04.json when the reference file exists.
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
sys.path.insert(0, str(REPO / "benchmarks"))

from overfit_ab_reference import lr_at  # shared schedule


def merge(tag: str):
    """Combine both sides into OVERFIT_AB_<tag>.json with a verdict stub."""
    out = {}
    for side, name in (("reference", f"OVERFIT_AB_ref_{tag}.json"),
                       ("ours", f"OVERFIT_AB_ours_{tag}.json")):
        p = REPO / "benchmarks" / name
        if p.exists():
            out[side] = json.loads(p.read_text())
    if len(out) == 2:
        (REPO / "benchmarks" / f"OVERFIT_AB_{tag}.json").write_text(
            json.dumps(out, indent=1) + "\n")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--replicas", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--joint-nf", type=int, default=128)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--T", type=int, default=500)
    p.add_argument("--n-eval", type=int, default=8)
    p.add_argument("--eval-at", default="0,250,500,1000,1750,3000")
    p.add_argument("--device", choices=("tpu", "cpu"), default="tpu")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--outdir", type=Path,
                   default=Path("/tmp/diffsbdd_overfit_ab_ours"))
    p.add_argument("--tag", default="r04")
    args = p.parse_args()

    if args.tiny:
        args.hidden, args.joint_nf, args.layers, args.T = 24, 16, 1, 16
        args.n_eval = 4

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from overfit_demo import build_dataset

    from diffsbdd_tpu.config import load_config
    from diffsbdd_tpu.data.dataset import LigandPocketDataset, PaddedLoader
    from diffsbdd_tpu.train.evaluation import SamplingEvaluator
    from diffsbdd_tpu.train.loop import create_train_state, make_train_step
    from diffsbdd_tpu.train.module import build_module_from_config

    # persistent compile cache (TPU entries only; see bench.py)
    if args.device == "tpu":
        cache = REPO / ".jax_cache"
        cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    datadir = args.outdir / "data"
    print("building dataset...", flush=True)
    hist = build_dataset(datadir, args.replicas)

    impl = "auto" if args.device == "tpu" else "xla"
    precision = "float32_x2" if args.device == "tpu" else "float32"
    cfg = load_config(overrides={
        "run_name": f"ab_ours_{args.tag}",
        "logdir": str(args.outdir / "runs"),
        "dataset": "crossdock_full",
        "mode": "pocket_conditioning",
        "pocket_representation": "full-atom",
        "datadir": str(datadir),
        "batch_size": args.batch,
        "lr": args.lr,
        "augment_rotation": False,  # the reference trains without any
        "augment_noise": 0.0,       # augmentation — matched off here
        "egnn_params": {
            "joint_nf": args.joint_nf, "hidden_nf": args.hidden,
            "n_layers": args.layers, "attention": True, "tanh": True,
            "norm_constant": 1, "inv_sublayers": 1,
            "reflection_equivariant": False, "edge_cutoff_ligand": None,
            "edge_cutoff_pocket": 5.0, "edge_cutoff_interaction": 5.0},
        "diffusion_params": {"diffusion_steps": args.T,
                             "normalize_factors": [1, 4]},
        "tpu": {"n_lig_max": 56, "n_pocket_max": 320,
                "matmul_precision": precision, "egnn_impl": impl},
    })
    module = build_module_from_config(cfg, hist)

    train_ds = LigandPocketDataset(datadir / "train.npz")
    val_ds = LigandPocketDataset(datadir / "val.npz")
    rng_np = np.random.default_rng(cfg.seed)
    loader = PaddedLoader(train_ds, args.batch,
                          lig_bucket=cfg.tpu.lig_bucket,
                          pocket_bucket=cfg.tpu.pocket_bucket,
                          shuffle=True, rng=rng_np)
    evaluator = SamplingEvaluator(module, dataset=val_ds,
                                  outdir=args.outdir / "eval")

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    params = module.init_params(init_rng, batch_size=2)
    state = create_train_state(params, lr=args.lr)

    eval_at = sorted({min(int(s), args.steps)
                      for s in args.eval_at.split(",")} | {args.steps})
    out_path = REPO / "benchmarks" / f"OVERFIT_AB_ours_{args.tag}.json"
    record = {
        "side": f"diffsbdd_tpu ({args.device}, {impl}, {precision})",
        "config": {"hidden_nf": args.hidden, "joint_nf": args.joint_nf,
                   "n_layers": args.layers, "T": args.T,
                   "batch": args.batch, "steps": args.steps,
                   "base_lr": args.lr,
                   "lr_schedule": "base to 50%, x0.3 to 80%, x0.1 after",
                   "noise_schedule": "polynomial_2", "loss": "l2",
                   "normalize_factors": [1, 4], "clip": "adaptive queue",
                   "augmentation": "none (matched to the reference)"},
        "trajectory": [],
    }

    def save_progress():
        out_path.write_text(json.dumps(record, indent=1) + "\n")

    train_steps = {}  # lr -> jitted step (3 distinct lrs on the schedule)

    def step_fn(lr):
        if lr not in train_steps:
            train_steps[lr] = make_train_step(module, lr=lr, clip_grad=True)
        return train_steps[lr]

    loss_window = []
    step = 0
    t_start = time.time()
    data_iter = iter(loader)
    while step <= args.steps:
        if step in eval_at:
            t0 = time.time()
            rng, k = jax.random.split(rng)
            m = evaluator.sample_and_analyze(
                state.params, k, args.n_eval, batch_size=args.n_eval)
            m = {k2: m[k2] for k2 in ("Validity", "Connectivity",
                                      "Uniqueness", "kl_div_atom_types")}
            m["step"] = step
            m["train_loss_recent"] = (round(float(np.mean(loss_window)), 4)
                                      if loss_window else None)
            m["wall_s"] = round(time.time() - t_start, 1)
            m["eval_s"] = round(time.time() - t0, 1)
            record["trajectory"].append(m)
            save_progress()
            print(f"[{step}] {json.dumps(m)}", flush=True)
        if step >= args.steps:
            break
        try:
            batch = next(data_iter)
        except StopIteration:
            data_iter = iter(loader)
            batch = next(data_iter)
        ligand, pocket = batch["ligand"], batch["pocket"]
        rng, k = jax.random.split(rng)
        state, info = step_fn(lr_at(step, args.steps, args.lr))(
            state, k, ligand, pocket)
        loss_window.append(float(info["loss"]))
        if len(loss_window) > 50:
            loss_window.pop(0)
        step += 1
        if step % 200 == 0:
            rate = step * args.batch / max(time.time() - t_start, 1e-9)
            print(f"step {step} loss {np.mean(loss_window):.4f} "
                  f"({rate:.1f} samples/s)", flush=True)

    record["total_wall_s"] = round(time.time() - t_start, 1)
    save_progress()
    merged = merge(args.tag)
    print(f"written: {out_path} (merged sides: {list(merged)})", flush=True)


if __name__ == "__main__":
    main()
