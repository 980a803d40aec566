"""Converge the best checkpoint this host allows (VERDICT r03 #5).

Round-3's 42k-step overfit minimized loss but slid to Validity 0.125 (the
high-t funnel overspreads when the train set is two complexes).  This run
attacks sample quality directly:

* coordinate-noise augmentation (``augment_noise``; rotation augmentation is
  a no-op for an E(3)-equivariant eps-net, so jitter is the real
  regularizer — reference stubs both, lightning_modules.py:338-347),
* periodic VALIDITY evaluation with best-checkpoint selection on the
  sampling metrics (validity, then connectivity) rather than val loss —
  the quantity the reference's test harness actually reports
  (test.py:102-135),
* a final honest re-eval of the selected checkpoint at a fresh PRNG key
  and a larger sample count.

Flagship model size (hidden 256 / 6 layers, the bench.py headline config)
so the resulting checkpoint also carries PRECISION_r04's bf16 A/B.
Exports the selected params as a compact fp16 .npz for the committed
trained-sanity fixture (tests/test_trained_sanity.py).

    python benchmarks/overfit_chem_r04.py --steps 12000        # TPU
    python benchmarks/overfit_chem_r04.py --tiny --device cpu  # smoke
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

from overfit_ab_reference import lr_at  # shared 50%/80% anneal
from overfit_demo import build_dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--replicas", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--augment-noise", type=float, default=0.05)
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--n-eval", type=int, default=16)
    p.add_argument("--n-eval-final", type=int, default=32)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--joint-nf", type=int, default=128)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--T", type=int, default=500)
    p.add_argument("--device", choices=("tpu", "cpu"), default="tpu")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--select-last", action="store_true",
                   help="export the FINAL state as the fixture instead of "
                        "the best-validity checkpoint (validity on 16 "
                        "samples is noise-dominated at this task; the "
                        "trained-sanity fixture wants convergence)")
    p.add_argument("--outdir", type=Path,
                   default=Path("/tmp/diffsbdd_overfit_r04"))
    p.add_argument("--tag", default="r04")
    args = p.parse_args()

    if args.tiny:
        args.hidden, args.layers, args.T = 32, 2, 20
        args.joint_nf = 16
        args.n_eval, args.n_eval_final = 4, 4

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from diffsbdd_tpu.checkpoint import load_model, save_model
    from diffsbdd_tpu.config import load_config
    from diffsbdd_tpu.data.dataset import LigandPocketDataset, PaddedLoader
    from diffsbdd_tpu.train.evaluation import SamplingEvaluator
    from diffsbdd_tpu.train.loop import create_train_state, make_train_step
    from diffsbdd_tpu.train.module import build_module_from_config
    from diffsbdd_tpu.utils.params_io import save_params_npz

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
        "run_name": f"overfit_chem_{args.tag}",
        "logdir": str(args.outdir / "runs"),
        "dataset": "crossdock_full",
        "mode": "pocket_conditioning",
        "pocket_representation": "full-atom",
        "datadir": str(datadir),
        "batch_size": args.batch,
        "lr": args.lr,
        "augment_rotation": True,
        "augment_noise": args.augment_noise,
        "egnn_params": {
            "joint_nf": args.joint_nf,
            "hidden_nf": args.hidden, "n_layers": args.layers,
            "attention": True, "tanh": True, "norm_constant": 1,
            "inv_sublayers": 1, "reflection_equivariant": False,
            "edge_cutoff_ligand": None, "edge_cutoff_pocket": 5.0,
            "edge_cutoff_interaction": 5.0},
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

    ckpt_dir = Path(cfg.logdir) / cfg.run_name / "checkpoints"
    out_path = REPO / "benchmarks" / f"OVERFIT_CHEM_{args.tag}.json"
    record = {
        "workload": "best-validity overfit, 2 example complexes",
        "config": {"hidden_nf": args.hidden, "n_layers": args.layers,
                   "T": args.T, "batch": args.batch, "steps": args.steps,
                   "base_lr": args.lr,
                   "lr_schedule": "base to 50%, x0.3 to 80%, x0.1 after",
                   "augment_noise": args.augment_noise,
                   "augment_rotation": True,
                   "selection": "max Validity, tie-break Connectivity, "
                                "fixed eval key",
                   "device": args.device, "impl": impl,
                   "precision": precision},
        "trajectory": [],
        "best": None,
    }

    step = 0
    best_key_metric = (-1.0, -1.0)
    if args.resume and (ckpt_dir / "last").exists():
        _, state, _ = load_model(ckpt_dir, name="last", lr=args.lr)
        step = int(state.step)
        rng = jax.random.fold_in(rng, step)
        if out_path.exists():
            prev = json.loads(out_path.read_text())
            record["trajectory"] = [r for r in prev.get("trajectory", [])
                                    if r["step"] <= step]
            # re-derive best from the trajectory (selection rules may have
            # changed between chunks); step 0 never qualifies — see below
            cands = [r for r in record["trajectory"] if r["step"] > 0]
            if cands:
                record["best"] = max(
                    cands, key=lambda r: (r["Validity"], r["Connectivity"]))
                best_key_metric = (record["best"]["Validity"],
                                   record["best"]["Connectivity"])
        print(f"resumed from step {step}", flush=True)

    def save_progress():
        out_path.write_text(json.dumps(record, indent=1) + "\n")

    train_steps = {}

    def step_fn(lr):
        if lr not in train_steps:
            train_steps[lr] = make_train_step(module, lr=lr, clip_grad=True)
        return train_steps[lr]

    # fixed selection key: every eval sees the same z_T draws, so the
    # trajectory measures the MODEL, not eval-noise (the final re-eval of
    # the winner uses a fresh key to keep selection honest)
    eval_key = jax.random.PRNGKey(10_000)

    def evaluate(params, key, n, tag_):
        t0 = time.time()
        m = evaluator.sample_and_analyze(
            params, key, n, batch_size=min(n, 16),
            size_rng=np.random.default_rng(7))
        m = {k2: m.get(k2) for k2 in
             ("Validity", "Connectivity", "Uniqueness",
              "kl_div_atom_types", "QED", "SA")}
        m["eval_s"] = round(time.time() - t0, 1)
        m["eval_tag"] = tag_
        return m

    loss_window = []
    t_start = time.time()
    data_iter = iter(loader)
    while step <= args.steps:
        if step % args.eval_every == 0 or step == args.steps:
            m = evaluate(state.params, eval_key, args.n_eval, "selection")
            m["step"] = step
            m["train_loss_recent"] = (round(float(np.mean(loss_window)), 4)
                                      if loss_window else None)
            m["wall_s"] = round(time.time() - t_start, 1)
            record["trajectory"].append(m)
            key_metric = (m["Validity"], m["Connectivity"])
            # the fresh init (step 0) is excluded from selection: its high
            # "validity" is tiny-fragment soup passing the valence check
            # (Connectivity 0.03, GEOMETRY_PROBE.json) — selecting it would
            # export an untrained net as the "best" artifact
            if step > 0 and key_metric > best_key_metric:
                best_key_metric = key_metric
                record["best"] = dict(m)
                save_model(ckpt_dir, module, state, cfg, name="bestv")
            save_model(ckpt_dir, module, state, cfg, name="last")
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
        if step % 500 == 0:
            rate = step * args.batch / max(time.time() - t_start, 1e-9)
            print(f"step {step} loss {np.mean(loss_window):.4f} "
                  f"({rate:.1f} samples/s)", flush=True)

    # honest re-eval of the selected checkpoint: fresh key, more samples
    sel_name = "last" if args.select_last else "bestv"
    _, best_state, _ = load_model(ckpt_dir, name=sel_name, lr=args.lr)
    record["best_reeval"] = evaluate(
        best_state.params, jax.random.PRNGKey(20_000), args.n_eval_final,
        "fresh-key re-eval")
    record["best_reeval"]["step"] = int(best_state.step)

    # committable fp16 fixture for tests/test_trained_sanity.py
    fixture = REPO / "checkpoints" / f"overfit_chem_{args.tag}_best.npz"
    save_params_npz(fixture, best_state.params, dtype=np.float16)
    meta = dict(record["config"])
    meta.update(step=int(best_state.step),
                selection_metrics=record["best"],
                reeval_metrics=record["best_reeval"],
                joint_nf=args.joint_nf,
                n_lig_max=56, n_pocket_max=320)
    fixture.with_suffix(".json").write_text(json.dumps(meta, indent=1) + "\n")
    record["fixture"] = str(fixture.relative_to(REPO))
    record["fixture_mb"] = round(fixture.stat().st_size / 1e6, 2)
    record["total_wall_s"] = round(time.time() - t_start, 1)
    save_progress()
    print(json.dumps({"best": record["best"],
                      "best_reeval": record["best_reeval"],
                      "fixture": record["fixture"],
                      "fixture_mb": record["fixture_mb"]}, indent=1),
          flush=True)


if __name__ == "__main__":
    main()
