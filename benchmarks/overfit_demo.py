"""End-to-end training demonstration on the two example complexes.

The CrossDocked/MOAD archives are not available offline, but the repo's
reference copies ship two real protein-ligand complexes
(example/3rfm.pdb + CFF, example/5ndu.pdb + 8V2).  This script exercises the
ENTIRE framework on real geometry:

  processing (proc_crossdock extraction) -> npz dataset -> PaddedLoader
  -> Trainer (jitted train step, augment_rotation, adaptive clipping, Orbax
  checkpoints) -> T=500 segmented sampling on the trained weights
  -> molecule building -> metrics (validity/connectivity/uniqueness/KL).

Overfitting two complexes is of course not science — it is the closed-loop
"does the whole machine learn and sample" check that the offline environment
otherwise cannot provide: with enough steps the model should reproduce
ligand-sized, mostly-connected molecules in the pocket frame, and the
atom-type KL against the training distribution should fall well below the
fresh-init value.

    python benchmarks/overfit_demo.py --steps 2000 --device tpu
    python benchmarks/overfit_demo.py --steps 40 --tiny --device cpu  # smoke

Writes benchmarks/OVERFIT_r02.json and sample SDFs under --outdir.
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

COMPLEXES = [
    ("/root/reference/example/3rfm.pdb",
     "/root/reference/example/3rfm_B_CFF.sdf"),
    ("/root/reference/example/5ndu.pdb",
     "/root/reference/example/5ndu_C_8V2.sdf"),
]


def build_dataset(outdir: Path, replicas: int):
    """Processed-dir layout (train/val npz + size histogram) from the two
    example complexes; train entries are replicated so one epoch has a
    useful number of optimizer steps."""
    from diffsbdd_tpu.constants import dataset_params
    from diffsbdd_tpu.data.proc_crossdock import (get_n_nodes,
                                                  process_ligand_and_pocket,
                                                  saveall)

    d = dataset_params["crossdock_full"]
    complexes = []
    for pdb, sdf in COMPLEXES:
        complexes.append(process_ligand_and_pocket(
            pdb, sdf, d["atom_encoder"], d["aa_encoder"], 8.0, False))

    def flat(pairs):
        acc = {k: [] for k in ("lig_coords", "lig_one_hot", "lig_mask",
                               "pocket_coords", "pocket_one_hot",
                               "pocket_mask")}
        names = []
        for i, (lig, pkt) in enumerate(pairs):
            names.append(f"complex_{i}")
            acc["lig_coords"].append(lig["lig_coords"])
            acc["lig_one_hot"].append(lig["lig_one_hot"])
            acc["lig_mask"].append(i * np.ones(len(lig["lig_coords"])))
            acc["pocket_coords"].append(pkt["pocket_coords"])
            acc["pocket_one_hot"].append(pkt["pocket_one_hot"])
            acc["pocket_mask"].append(i * np.ones(len(pkt["pocket_coords"])))
        return names, {k: np.concatenate(v) for k, v in acc.items()}

    outdir.mkdir(parents=True, exist_ok=True)
    names, train_flat = flat(complexes * replicas)
    saveall(outdir / "train.npz", names, **{k: train_flat[k] for k in (
        "lig_coords", "lig_one_hot", "lig_mask", "pocket_coords",
        "pocket_one_hot", "pocket_mask")})
    names, val_flat = flat(complexes)
    saveall(outdir / "val.npz", names, **{k: val_flat[k] for k in (
        "lig_coords", "lig_one_hot", "lig_mask", "pocket_coords",
        "pocket_one_hot", "pocket_mask")})
    hist = get_n_nodes(val_flat["lig_mask"], val_flat["pocket_mask"],
                       smooth_sigma=1.0)
    np.save(outdir / "size_distribution.npy", hist)
    return hist


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--replicas", type=int, default=64,
                   help="train-set copies of each complex")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--device", choices=("tpu", "cpu"), default="tpu")
    p.add_argument("--impl", default=None, help="egnn impl (default: auto)")
    p.add_argument("--precision", default=None,
                   help="matmul precision (default: float32_x2 on tpu)")
    p.add_argument("--tiny", action="store_true",
                   help="small model + short T for a CPU smoke run")
    p.add_argument("--hidden", type=int, default=None,
                   help="override hidden_nf (CPU-sized runs)")
    p.add_argument("--layers", type=int, default=None)
    p.add_argument("--T", type=int, default=None)
    p.add_argument("--skip-init-eval", action="store_true")
    p.add_argument("--n-eval", type=int, default=32)
    p.add_argument("--eval-every", type=int, default=1,
                   help="val-loss pass every N epochs")
    p.add_argument("--resume", action="store_true",
                   help="continue from the run's last checkpoint (chunked "
                        "long runs; --steps is the TOTAL step target)")
    p.add_argument("--outdir", type=Path,
                   default=Path("/tmp/diffsbdd_overfit_demo"))
    p.add_argument("--tag", default=None)
    args = p.parse_args()
    if args.tag is None:
        args.tag = "smoke" if args.tiny else "r03"

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from diffsbdd_tpu.config import load_config
    from diffsbdd_tpu.data.dataset import LigandPocketDataset, PaddedLoader
    from diffsbdd_tpu.train.evaluation import SamplingEvaluator
    from diffsbdd_tpu.train.loop import Trainer, create_train_state
    from diffsbdd_tpu.train.module import build_module_from_config

    datadir = args.outdir / "data"
    print("building dataset...", flush=True)
    hist = build_dataset(datadir, args.replicas)
    print("dataset ready", flush=True)

    # metric CEILING: the two ground-truth training ligands through the
    # exact eval pipeline (EDM-table bonds + valence validity + 100%%-
    # largest-fragment connectivity).  Measured r03: validity 1.0 but the
    # 49-atom 8V2 ligand's largest EDM fragment is 0.918 < 1.0, so even a
    # PERFECT model caps connectivity near the fraction of CFF-sized
    # samples (~0.5) without OpenBabel bond perception.
    metrics_ceiling = None
    try:
        from diffsbdd_tpu.chem.metrics import BasicMolecularMetrics
        from diffsbdd_tpu.chem.molecule import build_molecule
        from diffsbdd_tpu.constants import dataset_params as _dp
        from diffsbdd_tpu.data.proc_crossdock import \
            process_ligand_and_pocket
        _d = _dp["crossdock_full"]
        _mols = []
        for _pdb, _sdf in COMPLEXES:
            _lig, _ = process_ligand_and_pocket(
                _pdb, _sdf, _d["atom_encoder"], _d["aa_encoder"], 8.0, False)
            _mols.append(build_molecule(
                _lig["lig_coords"], _lig["lig_one_hot"].argmax(-1), _d,
                use_openbabel=False))
        (_v, _c, _, _), _ = BasicMolecularMetrics(_d).evaluate_mols(_mols)
        metrics_ceiling = {"Validity": _v, "Connectivity": _c}
        print(f"ground-truth ceiling: {metrics_ceiling}", flush=True)
    except Exception as e:  # ceiling is informational only
        print(f"ceiling check skipped: {e}", flush=True)

    impl = args.impl or ("auto" if args.device == "tpu" else "xla")
    precision = args.precision or (
        "float32_x2" if args.device == "tpu" else "float32")
    egnn = {"joint_nf": 128, "hidden_nf": 256, "n_layers": 6,
            "attention": True, "tanh": True, "norm_constant": 1,
            "inv_sublayers": 1, "reflection_equivariant": False,
            "edge_cutoff_ligand": None, "edge_cutoff_pocket": 5.0,
            "edge_cutoff_interaction": 5.0}
    T = 500
    if args.tiny:
        egnn.update(joint_nf=16, hidden_nf=32, n_layers=2)
        T = 20
    if args.hidden is not None:
        egnn.update(hidden_nf=args.hidden,
                    joint_nf=min(egnn["joint_nf"], args.hidden))
    if args.layers is not None:
        egnn.update(n_layers=args.layers)
    if args.T is not None:
        T = args.T

    steps_per_epoch = max(1, 2 * args.replicas // args.batch)
    n_epochs = max(1, -(-args.steps // steps_per_epoch))
    cfg = load_config(overrides={
        "run_name": f"overfit_{args.tag}",
        "logdir": str(args.outdir / "runs"),
        "dataset": "crossdock_full",
        "mode": "pocket_conditioning",
        "pocket_representation": "full-atom",
        "datadir": str(datadir),
        "batch_size": args.batch,
        "lr": args.lr,
        "n_epochs": n_epochs,
        "augment_rotation": True,
        "eval_epochs": 10 ** 9,            # final eval is run explicitly
        "visualize_sample_epoch": 10 ** 9,
        "visualize_chain_epoch": 10 ** 9,
        "egnn_params": egnn,
        "diffusion_params": {"diffusion_steps": T,
                             "normalize_factors": [1, 4]},
        "eval_params": {"n_eval_samples": args.n_eval,
                        "eval_batch_size": min(args.n_eval, 16)},
        "tpu": {"n_lig_max": 56, "n_pocket_max": 320,
                "matmul_precision": precision, "egnn_impl": impl},
    })
    module = build_module_from_config(cfg, hist)

    train_ds = LigandPocketDataset(datadir / "train.npz")
    val_ds = LigandPocketDataset(datadir / "val.npz")
    rng_np = np.random.default_rng(cfg.seed)
    train_loader = PaddedLoader(train_ds, args.batch,
                                lig_bucket=cfg.tpu.lig_bucket,
                                pocket_bucket=cfg.tpu.pocket_bucket,
                                shuffle=True, rng=rng_np)
    val_loader = PaddedLoader(val_ds, min(args.batch, 2),
                              lig_bucket=cfg.tpu.lig_bucket,
                              pocket_bucket=cfg.tpu.pocket_bucket,
                              shuffle=False)
    evaluator = SamplingEvaluator(module, dataset=val_ds,
                                  outdir=args.outdir / "eval")
    trainer = Trainer(module, cfg, train_loader, val_loader,
                      evaluator=evaluator)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    params = module.init_params(init_rng, batch_size=2)
    state = create_train_state(params, lr=cfg.lr)

    resumed_from = 0
    if args.resume:
        from diffsbdd_tpu.train.loop import restore_checkpoint
        ckpt_dir = Path(cfg.logdir) / cfg.run_name / "checkpoints"
        state, _ = restore_checkpoint(ckpt_dir, state, name="last")
        resumed_from = int(state.step)
        # distinct noise stream per chunk
        rng = jax.random.fold_in(rng, resumed_from)
        print(f"resumed from step {resumed_from}", flush=True)
        remaining = args.steps - resumed_from
        if remaining <= 0:
            print("step target already reached", flush=True)
        n_epochs = max(0, -(-remaining // steps_per_epoch))

    # fresh-init metrics: the bar the trained model has to clear
    metrics_init = None
    if not args.skip_init_eval and not args.resume:
        print("fresh-init eval...", flush=True)
        rng, k = jax.random.split(rng)
        t0 = time.time()
        metrics_init = evaluator.sample_and_analyze(
            state.params, k, args.n_eval,
            batch_size=cfg.eval_params.eval_batch_size)
        print(f"fresh-init metrics ({time.time()-t0:.0f}s):",
              json.dumps(metrics_init), flush=True)

    print("training...", flush=True)
    t0 = time.time()
    state, rng = trainer.fit(state, rng, n_epochs=n_epochs,
                             eval_every=args.eval_every)
    train_s = time.time() - t0
    print("final eval...", flush=True)

    rng, k = jax.random.split(rng)
    metrics = evaluator.sample_and_analyze(
        state.params, k, args.n_eval,
        batch_size=cfg.eval_params.eval_batch_size)
    print("trained metrics:", json.dumps(metrics), flush=True)
    rng, k = jax.random.split(rng)
    evaluator.sample_and_save(state.params, k, 4, epoch=n_epochs)

    result = {
        "workload": "overfit two example complexes (3rfm+CFF, 5ndu+8V2)",
        "device": args.device, "impl": impl, "precision": precision,
        "model": {k: egnn[k] for k in ("joint_nf", "hidden_nf", "n_layers")},
        "T": T, "steps": int(state.step), "batch": args.batch,
        "resumed_from": resumed_from,
        "lr": args.lr, "train_wall_s": round(train_s, 1),
        "samples_per_sec": round(
            (int(state.step) - resumed_from) * args.batch / max(train_s, 1e-9),
            2),
        "best_val_loss": trainer.best_val,
        "metrics_ground_truth_ceiling": metrics_ceiling,
        "metrics_fresh_init": metrics_init,
        "metrics_trained": metrics,
    }
    out = REPO / "benchmarks" / f"OVERFIT_{args.tag}.json"
    if metrics_init is None and out.exists():
        # chunked resume: carry the fresh-init bar from the first chunk
        prev = json.loads(out.read_text())
        result["metrics_fresh_init"] = prev.get("metrics_fresh_init")
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))
    print(f"written: {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
