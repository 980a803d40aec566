"""Reference-vs-rebuild A/B: train the ACTUAL PyTorch reference on the same
two-complex dataset and record its quality trajectory (VERDICT r03 #2).

The open question from round 3: our 42k-step overfit converged KL and
connectivity to their measured ceilings but full-T500 validity fell to 0.125
(fresh init: 0.94).  Hypothesis: the high-t funnel cannot be pinned from two
complexes and the validity metric is hypersensitive to coordinate noise —
i.e. the framework is fine, the data is just tiny.  The falsifiable test is
to train the reference itself (/root/reference, via tests/reference_bridge)
on identical data at an identical CPU-feasible config and compare
Validity/Connectivity/KL trajectories at matched step counts.  If the
reference also collapses, the rebuild is vindicated; if not, there is a real
high-t bug to find.

Both sides share: dataset construction (benchmarks/overfit_demo.build_dataset
-> the same train/val npz files), model config, lr schedule, batch size,
and — crucially — the SAME molecule-building + metric stack
(diffsbdd_tpu.chem, EDM-table bonds, no OpenBabel), so metric deltas can only
come from the learned model.

Reference behavioral anchors: training assembly lightning_modules.py:236-302,
optimizer :183-185, adaptive clipping :874-899, sampling eval :492-549,
sampler conditional_model.py:479-555.

    python benchmarks/overfit_ab_reference.py --steps 5000   # ~6 h on 1 core
    python benchmarks/overfit_ab_reference.py --steps 40 --tiny  # smoke

Writes benchmarks/OVERFIT_AB_ref_r04.json progressively (one record per eval
point), resumable via --resume.
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
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "benchmarks"))


def lr_at(step: int, total: int, base: float) -> float:
    """Shared A/B schedule: base to 50%, base*0.3 to 80%, base*0.1 after
    (the OVERFIT_r03 1e-3 -> 3e-4 -> 1e-4 anneal, proportional)."""
    if step < 0.5 * total:
        return base
    if step < 0.8 * total:
        return base * 0.3
    return base * 0.1


def eval_molecules(coords_types, atom_types_flat, dataset_info):
    """Shared metric stack: EDM-table molecule building + validity/
    connectivity/uniqueness + atom-type KL (diffsbdd_tpu.chem — the SAME
    functions the rebuild's SamplingEvaluator uses)."""
    from diffsbdd_tpu.chem.metrics import (BasicMolecularMetrics,
                                           CategoricalDistribution)
    from diffsbdd_tpu.chem.molecule import build_molecule

    mols = [build_molecule(c, t, dataset_info, add_coords=True)
            for c, t in coords_types if len(t)]
    (validity, connectivity, uniqueness, novelty), _ = \
        BasicMolecularMetrics(dataset_info).evaluate_mols(mols)
    lig_dist = CategoricalDistribution(dataset_info["atom_hist"],
                                       dataset_info["atom_encoder"])
    kl = lig_dist.kl_divergence(atom_types_flat)
    return {"Validity": validity, "Connectivity": connectivity,
            "Uniqueness": uniqueness, "kl_div_atom_types": kl,
            "n_molecules": len(mols)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--replicas", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--joint-nf", type=int, default=128)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--T", type=int, default=500)
    p.add_argument("--n-eval", type=int, default=16)
    p.add_argument("--eval-at", default="0,500,1000,2000,3500,5000")
    p.add_argument("--tiny", action="store_true",
                   help="smoke: tiny model, short T")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--outdir", type=Path,
                   default=Path("/tmp/diffsbdd_overfit_ab"))
    p.add_argument("--tag", default="r04")
    args = p.parse_args()

    import torch
    torch.manual_seed(0)
    torch.set_num_threads(1)  # single-core VM; avoid oversubscription

    if args.tiny:
        args.hidden, args.joint_nf, args.layers, args.T = 24, 16, 1, 16
        args.n_eval = 4

    from overfit_demo import build_dataset

    from diffsbdd_tpu.constants import dataset_params
    from reference_bridge import load_reference

    datadir = args.outdir / "data"
    print("building dataset...", flush=True)
    hist = build_dataset(datadir, args.replicas)
    dinfo = dataset_params["crossdock_full"]
    atom_nf = len(dinfo["atom_encoder"])
    residue_nf = len(dinfo["aa_encoder"])

    ref = load_reference()
    dyn = ref.dynamics.EGNNDynamics(
        atom_nf=atom_nf, residue_nf=residue_nf, n_dims=3,
        joint_nf=args.joint_nf, hidden_nf=args.hidden, device="cpu",
        n_layers=args.layers, attention=True, tanh=True, norm_constant=1,
        inv_sublayers=1, sin_embedding=False, normalization_factor=100,
        aggregation_method="sum", update_pocket_coords=False,
        edge_cutoff_ligand=None, edge_cutoff_pocket=5.0,
        edge_cutoff_interaction=5.0, reflection_equivariant=False,
        condition_time=True, mode="egnn_dynamics")
    ddpm = ref.conditional.ConditionalDDPM(
        dynamics=dyn, atom_nf=atom_nf, residue_nf=residue_nf, n_dims=3,
        size_histogram=hist, timesteps=args.T,
        noise_schedule="polynomial_2", noise_precision=5.0e-4,
        loss_type="l2", norm_values=(1, 4), norm_biases=(None, 0.0))

    # reference optimizer + adaptive clipping (lightning_modules.py:183-185,
    # :874-899; utils.Queue)
    sys.path.append("/root/reference")
    import utils as ref_utils
    opt = torch.optim.AdamW(ddpm.parameters(), lr=args.lr, amsgrad=True,
                            weight_decay=1e-12)
    gradnorm_queue = ref_utils.Queue()
    gradnorm_queue.add(3000)  # lightning_modules.py:55-56

    # reference data pipeline on the SAME npz files
    from torch.utils.data import DataLoader
    sys.path.append("/root/reference")
    import dataset as ref_dataset
    train_ds = ref_dataset.ProcessedLigandPocketDataset(
        datadir / "train.npz", center=True)
    val_ds = ref_dataset.ProcessedLigandPocketDataset(
        datadir / "val.npz", center=True)
    loader = DataLoader(train_ds, batch_size=args.batch, shuffle=True,
                        collate_fn=ref_dataset.ProcessedLigandPocketDataset
                        .collate_fn, num_workers=0)

    def get_lig_pocket(data):
        """lightning_modules.py:217-234 (no virtual nodes)."""
        ligand = {"x": data["lig_coords"].float(),
                  "one_hot": data["lig_one_hot"].float(),
                  "size": data["num_lig_atoms"].long(),
                  "mask": data["lig_mask"].long()}
        pocket = {"x": data["pocket_coords"].float(),
                  "one_hot": data["pocket_one_hot"].float(),
                  "size": data["num_pocket_nodes"].long(),
                  "mask": data["pocket_mask"].long()}
        return ligand, pocket

    def loss_fn(ligand, pocket):
        """l2 training assembly (lightning_modules.py:244-282)."""
        out = ddpm(ligand, pocket, return_info=True)
        (delta_log_px, error_t_lig, error_t_pocket, SNR_weight,
         loss_0_x_ligand, loss_0_x_pocket, loss_0_h, neg_log_const_0,
         kl_prior, log_pN, t_int, xh_lig_hat, info) = out
        denom_lig = 3 * ligand["size"] + ddpm.atom_nf * ligand["size"]
        error_t_lig = error_t_lig / denom_lig
        denom_pocket = (3 + ddpm.residue_nf) * pocket["size"]
        error_t_pocket = error_t_pocket / denom_pocket
        loss_t = 0.5 * (error_t_lig + error_t_pocket)
        loss_0 = loss_0_x_ligand / (3 * ligand["size"]) \
            + loss_0_x_pocket / (3 * pocket["size"]) + loss_0_h
        return (loss_t + loss_0 + kl_prior).mean()

    def clip_gradients():
        """configure_gradient_clipping (lightning_modules.py:874-899)."""
        max_norm = 1.5 * gradnorm_queue.mean() + 2 * gradnorm_queue.std()
        grad_norm = torch.nn.utils.clip_grad_norm_(
            ddpm.parameters(), max_norm=max_norm, norm_type=2.0)
        gradnorm_queue.add(float(min(grad_norm, max_norm)))

    @torch.no_grad()
    def sample_eval(n_eval, seed, chunk=4):
        """Sampling eval mirroring SamplingEvaluator._analyze_given_pocket:
        val pockets round-robin, ligand sizes ~ size prior conditional.
        Chunked: the reference's ragged layout makes the per-step dense
        adjacency O((B*N)^2), so small sampling batches are much cheaper."""
        torch.manual_seed(seed)
        ddpm.eval()
        coords_types, atom_types = [], []
        for start in range(0, n_eval, chunk):
            n = min(chunk, n_eval - start)
            items = [val_ds[(start + i) % len(val_ds)] for i in range(n)]
            data = ref_dataset.ProcessedLigandPocketDataset.collate_fn(items)
            _, pocket = get_lig_pocket(data)
            num_nodes = ddpm.size_distribution.sample_conditional(
                n2=pocket["size"].cpu())
            num_nodes = torch.clamp(num_nodes, min=1)
            xh_lig, _, lig_mask, _ = ddpm.sample_given_pocket(
                pocket, num_nodes, timesteps=args.T)
            for b in range(n):
                sel = lig_mask == b
                xh = xh_lig[sel].cpu().numpy()
                types = xh[:, 3:].argmax(-1)
                coords_types.append((xh[:, :3], types))
                atom_types.extend(types.tolist())
        ddpm.train()
        return eval_molecules(coords_types, atom_types, dinfo)

    eval_at = sorted({min(int(s), args.steps)
                      for s in args.eval_at.split(",")} | {args.steps})
    out_path = REPO / "benchmarks" / f"OVERFIT_AB_ref_{args.tag}.json"
    ckpt_path = args.outdir / f"ref_ckpt_{args.tag}.pt"

    record = {
        "side": "reference (PyTorch, /root/reference, CPU)",
        "config": {"hidden_nf": args.hidden, "joint_nf": args.joint_nf,
                   "n_layers": args.layers, "T": args.T,
                   "batch": args.batch, "steps": args.steps,
                   "base_lr": args.lr,
                   "lr_schedule": "base to 50%, x0.3 to 80%, x0.1 after",
                   "noise_schedule": "polynomial_2", "loss": "l2",
                   "normalize_factors": [1, 4], "clip": "adaptive queue"},
        "trajectory": [],
    }
    step = 0
    if args.resume and ckpt_path.exists():
        ck = torch.load(ckpt_path, weights_only=False)
        ddpm.load_state_dict(ck["model"])
        opt.load_state_dict(ck["opt"])
        step = ck["step"]
        gradnorm_queue.items = ck["queue"]
        if out_path.exists():
            record = json.loads(out_path.read_text())
        print(f"resumed from step {step}", flush=True)
    elif args.resume and out_path.exists():
        # No checkpoint survived, but the step-0 entry is reusable: model
        # init is pinned by torch.manual_seed(0) before construction, so a
        # fresh-init eval at the same seed reproduces it exactly.
        prev = json.loads(out_path.read_text())
        record["trajectory"] = [r for r in prev.get("trajectory", [])
                                if r["step"] == 0]
        if record["trajectory"]:
            print("reusing deterministic step-0 eval from previous run",
                  flush=True)

    def save_progress():
        out_path.write_text(json.dumps(record, indent=1) + "\n")

    loss_window = []
    t_start = time.time()
    done_evals = {r["step"] for r in record["trajectory"]}
    while step <= args.steps:
        for data in loader:
            if step in eval_at and step not in done_evals:
                t0 = time.time()
                m = sample_eval(args.n_eval, seed=1000 + step)
                m["step"] = step
                m["train_loss_recent"] = (round(float(np.mean(loss_window)),
                                                4) if loss_window else None)
                m["wall_s"] = round(time.time() - t_start, 1)
                m["eval_s"] = round(time.time() - t0, 1)
                record["trajectory"].append(m)
                done_evals.add(step)
                save_progress()
                torch.save({"model": ddpm.state_dict(),
                            "opt": opt.state_dict(), "step": step,
                            "queue": gradnorm_queue.items}, ckpt_path)
                print(f"[{step}] {json.dumps(m)}", flush=True)
            if step >= args.steps:
                break
            for g in opt.param_groups:
                g["lr"] = lr_at(step, args.steps, args.lr)
            ligand, pocket = get_lig_pocket(data)
            loss = loss_fn(ligand, pocket)
            opt.zero_grad()
            loss.backward()
            clip_gradients()
            opt.step()
            loss_window.append(float(loss.detach()))
            if len(loss_window) > 50:
                loss_window.pop(0)
            step += 1
            if step % 100 == 0:
                rate = step / max(time.time() - t_start, 1e-9)
                print(f"step {step} loss {np.mean(loss_window):.4f} "
                      f"({rate:.2f} steps/s)", flush=True)
        if step >= args.steps and args.steps in done_evals:
            break

    record["total_wall_s"] = round(time.time() - t_start, 1)
    save_progress()
    print(f"written: {out_path}", flush=True)


if __name__ == "__main__":
    main()
