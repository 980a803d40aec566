"""Geometry diagnostics for an overfit checkpoint: bug vs under-training.

The overfit run's validity stalls near 0.1 with atom pairs sampled at
~0.6-0.7 A (hard clashes -> EDM-table overbonding -> valence failures).
This probe separates two hypotheses:

* **systematic sampler/model bug** — then even *reconstruction* (noise the
  ground-truth ligand to a small t with ``diversify`` and denoise back)
  is clashy/wrong-scale;
* **unconverged geometry** — reconstruction from small t is clean and
  close to the input (the model is locally right around the data), and
  full T=500 samples just haven't pulled the clash modes apart yet.

Reports, for ground truth / diversify(t) / full samples:
min pairwise distance, clash fraction (pairs < 1.0 A), bonded-range
fraction, radius of gyration, validity; plus RMSD-to-input for the
reconstruction runs.

    python benchmarks/overfit_geometry_probe.py \
        --ckpt /tmp/overfit_r03/runs/overfit_tpu_r03/checkpoints \
        --datadir /tmp/overfit_r03/data
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def geom_stats(coords_list):
    """coords_list: list of (n,3) arrays (one molecule each)."""
    mind, clash, bonded, rg = [], [], [], []
    for c in coords_list:
        n = len(c)
        if n < 2:
            continue
        d = np.linalg.norm(c[:, None] - c[None, :], axis=-1)
        iu = np.triu_indices(n, 1)
        dv = d[iu]
        mind.append(dv.min())
        clash.append(float((dv < 1.0).mean()))
        bonded.append(float(((dv >= 1.0) & (dv < 1.8)).mean()))
        rg.append(float(np.sqrt(((c - c.mean(0)) ** 2).sum(-1).mean())))
    return {
        "min_dist_mean": round(float(np.mean(mind)), 3),
        "min_dist_min": round(float(np.min(mind)), 3),
        "clash_pair_frac": round(float(np.mean(clash)), 4),
        "bonded_pair_frac": round(float(np.mean(bonded)), 4),
        "rg_mean": round(float(np.mean(rg)), 3),
        "n_mols": len(mind),
    }


def validity_of(coords_list, types_list, dinfo):
    from diffsbdd_tpu.chem.metrics import BasicMolecularMetrics
    from diffsbdd_tpu.chem.molecule import build_molecule
    mols = [build_molecule(c, t, dinfo) for c, t in
            zip(coords_list, types_list)]
    (v, conn, _, _), _ = BasicMolecularMetrics(dinfo).evaluate_mols(mols)
    return {"Validity": round(v, 4), "Connectivity": round(conn, 4)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=Path, required=True)
    p.add_argument("--name", default="last")
    p.add_argument("--datadir", type=Path, required=True)
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--diversify-t", type=int, nargs="+",
                   default=[25, 50, 100, 250])
    p.add_argument("--skip-full", action="store_true")
    p.add_argument("--out", type=Path,
                   default=REPO / "benchmarks" / "GEOMETRY_PROBE.json")
    args = p.parse_args()

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from diffsbdd_tpu.checkpoint import load_model
    from diffsbdd_tpu.constants import dataset_params
    from diffsbdd_tpu.data.dataset import LigandPocketDataset, pad_batch
    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask
    from diffsbdd_tpu.train.evaluation import round_to_bucket

    module, state, cfg = load_model(args.ckpt, name=args.name)
    dinfo = dataset_params[cfg.dataset]
    ds = LigandPocketDataset(args.datadir / "val.npz")

    # ground-truth batch (the two complexes, repeated)
    items = [ds[i % len(ds)] for i in range(args.n)]
    nl_pad = round_to_bucket(
        max(len(it["lig_coords"]) for it in items), module.lig_bucket)
    np_pad = round_to_bucket(
        max(len(it["pocket_coords"]) for it in items), module.pocket_bucket)
    batch = pad_batch(items, nl_pad, np_pad)
    ligand = {k: jnp.asarray(v) for k, v in batch["ligand"].items()}
    pocket = {k: jnp.asarray(v) for k, v in batch["pocket"].items()}
    m_l = np.asarray(ligand["mask"])

    def split_mols(xh, mask=m_l):
        xs, ts = [], []
        arr = np.asarray(xh)
        for b in range(arr.shape[0]):
            sel = mask[b] > 0
            xs.append(arr[b, sel, :3])
            ts.append(arr[b, sel, 3:].argmax(-1))
        return xs, ts

    gt_x = [np.asarray(ligand["x"])[b, m_l[b] > 0] for b in range(args.n)]
    gt_t = [np.asarray(ligand["one_hot"])[b, m_l[b] > 0].argmax(-1)
            for b in range(args.n)]
    report = {"checkpoint": str(args.ckpt), "step": int(state.step),
              "ground_truth": {**geom_stats(gt_x),
                               **validity_of(gt_x, gt_t, dinfo)}}
    print("ground_truth:", json.dumps(report["ground_truth"]), flush=True)

    # model-free metric-sensitivity curve: ground truth + isotropic noise
    # through the exact eval pipeline.  This bounds what ANY stochastic
    # sampler can score: if validity collapses at sigma=0.1 A, a sampler
    # ending 0.1 A from the data cannot beat that number.
    noise_rng = np.random.default_rng(3)
    for sigma in (0.05, 0.1, 0.15, 0.25):
        nx = [c + sigma * noise_rng.standard_normal(c.shape) for c in gt_x]
        rep = {**geom_stats(nx), **validity_of(nx, gt_t, dinfo),
               "rmsd_to_input_mean": round(float(np.mean(
                   [np.sqrt(((a - b) ** 2).sum(-1).mean())
                    for a, b in zip(nx, gt_x)])), 3)}
        report[f"gt_noise_s{sigma}"] = rep
        print(f"gt_noise_s{sigma}:", json.dumps(rep), flush=True)

    # reconstruction probe: diversify at increasing noise levels
    for t_noise in args.diversify_t:
        key = jax.random.PRNGKey(100 + t_noise)
        xh_lig, _ = module.ddpm.diversify(
            state.params, key, ligand, pocket, noising_steps=t_noise)
        xs, ts = split_mols(xh_lig)
        # diversify returns coords in the ligand-CoM frame; the input is in
        # the data frame — CoM-align each pair (no rotation happens, so
        # internal-geometry RMSD needs only translation)
        rmsd = [float(np.sqrt((((a - a.mean(0)) - (b - b.mean(0))) ** 2)
                              .sum(-1).mean()))
                for a, b in zip(xs, gt_x)]
        type_acc = [float((a == b).mean()) for a, b in zip(ts, gt_t)]
        rep = {**geom_stats(xs), **validity_of(xs, ts, dinfo),
               "rmsd_to_input_mean": round(float(np.mean(rmsd)), 3),
               "rmsd_to_input_max": round(float(np.max(rmsd)), 3),
               "type_accuracy": round(float(np.mean(type_acc)), 4)}
        report[f"diversify_t{t_noise}"] = rep
        print(f"diversify_t{t_noise}:", json.dumps(rep), flush=True)

    # full T=500 samples (sizes = ground-truth sizes, so stats compare 1:1)
    if not args.skip_full:
        sizes = np.asarray(ligand["size"])
        lig_mask = jnp.asarray(num_nodes_to_mask(sizes, nl_pad))
        xh_lig, _ = module.ddpm.sample_given_pocket_segmented(
            state.params, jax.random.PRNGKey(7), pocket, lig_mask,
            segment=50)
        xs, ts = split_mols(xh_lig, np.asarray(lig_mask))
        rep = {**geom_stats(xs), **validity_of(xs, ts, dinfo)}
        report["full_T500"] = rep
        print("full_T500:", json.dumps(rep), flush=True)

    args.out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"written: {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
