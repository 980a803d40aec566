"""Measure the PyTorch reference sampler's throughput on this host's CPU.

BASELINE.md requires the baseline to be *measured* with the reference's own
machinery (/root/reference/test.py:84,152-176 times generate_ligands around
ConditionalDDPM.sample_given_pocket).  The Zenodo checkpoints are offline,
but sampling *throughput* is weight-independent, so this script random-
initializes the reference model at the exact flagship configuration
(configs/crossdock_fullatom_cond.yml: joint_nf=128, hidden_nf=256, 6 layers,
attention+tanh, 5A cutoffs, T=500) and times
``ConditionalDDPM.sample_given_pocket`` on the same 3rfm A:330 pocket and
ligand-size distribution that bench.py uses.

The chain cost is exactly linear in T (one dynamics eval per step), so we
time T_MEASURE steps and report the per-step cost plus the T=500
extrapolation; pass --full-T to run all 500 steps instead.

Usage:  python benchmarks/measure_reference_cpu.py [--batch 8] [--t 25]
Writes: prints one JSON line; optionally updates BASELINE.json 'measured'
        with --write.
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

T_FULL = 500


def build_reference_model(atom_nf, residue_nf, timesteps):
    import reference_bridge as rb

    ref = rb.load_reference()
    # flagship dims: /root/reference/configs/crossdock_fullatom_cond.yml
    dyn = ref.dynamics.EGNNDynamics(
        atom_nf=atom_nf, residue_nf=residue_nf, n_dims=3, joint_nf=128,
        hidden_nf=256, n_layers=6, attention=True, tanh=True,
        mode="egnn_dynamics", norm_constant=1, inv_sublayers=1,
        sin_embedding=False, normalization_factor=100,
        aggregation_method="sum", update_pocket_coords=False,
        edge_cutoff_ligand=None, edge_cutoff_pocket=5.0,
        edge_cutoff_interaction=5.0, reflection_equivariant=True)
    hist = np.ones((41, 400))
    ddpm = ref.conditional.ConditionalDDPM(
        dynamics=dyn, atom_nf=atom_nf, residue_nf=residue_nf, n_dims=3,
        size_histogram=hist, timesteps=timesteps,
        noise_schedule="polynomial_2", noise_precision=5e-4,
        loss_type="l2", norm_values=(1.0, 4.0), norm_biases=(None, 0.0))
    ddpm.eval()
    return ddpm


def get_pocket_ragged(batch):
    """Same 3rfm A:330 full-atom pocket bench.py uses, as ragged torch dicts."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch

    from __graft_entry__ import _flagship_module
    from diffsbdd_tpu.chem.pdb import get_pocket_from_ligand, parse_pdb

    cfg, module = _flagship_module(egnn_impl="xla")
    struct = parse_pdb("/root/reference/example/3rfm.pdb")
    residues = get_pocket_from_ligand(struct, "A:330")
    pocket_pad = module.prepare_pocket(residues, repeats=batch)
    n = int(np.asarray(pocket_pad["size"])[0])
    x = np.asarray(pocket_pad["x"])[:, :n].reshape(-1, 3)
    oh = np.asarray(pocket_pad["one_hot"])[:, :n].reshape(
        -1, module.residue_nf)
    mask = np.repeat(np.arange(batch), n)
    pocket = {
        "x": torch.as_tensor(x, dtype=torch.float32),
        "one_hot": torch.as_tensor(oh, dtype=torch.float32),
        "mask": torch.as_tensor(mask),
        "size": torch.full((batch,), n, dtype=torch.long),
    }
    # bench.py ligand sizes: prior-conditional draw clipped to [8, 24]
    rng_np = np.random.default_rng(0)
    num_nodes = module.ddpm.size_distribution.sample_conditional(
        n2=np.full(batch, n), rng=rng_np)
    num_nodes = np.clip(num_nodes, 8, 24)
    return pocket, num_nodes, n, module.atom_nf, module.residue_nf


def make_ligand_ragged(batch, num_nodes, atom_nf, pocket):
    """Random ligand batch near the pocket center, reference ragged layout."""
    import torch

    center = pocket["x"].mean(0)
    xs, ohs, mask = [], [], []
    g = torch.Generator().manual_seed(1)
    for b, n in enumerate(num_nodes):
        n = int(n)
        xs.append(center + 2.0 * torch.randn(n, 3, generator=g))
        ohs.append(torch.nn.functional.one_hot(
            torch.randint(0, atom_nf, (n,), generator=g), atom_nf).float())
        mask.append(torch.full((n,), b, dtype=torch.long))
    return {
        "x": torch.cat(xs), "one_hot": torch.cat(ohs),
        "mask": torch.cat(mask),
        "size": torch.as_tensor(np.asarray(num_nodes), dtype=torch.long),
    }


def measure_train(args, pocket, num_nodes, n_pocket, atom_nf, residue_nf):
    """Time the reference training step: ConditionalDDPM loss + l2 assembly
    (lightning_modules.py:246-282, mode=pocket_conditioning, no virtual
    nodes / aux loss) + backward + AdamW(amsgrad, wd=1e-12)
    (lightning_modules.py:183-185).  Throughput is weight-independent."""
    import torch

    ddpm = build_reference_model(atom_nf, residue_nf, timesteps=T_FULL)
    ddpm.train()
    opt = torch.optim.AdamW(ddpm.parameters(), lr=1e-4, amsgrad=True,
                            weight_decay=1e-12)
    ligand = make_ligand_ragged(args.batch, num_nodes, atom_nf, pocket)
    x_dims = 3

    def one_step():
        opt.zero_grad()
        (delta_log_px, error_t_lig, error_t_pocket, SNR_weight,
         loss_0_x_ligand, loss_0_x_pocket, loss_0_h, neg_log_const_0,
         kl_prior, log_pN, t_int, xh_lig_hat, info) = ddpm(
            {k: v.clone() for k, v in ligand.items()},
            {k: v.clone() for k, v in pocket.items()}, return_info=True)
        denom_lig = x_dims * ligand["size"] + ddpm.atom_nf * ligand["size"]
        error_t_lig = error_t_lig / denom_lig
        denom_pocket = (x_dims + ddpm.residue_nf) * pocket["size"]
        error_t_pocket = error_t_pocket / denom_pocket
        loss_t = 0.5 * (error_t_lig + error_t_pocket)
        loss_0 = loss_0_x_ligand / (x_dims * ligand["size"]) \
            + loss_0_x_pocket / (x_dims * pocket["size"]) + loss_0_h
        nll = (loss_t + loss_0 + kl_prior).mean(0)
        nll.backward()
        opt.step()
        return float(nll)

    torch.manual_seed(0)
    one_step()  # warmup
    times = []
    for _ in range(args.t_train):
        t0 = time.perf_counter()
        loss = one_step()
        times.append(time.perf_counter() - t0)
    per_step = float(np.median(times))

    result = {
        "metric": "reference_cpu_train_samples_per_sec",
        "value": round(args.batch / per_step, 5),
        "unit": "samples/s",
        "batch": args.batch,
        "n_pocket_atoms": n_pocket,
        "ligand_sizes": [int(x) for x in num_nodes],
        "sec_per_step": round(per_step, 4),
        "measured_steps": args.t_train,
        "torch_threads": torch.get_num_threads(),
        "loss": round(loss, 4),
    }
    print(json.dumps(result))

    if args.write:
        path = REPO / "BASELINE.json"
        data = json.loads(path.read_text())
        data.setdefault("measured", {})["reference_cpu_train"] = result
        path.write_text(json.dumps(data, indent=2) + "\n")
        print(f"recorded in {path}", file=sys.stderr)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--t", type=int, default=25,
                   help="measured steps (extrapolated to T=500)")
    p.add_argument("--full-T", action="store_true")
    p.add_argument("--train", action="store_true",
                   help="measure the training step instead of the sampler")
    p.add_argument("--t-train", type=int, default=5,
                   help="measured training steps (median)")
    p.add_argument("--write", action="store_true",
                   help="record into BASELINE.json 'measured'")
    args = p.parse_args()

    import torch

    t_measure = T_FULL if args.full_T else args.t
    pocket, num_nodes, n_pocket, atom_nf, residue_nf = \
        get_pocket_ragged(args.batch)
    if args.train:
        measure_train(args, pocket, num_nodes, n_pocket, atom_nf, residue_nf)
        return
    ddpm = build_reference_model(atom_nf, residue_nf, timesteps=T_FULL)

    torch.manual_seed(0)
    # warmup (allocator, thread pool)
    with torch.no_grad():
        ddpm.sample_given_pocket(
            {k: v.clone() for k, v in pocket.items()},
            torch.as_tensor(num_nodes), timesteps=2)

    t0 = time.perf_counter()
    with torch.no_grad():
        ddpm.sample_given_pocket(
            {k: v.clone() for k, v in pocket.items()},
            torch.as_tensor(num_nodes), timesteps=t_measure)
    dt = time.perf_counter() - t0

    # one dynamics eval per step plus one decode eval => t_measure+1 evals
    per_step = dt / (t_measure + 1)
    t500 = per_step * (T_FULL + 1)
    mol_per_sec = args.batch / t500

    result = {
        "metric": "reference_cpu_molecules_per_sec_T500",
        "value": round(mol_per_sec, 5),
        "unit": "mol/s",
        "batch": args.batch,
        "n_pocket_atoms": n_pocket,
        "ligand_sizes": [int(x) for x in num_nodes],
        "measured_steps": t_measure,
        "sec_per_step": round(per_step, 4),
        "sec_per_mol_T500": round(t500 / args.batch, 2),
        "torch_threads": torch.get_num_threads(),
        "extrapolated": not args.full_T,
    }
    print(json.dumps(result))

    if args.write:
        path = REPO / "BASELINE.json"
        data = json.loads(path.read_text())
        data.setdefault("measured", {})["reference_cpu"] = result
        path.write_text(json.dumps(data, indent=2) + "\n")
        print(f"recorded in {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
