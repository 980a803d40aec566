"""De-novo ligand generation CLI — equivalent of
/root/reference/generate_ligands.py.

    python -m diffsbdd_tpu.cli.generate_ligands <ckpt_dir> \
        --pdbfile example/3rfm.pdb --ref_ligand A:330 \
        --outfile out.sdf --n_samples 20
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from diffsbdd_tpu.chem.sdfio import write_sdf_file
from diffsbdd_tpu.checkpoint import load_model


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", type=Path)
    p.add_argument("--pdbfile", type=str, required=True)
    p.add_argument("--resi_list", type=str, nargs="+", default=None)
    p.add_argument("--ref_ligand", type=str, default=None)
    p.add_argument("--outfile", type=Path, required=True)
    p.add_argument("--n_samples", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_nodes_lig", type=int, default=None)
    p.add_argument("--all_frags", action="store_true")
    p.add_argument("--sanitize", action="store_true")
    p.add_argument("--relax", action="store_true")
    p.add_argument("--resamplings", type=int, default=10)
    p.add_argument("--jump_length", type=int, default=1)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    module, state, cfg = load_model(args.checkpoint)

    batch_size = args.batch_size or args.n_samples
    molecules = []
    rng = jax.random.PRNGKey(args.seed)
    size_rng = np.random.default_rng(args.seed)
    # bounded retry budget: sanitize/largest_frag can reject every molecule
    # in a batch, and an unbounded sample-until-enough loop would burn
    # accelerator time forever on a weak checkpoint; after the budget the
    # CLI writes however many survived (like the reference's fixed loop)
    max_batches = 3 * -(-args.n_samples // batch_size) + 3
    for _ in range(max_batches):
        if len(molecules) >= args.n_samples:
            break
        rng, step_rng = jax.random.split(rng)
        # always request the full batch: a shrinking remainder would be a
        # new batch shape, recompiling the whole T-step sampler per retry
        # (test_set.py samples full batches for the same reason); the
        # surplus is truncated below
        n = batch_size
        num_nodes = None if args.num_nodes_lig is None else \
            np.full(n, args.num_nodes_lig)
        molecules.extend(module.generate_ligands(
            state.params, step_rng, args.pdbfile, n,
            pocket_ids=args.resi_list, ref_ligand=args.ref_ligand,
            num_nodes_lig=num_nodes,
            sanitize=args.sanitize,
            largest_frag=not args.all_frags,
            relax_iter=(200 if args.relax else 0),
            timesteps=args.timesteps,
            resamplings=args.resamplings,
            jump_length=args.jump_length,
            size_rng=size_rng))

    if len(molecules) < args.n_samples:
        print(f"warning: only {len(molecules)}/{args.n_samples} molecules "
              f"survived filtering within the retry budget")
    molecules = molecules[:args.n_samples]
    args.outfile.parent.mkdir(parents=True, exist_ok=True)
    write_sdf_file(args.outfile, molecules)
    print(f"wrote {len(molecules)} molecules to {args.outfile}")


if __name__ == "__main__":
    main()
