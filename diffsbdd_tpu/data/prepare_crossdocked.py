"""Collect baseline methods' sampled molecules into per-pocket SDF files.

Equivalent of /root/reference/data/prepare_crossdocked.py: takes the
CrossDocked test-set sample dumps published for baseline methods (CVAE, SBDD,
Pocket2Mol — torch .pt dicts mapping (receptor, ref-ligand) to molecule
lists) and writes one SDF per pocket so every method can be evaluated with
the same metrics/docking harness.
"""
from __future__ import annotations

import argparse
from pathlib import Path

from diffsbdd_tpu.chem.sdfio import write_sdf_file


def collect(samples_path, outdir):
    import torch  # baseline dumps are torch pickles

    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    data = torch.load(samples_path, map_location="cpu", weights_only=False)
    n_written = 0
    for key, mols in data.items():
        if isinstance(key, (tuple, list)):
            receptor = Path(str(key[0])).stem
            ligand = Path(str(key[1])).stem
            name = f"{receptor}_{ligand}".replace("_", "-")
        else:
            name = Path(str(key)).stem.replace("_", "-")
        out = outdir / f"{name}_gen.sdf"
        write_sdf_file(out, mols if isinstance(mols, (list, tuple)) else [mols])
        n_written += 1
    return n_written


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("samples", type=Path,
                   help=".pt dump of baseline samples keyed by pocket")
    p.add_argument("--outdir", type=Path, required=True)
    args = p.parse_args(argv)
    n = collect(args.samples, args.outdir)
    print(f"wrote {n} per-pocket SDF files to {args.outdir}")


if __name__ == "__main__":
    main()
