"""Chain-level A/B of the kernel cutoff-skip machinery (VERDICT r03 #3).

Times the full T=500 conditional sampling chain (the bench.py headline
workload: 3rfm A:330 pocket, B=32) with the fused kernels running under

  * skip_mode='bits'    sub_j=32  (the r03 production configuration)
  * skip_mode='compact' sub_j=16  (prefetched index lists)
  * skip_mode='compact' sub_j=8   (finest granularity)

at the chem-validated bfloat16 fast tier, and additionally verifies at
float32_x2 that bits and compact produce numerically matching final
samples over a full chain with identical PRNG keys (the two paths must
compute the same active pair set; reference behavior spec:
/root/reference/qm9/models.py cutoff edges via dynamics.py:169-187).

Writes benchmarks/SKIP_AB_r04.json.

    python benchmarks/skip_chain_ab.py [--batch 32] [--repeats 5] [--t 500]
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

import bench  # noqa: E402  (safe: bench.py only acts under __main__)
from __graft_entry__ import _flagship_module  # noqa: E402


def build(tier, skip_mode, sub_j, T):
    cfg, module = _flagship_module(
        n_lig_max=24, n_pocket_max=320, T=T,
        matmul_precision=tier, egnn_impl="pallas",
        kernel_skip_mode=skip_mode, kernel_sub_j=sub_j)
    return module


def chain_equality(T, batch=8):
    """Full-chain numeric check: bits vs compact, identical keys, f32_x2."""
    import jax
    import jax.numpy as jnp

    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask

    outs = {}
    for mode, sub_j in (("bits", 32), ("compact", 16)):
        module = build("float32_x2", mode, sub_j, T)
        params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
        pocket = bench.get_pocket(module, batch)
        rng_np = np.random.default_rng(0)
        num_nodes = module.ddpm.size_distribution.sample_conditional(
            n2=np.asarray(pocket["size"]), rng=rng_np)
        num_nodes = np.clip(num_nodes, 8, 24)
        lig_mask = jnp.asarray(num_nodes_to_mask(num_nodes, 24))
        xh_lig, _ = module.ddpm.sample_given_pocket_segmented(
            params, jax.random.PRNGKey(7), pocket, lig_mask,
            timesteps=T, segment=50, shared_pocket=True)
        xh_lig = np.asarray(xh_lig)
        x, h = xh_lig[..., :3], xh_lig[..., 3:]
        m = np.asarray(lig_mask)[..., None]
        outs[mode] = (x * m, h * m, m)
    (xb, hb, m), (xc, hc, _) = outs["bits"], outs["compact"]
    coord_dev = float(np.abs(xb - xc).max())
    type_flips = int((np.argmax(hb, -1) != np.argmax(hc, -1))[m[..., 0] > 0].sum())
    return {"T": T, "batch": batch,
            "coord_max_dev_A": coord_dev, "type_flips": type_flips}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--t", type=int, default=500)
    p.add_argument("--tier", default="bfloat16")
    p.add_argument("--skip-equality", action="store_true")
    p.add_argument("--eq-t", type=int, default=500)
    args = p.parse_args()

    bench._enable_compilation_cache()
    import jax  # noqa: F401

    record = {"workload": "conditional sampling, 3rfm A:330, T=%d, B=%d"
                          % (args.t, args.batch),
              "tier": args.tier, "points": {}}
    out_path = REPO / "benchmarks" / "SKIP_AB_r04.json"

    def save():
        out_path.write_text(json.dumps(record, indent=1) + "\n")

    for key, mode, sub_j in (("bits_32", "bits", 32),
                             ("compact_16", "compact", 16),
                             ("compact_8", "compact", 8)):
        t0 = time.time()
        try:
            module = build(args.tier, mode, sub_j, args.t)
            params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
            rec = bench._bench_batch(module, params, batch=args.batch,
                                     T=args.t, n_lig=24,
                                     repeats=args.repeats, tier=args.tier)
        except Exception as e:
            rec = {"error": f"{type(e).__name__}: {e}"[:300]}
        rec["skip_mode"] = mode
        rec["sub_j"] = sub_j
        rec["total_s_incl_compile"] = round(time.time() - t0, 1)
        record["points"][key] = rec
        print(json.dumps({key: rec}), flush=True)
        save()
        time.sleep(15)  # rest the tunnel between points

    if not args.skip_equality:
        try:
            record["chain_equality_f32x2"] = chain_equality(args.eq_t)
        except Exception as e:
            record["chain_equality_f32x2"] = {
                "error": f"{type(e).__name__}: {e}"[:300]}
        save()

    base = record["points"]["bits_32"].get("mol_per_sec")
    for key, rec in record["points"].items():
        if base and rec.get("mol_per_sec"):
            rec["speedup_vs_bits32"] = round(rec["mol_per_sec"] / base, 4)
    save()
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
