"""Precision-tier validation: full-chain trajectory deviation vs exact f32.

Runs the complete T-step conditional sampler twice with IDENTICAL PRNG keys —
once at strict float32 (HIGHEST, the exactness anchor) and once at a candidate
kernel precision ('float32_x3' 3-pass bf16 split, or 'bfloat16' 1-pass) — and
reports end-of-chain deviations in physically meaningful units:

* max / RMS absolute deviation of final ligand coordinates (Angstrom),
* fraction of atoms whose argmax atom type differs,
* single-step eps deviation (the per-step error that compounds).

This is the evidence behind bench.py's precision choice: a tier is
"validated" when 500 compounding steps leave coordinates within a small
fraction of a bond length and no type flips.  (Without trained weights the
denoiser is random-init; deviation growth through the chain is dominated by
the same error-amplification dynamics, and the harness re-runs unchanged on
converted reference checkpoints.)

    python benchmarks/precision_validation.py [--t 500] [--batch 8] \
        [--candidates float32_x3 bfloat16]
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


def build(precision, T, impl="pallas"):
    from __graft_entry__ import _flagship_module
    cfg, module = _flagship_module(
        n_lig_max=24, n_pocket_max=320, T=T, matmul_precision=precision,
        egnn_impl=impl)
    return module


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=500)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--impl", default="pallas")
    p.add_argument("--reference-precision", default="float32")
    p.add_argument("--candidates", nargs="+",
                   default=["float32_x3", "bfloat16"])
    args = p.parse_args()

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    import bench
    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask

    T, B = args.t, args.batch
    ref_module = build(args.reference_precision, T, args.impl)
    params = ref_module.init_params(jax.random.PRNGKey(0), batch_size=2)
    pocket = bench.get_pocket(ref_module, B)
    rng_np = np.random.default_rng(0)
    num_nodes = np.clip(ref_module.ddpm.size_distribution.sample_conditional(
        n2=np.asarray(pocket["size"]), rng=rng_np), 8, 24)
    lig_mask = jnp.asarray(num_nodes_to_mask(num_nodes, 24))
    key = jax.random.PRNGKey(7)

    def run(module):
        # shared_pocket=True so the evidence covers the production bench
        # path (batch-invariant first-layer factorization included)
        xh_lig, _ = module.ddpm.sample_given_pocket_segmented(
            params, key, pocket, lig_mask, timesteps=T, segment=50,
            shared_pocket=True)
        return np.asarray(xh_lig)

    def one_step_eps(module):
        ddpm = module.ddpm
        _, npocket = ddpm.normalize(pocket=pocket)
        z_lig, xh_pkt = ddpm._prior_sample(jax.random.PRNGKey(3), npocket,
                                           lig_mask)
        z2, _ = ddpm._denoise_segment(
            params, jax.random.PRNGKey(4), z_lig, xh_pkt, lig_mask,
            npocket["mask"], jnp.asarray(T - 1, jnp.float32), n_steps=1,
            timesteps=T)
        return np.asarray(z2)

    t0 = time.time()
    ref_final = run(ref_module)
    ref_step = one_step_eps(ref_module)
    mask_np = np.asarray(lig_mask) > 0

    out = {"t": T, "batch": B, "impl": args.impl,
           "reference": args.reference_precision,
           "candidates": {}}
    for cand in args.candidates:
        module = build(cand, T, args.impl)
        final = run(module)
        step = one_step_eps(module)
        dx = np.abs(final[..., :3] - ref_final[..., :3])[mask_np]
        types_ref = ref_final[..., 3:].argmax(-1)[mask_np]
        types_cand = final[..., 3:].argmax(-1)[mask_np]
        step_dev = float(np.abs(step - ref_step)[mask_np].max())
        out["candidates"][cand] = {
            "coord_max_abs_dev_A": round(float(dx.max()), 6),
            "coord_rms_dev_A": round(float(np.sqrt((dx ** 2).mean())), 6),
            "type_flip_fraction": round(
                float((types_ref != types_cand).mean()), 6),
            "single_step_max_dev": step_dev,
        }
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
