"""Round-5 sampling-path perf probes (VERDICT r04 next #3/#4/#7).

Four independently runnable probes against the flagship sampling chain
(T=500 conditional, 3rfm pocket), each appending a JSON record to
``benchmarks/PERF_R05.json``:

* ``equality``  — full-T500 chain equality ti8 vs ti16 at B=32 (re-creates
  the TILE_AB_checks evidence ADVICE r04 #1 flagged as uncommitted, now on
  the slimmed SMEM compact path) and vs the r04 whole-array-prefetch
  numbers' semantics (the SMEM slimming must be a pure layout change).
* ``b64``       — B=64 sampling at tile_i 8 vs 16: the r04 ti8 SMEM ceiling
  (NOTES r04) is the one measured reason b64 regressed to 1.67 mol/s vs
  2.125 at b32; with per-grid-step SMEM index blocks ti8 should now compile
  and b64 should meet/beat b32 per-molecule.
* ``segments``  — segment length sweep (50/125/250) at B=32/bf16: ~2 ms/step
  of per-segment host+dispatch overhead was measured in r04 (NOTES r04);
  longer jitted segments amortize it while every dispatch stays far below
  the 60 s tunnel watchdog (50 steps x ~30 ms = 1.5 s today).
* ``pp_probe``  — isolates the per-step XLA index-glue cost that VERDICT #4
  proposes hoisting out of the scan (dense (B,N,N) input-coordinate d2 +
  the three compact active-block index computations): an upper bound on the
  chain-level win from caching the frozen-pocket activity lists.

    python benchmarks/perf_r05.py equality b64 segments pp_probe
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

OUT = REPO / "benchmarks" / "PERF_R05.json"


def record(name, data):
    rec = {}
    if OUT.exists():
        rec = json.loads(OUT.read_text())
    rec[name] = data
    OUT.write_text(json.dumps(rec, indent=1) + "\n")
    print(f"[{name}] {json.dumps(data)}", flush=True)


def _module(tile_i=None, precision="bfloat16", T=500, segment=None):
    from __graft_entry__ import _flagship_module
    _, m = _flagship_module(n_lig_max=24, n_pocket_max=320, T=T,
                            matmul_precision=precision, egnn_impl="pallas",
                            kernel_tile_i=tile_i)
    return m


def _chain_inputs(module, batch):
    import jax.numpy as jnp

    import bench
    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask
    pocket = bench.get_pocket(module, batch)
    rng_np = np.random.default_rng(0)
    num_nodes = np.clip(module.ddpm.size_distribution.sample_conditional(
        n2=np.asarray(pocket["size"]), rng=rng_np), 8, 24)
    lig_mask = jnp.asarray(num_nodes_to_mask(num_nodes, 24))
    return pocket, lig_mask


def _run_chain(module, params, pocket, lig_mask, key, T=500, segment=50):
    import jax.numpy as jnp
    out = module.ddpm.sample_given_pocket_segmented(
        params, key, pocket, lig_mask, timesteps=T, segment=segment,
        shared_pocket=True)
    return np.asarray(out[0])


def probe_equality():
    """ti8 vs ti16 full-T500 chains must be bit-identical (same math, the
    row-tile factor only changes the kernel grid)."""
    import jax
    m16 = _module(tile_i=16)
    m8 = _module(tile_i=8)
    params = m16.init_params(jax.random.PRNGKey(0), batch_size=2)
    pocket, lig_mask = _chain_inputs(m16, 32)
    key = jax.random.PRNGKey(5)
    out16 = _run_chain(m16, params, pocket, lig_mask, key)
    out8 = _run_chain(m8, params, pocket, lig_mask, key)
    dev = float(np.abs(out16 - out8).max())
    data = {"batch": 32, "T": 500, "precision": "bfloat16",
            "max_abs_dev_ti8_vs_ti16": dev, "bit_identical": bool(dev == 0.0),
            "note": "slimmed per-grid-step SMEM compact index operands "
                    "(r05); recreates the TILE_AB_checks evidence "
                    "(ADVICE r04 #1)"}
    record("tile_equality_T500", data)
    (REPO / "benchmarks" / "TILE_AB_checks_r05.json").write_text(
        json.dumps(data, indent=1) + "\n")


def probe_b64():
    """B=64 sampling, ti8 vs ti16, plus B=32 ti8 reference in-session."""
    import jax
    res = {}
    for tag, tile, batch in (("b32_ti8", 8, 32), ("b64_ti8", 8, 64),
                             ("b64_ti16", 16, 64)):
        try:
            m = _module(tile_i=tile)
            params = m.init_params(jax.random.PRNGKey(0), batch_size=2)
            pocket, lig_mask = _chain_inputs(m, batch)
            _run_chain(m, params, pocket, lig_mask, jax.random.PRNGKey(1),
                       T=100)  # compile+warm
            times = []
            for i in range(4):
                t0 = time.perf_counter()
                _run_chain(m, params, pocket, lig_mask,
                           jax.random.PRNGKey(2 + i))
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times[1:]))
            res[tag] = {"batch": batch, "tile_i": tile,
                        "mol_per_sec": round(batch / dt, 4),
                        "ms_per_step": round(dt / 500 * 1e3, 2),
                        "wall_s_all": [round(t, 2) for t in times]}
        except Exception as e:
            res[tag] = {"error": f"{type(e).__name__}: {e}"[:300]}
        record("b64_tiles_partial", res)
        time.sleep(15)
    record("b64_tiles", res)


def probe_segments():
    """Segment-length sweep at B=32/bf16/ti8."""
    import jax
    m = _module(tile_i=8)
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2)
    pocket, lig_mask = _chain_inputs(m, 32)
    res = {}
    for seg in (50, 125, 250):
        try:
            _run_chain(m, params, pocket, lig_mask, jax.random.PRNGKey(1),
                       T=2 * seg, segment=seg)
            times = []
            for i in range(4):
                t0 = time.perf_counter()
                _run_chain(m, params, pocket, lig_mask,
                           jax.random.PRNGKey(2 + i), segment=seg)
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times[1:]))
            res[f"seg{seg}"] = {
                "segment": seg, "mol_per_sec": round(32 / dt, 4),
                "ms_per_step": round(dt / 500 * 1e3, 2),
                "dispatches": -(-500 // seg),
                "wall_s_all": [round(t, 2) for t in times]}
        except Exception as e:
            res[f"seg{seg}"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        record("segment_sweep_partial", res)
        time.sleep(10)
    record("segment_sweep", res)


def probe_pp():
    """Per-step cost of the hoistable index glue (VERDICT #4 upper bound).

    Times, in isolation at B=32 N=384: the dense input-coordinate d2 plus
    the three per-launch compact index computations exactly as a sampling
    step builds them.  The chain can cache the pocket-row/pocket-col part
    across all 500 steps; this measures the WHOLE glue, i.e. an upper
    bound on any hoisting win.
    """
    import jax
    import jax.numpy as jnp

    from diffsbdd_tpu.ops.egnn_pallas import _compact_block_indices

    B, NL, NP = 32, 24, 320
    N = 384
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 4)
    mask = jnp.ones((B, N))
    is_lig = jnp.asarray((np.arange(N) < NL)[None].repeat(B, 0).astype(
        np.float32))
    cutoffs = (None, 5.0, 5.0)

    @jax.jit
    def glue(x):
        diff0 = x[:, :, None, :] - x[:, None, :, :]
        d2 = jnp.sum(diff0 * diff0, axis=-1)
        pkt = mask * (1 - is_lig)
        lig_cols = mask * is_lig
        outs = []
        # the three shared-pocket launches' index sets + the coord kernel's
        outs.append(_compact_block_indices(
            d2[:1], pkt[:1], pkt[:1], is_lig[:1], cutoffs, 8, 16, N // 8))
        outs.append(_compact_block_indices(
            d2, pkt, lig_cols, is_lig, cutoffs, 8, 16, N // 8))
        outs.append(_compact_block_indices(
            d2, lig_cols, mask, is_lig, cutoffs, 8, 16, -(-NL // 8)))
        outs.append(_compact_block_indices(
            d2, mask, mask, is_lig, cutoffs, 8, 16, -(-NL // 8)))
        return outs

    out = glue(x)
    jax.block_until_ready(out)
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = glue(x)
        # host transfer = true sync through the tunnel
        float(jnp.sum(out[0][0]))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times[2:]))

    # dispatch+sync floor: a near-empty jit with the same sync discipline,
    # so the glue's pure-compute share can be separated from the tunnel's
    # per-dispatch latency (measured ~23 ms, NOTES r04)
    tiny = jax.jit(lambda v: v + 1.0)
    v0 = jnp.zeros((8, 128))
    float(jnp.sum(tiny(v0)))
    floor_times = []
    for _ in range(20):
        t0 = time.perf_counter()
        float(jnp.sum(tiny(v0)))
        floor_times.append(time.perf_counter() - t0)
    floor = float(np.median(floor_times[2:]))
    record("pp_hoist_upper_bound", {
        "batch": B, "n_pad": N,
        "glue_plus_sync_ms": round(dt * 1e3, 3),
        "dispatch_sync_floor_ms": round(floor * 1e3, 3),
        "glue_ms_per_step_est": round((dt - floor) * 1e3, 3),
        "note": "upper bound on the VERDICT-#4 hoisting win: the whole "
                "per-step index glue incl. the dense (B,N,N) d2, with the "
                "per-dispatch sync floor measured separately and "
                "subtracted; the pp-only cacheable share is smaller "
                "still.  Compare against the ~30 ms step.",
    })


PROBES = {"equality": probe_equality, "b64": probe_b64,
          "segments": probe_segments, "pp_probe": probe_pp}


def main():
    import jax
    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    names = [a for a in sys.argv[1:] if a in PROBES] or list(PROBES)
    for i, n in enumerate(names):
        if i:
            time.sleep(20)
        try:
            PROBES[n]()
        except Exception as e:  # record, keep sweeping
            record(f"{n}_error", {"error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
