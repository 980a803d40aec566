"""Headline benchmark: pocket-conditional ligand sampling throughput.

Workload (mirrors the reference's measurement machinery, BASELINE.md):
T=500 denoising steps of the full-atom crossdock-sized conditional model
(joint_nf=128, hidden_nf=256, 6 layers, attention+tanh, 5A edge cutoffs) on
the 3rfm A:330 example pocket (286 heavy atoms), batch of ligands sampled
per pocket.  Metric: molecules generated per second per chip.

``vs_baseline`` compares against the PyTorch reference on A100.  The repo
stores no number (BASELINE.md), so the baseline is anchored to a MEASURED
run of the reference sampler on this host (benchmarks/measure_reference_cpu.py,
recorded in BASELINE.json 'measured'): 0.00381 mol/s on the single CPU core,
scaled by a documented assumed 130x single-core-CPU->A100 factor to
0.5 mol/s.  The raw measured CPU anchor and the ratio against it are also
emitted so the one assumption stays visible.

Output protocol (driver-harvest hardening, VERDICT r03 #1): this script
prints a parseable provisional JSON record IMMEDIATELY at startup (before
any jax import or device contact), then an updated record after each
completed measurement point, and a final complete record at the end.  Every
line is a full record with the same schema; later lines supersede earlier
ones (``provisional: true`` marks non-final lines).  Killing the process at
ANY time leaves a parseable record in the stdout tail.  SIGTERM and the
internal watchdog flush the latest record before exiting.

Statistics (VERDICT r03 #7): headline points run >=6 timed repeats with the
first discarded (residual warmup), reporting median + IQR; a point is
headline-eligible only if IQR/median <= 15%.  MFU/FLOP accounting
(VERDICT r03 #4) comes from the hand model in diffsbdd_tpu/utils/flops.py.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent


def _load_baseline():
    """Measured CPU anchor + derived A100 estimate from BASELINE.json."""
    try:
        data = json.loads((REPO / "BASELINE.json").read_text())
        measured = data["measured"]["reference_cpu"]["value"]
        a100 = data["measured"]["a100_baseline_estimate"]["value"]
        return measured, a100
    except Exception:
        return 0.00381, 0.5


TORCH_CPU_MEASURED_MOL_PER_SEC, TORCH_A100_BASELINE_MOL_PER_SEC = \
    _load_baseline()

EXAMPLE_PDB = Path("/root/reference/example/3rfm.pdb")

BASELINE_NOTE = ("A100 baseline 0.5 mol/s = measured single-core CPU "
                 "reference (0.00381 mol/s, BASELINE.json) x assumed "
                 "130x CPU->A100 factor")

# latest emitted record, re-flushed by signal handlers
_LATEST: dict = {}

# VERDICT r04 weak #1: the driver parses the LAST ~2000 chars of stdout.
# r04's final record (full sweep + per-point MFU blocks) outgrew that
# window, so the head of the line — metric/value — was cut off and the
# round's headline parsed as null.  Protocol now: the full record goes to
# benchmarks/BENCH_FULL_LAST.json; every stdout line is a COMPACT headline
# record hard-capped at 1500 bytes (tests/test_bench_protocol.py pins it).
MAX_STDOUT_RECORD_BYTES = 1500
# Overridable so test-suite smoke spawns don't clobber the committed
# hardware record (tests point this at a tmp path).
FULL_RECORD_PATH = Path(os.environ.get(
    "DIFFSBDD_BENCH_FULL_PATH",
    REPO / "benchmarks" / "BENCH_FULL_LAST.json"))

# compact-record field order: required schema fields first, then optional
# context fields dropped (in reverse order) if the cap is ever threatened
_COMPACT_REQUIRED = ("metric", "value", "unit", "vs_baseline",
                     "vs_measured_cpu_reference", "batch", "ms_per_step",
                     "mfu_model", "provisional")
_COMPACT_OPTIONAL = ("precision", "headline_stable", "stability",
                     "smoke_mode", "provisional_reason", "error",
                     "terminated_early", "baseline_note", "full_record")
_COMPACT_TRUNCATE = {"precision": 110, "provisional_reason": 140,
                     "error": 140, "terminated_early": 140,
                     "baseline_note": 150}


def _compact(full: dict) -> dict:
    """Derive the <=1500-byte stdout headline record from a full record."""
    rec = {}
    for k in _COMPACT_REQUIRED:
        if k == "batch":
            rec[k] = full.get("headline_batch", full.get("batch", 0))
        elif k == "provisional":
            rec[k] = bool(full.get("provisional", False))
        elif k in ("value", "vs_baseline", "vs_measured_cpu_reference"):
            rec[k] = full.get(k, 0.0)
        else:
            rec[k] = full.get(k)  # null when not measured
    for k in _COMPACT_OPTIONAL:
        if k in full and full[k] is not None:
            v = full[k]
            if isinstance(v, str) and k in _COMPACT_TRUNCATE:
                v = v[:_COMPACT_TRUNCATE[k]]
            rec[k] = v
    try:
        rec["full_record"] = str(FULL_RECORD_PATH.relative_to(REPO))
    except ValueError:
        rec["full_record"] = str(FULL_RECORD_PATH)
    # enforce the cap: drop optional fields (least important last) until fit
    line = json.dumps(rec)
    drop = list(_COMPACT_OPTIONAL)
    while len(line.encode()) > MAX_STDOUT_RECORD_BYTES and drop:
        rec.pop(drop.pop(), None)
        line = json.dumps(rec)
    return rec


def _emit(record: dict) -> None:
    """Persist the full record to benchmarks/, print the compact line."""
    _LATEST.clear()
    _LATEST.update(record)
    try:
        FULL_RECORD_PATH.write_text(json.dumps(record, indent=1))
    except Exception:
        pass  # emission must never fail on a read-only/odd filesystem
    print(json.dumps(_compact(record)), flush=True)


def _last_recorded() -> dict:
    """Most recent live TPU measurement (benchmarks/LAST_RECORDED.json)."""
    try:
        return json.loads(
            (REPO / "benchmarks" / "LAST_RECORDED.json").read_text())
    except Exception:
        return {"value": 2.0196, "unit": "mol/s", "vs_baseline": 4.039,
                "batch": 32, "ms_per_step": 31.69,
                "precision": "bfloat16 fast tier (chem-validated, "
                             "PRECISION_r03.json)",
                "note": "fallback constants (LAST_RECORDED.json unreadable)"}


def _emit_startup_provisional() -> None:
    last = _last_recorded()
    _emit({
        "metric": "molecules_per_sec_per_chip_T500",
        "value": last.get("value", 0.0),
        "unit": "mol/s",
        "vs_baseline": last.get("vs_baseline", 0.0),
        "vs_measured_cpu_reference": round(
            last.get("value", 0.0) / TORCH_CPU_MEASURED_MOL_PER_SEC, 1),
        "batch": last.get("batch", 0),
        "ms_per_step": last.get("ms_per_step"),
        "precision": last.get("precision", ""),
        "provisional": True,
        "provisional_reason": "startup record emitted before any "
                              "measurement; a later JSON line supersedes "
                              "this one",
        "last_recorded_tpu": last,
        "baseline_note": BASELINE_NOTE,
    })


def get_pocket(module, n_samples):
    """Real example pocket when available, synthetic otherwise."""
    if EXAMPLE_PDB.exists():
        from diffsbdd_tpu.chem.pdb import get_pocket_from_ligand, parse_pdb
        struct = parse_pdb(EXAMPLE_PDB)
        residues = get_pocket_from_ligand(struct, "A:330")
        return module.prepare_pocket(residues, repeats=n_samples)
    # synthetic fallback: a dense cluster with realistic density
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    n = 286
    n_pad = 320
    coords = (rng.standard_normal((n, 3)) * 6.0).astype(np.float32)
    types = rng.integers(0, module.residue_nf, n)
    pocket = {
        "x": np.zeros((n_samples, n_pad, 3), np.float32),
        "one_hot": np.zeros((n_samples, n_pad, module.residue_nf), np.float32),
        "mask": np.zeros((n_samples, n_pad), np.float32),
        "size": np.full((n_samples,), n, np.int32),
    }
    pocket["x"][:, :n] = coords
    pocket["one_hot"][:, :n, :] = np.eye(module.residue_nf)[types][None]
    pocket["mask"][:, :n] = 1.0
    return {k: jnp.asarray(v) for k, v in pocket.items()}


def _enable_compilation_cache():
    """Persistent compile cache: repeated bench runs (and the driver's run)
    skip the expensive remote XLA compiles once primed."""
    import jax
    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _mfu_fields(pocket, lig_mask, n_lig, dt_step_s, tier, batch):
    """FLOP/MFU accounting for one denoise step (utils/flops.py hand model).

    Block activity is computed from the real pocket coordinates with the
    ligand placed at the pocket CoM with unit-normal spread — the sampler's
    z_T initialization — at the kernels' (tile_i, sub_j) granularity.
    """
    try:
        from diffsbdd_tpu.utils.flops import (block_activity, eps_net_flops,
                                              mfu_report)
        x_p = np.asarray(pocket["x"][:1])
        m_p = np.asarray(pocket["mask"][:1])
        n_pkt = x_p.shape[1]
        m_l = np.asarray(lig_mask[:1])
        n_pad = -(-(n_lig + n_pkt) // 128) * 128
        x = np.zeros((1, n_pad, 3), np.float32)
        mask = np.zeros((1, n_pad), np.float32)
        is_lig = np.zeros((1, n_pad), np.float32)
        com = (x_p * m_p[..., None]).sum(1) / m_p.sum(1)[..., None]
        rng = np.random.default_rng(0)
        x[:, :n_lig] = com[:, None, :] + rng.standard_normal(
            (1, n_lig, 3)).astype(np.float32)
        x[:, n_lig:n_lig + n_pkt] = x_p
        mask[:, :n_lig] = m_l
        mask[:, n_lig:n_lig + n_pkt] = m_p
        is_lig[:, :n_lig] = 1.0
        cutoffs = (None, 5.0, 5.0)
        act = block_activity(x, mask, is_lig, cutoffs)
        fl = eps_net_flops(
            batch=batch, n_lig_rows=n_lig, n_pocket=n_pkt, n_pad=n_pad,
            hidden_nf=256, n_layers=6, inv_sublayers=1, attention=True,
            reflection_equiv=False, activity=act, shared_pocket=True)
        rep = mfu_report(fl, dt_step_s, tier, batch=batch)
        rep["block_activity"] = round(act, 4)
        return rep
    except Exception as e:  # accounting must never sink a measurement
        return {"error": f"{type(e).__name__}: {e}"[:200]}


def _bench_batch(module, params, batch, T, n_lig, repeats, tier):
    """Timed chain runs at one batch size: median + IQR, first run discarded.

    ``repeats`` counts the timed runs AFTER the compile/warm call; the first
    timed run is additionally discarded (it reproducibly carries 2-4x
    residual warmup through the tunnel, BENCH_live_r03_session3.json).
    """
    import jax
    import jax.numpy as jnp

    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask

    pocket = get_pocket(module, batch)
    rng_np = np.random.default_rng(0)
    num_nodes = module.ddpm.size_distribution.sample_conditional(
        n2=np.asarray(pocket["size"]), rng=rng_np)
    num_nodes = np.clip(num_nodes, 8, n_lig)
    lig_mask = jnp.asarray(num_nodes_to_mask(num_nodes, n_lig))

    # segmented dispatch: identical chain, but each device dispatch stays
    # short (the tunnel enforces per-execution limits); overhead is a few ms
    def sample(key):
        # shared_pocket: get_pocket replicates ONE pocket across the batch
        # (the generate_ligands layout), enabling the batch-invariant
        # first-layer factorization
        return module.ddpm.sample_given_pocket_segmented(
            params, key, pocket, lig_mask, timesteps=T, segment=50,
            shared_pocket=True)

    def sync(out):
        # jax.block_until_ready does NOT wait for device completion through
        # this host's TPU tunnel (measured: 30 chained 4k matmuls "ready" in
        # 3.7 ms, compute surfacing only on transfer) — a host transfer is
        # the only true synchronization point
        return float(jnp.sum(out[0]))

    # compile + warmup at a short schedule: the T=500 run reuses the same
    # compiled 50-step segment + decode functions
    warm = module.ddpm.sample_given_pocket_segmented(
        params, jax.random.PRNGKey(1), pocket, lig_mask,
        timesteps=min(100, T), segment=50, shared_pocket=True)
    sync(warm)

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        out = sample(jax.random.PRNGKey(2 + i))
        sync(out)
        times.append(time.perf_counter() - t0)
    kept = times[1:] if len(times) > 1 else times
    dt = float(np.median(kept))
    q1, q3 = np.percentile(kept, [25, 75])
    iqr = float(q3 - q1)
    rel_iqr = iqr / dt if dt > 0 else float("inf")

    rec = {
        "batch": batch,
        "mol_per_sec": batch / dt,
        "wall_s_median": round(dt, 2),
        "wall_s_iqr": round(iqr, 3),
        "iqr_over_median": round(rel_iqr, 4),
        "stable": bool(rel_iqr <= 0.15),
        "wall_s_all": [round(t, 2) for t in times],
        "n_kept": len(kept),
        "first_run_discarded": len(times) > 1,
        "ms_per_step": round(dt / T * 1e3, 2),
    }
    rec["mfu"] = _mfu_fields(pocket, lig_mask, n_lig, dt / T, tier, batch)
    return rec


def _bench_joint_sample(batch, T, n_lig, segment=50, smoke=False):
    """Joint-model (EnVariationalDiffusion-equivalent) unconditional sample
    timing — the test.py-style joint workload (en_diffusion.py:580-651)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_module
    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask

    model_kw = dict(hidden_nf=32, n_layers=2) if smoke else {}
    _, module = _flagship_module(
        n_lig_max=n_lig, n_pocket_max=320, T=T,
        matmul_precision="float32" if smoke else "float32_x2",
        egnn_impl="xla" if smoke else "pallas", mode="joint", **model_kw)
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)

    rng_np = np.random.default_rng(0)
    n_l, n_p = module.ddpm.size_distribution.sample(batch, rng=rng_np)
    lig_mask = jnp.asarray(num_nodes_to_mask(np.clip(n_l, 8, n_lig), n_lig))
    pkt_mask = jnp.asarray(num_nodes_to_mask(np.clip(n_p, 64, 320), 320))

    def run(key):
        out = module.ddpm.sample_segmented(
            params, key, (lig_mask, pkt_mask), timesteps=T, segment=segment)
        return float(jnp.sum(out[0]))

    run(jax.random.PRNGKey(1))  # compile + warm
    t0 = time.perf_counter()
    run(jax.random.PRNGKey(2))
    dt = time.perf_counter() - t0
    return {"batch": batch, "mol_per_sec": round(batch / dt, 4),
            "wall_s": round(dt, 2), "ms_per_step": round(dt / T * 1e3, 2)}


def _bench_inpaint(module, params, batch, T, n_lig, resamplings=5,
                   segment=50):
    """Conditional RePaint inpainting timing (inpaint.py:147-149 workload):
    T x resamplings net evaluations per molecule."""
    import jax
    import jax.numpy as jnp

    from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask

    pocket = get_pocket(module, batch)
    # synthetic fixed substructure near the pocket CoM: 6 fixed atoms of a
    # 20-atom ligand (timing is independent of the fixed-atom geometry)
    n_nodes = 20
    lig_mask = jnp.asarray(num_nodes_to_mask(
        np.full((batch,), n_nodes), n_lig))
    com = (jnp.sum(pocket["x"] * pocket["mask"][..., None], axis=1)
           / jnp.sum(pocket["mask"], axis=1)[..., None])
    rng_np = np.random.default_rng(0)
    x0 = com[:, None, :] + jnp.asarray(
        rng_np.standard_normal((batch, n_lig, 3)).astype(np.float32))
    one_hot = jnp.zeros((batch, n_lig, module.atom_nf)).at[..., 0].set(1.0)
    ligand = {"x": x0 * lig_mask[..., None],
              "one_hot": one_hot * lig_mask[..., None],
              "mask": lig_mask,
              "size": jnp.full((batch,), n_nodes, jnp.int32)}
    lig_fixed = (jnp.arange(n_lig)[None, :] < 6).astype(jnp.float32) * lig_mask

    def run(key):
        out = module.ddpm.inpaint_segmented(
            params, key, ligand, pocket, lig_fixed,
            resamplings=resamplings, timesteps=T, center="ligand",
            segment=segment, shared_pocket=True)
        return float(jnp.sum(out[0]))

    run(jax.random.PRNGKey(1))  # compile + warm
    t0 = time.perf_counter()
    run(jax.random.PRNGKey(2))
    dt = time.perf_counter() - t0
    return {"batch": batch, "resamplings": resamplings,
            "mol_per_sec": round(batch / dt, 4), "wall_s": round(dt, 2),
            "ms_per_net_eval": round(dt / (T * resamplings) * 1e3, 2)}


def _assemble(runs, workloads, smoke, bf16_evidence, final):
    """Full result record from the points measured so far."""
    ok = {k: r for k, r in runs.items() if "mol_per_sec" in r}
    if not ok:
        return None
    # headline promotion: stability-gated (IQR/median <= 15%); unstable
    # points stay in the record but cannot carry the headline unless
    # nothing is stable (then the best point is promoted, flagged)
    stable = {k: r for k, r in ok.items() if r.get("stable", True)}
    pool = stable or ok
    best_key = max(pool, key=lambda k: pool[k]["mol_per_sec"])
    mols_per_sec = ok[best_key]["mol_per_sec"]
    if best_key.endswith("_bf16"):
        headline_precision = (
            "bfloat16 fast tier (chem-validated vs float32_x2, latest "
            "PRECISION_r0N.json: deltas " + json.dumps(bf16_evidence) + ")")
    else:
        headline_precision = "float32_x2 (chain-validated, PRECISION_r02.json)"

    result = {
        "metric": "molecules_per_sec_per_chip_T500",
        "value": round(mols_per_sec, 4),
        "unit": "mol/s",
        "vs_baseline": round(mols_per_sec / TORCH_A100_BASELINE_MOL_PER_SEC,
                             3),
        "vs_measured_cpu_reference": round(
            mols_per_sec / TORCH_CPU_MEASURED_MOL_PER_SEC, 1),
        "baseline_note": BASELINE_NOTE,
        "headline_batch": runs[best_key]["batch"],
        "ms_per_step": runs[best_key].get("ms_per_step"),
        "mfu_model": (round(runs[best_key]["mfu"]["mfu_model"], 4)
                      if isinstance(runs[best_key].get("mfu"), dict)
                      and "mfu_model" in runs[best_key]["mfu"] else None),
        "headline_stable": bool(runs[best_key].get("stable", True)),
        "precision": headline_precision,
        "runs": {k: {kk: round(vv, 4) if isinstance(vv, float) else vv
                     for kk, vv in r.items()} for k, r in runs.items()},
        "workloads": workloads,
    }
    if not stable:
        result["stability"] = "no point met IQR/median <= 15%"
    if not final:
        result["provisional"] = True
        result["provisional_reason"] = "sweep still in progress"
    if smoke:
        result["smoke_mode"] = True
    return result


def main():
    import os

    import jax

    _enable_compilation_cache()

    from __graft_entry__ import _flagship_module

    T = 500
    n_lig = 24
    # b8 == b32 == b64 within noise per-molecule (r03 sweep: 1.65 / 1.69 /
    # 1.69-best mol/s) — per-step cost is ~linear in B on this
    # bandwidth-bound kernel, so bigger batches buy nothing and B=128's
    # kernel compile crashes the remote compile helper (HTTP 500); B=64
    # runs also destabilized the tunnel under sustained load, so the sweep
    # stops at 64.  ``batches`` drives the smoke path; the real sweep order
    # is built below with headline candidates first.
    batches = (8, 32, 64)
    impl = "pallas"
    # harness smoke mode (CPU-runnable, tiny schedule): validates the bench
    # plumbing without a TPU; the driver runs the full configuration
    smoke = os.environ.get("DIFFSBDD_BENCH_SMOKE") == "1"
    model_kw = {}
    if smoke:
        T, batches, impl = 10, (2, 4), "xla"
        # plumbing-only validation at a small model: the full-size dense
        # chain runs minutes per step on a single CPU core
        model_kw = dict(hidden_nf=32, n_layers=2)
        # self-contained CPU smoke: the axon TPU plugin overrides
        # JAX_PLATFORMS at import, so pin the platform explicitly — the
        # smoke must not depend on (or wedge) the tunnel
        jax.config.update("jax_platforms", "cpu")
        # do NOT load the persistent cache on CPU: its entries are AOT CPU
        # executables whose machine features may come from a different host
        # (XLA warns "could lead to execution errors such as SIGILL")
        jax.config.update("jax_compilation_cache_dir", None)

    # fused Pallas EGNN kernels; 'float32_x2' keeps the XLA glue at exact
    # f32 and runs the kernels' pair-MLP dots as 2-pass bf16 splits
    # (activation low bits kept, weight low bits dropped).  Validated over
    # the full T=500 chain vs strict f32 (benchmarks/precision_validation.py,
    # PRECISION_r02.json): coord max dev 0.020 A, RMS 0.004 A, ZERO type
    # flips, single-step eps dev 1e-5 — chemically indistinguishable.  The
    # kernels skip cutoff-inactive column blocks via SMEM-prefetched activity
    # bits, and in conditional mode the coordinate kernel only computes the
    # ligand row tiles (pocket coordinates are frozen).
    #
    # Pocket-size note: prepare_pocket pads the 286-atom pocket to the next
    # 64-bucket (320); the kernels then pad N = 24 + 320 = 344 to the
    # 128-multiple 384.  Tighter pocket padding cannot shrink N below 384
    # for this pocket, and the padded rows are mask-0 blocks the SMEM
    # activity bits already skip — pocket bucketing is tile-optimal here.
    cfg, module = _flagship_module(n_lig_max=n_lig, n_pocket_max=320, T=T,
                                   matmul_precision="float32_x2",
                                   egnn_impl=impl, **model_kw)
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)

    # Sampling-validated tile override (benchmarks/TILE_AB_r04.json):
    # tile_i=8 is 3.3% faster than the default 16 at B<=32 under the
    # compact skip mode (30.04 vs 31.04 ms/step, alternating A/B,
    # bit-identical full chains — TILE_AB_checks_r05.json re-pins the
    # equality on the r05 per-grid-step SMEM index operands).  The r04
    # B=64 SMEM ceiling is gone (the compact index words now stream per
    # grid step), so ti8 carries every batch point: measured b64 2.068
    # mol/s vs 1.67 in r04 (benchmarks/PERF_R05.json b64_tiles).
    module_t8 = None
    if not smoke:
        try:
            _, module_t8 = _flagship_module(
                n_lig_max=n_lig, n_pocket_max=320, T=T,
                matmul_precision="float32_x2", egnn_impl=impl,
                kernel_tile_i=8, **model_kw)
        except Exception:
            module_t8 = None

    # bfloat16 fast tier: eligible as headline only with recorded
    # metric-level evidence that bf16 samples are chemically
    # indistinguishable (benchmarks/precision_chem_ab.py writes
    # PRECISION_r{N}.json; validity/connectivity deltas within 0.05)
    bf16_evidence = None
    for rec_name in ("PRECISION_r05.json", "PRECISION_r04.json",
                     "PRECISION_r03.json"):
        try:
            prec = json.loads(
                (REPO / "benchmarks" / rec_name).read_text())
            deltas = prec["chem_ab"]["deltas_vs_base"].get("bfloat16")
            if deltas is not None and \
                    abs(deltas.get("Validity", 1)) <= 0.05 and \
                    abs(deltas.get("Connectivity", 1)) <= 0.05:
                bf16_evidence = deltas
                break
        except Exception:
            pass

    def _point(runs, key, mod, batch, repeats, tier):
        try:
            runs[key] = _bench_batch(mod, params, batch=batch, T=T,
                                     n_lig=n_lig, repeats=repeats, tier=tier)
        except Exception as e:  # one failed point must not sink the sweep
            runs[key] = {"batch": batch,
                         "error": f"{type(e).__name__}: {e}"[:200]}

    # headline candidates FIRST, on the freshest tunnel state (the tunnel
    # degrades ~±25% under sustained load): the chain-validated x2 point at
    # B=32, then the chem-validated bf16 fast tier at the same batch, at
    # full repeats.  The remaining x2 points (b8, b64) fill in the
    # batch-scaling story at reduced repeats; short rests between points.
    runs = {}
    workloads = {}
    mod16 = None
    if bf16_evidence is not None and not smoke:
        try:
            _, mod16 = _flagship_module(
                n_lig_max=n_lig, n_pocket_max=320, T=T,
                matmul_precision="bfloat16", egnn_impl=impl,
                kernel_tile_i=8, **model_kw)
        except Exception as e:
            runs["bf16"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    order = []
    if smoke:
        order = [(f"b{b}", module, b, 2, "float32", True)
                 for b in batches]
    else:
        m32 = module_t8 if module_t8 is not None else module
        order.append(("b32", m32, 32, 6, "float32_x2", True))
        if mod16 is not None:
            order.append(("b32_bf16", mod16, 32, 6, "bfloat16", True))
        order += [("b8", m32, 8, 4, "float32_x2", False),
                  ("b64", m32, 64, 4, "float32_x2", False)]
        if mod16 is not None:
            order.append(("b64_bf16", mod16, 64, 4, "bfloat16", False))
    sweep_t0 = time.monotonic()
    for i, (key, mod, b, reps, tier, is_headline) in enumerate(order):
        if not smoke and not is_headline and \
                time.monotonic() - sweep_t0 > 600:
            runs[key] = {"batch": b, "skipped": "sweep budget (600s) spent; "
                         "headline points completed first"}
            continue
        if not smoke and i:
            time.sleep(20)
        _point(runs, key, mod, b, reps, tier)
        snap = _assemble(runs, workloads, smoke, bf16_evidence, final=False)
        if snap is not None:
            _emit(snap)

    # secondary reference workloads (single timed run each): joint-model
    # unconditional sampling and conditional RePaint inpainting
    try:
        if not smoke:
            time.sleep(15)
        workloads["inpaint_T500_r5"] = _bench_inpaint(
            module, params, batch=4 if smoke else 8, T=T, n_lig=n_lig,
            resamplings=2 if smoke else 5)
    except Exception as e:
        workloads["inpaint_T500_r5"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    try:
        if not smoke:
            time.sleep(15)
        workloads["joint_sample_T500"] = _bench_joint_sample(
            batch=4 if smoke else 8, T=T, n_lig=n_lig, smoke=smoke)
    except Exception as e:
        workloads["joint_sample_T500"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    result = _assemble(runs, workloads, smoke, bf16_evidence, final=True)
    if result is None:
        raise RuntimeError(f"all batch points failed: {runs}")
    _emit(result)

    # persist the live measurement for future provisional records
    if not smoke and result["value"] > 0:
        try:
            best = result["runs"][max(
                (k for k, r in result["runs"].items() if "mol_per_sec" in r),
                key=lambda k: result["runs"][k]["mol_per_sec"])]
            (REPO / "benchmarks" / "LAST_RECORDED.json").write_text(
                json.dumps({
                    "value": result["value"], "unit": "mol/s",
                    "vs_baseline": result["vs_baseline"],
                    "batch": result["headline_batch"],
                    "ms_per_step": best.get("ms_per_step"),
                    "precision": result["precision"],
                    "source": "bench.py live run",
                }, indent=1))
        except Exception:
            pass


def _emit_failure(reason: str):
    """Terminal failure record.  If a live (even partial) measurement was
    already emitted, re-emit it with the failure annotated instead of
    zeroing the value — a captured partial sweep beats a tombstone."""
    if _LATEST and not _LATEST.get("provisional_reason", "").startswith(
            "startup"):
        rec = dict(_LATEST)
        rec["terminated_early"] = reason[:300]
        rec.pop("provisional", None)
        rec.pop("provisional_reason", None)
        _emit(rec)
        return
    # nothing measured live this run: re-emit the startup provisional (the
    # last-recorded real-hardware number, still flagged provisional) with
    # the failure reason attached — the VERDICT-r03-#1 protocol
    last = _last_recorded()
    _emit({
        "metric": "molecules_per_sec_per_chip_T500",
        "value": last.get("value", 0.0),
        "unit": "mol/s",
        "vs_baseline": last.get("vs_baseline", 0.0),
        "vs_measured_cpu_reference": round(
            last.get("value", 0.0) / TORCH_CPU_MEASURED_MOL_PER_SEC, 1),
        "batch": last.get("batch", 0),
        "ms_per_step": last.get("ms_per_step"),
        "precision": last.get("precision", ""),
        "provisional": True,
        "provisional_reason": "no live measurement completed this run; "
                              "value is the last recorded TPU number",
        "error": reason[:300],
        "last_recorded_tpu": last,
        "baseline_note": BASELINE_NOTE,
    })


def _probe_device(timeout_s: int = 75) -> bool:
    """Touch the TPU in a SUBPROCESS with a timeout.

    The tunnel wedges rather than errors: device init or the first dispatch
    can block for tens of minutes, then the tunnel recovers after idling.
    Probing in a disposable child keeps this process clean so the bench can
    wait out a wedge instead of inheriting a poisoned backend."""
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((256, 256)); "
            "float(jnp.sum(x @ x)); print('ok')")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, timeout=timeout_s)
        return proc.returncode == 0 and b"ok" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    import os as _os
    import signal

    # FIRST OUTPUT, before any jax import or device contact: a parseable
    # provisional record.  The r03 harvest died inside the probe loop with
    # zero bytes of JSON emitted — that must be impossible now.
    _emit_startup_provisional()

    def _on_timeout(signum, frame):
        _emit_failure("watchdog: bench exceeded its internal budget "
                      "(TPU tunnel hang?)")
        _os._exit(0)

    def _on_term(signum, frame):
        _emit_failure("SIGTERM received (driver timeout?)")
        _os._exit(0)

    signal.signal(signal.SIGALRM, _on_timeout)
    signal.signal(signal.SIGTERM, _on_term)
    signal.alarm(2400)

    # a wedged tunnel heals with idle time: probe cheaply, and if the device
    # is unresponsive, rest and retry — but the WHOLE probe+rest budget is
    # capped (~7 min) so the harvest window is never consumed by waiting
    if _os.environ.get("DIFFSBDD_BENCH_SMOKE") != "1":
        probe_deadline = time.monotonic() + 420
        reachable = False
        while True:
            if _probe_device():
                reachable = True
                break
            if time.monotonic() + 105 + 75 > probe_deadline:
                break
            print("device probe unresponsive; resting 105s for tunnel "
                  "recovery", file=sys.stderr)
            time.sleep(105)
        if not reachable:
            _emit_failure("TPU unreachable: device probes timed out over "
                          "the capped ~7 min probe budget (axon tunnel "
                          "outage)")
            _os._exit(0)

    try:
        main()
    except Exception as e:  # noqa: BLE001 — always emit a parseable record
        _emit_failure(f"{type(e).__name__}: {e}")
    finally:
        signal.alarm(0)
