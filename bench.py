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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def _load_baseline():
    """Measured CPU anchor + derived A100 estimate from BASELINE.json."""
    try:
        data = json.loads(
            (Path(__file__).resolve().parent / "BASELINE.json").read_text())
        measured = data["measured"]["reference_cpu"]["value"]
        a100 = data["measured"]["a100_baseline_estimate"]["value"]
        return measured, a100
    except Exception:
        return 0.00381, 0.5


TORCH_CPU_MEASURED_MOL_PER_SEC, TORCH_A100_BASELINE_MOL_PER_SEC = \
    _load_baseline()

EXAMPLE_PDB = Path("/root/reference/example/3rfm.pdb")


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
    cache_dir = Path(__file__).resolve().parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _bench_batch(module, params, batch, T, n_lig, repeats):
    """Median-of-N timing at one batch size, plus a stage breakdown."""
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
    dt = float(np.median(times))

    # marginal per-step cost via a chain-length slope: a half-length chain
    # shares the fixed costs (prior, decode, dispatch), so the difference
    # isolates the eps-net step — robust to tunnel drift, unlike timing an
    # isolated segment in a separate (later, differently-loaded) dispatch
    half = module.ddpm.sample_given_pocket_segmented(
        params, jax.random.PRNGKey(2), pocket, lig_mask, timesteps=T // 2,
        segment=50, shared_pocket=True)
    sync(half)  # compile any T//2-specific pieces
    t0 = time.perf_counter()
    half = module.ddpm.sample_given_pocket_segmented(
        params, jax.random.PRNGKey(2), pocket, lig_mask, timesteps=T // 2,
        segment=50, shared_pocket=True)
    sync(half)
    dt_half = time.perf_counter() - t0

    return {
        "batch": batch,
        "mol_per_sec": batch / dt,
        "wall_s_median": round(dt, 2),
        "wall_s_all": [round(t, 2) for t in times],
        "ms_per_step": round(dt / T * 1e3, 2),
        # raw half-length chain wall time: the T-vs-T/2 difference isolates
        # the marginal eps-net step cost when the tunnel is stable; reported
        # raw because run-to-run device variance (~±25% under sustained
        # load) can exceed the quantity being derived
        "wall_s_half_T": round(dt_half, 2),
    }


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
    repeats = 3
    impl = "pallas"
    # harness smoke mode (CPU-runnable, tiny schedule): validates the bench
    # plumbing without a TPU; the driver runs the full configuration
    smoke = os.environ.get("DIFFSBDD_BENCH_SMOKE") == "1"
    model_kw = {}
    if smoke:
        T, batches, impl, repeats = 10, (2, 4), "xla", 1
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
    # exact-grade 3-pass tier ('float32_x3', 1.7e-4 A max dev) costs ~19%
    # more (one extra MXU pass, measured 6.4 ms/step at B=32).  The kernels
    # skip cutoff-inactive 16-column blocks via SMEM-prefetched activity
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

    # bfloat16 fast tier: eligible as headline only with recorded
    # metric-level evidence that bf16 samples are chemically
    # indistinguishable (benchmarks/precision_chem_ab.py writes
    # PRECISION_r03.json; validity/connectivity deltas within 0.05)
    bf16_evidence = None
    try:
        prec = json.loads((Path(__file__).resolve().parent / "benchmarks"
                           / "PRECISION_r03.json").read_text())
        deltas = prec["chem_ab"]["deltas_vs_base"].get("bfloat16")
        if deltas is not None and \
                abs(deltas.get("Validity", 1)) <= 0.05 and \
                abs(deltas.get("Connectivity", 1)) <= 0.05:
            bf16_evidence = deltas
    except Exception:
        pass

    def _point(runs, key, mod, batch):
        try:
            runs[key] = _bench_batch(mod, params, batch=batch, T=T,
                                     n_lig=n_lig, repeats=repeats)
        except Exception as e:  # one failed point must not sink the sweep
            runs[key] = {"batch": batch,
                         "error": f"{type(e).__name__}: {e}"[:200]}

    # headline candidates FIRST, on the freshest tunnel state (the tunnel
    # degrades ~±25% under sustained load): the chain-validated x2 point at
    # B=32, then the chem-validated bf16 fast tier at the same batch.  The
    # remaining x2 points (b8, b64) fill in the batch-scaling story, and a
    # bonus bf16 B=64 point closes the sweep; short rests between points.
    runs = {}
    mod16 = None
    if bf16_evidence is not None and not smoke:
        try:
            _, mod16 = _flagship_module(
                n_lig_max=n_lig, n_pocket_max=320, T=T,
                matmul_precision="bfloat16", egnn_impl=impl, **model_kw)
        except Exception as e:
            runs["bf16"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    order = []
    if smoke:
        order = [(f"b{b}", module, b) for b in batches]
    else:
        order.append(("b32", module, 32))
        if mod16 is not None:
            order.append(("b32_bf16", mod16, 32))
        order += [("b8", module, 8), ("b64", module, 64)]
        if mod16 is not None:
            order.append(("b64_bf16", mod16, 64))
    for i, (key, mod, b) in enumerate(order):
        if not smoke and i:
            time.sleep(20)
        _point(runs, key, mod, b)

    ok = {k: r for k, r in runs.items() if "mol_per_sec" in r}
    if not ok:
        raise RuntimeError(f"all batch points failed: {runs}")
    best_key = max(ok, key=lambda k: ok[k]["mol_per_sec"])
    mols_per_sec = ok[best_key]["mol_per_sec"]
    if best_key.endswith("_bf16"):
        headline_precision = (
            "bfloat16 fast tier (chem-validated vs float32_x2, "
            "PRECISION_r03.json: deltas " + json.dumps(bf16_evidence) + ")")
    else:
        headline_precision = "float32_x2 (chain-validated, PRECISION_r02.json)"

    # secondary reference workloads (single timed run each): joint-model
    # unconditional sampling and conditional RePaint inpainting
    workloads = {}
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

    result = {
        "metric": "molecules_per_sec_per_chip_T500",
        "value": round(mols_per_sec, 4),
        "unit": "mol/s",
        "vs_baseline": round(mols_per_sec / TORCH_A100_BASELINE_MOL_PER_SEC, 3),
        "vs_measured_cpu_reference": round(
            mols_per_sec / TORCH_CPU_MEASURED_MOL_PER_SEC, 1),
        "baseline_note": "A100 baseline 0.5 mol/s = measured single-core CPU "
                         "reference (0.00381 mol/s, BASELINE.json) x assumed "
                         "130x CPU->A100 factor",
        "headline_batch": runs[best_key]["batch"],
        "precision": headline_precision,
        "runs": {k: {kk: round(vv, 4) if isinstance(vv, float) else vv
                     for kk, vv in r.items()} for k, r in runs.items()},
        "workloads": workloads,
    }
    if smoke:
        result["smoke_mode"] = True
    print(json.dumps(result))


def _emit_failure(reason: str):
    # value 0.0 = no LIVE measurement happened; last_recorded_tpu points at
    # the most recent real-hardware number (see NOTES.md session 4 and
    # benchmarks/PRECISION_r02.json for its validation) so a transient
    # tunnel outage at harvest time doesn't erase the recorded state
    print(json.dumps({
        "metric": "molecules_per_sec_per_chip_T500",
        "value": 0.0, "unit": "mol/s", "vs_baseline": 0.0,
        "error": reason[:300],
        "last_recorded_tpu": {
            "value": 2.0196, "unit": "mol/s", "vs_baseline": 4.039,
            "batch": 32, "ms_per_step": 31.69,
            "precision": "bfloat16 fast tier (chem-validated, "
                         "PRECISION_r03.json)",
            "note": "measured live on the real v5e chip 2026-08-19 "
                    "(benchmarks/BENCH_live_r03_session3.json; float32_x2 "
                    "reproduced at 1.6956 mol/s in the same sweep); not a "
                    "live measurement from this run."},
    }))


def _probe_device(timeout_s: int = 150) -> bool:
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
    # hard watchdog: a wedged TPU tunnel hangs rather than erroring; always
    # emit a parseable record
    import os as _os
    import signal

    # a wedged tunnel heals with idle time: probe cheaply, and if the device
    # is unresponsive, rest and retry before burning the measurement attempt
    if _os.environ.get("DIFFSBDD_BENCH_SMOKE") != "1":
        for attempt in range(4):
            if _probe_device():
                break
            if attempt == 3:
                # tunnel is thoroughly wedged (a 256x256 matmul won't finish
                # in 150 s even after 15 min of healing idle); running the
                # bench would only hang into the watchdog — short-circuit
                _emit_failure("TPU unreachable: 4 device probes timed out "
                              "over ~20 min (axon tunnel outage)")
                _os._exit(0)
            print(f"device probe {attempt + 1} unresponsive; "
                  "resting 300s for tunnel recovery", file=sys.stderr)
            time.sleep(300)

    def _on_timeout(signum, frame):
        _emit_failure("watchdog: bench exceeded 3000s (TPU tunnel hang?)")
        _os._exit(0)

    signal.signal(signal.SIGALRM, _on_timeout)
    signal.alarm(3000)
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always emit a parseable record
        _emit_failure(f"{type(e).__name__}: {e}")
    finally:
        signal.alarm(0)
