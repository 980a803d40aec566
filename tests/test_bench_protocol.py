"""bench.py harvest protocol + FLOP/MFU model tests (VERDICT r03 #1/#4/#7).

The r03 driver harvest came back ``parsed: null`` because bench.py spent its
whole budget probing a wedged tunnel before printing a byte.  These tests pin
the new contract: a parseable record in the stdout tail under ANY termination
(instant kill, mid-run kill, natural completion), stability-gated headline
statistics, and the hand FLOP model's internal consistency.
"""
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _last_json_line(text: str):
    lines = [ln for ln in text.strip().splitlines() if ln.strip()]
    assert lines, "no output at all"
    return json.loads(lines[-1])


def _spawn_smoke(full_path=None):
    env = dict(os.environ)
    env["DIFFSBDD_BENCH_SMOKE"] = "1"
    # never clobber the committed hardware record from a test spawn
    env["DIFFSBDD_BENCH_FULL_PATH"] = str(
        full_path or REPO / "benchmarks" / ".bench_full_test.json")
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, str(REPO / "bench.py")], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)


@pytest.mark.quick
def test_startup_record_is_immediate_and_parseable():
    """First stdout line must appear within seconds and be a full record."""
    proc = _spawn_smoke()
    try:
        t0 = time.monotonic()
        first = proc.stdout.readline()
        dt = time.monotonic() - t0
        rec = json.loads(first)
        assert dt < 20, f"startup record took {dt:.1f}s"
        assert rec["metric"] == "molecules_per_sec_per_chip_T500"
        assert rec["provisional"] is True
        assert rec["value"] > 0  # last-recorded live number, not a zero
        assert "vs_baseline" in rec and "unit" in rec
    finally:
        proc.kill()
        proc.wait()


@pytest.mark.quick
def test_sigkill_leaves_parseable_tail():
    """SIGKILL at any moment leaves a parseable record in the tail."""
    proc = _spawn_smoke()
    first = proc.stdout.readline()  # wait for the startup record
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    rest = proc.stdout.read()
    rec = _last_json_line(first + rest)
    assert rec["metric"] == "molecules_per_sec_per_chip_T500"
    assert rec["value"] > 0


def test_full_smoke_emits_progressive_then_final_records(tmp_path):
    """Natural completion: provisional startup line, >=1 snapshot, final.

    VERDICT r04 weak #1: every stdout line must be a COMPACT record (the
    driver reads only the last ~2000 chars of the tail), with the full
    sweep detail in the full-record file (benchmarks/BENCH_FULL_LAST.json
    in production; redirected to tmp here so the suite never dirties the
    committed hardware record).
    """
    full_path = tmp_path / "bench_full.json"
    proc = _spawn_smoke(full_path)
    out, _ = proc.communicate(timeout=540)
    assert proc.returncode == 0
    raw_lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    lines = [json.loads(ln) for ln in raw_lines]
    assert len(lines) >= 3
    assert lines[0]["provisional"] is True
    final = lines[-1]
    assert final["provisional"] is False
    assert final["smoke_mode"] is True
    assert final["value"] > 0
    # VERDICT r04 #1 done-criterion: the last line parses ALONE and fits
    # the 1500-byte cap (and so does every other line)
    for ln in raw_lines:
        assert len(ln.encode()) <= 1500, f"stdout record too big: {len(ln)}B"
    for k in ("metric", "value", "unit", "vs_baseline",
              "vs_measured_cpu_reference", "batch", "ms_per_step",
              "provisional"):
        assert k in final, f"compact final record missing {k}"
    # full detail (per-run stats + MFU blocks) lives in the full-record file
    full = json.loads(full_path.read_text())
    assert full["value"] == final["value"]
    for r in full["runs"].values():
        assert "wall_s_half_T" not in r
        if "mol_per_sec" in r:
            assert "iqr_over_median" in r and "stable" in r
            assert "mfu" in r
    # intermediate snapshots are flagged and carry the same schema
    for snap in lines[1:-1]:
        assert snap["provisional"] is True
        assert snap["value"] > 0


@pytest.mark.quick
def test_compact_record_cap_under_bloat():
    """_compact must stay <=1500 bytes even for a pathological full record."""
    sys.path.insert(0, str(REPO))
    import bench
    full = {
        "metric": "molecules_per_sec_per_chip_T500", "value": 2.1254,
        "unit": "mol/s", "vs_baseline": 4.251,
        "vs_measured_cpu_reference": 557.9, "headline_batch": 32,
        "ms_per_step": 30.11, "mfu_model": 0.497,
        "precision": "x" * 5000, "provisional_reason": "y" * 5000,
        "error": "z" * 5000, "baseline_note": "w" * 5000,
        "runs": {f"b{i}": {"mfu": {"k": "v" * 500}} for i in range(50)},
        "workloads": {"j": {"detail": "d" * 10000}},
    }
    rec = bench._compact(full)
    line = json.dumps(rec)
    assert len(line.encode()) <= 1500
    parsed = json.loads(line)
    assert parsed["value"] == 2.1254
    assert parsed["batch"] == 32
    assert parsed["ms_per_step"] == 30.11
    assert parsed["mfu_model"] == 0.497
    assert parsed["provisional"] is False
    assert "runs" not in parsed and "workloads" not in parsed


@pytest.mark.quick
def test_flops_model_consistency():
    from diffsbdd_tpu.utils.flops import (TIER_PASSES, block_activity,
                                          eps_net_flops, mfu_report)

    # dense activity == 1.0 on a fully-connected cluster
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 128, 3)).astype(np.float32) * 0.1
    mask = np.ones((1, 128), np.float32)
    is_lig = np.zeros((1, 128), np.float32)
    is_lig[:, :16] = 1.0
    assert block_activity(x, mask, is_lig, (None, 5.0, 5.0)) == 1.0
    # spreading the cluster far beyond the cutoffs leaves only diagonal
    # blocks (+ the cutoff-free ligand-ligand rows) active
    act = block_activity(x * 1e3, mask, is_lig, (None, 5.0, 5.0))
    assert act < 0.5

    fl = eps_net_flops(batch=32, n_lig_rows=24, n_pocket=320, n_pad=384,
                       hidden_nf=256, n_layers=6, activity=0.385,
                       shared_pocket=True)
    # flagship magnitude: ~1.5e12 logical flops/step at B=32 (see NOTES r4)
    assert 0.5e12 < fl["mxu_flops_total"] < 5e12
    # shared-pocket factorization must shrink the pair count
    fl_dense = eps_net_flops(batch=32, n_lig_rows=24, n_pocket=320,
                             n_pad=384, hidden_nf=256, n_layers=6,
                             activity=0.385, shared_pocket=False)
    assert fl["pair_slots_gcl"] < fl_dense["pair_slots_gcl"]

    rep = mfu_report(fl, 31.69e-3, "bfloat16")
    assert 0 < rep["mxu_utilization_executed"] < 1
    assert 0 < rep["vpu_utilization_est"] < 1.5
    # x2 doubles executed pairwise passes
    rep2 = mfu_report(fl, 31.69e-3, "float32_x2")
    assert rep2["flops_per_step_mxu_executed"] > \
        rep["flops_per_step_mxu_executed"]
    assert TIER_PASSES["float32"] == 6
