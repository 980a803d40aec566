"""Hand FLOP model of the EGNN denoiser step + MFU accounting.

VERDICT r03 #4: every perf claim ("VPU-bound", "bandwidth-bound", "floor")
needs a FLOP-counted number.  XLA's ``cost_analysis`` cannot see inside the
Pallas custom calls where ~all of the FLOPs live, so this is a hand model of
the matmul (MXU) and elementwise-assembly (VPU) work actually executed by the
fused kernels (ops/egnn_pallas.py), parameterized by the measured block
activity of the cutoff-skip machinery.

Counted per eps-net forward (the unit the T-step sampler repeats; reference
behavioral spec: equivariant_diffusion/egnn_new.py:6-132, dynamics.py:87-167):

MXU (matmul) flops, 2*M*K*N per dot, executed per precision-tier pass count:
  * GCL pairwise hidden layer  : P_gcl  * 2*H^2      (edge_mlp_2)
  * GCL attention head         : P_gcl  * 2*H        (att_mlp)
  * coord MLP hidden + head    : P_crd  * (2*H^2 + 2*H)
  * cross MLP hidden + head    : P_crd  * (2*H^2 + 2*H)   [reflection off]
  * split first-layer row/col projections, node MLP, in/out embeddings:
    O(N*H^2) node-level terms (XLA side, single f32 pass)

where P_gcl / P_crd are pair-slot counts after cutoff-block skipping
(``activity``), conditional-mode ligand-row truncation (coord kernel), and
the shared-pocket first-layer factorization.

VPU (elementwise) ops: the per-pair-feature assembly measured to be the
kernel's bottleneck (NOTES.md r3s3) — first-layer bias build + broadcast-add
(~7 ops/feature after the type-table fold), two silus (~5 each), attention
gate + aggregation multiply-add (~4) => ~21 ops per pair-feature.

Peaks used for utilization (TPU v5e, per chip): 197e12 bf16 MXU flops/s
(all kernel dot tiers execute as bf16 MXU passes: x2 = 2 passes, x3 = 3,
HIGHEST = 6), and ~3.6e12 VPU ops/s (8x128 vector unit, 4 ALUs/lane,
~0.94 GHz) — the VPU number is an architectural estimate, flagged as such.
"""
from __future__ import annotations

from typing import Optional

V5E_MXU_BF16_FLOPS = 197e12  # per chip, bf16 (f32 accumulate)
V5E_MXU_F32_FLOPS = 98.5e12  # HIGHEST-equivalent useful-f32 rate
V5E_VPU_OPS = 3.6e12         # 8x128 lanes * 4 ALUs * ~0.94 GHz (estimate)

# MXU passes each precision tier spends per logical dot
# (ops/egnn_pallas.py::_PRECISIONS / _dot)
TIER_PASSES = {
    "bfloat16": 1,
    "float32_x2": 2,
    "float32_x3": 3,
    "tensorfloat32": 3,
    "float32": 6,  # Precision.HIGHEST on TPU = 6-pass bf16
}

VPU_OPS_PER_PAIR_FEATURE = 21.0  # assembly + 2 silu + gate + aggregate


def block_activity(x, mask, is_lig, cutoffs, tile_i=16, sub_j=32,
                   col_mask=None):
    """Fraction of (tile_i x sub_j) pair blocks the kernels actually compute.

    Mirrors ops/egnn_pallas.py::_block_activity_bits (same granularity, same
    1e-6 cutoff slack) on host numpy; ``x`` (B, N, 3), masks (B, N).
    """
    import numpy as np

    x = np.asarray(x)
    mask = np.asarray(mask)
    is_lig = np.asarray(is_lig)
    B, N, _ = x.shape
    d2 = np.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, -1)
    cm = mask if col_mask is None else np.asarray(col_mask)
    valid = mask[:, :, None] * cm[:, None, :]
    ll = is_lig[:, :, None] * is_lig[:, None, :]
    pp = (1 - is_lig)[:, :, None] * (1 - is_lig)[:, None, :]
    cross = 1.0 - ll - pp
    ok = np.zeros_like(valid)
    cl, cp, ci = [None if c is None else (c * (1 + 1e-6)) ** 2
                  for c in cutoffs]
    ok += ll if cl is None else ll * (d2 <= cl)
    ok += pp if cp is None else pp * (d2 <= cp)
    ok += cross if ci is None else cross * (d2 <= ci)
    adj = valid * ok
    blk = adj.reshape(B, N // tile_i, tile_i, N // sub_j, sub_j)
    active = (blk.max(axis=(2, 4)) > 0)
    return float(active.mean())


def eps_net_flops(batch: int, n_lig_rows: int, n_pocket: int, n_pad: int,
                  hidden_nf: int, n_layers: int, inv_sublayers: int = 1,
                  attention: bool = True, reflection_equiv: bool = False,
                  activity: float = 1.0, shared_pocket: bool = False,
                  joint_nf: int = 128, tile_i: int = 16) -> dict:
    """MXU/VPU work of ONE eps-net forward at the fused-kernel layout.

    ``n_lig_rows``: ligand slots (the coord kernel's truncated row count in
    conditional mode; rounded up to ``tile_i``).  ``n_pad``: kernel-padded
    node count (N rounded to 128).  ``activity``: fraction of pair blocks
    computed (1.0 = dense).  Returns 1-pass (logical) flop counts; scale MXU
    by ``TIER_PASSES[tier]`` for executed passes.
    """
    B, H, N = batch, hidden_nf, n_pad
    L = n_layers * inv_sublayers
    lig_rows = -(-n_lig_rows // tile_i) * tile_i

    # pair-slot counts after skipping (activity applies uniformly; the
    # ligand-row blocks are denser than pocket blocks, so this slightly
    # UNDER-counts coord work and OVER-counts nothing)
    pairs_full = activity * N * N
    if shared_pocket:
        # first GCL: pocket-pocket once at B=1 + per-sample ligand strips
        # (pocket rows x ligand cols, ligand rows x all cols)
        npk = N - lig_rows
        p_first = activity * (npk * npk + B * (npk * lig_rows
                                               + lig_rows * N))
        p_gcl = p_first + (L - 1) * B * pairs_full
    else:
        p_gcl = L * B * pairs_full
    # conditional coord kernel: ligand row tiles only, every layer
    p_crd = n_layers * B * activity * lig_rows * N

    gcl_pair_mxu = p_gcl * (2 * H * H + (2 * H if attention else 0))
    n_coord_mlps = 1 if reflection_equiv else 2
    crd_pair_mxu = n_coord_mlps * p_crd * (2 * H * H + 2 * H)

    # node-level XLA work per forward (single f32 pass):
    #  - split first-layer row+col projections: 2 * 2NH^2 per pairwise MLP
    #    (GCL once per sublayer; coord + cross once per layer)
    #  - GCL node MLP: 2*(2H*H) + 2*(H*H) = 6NH^2 per sublayer
    #  - embeddings in/out + encoders: ~2 * 2*N*H*joint_nf
    n_pair_mlps = L + n_layers * n_coord_mlps
    node_mxu = B * N * (4 * H * H * n_pair_mlps + 6 * H * H * L
                        + 4 * H * joint_nf)

    vpu_pair_features = (p_gcl + n_coord_mlps * p_crd) * H
    vpu_ops = vpu_pair_features * VPU_OPS_PER_PAIR_FEATURE

    return {
        "mxu_flops_pairwise": gcl_pair_mxu + crd_pair_mxu,
        "mxu_flops_node_level": node_mxu,
        "mxu_flops_total": gcl_pair_mxu + crd_pair_mxu + node_mxu,
        "vpu_ops": vpu_ops,
        "pair_slots_gcl": p_gcl,
        "pair_slots_coord": n_coord_mlps * p_crd,
        "activity": activity,
    }


def mfu_report(flops: dict, step_seconds: float, tier: str,
               batch: Optional[int] = None) -> dict:
    """Utilization numbers for one step of ``step_seconds`` wall time.

    ``mxu_utilization_executed``: executed bf16 MXU passes vs the 197 TF/s
    v5e peak — how busy the systolic array actually is.
    ``mfu_model``: logical model flops (1 pass, after skipping) vs the
    f32-equivalent 98.5 TF/s peak — the classic "useful flops" MFU.
    ``vpu_utilization_est``: assembly VPU ops vs the ~3.6 TOP/s estimate —
    >50% here with low MXU numbers is the quantitative form of the
    "VPU-assembly-bound" claim.
    """
    passes = TIER_PASSES.get(tier, 1)
    executed = (flops["mxu_flops_pairwise"] * passes
                + flops["mxu_flops_node_level"])
    out = {
        "flops_per_step_model": flops["mxu_flops_total"],
        "flops_per_step_mxu_executed": executed,
        "vpu_ops_per_step": flops["vpu_ops"],
        "mfu_model": flops["mxu_flops_total"] / step_seconds
        / V5E_MXU_F32_FLOPS,
        "mxu_utilization_executed": executed / step_seconds
        / V5E_MXU_BF16_FLOPS,
        "vpu_utilization_est": flops["vpu_ops"] / step_seconds / V5E_VPU_OPS,
        "tier_mxu_passes": passes,
        "peaks": {"mxu_bf16": V5E_MXU_BF16_FLOPS,
                  "mxu_f32": V5E_MXU_F32_FLOPS,
                  "vpu_est": V5E_VPU_OPS},
    }
    return {k: (round(v, 4) if isinstance(v, float) and k.startswith(
        ("mfu", "mxu_util", "vpu_util")) else v) for k, v in out.items()}
