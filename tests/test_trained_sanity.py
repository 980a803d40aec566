"""Trained-model sanity bar (VERDICT r03 #6).

Round 3's geometry probe established what *healthy* trained behavior looks
like on the 2-complex overfit task (reference behavior spec:
/root/reference/analysis/metrics.py:42-133 for the metrics,
conditional_model.py:332-409 for diversify): reconstruction from a small
noising level stays near the input (small RMSD), keeps the atom types
(accuracy ~1.0), and scores non-trivial validity — while a fresh-init net
randomizes the types.  Those claims previously lived only in probe JSONs;
this test pins them against a committed trained fixture
(``checkpoints/overfit_chem_fixture_best.npz`` + sidecar, produced by
``benchmarks/overfit_chem_r04.py --tag fixture`` at a CPU-runnable size)
so a regression in the small-t dynamics or the checkpoint/params plumbing
turns the suite red instead of shipping silently.

Skips when the fixture has not been built yet.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
FIXTURE = REPO / "checkpoints" / "overfit_chem_fixture_best.npz"

pytestmark = pytest.mark.skipif(
    not FIXTURE.exists(),
    reason="trained fixture not built (benchmarks/overfit_chem_r04.py "
           "--tag fixture)")


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    import jax
    import sys
    sys.path.insert(0, str(REPO / "benchmarks"))
    from overfit_demo import build_dataset

    from diffsbdd_tpu.config import load_config
    from diffsbdd_tpu.data.dataset import LigandPocketDataset, pad_batch
    from diffsbdd_tpu.train.evaluation import round_to_bucket
    from diffsbdd_tpu.train.module import build_module_from_config
    from diffsbdd_tpu.utils.params_io import load_params_npz

    meta = json.loads(FIXTURE.with_suffix(".json").read_text())
    datadir = tmp_path_factory.mktemp("fixture_data")
    hist = build_dataset(datadir, replicas=1)

    cfg = load_config(overrides={
        "dataset": "crossdock_full",
        "mode": "pocket_conditioning",
        "pocket_representation": "full-atom",
        "datadir": str(datadir),
        "egnn_params": {
            "joint_nf": meta["joint_nf"],
            "hidden_nf": meta["hidden_nf"], "n_layers": meta["n_layers"],
            "attention": True, "tanh": True, "norm_constant": 1,
            "inv_sublayers": 1, "reflection_equivariant": False,
            "edge_cutoff_ligand": None, "edge_cutoff_pocket": 5.0,
            "edge_cutoff_interaction": 5.0},
        "diffusion_params": {"diffusion_steps": meta["T"],
                             "normalize_factors": [1, 4]},
        "tpu": {"n_lig_max": meta["n_lig_max"],
                "n_pocket_max": meta["n_pocket_max"],
                "matmul_precision": "float32", "egnn_impl": "xla"},
    })
    module = build_module_from_config(cfg, hist)
    template = module.init_params(jax.random.PRNGKey(1), batch_size=2)
    params = load_params_npz(FIXTURE, template=template)

    ds = LigandPocketDataset(datadir / "val.npz")
    n = 8
    items = [ds[i % len(ds)] for i in range(n)]
    nl_pad = round_to_bucket(
        max(len(it["lig_coords"]) for it in items), module.lig_bucket)
    np_pad = round_to_bucket(
        max(len(it["pocket_coords"]) for it in items), module.pocket_bucket)
    batch = pad_batch(items, nl_pad, np_pad)
    import jax.numpy as jnp
    ligand = {k: jnp.asarray(v) for k, v in batch["ligand"].items()}
    pocket = {k: jnp.asarray(v) for k, v in batch["pocket"].items()}
    return meta, module, params, template, ligand, pocket


def _diversify_stats(module, params, ligand, pocket, t_noise, key):
    """CoM-aligned RMSD-to-input, type accuracy, validity of diversify()."""
    import jax

    from diffsbdd_tpu.chem.metrics import BasicMolecularMetrics
    from diffsbdd_tpu.chem.molecule import build_molecule
    from diffsbdd_tpu.constants import dataset_params

    xh, _ = module.ddpm.diversify(params, key, ligand, pocket,
                                  noising_steps=t_noise)
    arr = np.asarray(xh)
    m_l = np.asarray(ligand["mask"])
    gt_x = np.asarray(ligand["x"])
    gt_t = np.asarray(ligand["one_hot"]).argmax(-1)

    dinfo = dataset_params["crossdock_full"]
    rmsds, accs, mols = [], [], []
    for b in range(arr.shape[0]):
        sel = m_l[b] > 0
        x, t = arr[b, sel, :3], arr[b, sel, 3:].argmax(-1)
        gx, gt_ = gt_x[b, sel], gt_t[b, sel]
        # diversify returns ligand-CoM-frame coords; input is in the data
        # frame -> translation-align (no rotation is applied by the model)
        rmsds.append(float(np.sqrt(
            (((x - x.mean(0)) - (gx - gx.mean(0))) ** 2).sum(-1).mean())))
        accs.append(float((t == gt_).mean()))
        mols.append(build_molecule(x, t, dinfo))
    (validity, conn, _, _), _ = BasicMolecularMetrics(dinfo).evaluate_mols(
        mols)
    return {"rmsd_mean": float(np.mean(rmsds)),
            "rmsd_max": float(np.max(rmsds)),
            "type_acc": float(np.mean(accs)),
            "validity": float(validity)}


def test_diversify_reconstruction_healthy(trained_setup):
    """Small-t reconstruction from the trained fixture: near-input coords,
    preserved types, non-degenerate validity.  Bars set from the measured
    fixture behavior (t=T/20: type_acc 0.99, rmsd 0.149 A, validity 0.25
    on 8 mols) with margin for eval-noise."""
    import jax

    meta, module, params, _, ligand, pocket = trained_setup
    t_noise = max(2, meta["T"] // 20)
    stats = _diversify_stats(module, params, ligand, pocket, t_noise,
                             jax.random.PRNGKey(100))
    assert stats["type_acc"] >= 0.9, stats
    assert stats["rmsd_mean"] < 0.25, stats
    assert stats["validity"] >= 0.125, stats


def test_diversify_discriminates_fresh_init(trained_setup):
    """The same protocol on a FRESH-INIT net must look unhealthy — this
    pins that the sanity bar actually measures training, not the noising
    level being small.  At t=T/20 the h-channel noise is small enough that
    even a random net keeps ~0.84 type accuracy, so the discrimination
    level is deeper: t=T/10, where the trained fixture measures 0.855 vs
    fresh-init 0.358 (gap 0.50)."""
    import jax

    meta, module, params, template, ligand, pocket = trained_setup
    t_noise = max(3, meta["T"] // 10)
    trained = _diversify_stats(module, params, ligand, pocket, t_noise,
                               jax.random.PRNGKey(100))
    fresh = _diversify_stats(module, template, ligand, pocket, t_noise,
                             jax.random.PRNGKey(100))
    # a random eps-net scrambles the categorical head: reconstruction type
    # accuracy collapses toward chance while the trained net keeps most
    assert trained["type_acc"] >= 0.75, (trained, fresh)
    assert trained["type_acc"] >= fresh["type_acc"] + 0.3, (trained, fresh)
