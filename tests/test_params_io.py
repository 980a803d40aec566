"""Unit tests for the compact .npz parameter snapshots
(diffsbdd_tpu/utils/params_io.py) — the committable-fixture format used by
tests/test_trained_sanity.py and benchmarks/overfit_chem_r04.py.
"""
from __future__ import annotations

import numpy as np
import pytest

from diffsbdd_tpu.utils.params_io import load_params_npz, save_params_npz


@pytest.fixture
def tree():
    return {
        "layer0": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4),
                   "bias": np.ones(4, np.float32)},
        "embed": {"table": np.random.default_rng(0)
                  .standard_normal((5, 3)).astype(np.float32)},
        "step": np.int64(7),
    }


@pytest.mark.quick
def test_roundtrip_exact(tmp_path, tree):
    p = tmp_path / "params.npz"
    save_params_npz(p, tree)
    out = load_params_npz(p, template=tree)
    import jax
    devs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64)).max()),
        tree, out)
    assert max(jax.tree_util.tree_leaves(devs)) == 0.0


@pytest.mark.quick
def test_fp16_downcast_keeps_ints(tmp_path, tree):
    p = tmp_path / "params16.npz"
    save_params_npz(p, tree, dtype=np.float16)
    raw = load_params_npz(p, template=None, dtype=None)
    assert raw["layer0"]["kernel"].dtype == np.float16
    assert raw["step"].dtype == np.int64  # integers are never downcast
    out = load_params_npz(p, template=tree)  # loads back as float32
    assert np.asarray(out["layer0"]["kernel"]).dtype == np.float32
    # fp16 round-trip error is bounded
    err = np.abs(np.asarray(out["embed"]["table"])
                 - tree["embed"]["table"]).max()
    assert err < 2e-3


@pytest.mark.quick
def test_nested_dict_without_template(tmp_path, tree):
    p = tmp_path / "params.npz"
    save_params_npz(p, tree)
    nested = load_params_npz(p)
    assert set(nested) == {"layer0", "embed", "step"}
    assert nested["layer0"]["kernel"].shape == (3, 4)


@pytest.mark.quick
def test_template_mismatches_raise(tmp_path, tree):
    p = tmp_path / "params.npz"
    save_params_npz(p, tree)

    bad_shape = {**tree,
                 "layer0": {"kernel": np.zeros((4, 4), np.float32),
                            "bias": tree["layer0"]["bias"]}}
    with pytest.raises(ValueError, match="shape mismatch"):
        load_params_npz(p, template=bad_shape)

    missing = {**tree, "extra": np.zeros(2, np.float32)}
    with pytest.raises(KeyError, match="missing parameter"):
        load_params_npz(p, template=missing)

    # stored keys the template doesn't consume must error too (silent
    # weight-dropping is how converter bugs hide — convert/torch_ckpt.py
    # has the same contract)
    subset = {"layer0": tree["layer0"], "step": tree["step"]}
    with pytest.raises(KeyError, match="unconsumed"):
        load_params_npz(p, template=subset)
