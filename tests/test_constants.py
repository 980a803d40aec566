"""Generated constants tables must equal the reference's hardcoded arrays.

Our diffsbdd_tpu/constants.py *generates* the per-dataset bond-length and
Lennard-Jones matrices from the element tables; the reference hardcodes the
resulting arrays (/root/reference/constants.py:95-183).  These tests assert
exact equality of every table for every dataset.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

import diffsbdd_tpu.constants as ours
from reference_bridge import REFERENCE_ROOT, _stub_chem_deps


@pytest.fixture(scope="module")
def ref():
    _stub_chem_deps()
    chem = sys.modules["rdkit.Chem"]
    if not hasattr(chem, "rdchem"):
        rdchem = types.ModuleType("rdkit.Chem.rdchem")

        class BondType:
            SINGLE, DOUBLE, TRIPLE, AROMATIC = 1, 2, 3, 12

        rdchem.BondType = BondType
        chem.rdchem = rdchem
    spec = importlib.util.spec_from_file_location(
        "reference_constants", f"{REFERENCE_ROOT}/constants.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scalar_constants(ref):
    assert ours.MARGINS == (ref.margin1, ref.margin2, ref.margin3)
    assert ours.ALLOWED_BONDS == ref.allowed_bonds
    assert ours.COVALENT_RADII == ref.covalent_radii
    assert ours.N_CA_DIST == ref.N_CA_DIST
    assert ours.CA_C_DIST == ref.CA_C_DIST
    assert ours.N_CA_C_ANGLE == ref.N_CA_C_ANGLE


def test_bond_length_tables(ref):
    assert ours.BONDS1 == ref.bonds1
    assert ours.BONDS2 == ref.bonds2
    assert ours.BONDS3 == ref.bonds3


@pytest.mark.parametrize("dataset", ["bindingmoad", "crossdock",
                                     "crossdock_full"])
def test_dataset_params_match_reference(ref, dataset):
    ref_d = ref.dataset_params[dataset]
    our_d = ours.dataset_params[dataset]

    assert set(ref_d.keys()) <= set(our_d.keys()), \
        sorted(set(ref_d.keys()) - set(our_d.keys()))

    for key in ("atom_encoder", "aa_encoder"):
        assert our_d[key] == ref_d[key], key
    for key in ("atom_decoder", "aa_decoder", "colors_dic", "radius_dic"):
        assert list(our_d[key]) == list(ref_d[key]), key
    for key in ("bonds1", "bonds2", "bonds3", "lennard_jones_rm"):
        np.testing.assert_array_equal(
            np.asarray(our_d[key], np.float64),
            np.asarray(ref_d[key], np.float64), err_msg=f"{dataset}/{key}")
    for key in ("atom_hist", "aa_hist"):
        assert dict(our_d[key]) == dict(ref_d[key]), key
