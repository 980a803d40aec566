"""Docking wrappers + batch-scoring CLI, dry-run with stubbed binaries.

The external binaries (qvina2.1, obabel, smina.static) are not present in
this environment; these tests install tiny shell-script stand-ins on PATH
that emit byte-plausible output, which exercises every line of our parsing,
file-walking, and CSV/pickle writing (reference analysis/docking.py:133-197).
"""
import os
import pickle
import stat
import sys

import numpy as np
import pytest

from diffsbdd_tpu.chem import docking
from diffsbdd_tpu.chem.molecule import SimpleMol
from diffsbdd_tpu.chem.sdfio import write_sdf_file

QVINA_STUB = """#!/bin/sh
# Emit the VERBATIM stdout shape of a real qvina2.1 run (banner, warnings,
# progress lines, multi-mode result table, trailing writer line) so the
# parser is exercised against the full transcript, not just the table.
# Score derived from center_x so different ligands get different scores.
cx=0
while [ $# -gt 0 ]; do
  if [ "$1" = "--center_x" ]; then cx=$2; fi
  shift
done
s=$(echo $cx | sed 's/[^0-9]//g' | cut -c1)
cat <<TRANSCRIPT
#################################################################
# If you used QuickVina 2 in your work, please cite:            #
#                                                               #
# Amr Alhossary, Stephanus Daniel Handoko, Yuguang Mu, and      #
# Chee-Keong Kwoh,Fast, Accurate, and Reliable Molecular        #
# Docking with QuickVina 2, Bioinformatics (2015),              #
# DOI: 10.1093/bioinformatics/btv082                            #
#                                                               #
#################################################################

WARNING: The search space volume > 27000 Angstrom^3 (See FAQ)
Detected 4 CPUs
WARNING: at low exhaustiveness, it may be impossible to utilize all CPUs
Reading input ... done.
Setting up the scoring function ... done.
Analyzing the binding site ... done.
Using random seed: 1897734054
Performing search ... done.
Refining results ... done.

mode |   affinity | dist from best mode
     | (kcal/mol) | rmsd l.b.| rmsd u.b.
-----+------------+----------+----------
   1         -$s.5      0.000      0.000
   2         -$s.1      1.827      3.587
   3         -2.9      2.355      4.210
Writing output ... done.
TRANSCRIPT
"""

QVINA_FAIL_STUB = """#!/bin/sh
# a run that dies before producing a result table (e.g. pdbqt parse error)
echo "Detected 4 CPUs"
echo "Reading input ..."
echo ""
echo "Parse error on line 7 in file \\"lig.pdbqt\\": Unknown or inappropriate tag" 1>&2
exit 1
"""

OBABEL_STUB = """#!/bin/sh
# write a dummy output file at the -O argument
out=""
while [ $# -gt 0 ]; do
  if [ "$1" = "-O" ]; then out=$2; fi
  shift
done
[ -n "$out" ] && echo "REMARK stub" > "$out"
"""

SMINA_STUB = """#!/bin/sh
echo "Affinity: -7.31415 (kcal/mol)"
echo "Affinity: -5.00000 (kcal/mol)"
"""


@pytest.fixture
def stub_binaries(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, body in [("qvina2.1", QVINA_STUB), ("obabel", OBABEL_STUB),
                       ("smina.static", SMINA_STUB)]:
        p = bindir / name
        p.write_text(body)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")
    return bindir


def _mol(seed=0, n=5):
    rng = np.random.default_rng(seed)
    coords = rng.normal(size=(n, 3)).astype(np.float32) + 10 * seed
    bonds = [(i, i + 1, 1) for i in range(n - 1)]
    return SimpleMol(symbols=["C"] * n, coords=coords, bonds=bonds,
                     name=f"mol{seed}")


def test_smina_score_parses_affinities(stub_binaries, tmp_path):
    rec = tmp_path / "rec.pdb"
    rec.write_text("END\n")
    scores = docking.smina_score([_mol(0), _mol(1)], str(rec))
    assert scores == [-7.31415, -5.0]


def test_qvina2_score_single_sdf(stub_binaries, tmp_path):
    sdf = tmp_path / "lig.sdf"
    write_sdf_file(sdf, [_mol(1), _mol(2)])
    rec = tmp_path / "rec.pdbqt"
    rec.write_text("REMARK receptor\n")
    scores = docking.calculate_qvina2_score(rec, sdf, tmp_path / "out")
    assert len(scores) == 2
    assert all(np.isfinite(s) and s < 0 for s in scores)


def test_qvina2_parses_full_transcript_exactly(stub_binaries, tmp_path):
    """The stub emits the complete qvina2.1 stdout (banner + warnings +
    progress + 3-mode table + trailing line); the parser must pull mode 1's
    affinity — matching the reference's index-the-separator semantics
    (analysis/docking.py:110-113)."""
    sdf = tmp_path / "lig.sdf"
    write_sdf_file(sdf, [_mol(3)])  # center_x ~ 30 -> stub affinity -3.5
    rec = tmp_path / "rec.pdbqt"
    rec.write_text("REMARK receptor\n")
    scores = docking.calculate_qvina2_score(rec, sdf, tmp_path / "out")
    assert scores == [-3.5]


def test_qvina2_failed_run_reports_nan(stub_binaries, tmp_path):
    """A qvina run that dies before the result table (pdbqt parse error)
    must yield nan for that ligand, not crash the batch."""
    qvina = stub_binaries / "qvina2.1"
    qvina.write_text(QVINA_FAIL_STUB)
    sdf = tmp_path / "lig.sdf"
    write_sdf_file(sdf, [_mol(1)])
    rec = tmp_path / "rec.pdbqt"
    rec.write_text("REMARK receptor\n")
    scores = docking.calculate_qvina2_score(rec, sdf, tmp_path / "out")
    assert len(scores) == 1 and np.isnan(scores[0])


def test_batch_cli_moad_layout(stub_binaries, tmp_path):
    """CLI walks the sdf dir, maps <receptor>_<pocket>_<suffix>.sdf to its
    pdbqt, and writes qvina2_scores.csv + the results pickle."""
    pdbqt_dir = tmp_path / "receptors"
    sdf_dir = tmp_path / "sdfs"
    out_dir = tmp_path / "out"
    pdbqt_dir.mkdir()
    sdf_dir.mkdir()
    for rec in ("1abc-bio1", "2xyz-bio1"):
        (pdbqt_dir / f"{rec}.pdbqt").write_text("REMARK receptor\n")
    write_sdf_file(sdf_dir / "1abc-bio1_pocket0_gen.sdf", [_mol(1)])
    write_sdf_file(sdf_dir / "2xyz-bio1_pocket3_gen.sdf", [_mol(2), _mol(3)])

    results = docking.main([
        "--pdbqt_dir", str(pdbqt_dir), "--sdf_dir", str(sdf_dir),
        "--out_dir", str(out_dir), "--write_csv", "--write_dict",
        "--dataset", "moad"])

    assert len(results["ligand"]) == 2
    assert results["receptor"][0].endswith("1abc-bio1.pdbqt")
    assert len(results["scores"][1]) == 2

    csv = (out_dir / "qvina2_scores.csv").read_text()
    assert "1abc-bio1_pocket0_gen" in csv and "2xyz-bio1" in csv

    with open(out_dir / "qvina2_scores.pkl", "rb") as f:
        d = pickle.load(f)
    assert set(d) == {"1abc-bio1_pocket0_gen", "2xyz-bio1_pocket3_gen"}
    assert all(np.isfinite(s) for s in d["2xyz-bio1_pocket3_gen"]["scores"])


def test_batch_cli_crossdocked_layout(stub_binaries, tmp_path):
    pdbqt_dir = tmp_path / "receptors"
    sdf_dir = tmp_path / "sdfs"
    pdbqt_dir.mkdir()
    sdf_dir.mkdir()
    (pdbqt_dir / "pocketA.pdbqt").write_text("REMARK receptor\n")
    write_sdf_file(sdf_dir / "pocketA_gen.sdf", [_mol(4)])

    results = docking.main([
        "--pdbqt_dir", str(pdbqt_dir), "--sdf_dir", str(sdf_dir),
        "--out_dir", str(tmp_path / "out"), "--dataset", "crossdocked"])
    assert results["receptor"] == [str(pdbqt_dir / "pocketA.pdbqt")]


def test_missing_binary_raises_clearly(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # empty PATH
    with pytest.raises(FileNotFoundError, match="qvina2.1"):
        docking.calculate_qvina2_score(tmp_path / "r.pdbqt",
                                       tmp_path / "l.sdf", tmp_path)


@pytest.fixture
def stub_prep(tmp_path, monkeypatch):
    """prepare_receptor4.py stand-in: logs argv, writes the -o output."""
    bindir = tmp_path / "prep_bin"
    bindir.mkdir()
    p = bindir / "prepare_receptor4.py"
    p.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, pathlib\n"
        "args = sys.argv[1:]\n"
        "log = pathlib.Path(__file__).parent / 'prep_calls.txt'\n"
        "log.open('a').write(' '.join(args) + '\\n')\n"
        "out = args[args.index('-o') + 1]\n"
        "pathlib.Path(out).write_text('REMARK receptor stub\\n')\n")
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")
    return bindir


def test_pdbs_to_pdbqts_batch_and_flags(stub_prep, tmp_path):
    """Batch receptor prep mirrors docking_py27.py: one call per *.pdb,
    MOAD gets '-A checkhydrogens -e', crossdocked doesn't, and existing
    outputs are not regenerated."""
    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    for name in ("recA", "recB"):
        (pdb_dir / f"{name}.pdb").write_text("ATOM\nEND\n")

    out_cd = tmp_path / "qt_cd"
    res = docking.pdbs_to_pdbqts(pdb_dir, out_cd, dataset="crossdocked")
    assert [p.name for p in res] == ["recA.pdbqt", "recB.pdbqt"]
    assert all(p.exists() for p in res)

    out_moad = tmp_path / "qt_moad"
    docking.pdbs_to_pdbqts(pdb_dir, out_moad, dataset="bindingmoad")

    calls = (stub_prep / "prep_calls.txt").read_text().splitlines()
    assert len(calls) == 4
    assert all("checkhydrogens" not in c for c in calls[:2])
    assert all("-A checkhydrogens -e" in c for c in calls[2:])

    # caching: a second run with outputs present must not call the binary
    docking.pdbs_to_pdbqts(pdb_dir, out_cd, dataset="crossdocked")
    assert len((stub_prep / "prep_calls.txt").read_text().splitlines()) == 4

    with pytest.raises(NotImplementedError):
        docking.pdb_to_pdbqt(pdb_dir / "recA.pdb", tmp_path / "x.pdbqt",
                             dataset="nope")
