"""Sampling-server tests (diffsbdd_tpu/cli/serve.py).

The server is the serving-native counterpart of the reference's one-shot
`generate_ligands.py` (which reloads + retraces per invocation): load once,
compile per request shape once, answer many requests.  These tests drive
the transport-agnostic handler and the JSON-lines loop in-process against
a tiny checkpoint.
"""
import io
import json
from pathlib import Path

import jax
import numpy as np

from diffsbdd_tpu.checkpoint import save_model
from diffsbdd_tpu.train.loop import create_train_state
from diffsbdd_tpu.train.module import build_module_from_config

from test_cli import EXAMPLE_PDB, small_cfg
from test_data import make_npz


def _make_ckpt(tmp_path):
    datadir = tmp_path / "data"
    datadir.mkdir()
    make_npz(datadir, n_complexes=4, a_nf=10, r_nf=20, seed=1)
    np.save(datadir / "size_distribution.npy", np.ones((17, 65)))
    cfg = small_cfg(tmp_path, datadir)
    module = build_module_from_config(cfg, np.ones((17, 65)))
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    state = create_train_state(params, lr=1e-3)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    save_model(ckpt_dir, module, state, cfg, name="best")
    return ckpt_dir


def test_server_handles_requests(tmp_path):
    from diffsbdd_tpu.cli.serve import SamplingServer

    server = SamplingServer(_make_ckpt(tmp_path), name="best")

    assert server.handle({"op": "ping"}) == {"ok": True}

    info = server.handle({"op": "info", "id": 1})
    assert info["ok"] and info["id"] == 1
    assert info["T"] == 10 and info["requests"] == 0

    out = server.handle({
        "op": "generate", "id": "r1", "pdbfile": str(EXAMPLE_PDB),
        "ref_ligand": "A:330", "n_samples": 2, "num_nodes_lig": 6,
        "all_frags": True, "outfile": str(tmp_path / "srv.sdf")})
    assert out.get("ok"), out
    assert out["id"] == "r1"
    assert out["n_molecules"] >= 1
    assert len(out["smiles"]) == out["n_molecules"]
    assert Path(out["outfile"]).exists()

    # second request at the SAME shape: no recompile, warm-path served
    out2 = server.handle({
        "op": "generate", "pdbfile": str(EXAMPLE_PDB),
        "ref_ligand": "A:330", "n_samples": 2, "num_nodes_lig": 6,
        "all_frags": True})
    assert out2.get("ok"), out2
    assert server.handle({"op": "info"})["requests"] == 2

    # errors are replies, not crashes
    bad = server.handle({"op": "generate", "id": 9})  # no pdbfile
    assert "error" in bad and bad["id"] == 9
    assert "KeyError" in bad["error"]
    assert server.handle({"op": "nope"})["error"].startswith("ValueError")


def test_warmup_does_not_perturb_rng_stream(tmp_path):
    """ADVICE r04 #4: warmup runs on a throwaway key + size_rng, so an
    unseeded generate after warmup equals the same generate on a fresh
    (unwarmed) server."""
    from diffsbdd_tpu.cli.serve import SamplingServer

    ckpt = _make_ckpt(tmp_path)
    gen_req = {"op": "generate", "pdbfile": str(EXAMPLE_PDB),
               "ref_ligand": "A:330", "n_samples": 2, "num_nodes_lig": 6,
               "all_frags": True}

    warmed = SamplingServer(ckpt, name="best", seed=3)
    w = warmed.handle({"op": "warmup", **{k: v for k, v in gen_req.items()
                                          if k != "op"}})
    assert w.get("ok"), w
    out_warmed = warmed.handle(dict(gen_req))

    fresh = SamplingServer(ckpt, name="best", seed=3)
    out_fresh = fresh.handle(dict(gen_req))

    assert out_warmed["smiles"] == out_fresh["smiles"]
    assert out_warmed["n_atoms"] == out_fresh["n_atoms"]


def test_server_jsonl_loop(tmp_path):
    from diffsbdd_tpu.cli.serve import SamplingServer

    server = SamplingServer(_make_ckpt(tmp_path), name="best")
    requests = "\n".join([
        json.dumps({"op": "ping", "id": 0}),
        "this is not json",
        json.dumps({"op": "generate", "id": 1, "pdbfile": str(EXAMPLE_PDB),
                    "ref_ligand": "A:330", "n_samples": 2,
                    "num_nodes_lig": 6, "all_frags": True}),
        json.dumps({"op": "shutdown", "id": 2}),
        json.dumps({"op": "ping", "id": 3}),  # after shutdown: unserved
    ]) + "\n"
    out = io.StringIO()
    server.serve_forever(infile=io.StringIO(requests), outfile=out)
    replies = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(replies) == 4  # ping, bad-request error, generate, shutdown
    assert replies[0] == {"ok": True, "id": 0}
    assert "error" in replies[1]
    assert replies[2]["id"] == 1 and replies[2].get("ok")
    assert replies[3].get("shutdown")
