"""PyTorch-Lightning checkpoint -> JAX params converter.

Converts the reference's published checkpoints (Zenodo record 8183747,
/root/reference/README.md:63-72) into this framework's param pytree + config
sidecar so that numerical parity can be validated against trained weights.

Key mapping (reference module tree -> flax tree):
  ddpm.dynamics.atom_encoder.{0,2}        -> dynamics/atom_encoder/lin{0,2}
  ddpm.dynamics.{atom,residue}_{en,de}coder likewise
  ddpm.dynamics.edge_embedding            -> dynamics/edge_embedding
  ddpm.dynamics.egnn.embedding{,_out}     -> dynamics/egnn/embedding{,_out}
  ...egnn.e_block_i.gcl_j.edge_mlp.{0,2}  -> .../e_block_i/gcl_j/edge_mlp_{0,2}
  ...gcl_j.node_mlp.{0,2} / att_mlp.0     -> node_mlp_{0,2} / att_mlp_0
  ...gcl_equiv.coord_mlp.{0,2,4}          -> gcl_equiv/coord_mlp/lin{0,1,2}
  ...gcl_equiv.cross_product_mlp.{0,2,4}  -> .../cross_product_mlp/lin{0,1,2}
  ddpm.gamma.gamma (buffer)               -> verified against our schedule table
  ddpm.gamma.l{1,2,3} (GammaNetwork)      -> gamma/l{1,2,3}

torch ``nn.Linear`` stores (out, in); flax ``Dense`` kernels are (in, out), so
every weight is transposed.  The first layer of each pairwise MLP keeps the
identical concatenated layout ([h_i; h_j; edge_feat] rows), so the transpose
is the only transformation needed.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32).T


def _v(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def _mlp2(sd: Dict, prefix: str) -> Dict:
    """Linear-act-Linear torch Sequential -> {lin0, lin2}."""
    return {
        "lin0": {"kernel": _t(sd[f"{prefix}.0.weight"]),
                 "bias": _v(sd[f"{prefix}.0.bias"])},
        "lin2": {"kernel": _t(sd[f"{prefix}.2.weight"]),
                 "bias": _v(sd[f"{prefix}.2.bias"])},
    }


def _coord_mlp(sd: Dict, prefix: str, tied_head: bool = False) -> Dict:
    """``tied_head``: the cross_product_mlp's final (hidden, 1) head is the
    SAME nn.Linear instance as coord_mlp's in the reference
    (egnn_new.py:78-93), so the flax tree omits it (the module reads the
    shared parameter from coord_mlp at call time)."""
    out = {
        "lin0_kernel": _t(sd[f"{prefix}.0.weight"]),
        "lin0_bias": _v(sd[f"{prefix}.0.bias"]),
        "lin1": {"kernel": _t(sd[f"{prefix}.2.weight"]),
                 "bias": _v(sd[f"{prefix}.2.bias"])},
    }
    if not tied_head:
        out["lin2"] = {"kernel": _t(sd[f"{prefix}.4.weight"])}  # no bias
    return out


def _gcl(sd: Dict, prefix: str, attention: bool) -> Dict:
    out = {
        "edge_mlp_0_kernel": _t(sd[f"{prefix}.edge_mlp.0.weight"]),
        "edge_mlp_0_bias": _v(sd[f"{prefix}.edge_mlp.0.bias"]),
        "edge_mlp_2": {"kernel": _t(sd[f"{prefix}.edge_mlp.2.weight"]),
                       "bias": _v(sd[f"{prefix}.edge_mlp.2.bias"])},
        "node_mlp_0": {"kernel": _t(sd[f"{prefix}.node_mlp.0.weight"]),
                       "bias": _v(sd[f"{prefix}.node_mlp.0.bias"])},
        "node_mlp_2": {"kernel": _t(sd[f"{prefix}.node_mlp.2.weight"]),
                       "bias": _v(sd[f"{prefix}.node_mlp.2.bias"])},
    }
    if attention:
        out["att_mlp_0"] = {"kernel": _t(sd[f"{prefix}.att_mlp.0.weight"]),
                            "bias": _v(sd[f"{prefix}.att_mlp.0.bias"])}
    return out


def convert_state_dict(state_dict: Dict[str, Any], n_layers: int,
                       inv_sublayers: int, attention: bool,
                       reflection_equiv: bool,
                       has_edge_embedding: bool,
                       mode: str = "egnn_dynamics") -> Dict:
    """Reference ``state_dict`` -> flax variables {'params': ...} for
    EGNNDynamics (plus GammaNetwork params when the schedule is learned).

    Every source tensor must be consumed: a conversion-flag/checkpoint
    mismatch (e.g. flags say reflection_equiv=True but the checkpoint
    carries cross_product_mlp weights) would otherwise silently DROP
    weights — the template-tree validation can't see keys the template
    itself lacks — and produce a numerically wrong model with no error.
    """

    class _Tracking(dict):
        def __init__(self, base):
            super().__init__(base)
            self.consumed = set()

        def __getitem__(self, key):
            self.consumed.add(key)
            return super().__getitem__(key)

    sd = _Tracking(state_dict)
    dp: Dict[str, Any] = {}

    for name in ("atom_encoder", "atom_decoder", "residue_encoder",
                 "residue_decoder"):
        dp[name] = _mlp2(sd, f"ddpm.dynamics.{name}")

    if has_edge_embedding:
        dp["edge_embedding"] = {
            "embedding": _v(sd["ddpm.dynamics.edge_embedding.weight"])}

    if mode == "egnn_dynamics":
        egnn: Dict[str, Any] = {
            "embedding": {
                "kernel": _t(sd["ddpm.dynamics.egnn.embedding.weight"]),
                "bias": _v(sd["ddpm.dynamics.egnn.embedding.bias"])},
            "embedding_out": {
                "kernel": _t(sd["ddpm.dynamics.egnn.embedding_out.weight"]),
                "bias": _v(sd["ddpm.dynamics.egnn.embedding_out.bias"])},
        }
        for i in range(n_layers):
            block: Dict[str, Any] = {}
            bp = f"ddpm.dynamics.egnn.e_block_{i}"
            for j in range(inv_sublayers):
                block[f"gcl_{j}"] = _gcl(sd, f"{bp}.gcl_{j}", attention)
            equiv = {"coord_mlp": _coord_mlp(sd, f"{bp}.gcl_equiv.coord_mlp")}
            if not reflection_equiv:
                equiv["cross_product_mlp"] = _coord_mlp(
                    sd, f"{bp}.gcl_equiv.cross_product_mlp", tied_head=True)
            block["gcl_equiv"] = equiv
            egnn[f"e_block_{i}"] = block
        dp["egnn"] = egnn
    else:  # gnn_dynamics
        gnn: Dict[str, Any] = {
            "embedding": {
                "kernel": _t(sd["ddpm.dynamics.gnn.embedding.weight"]),
                "bias": _v(sd["ddpm.dynamics.gnn.embedding.bias"])},
            "embedding_out": {
                "kernel": _t(sd["ddpm.dynamics.gnn.embedding_out.weight"]),
                "bias": _v(sd["ddpm.dynamics.gnn.embedding_out.bias"])},
        }
        for i in range(n_layers):
            gnn[f"gcl_{i}"] = _gcl(sd, f"ddpm.dynamics.gnn.gcl_{i}", attention)
        dp["gnn"] = gnn

    params = {"dynamics": {"params": dp}}

    if "ddpm.gamma.l1.weight" in sd:  # learned GammaNetwork
        params["gamma"] = {"params": {
            "l1": {"kernel": _t(sd["ddpm.gamma.l1.weight"]),
                   "bias": _v(sd["ddpm.gamma.l1.bias"])},
            "l2": {"kernel": _t(sd["ddpm.gamma.l2.weight"]),
                   "bias": _v(sd["ddpm.gamma.l2.bias"])},
            "l3": {"kernel": _t(sd["ddpm.gamma.l3.weight"]),
                   "bias": _v(sd["ddpm.gamma.l3.bias"])},
            "gamma_0": _v(sd["ddpm.gamma.gamma_0"]),
            "gamma_1": _v(sd["ddpm.gamma.gamma_1"]),
        }}

    def _expected_leftover(key: str) -> bool:
        # ddpm.gamma.gamma: PredefinedNoiseSchedule's precomputed table
        # buffer (we rebuild it from the config and verify separately);
        # cross_product_mlp.4.weight: the torch layout aliases the TIED
        # head tensor under both coord_mlp and cross_product_mlp, and the
        # conversion reads it from coord_mlp only
        return key == "ddpm.gamma.gamma" \
            or key.endswith("cross_product_mlp.4.weight")

    leftover = sorted(k for k in sd
                      if k not in sd.consumed and not _expected_leftover(k))
    if leftover:
        shown = ", ".join(leftover[:10])
        raise ValueError(
            f"{len(leftover)} checkpoint tensors were not consumed by the "
            f"conversion (flag/checkpoint mismatch? e.g. attention/"
            f"reflection_equivariant/inv_sublayers): {shown}")
    return params


def export_state_dict(params: Dict, attention: bool, reflection_equiv: bool,
                      gamma_table: np.ndarray = None) -> Dict[str, np.ndarray]:
    """Inverse mapping: our params -> reference-style state_dict arrays.

    Lets models trained in this framework be exported for tools that consume
    the reference checkpoint layout; also powers the converter round-trip
    tests.
    """
    dp = params["dynamics"]["params"]
    sd: Dict[str, np.ndarray] = {}

    def put_mlp2(prefix, tree):
        sd[f"{prefix}.0.weight"] = _t(tree["lin0"]["kernel"])
        sd[f"{prefix}.0.bias"] = _v(tree["lin0"]["bias"])
        sd[f"{prefix}.2.weight"] = _t(tree["lin2"]["kernel"])
        sd[f"{prefix}.2.bias"] = _v(tree["lin2"]["bias"])

    def put_coord(prefix, tree, shared_head=None):
        sd[f"{prefix}.0.weight"] = _t(tree["lin0_kernel"])
        sd[f"{prefix}.0.bias"] = _v(tree["lin0_bias"])
        sd[f"{prefix}.2.weight"] = _t(tree["lin1"]["kernel"])
        sd[f"{prefix}.2.bias"] = _v(tree["lin1"]["bias"])
        head = tree["lin2"]["kernel"] if shared_head is None else shared_head
        sd[f"{prefix}.4.weight"] = _t(head)

    def put_gcl(prefix, tree):
        sd[f"{prefix}.edge_mlp.0.weight"] = _t(tree["edge_mlp_0_kernel"])
        sd[f"{prefix}.edge_mlp.0.bias"] = _v(tree["edge_mlp_0_bias"])
        sd[f"{prefix}.edge_mlp.2.weight"] = _t(tree["edge_mlp_2"]["kernel"])
        sd[f"{prefix}.edge_mlp.2.bias"] = _v(tree["edge_mlp_2"]["bias"])
        sd[f"{prefix}.node_mlp.0.weight"] = _t(tree["node_mlp_0"]["kernel"])
        sd[f"{prefix}.node_mlp.0.bias"] = _v(tree["node_mlp_0"]["bias"])
        sd[f"{prefix}.node_mlp.2.weight"] = _t(tree["node_mlp_2"]["kernel"])
        sd[f"{prefix}.node_mlp.2.bias"] = _v(tree["node_mlp_2"]["bias"])
        if attention:
            sd[f"{prefix}.att_mlp.0.weight"] = _t(tree["att_mlp_0"]["kernel"])
            sd[f"{prefix}.att_mlp.0.bias"] = _v(tree["att_mlp_0"]["bias"])

    for name in ("atom_encoder", "atom_decoder", "residue_encoder",
                 "residue_decoder"):
        put_mlp2(f"ddpm.dynamics.{name}", dp[name])
    if "edge_embedding" in dp:
        sd["ddpm.dynamics.edge_embedding.weight"] = _v(
            dp["edge_embedding"]["embedding"])

    egnn = dp["egnn"]
    sd["ddpm.dynamics.egnn.embedding.weight"] = _t(egnn["embedding"]["kernel"])
    sd["ddpm.dynamics.egnn.embedding.bias"] = _v(egnn["embedding"]["bias"])
    sd["ddpm.dynamics.egnn.embedding_out.weight"] = _t(
        egnn["embedding_out"]["kernel"])
    sd["ddpm.dynamics.egnn.embedding_out.bias"] = _v(
        egnn["embedding_out"]["bias"])
    for bname, block in egnn.items():
        if not bname.startswith("e_block_"):
            continue
        prefix = f"ddpm.dynamics.egnn.{bname}"
        for gname, tree in block.items():
            if gname.startswith("gcl_") and gname != "gcl_equiv":
                put_gcl(f"{prefix}.{gname}", tree)
        put_coord(f"{prefix}.gcl_equiv.coord_mlp",
                  block["gcl_equiv"]["coord_mlp"])
        if not reflection_equiv:
            # tied head: the torch layout aliases one tensor under both
            # keys, so export writes coord_mlp's head here too
            put_coord(f"{prefix}.gcl_equiv.cross_product_mlp",
                      block["gcl_equiv"]["cross_product_mlp"],
                      shared_head=block["gcl_equiv"]["coord_mlp"]["lin2"]
                      ["kernel"])

    if gamma_table is not None:
        sd["ddpm.gamma.gamma"] = np.asarray(gamma_table, np.float32)
    return sd


def _namespace_to_dict(obj):
    if hasattr(obj, "__dict__") and not isinstance(obj, dict):
        return {k: _namespace_to_dict(v) for k, v in vars(obj).items()}
    if isinstance(obj, dict):
        return {k: _namespace_to_dict(v) for k, v in obj.items()}
    return obj


def hparams_to_config_dict(hparams: Dict[str, Any]) -> Dict[str, Any]:
    """Lightning hyper_parameters -> our config dict (field-compatible)."""
    h = _namespace_to_dict(hparams)
    keep = ["dataset", "mode", "pocket_representation", "virtual_nodes",
            "batch_size", "lr", "clip_grad", "augment_noise",
            "augment_rotation", "auxiliary_loss", "eval_epochs",
            "visualize_sample_epoch", "visualize_chain_epoch"]
    cfg = {k: h[k] for k in keep if k in h}
    for nested in ("egnn_params", "diffusion_params", "loss_params",
                   "eval_params"):
        if nested in h and h[nested] is not None:
            cfg[nested] = h[nested]
    return cfg


def convert_lightning_checkpoint(ckpt_path, out_dir, name: str = "best",
                                 verify_gamma: bool = True):
    """Full conversion: Lightning .ckpt -> Orbax checkpoint + config JSON.

    Requires torch (CPU build is sufficient).
    """
    import torch

    from diffsbdd_tpu.checkpoint import save_model
    from diffsbdd_tpu.config import load_config
    from diffsbdd_tpu.train.loop import create_train_state
    from diffsbdd_tpu.train.module import build_module_from_config

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in ckpt["state_dict"].items()}
    hparams = ckpt["hyper_parameters"]
    cfg_dict = hparams_to_config_dict(hparams)
    cfg = load_config(overrides=cfg_dict)

    histogram = np.asarray(_namespace_to_dict(hparams)["node_histogram"])
    module = build_module_from_config(cfg, histogram)

    eg = cfg.egnn_params
    params = convert_state_dict(
        sd, n_layers=eg.n_layers, inv_sublayers=eg.inv_sublayers,
        attention=eg.attention, reflection_equiv=eg.reflection_equivariant,
        has_edge_embedding=eg.get("edge_embedding_dim") is not None,
        mode="egnn_dynamics")

    if verify_gamma and "ddpm.gamma.gamma" in sd:
        ours = np.asarray(module.ddpm.gamma_table.gammas)
        theirs = np.asarray(sd["ddpm.gamma.gamma"], dtype=np.float32)
        if not np.allclose(ours, theirs, atol=1e-4):
            raise ValueError(
                "gamma schedule mismatch between checkpoint and config "
                f"(max diff {np.abs(ours - theirs).max()})")

    # validate the tree against a fresh init (catches naming/shape drift)
    import jax

    template = module.init_params(jax.random.PRNGKey(0))
    t_flat = jax.tree_util.tree_flatten_with_path(template)[0]
    c_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    t_paths = {jax.tree_util.keystr(p): v.shape for p, v in t_flat}
    c_paths = {jax.tree_util.keystr(p): v.shape for p, v in c_flat}
    if t_paths != c_paths:
        missing = set(t_paths) - set(c_paths)
        extra = set(c_paths) - set(t_paths)
        shape_mismatch = {k: (t_paths[k], c_paths[k])
                          for k in set(t_paths) & set(c_paths)
                          if t_paths[k] != c_paths[k]}
        raise ValueError(
            f"converted tree mismatch:\n missing={missing}\n extra={extra}\n"
            f" shapes={shape_mismatch}")

    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    state = create_train_state(params, lr=float(cfg.lr))
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    save_model(out_dir, module, state, cfg, name=name)
    return module, state, cfg


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert a DiffSBDD Lightning checkpoint to this "
                    "framework's format")
    p.add_argument("ckpt", type=Path)
    p.add_argument("--outdir", type=Path, required=True)
    p.add_argument("--name", type=str, default="best")
    args = p.parse_args(argv)
    convert_lightning_checkpoint(args.ckpt, args.outdir, name=args.name)
    print(f"converted {args.ckpt} -> {args.outdir}")


if __name__ == "__main__":
    main()
