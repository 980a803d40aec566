"""Activation / loss / sampler parity against the actual PyTorch reference.

The keystone harness from SURVEY.md §7 step 3: random-initialize the real
reference modules (/root/reference/equivariant_diffusion/*), convert their
state_dict with diffsbdd_tpu.convert.torch_ckpt.convert_state_dict, and
assert that on identical ragged<->padded inputs

  * every EGNN block's (h, x) activations match (egnn_new.py:163-184),
  * the dynamics eps outputs match (dynamics.py:87-167),
  * every loss/VLB term matches (en_diffusion.py:336-469,
    conditional_model.py:202-330),
  * full reverse-sampling chains match with an injected identical noise
    stream (conditional_model.py:479-555, en_diffusion.py:580-651).

Any transposed kernel, mis-ordered term, or wrong CoM frame fails here.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import reference_bridge as rb

try:
    REF = rb.load_reference()
except Exception as e:  # pragma: no cover
    REF = None
    _REF_ERR = str(e)

pytestmark = pytest.mark.skipif(REF is None, reason="reference unavailable")

from diffsbdd_tpu.convert.torch_ckpt import convert_state_dict
from diffsbdd_tpu.diffusion import ddpm as our_ddpm_mod
from diffsbdd_tpu.diffusion.size_prior import SizeDistribution
from diffsbdd_tpu.models.dynamics import EGNNDynamics as OurDynamics

ATOL = 1e-5
RTOL = 1e-4

LIG_SIZES = [4, 6, 3]
PKT_SIZES = [9, 5, 7]
NL, NP = 7, 10
B = len(LIG_SIZES)


def base_cfg(**over):
    cfg = dict(atom_nf=5, residue_nf=6, joint_nf=8, hidden_nf=16,
               n_layers=2, inv_sublayers=1, attention=True, tanh=True,
               norm_constant=1.0, normalization_factor=100.0,
               aggregation_method="sum", sin_embedding=False,
               reflection_equiv=False, update_pocket_coords=False,
               cutoffs=(None, 2.5, 2.5), edge_embedding_dim=None,
               mode="egnn_dynamics")
    cfg.update(over)
    return cfg


def build_ref_dynamics(cfg, seed=0):
    torch.manual_seed(seed)
    dyn = REF.dynamics.EGNNDynamics(
        atom_nf=cfg["atom_nf"], residue_nf=cfg["residue_nf"], n_dims=3,
        joint_nf=cfg["joint_nf"], hidden_nf=cfg["hidden_nf"],
        n_layers=cfg["n_layers"], attention=cfg["attention"],
        tanh=cfg["tanh"], mode=cfg["mode"],
        norm_constant=cfg["norm_constant"],
        inv_sublayers=cfg["inv_sublayers"],
        sin_embedding=cfg["sin_embedding"],
        normalization_factor=cfg["normalization_factor"],
        aggregation_method=cfg["aggregation_method"],
        update_pocket_coords=cfg["update_pocket_coords"],
        edge_cutoff_ligand=cfg["cutoffs"][0],
        edge_cutoff_pocket=cfg["cutoffs"][1],
        edge_cutoff_interaction=cfg["cutoffs"][2],
        reflection_equivariant=cfg["reflection_equiv"],
        edge_embedding_dim=cfg["edge_embedding_dim"])
    dyn.eval()
    return dyn


def build_our_dynamics(cfg):
    return OurDynamics(
        atom_nf=cfg["atom_nf"], residue_nf=cfg["residue_nf"],
        joint_nf=cfg["joint_nf"], hidden_nf=cfg["hidden_nf"],
        n_layers=cfg["n_layers"], attention=cfg["attention"],
        tanh=cfg["tanh"], mode=cfg["mode"],
        norm_constant=cfg["norm_constant"],
        inv_sublayers=cfg["inv_sublayers"],
        sin_embedding=cfg["sin_embedding"],
        normalization_factor=cfg["normalization_factor"],
        aggregation_method=cfg["aggregation_method"],
        update_pocket_coords=cfg["update_pocket_coords"],
        edge_cutoff_ligand=cfg["cutoffs"][0],
        edge_cutoff_pocket=cfg["cutoffs"][1],
        edge_cutoff_interaction=cfg["cutoffs"][2],
        reflection_equivariant=cfg["reflection_equiv"],
        edge_embedding_dim=cfg["edge_embedding_dim"],
        impl="xla", matmul_precision="float32")


def convert_ref(ref_dyn, cfg):
    sd = {f"ddpm.dynamics.{k}": v.detach().numpy()
          for k, v in ref_dyn.state_dict().items()}
    return convert_state_dict(
        sd, n_layers=cfg["n_layers"], inv_sublayers=cfg["inv_sublayers"],
        attention=cfg["attention"],
        reflection_equiv=cfg["reflection_equiv"],
        has_edge_embedding=cfg["edge_embedding_dim"] is not None,
        mode=cfg["mode"])


def make_inputs(cfg, seed=1, center="none"):
    """Identical padded (ours) and ragged (torch) inputs."""
    rng = np.random.default_rng(seed)
    x_l = (1.5 * rng.standard_normal((B, NL, 3))).astype(np.float32)
    x_p = (1.5 * rng.standard_normal((B, NP, 3))).astype(np.float32)
    h_l = np.eye(cfg["atom_nf"], dtype=np.float32)[
        rng.integers(0, cfg["atom_nf"], (B, NL))]
    h_p = np.eye(cfg["residue_nf"], dtype=np.float32)[
        rng.integers(0, cfg["residue_nf"], (B, NP))]
    m_l = rb.pad_mask(LIG_SIZES, NL)
    m_p = rb.pad_mask(PKT_SIZES, NP)
    x_l *= m_l[..., None]
    x_p *= m_p[..., None]
    h_l *= m_l[..., None]
    h_p *= m_p[..., None]

    if center == "joint":  # dataset-style joint-CoM centering (dataset.py:35-41)
        for b in range(B):
            allx = np.concatenate([x_l[b, :LIG_SIZES[b]],
                                   x_p[b, :PKT_SIZES[b]]], 0)
            mean = allx.mean(0)
            x_l[b, :LIG_SIZES[b]] -= mean
            x_p[b, :PKT_SIZES[b]] -= mean
    t = np.linspace(0.2, 0.8, B, dtype=np.float32).reshape(B, 1)
    return dict(x_l=x_l, x_p=x_p, h_l=h_l, h_p=h_p, m_l=m_l, m_p=m_p, t=t)


def ragged_t(arr, sizes):
    return torch.as_tensor(rb.to_ragged(arr, sizes))


def combined_to_ragged(arr, nl=NL):
    lig = rb.to_ragged(np.asarray(arr)[:, :nl], LIG_SIZES)
    pkt = rb.to_ragged(np.asarray(arr)[:, nl:], PKT_SIZES)
    return np.concatenate([lig, pkt], axis=0)


# ===========================================================================
# 1. activation-level parity of the dynamics network
# ===========================================================================

CASES = {
    "cond_attn_cross": base_cfg(),
    "cond_edge_embed": base_cfg(edge_embedding_dim=4),
    "joint_plain": base_cfg(attention=False, reflection_equiv=True,
                            update_pocket_coords=True,
                            cutoffs=(None, None, None)),
    "cond_sin_embed": base_cfg(sin_embedding=True, inv_sublayers=2,
                               cutoffs=(None, 3.0, 3.0)),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_dynamics_activation_parity(case):
    cfg = CASES[case]
    ref_dyn = build_ref_dynamics(cfg, seed=hash(case) % 2**31)
    params = convert_ref(ref_dyn, cfg)
    our_dyn = build_our_dynamics(cfg)
    inp = make_inputs(cfg, seed=2)

    # ---- torch forward with per-block activation hooks
    acts = {}

    def block_hook(i):
        def hook(mod, args, out):
            acts[f"block_{i}"] = (out[0].detach().numpy(),
                                  out[1].detach().numpy())
        return hook

    ref_dyn.egnn.embedding.register_forward_hook(
        lambda m, a, o: acts.__setitem__("embedding", o.detach().numpy()))
    for i in range(cfg["n_layers"]):
        ref_dyn.egnn._modules[f"e_block_{i}"].register_forward_hook(
            block_hook(i))

    with torch.no_grad():
        eps_l_t, eps_p_t = ref_dyn(
            torch.cat([ragged_t(inp["x_l"], LIG_SIZES),
                       ragged_t(inp["h_l"], LIG_SIZES)], dim=1),
            torch.cat([ragged_t(inp["x_p"], PKT_SIZES),
                       ragged_t(inp["h_p"], PKT_SIZES)], dim=1),
            torch.as_tensor(inp["t"]),
            torch.as_tensor(rb.batch_index(LIG_SIZES)),
            torch.as_tensor(rb.batch_index(PKT_SIZES)))

    # ---- ours with flax intermediate capture
    xh_l = jnp.concatenate([jnp.asarray(inp["x_l"]), jnp.asarray(inp["h_l"])], -1)
    xh_p = jnp.concatenate([jnp.asarray(inp["x_p"]), jnp.asarray(inp["h_p"])], -1)
    (eps_l, eps_p), mods = our_dyn.apply(
        params["dynamics"], xh_l, xh_p, jnp.asarray(inp["t"]),
        jnp.asarray(inp["m_l"]), jnp.asarray(inp["m_p"]),
        capture_intermediates=True)
    inter = mods["intermediates"]["egnn"]

    # per-layer comparisons (ragged extraction ignores pad slots)
    np.testing.assert_allclose(
        combined_to_ragged(inter["embedding"]["__call__"][0]),
        acts["embedding"], atol=ATOL, rtol=RTOL, err_msg="embedding")
    for i in range(cfg["n_layers"]):
        h_ref, x_ref = acts[f"block_{i}"]
        h_our, x_our = inter[f"e_block_{i}"]["__call__"][0]
        np.testing.assert_allclose(
            combined_to_ragged(h_our), h_ref, atol=ATOL, rtol=RTOL,
            err_msg=f"block {i} h")
        np.testing.assert_allclose(
            combined_to_ragged(x_our), x_ref, atol=ATOL, rtol=RTOL,
            err_msg=f"block {i} x")

    np.testing.assert_allclose(
        rb.to_ragged(eps_l, LIG_SIZES), eps_l_t.numpy(),
        atol=ATOL, rtol=RTOL, err_msg="eps ligand")
    np.testing.assert_allclose(
        rb.to_ragged(eps_p, PKT_SIZES), eps_p_t.numpy(),
        atol=ATOL, rtol=RTOL, err_msg="eps pocket")


def test_gnn_dynamics_parity():
    cfg = base_cfg(mode="gnn_dynamics", attention=True, tanh=False,
                   update_pocket_coords=True, cutoffs=(None, 3.0, 3.0))
    ref_dyn = build_ref_dynamics(cfg, seed=11)
    # latent reference bug: dynamics.py only sets update_pocket_coords in the
    # egnn branch (dynamics.py:75), so gnn_dynamics forward would crash at
    # dynamics.py:161; restore the attribute the forward expects
    ref_dyn.update_pocket_coords = True
    params = convert_ref(ref_dyn, cfg)
    our_dyn = build_our_dynamics(cfg)
    inp = make_inputs(cfg, seed=3)

    with torch.no_grad():
        eps_l_t, eps_p_t = ref_dyn(
            torch.cat([ragged_t(inp["x_l"], LIG_SIZES),
                       ragged_t(inp["h_l"], LIG_SIZES)], dim=1),
            torch.cat([ragged_t(inp["x_p"], PKT_SIZES),
                       ragged_t(inp["h_p"], PKT_SIZES)], dim=1),
            torch.as_tensor(inp["t"]),
            torch.as_tensor(rb.batch_index(LIG_SIZES)),
            torch.as_tensor(rb.batch_index(PKT_SIZES)))

    xh_l = jnp.concatenate([jnp.asarray(inp["x_l"]), jnp.asarray(inp["h_l"])], -1)
    xh_p = jnp.concatenate([jnp.asarray(inp["x_p"]), jnp.asarray(inp["h_p"])], -1)
    eps_l, eps_p = our_dyn.apply(
        params["dynamics"], xh_l, xh_p, jnp.asarray(inp["t"]),
        jnp.asarray(inp["m_l"]), jnp.asarray(inp["m_p"]))

    np.testing.assert_allclose(rb.to_ragged(eps_l, LIG_SIZES),
                               eps_l_t.numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(rb.to_ragged(eps_p, PKT_SIZES),
                               eps_p_t.numpy(), atol=ATOL, rtol=RTOL)


# ===========================================================================
# 2. full DDPM construction on both sides
# ===========================================================================

T_STEPS = 8
NORM_VALUES = (1.0, 4.0)


def make_histogram():
    hist = np.ones((NL + 1, NP + 1))
    hist[4, 9] = 25.0
    hist[6, 5] = 10.0
    return hist


def build_pair(kind):
    """(our_ddpm, our_params, ref_ddpm, ref_queue) with identical weights."""
    if kind == "joint":
        cfg = base_cfg(attention=True, reflection_equiv=True,
                       update_pocket_coords=True, cutoffs=(None, None, None))
        our_cls, ref_cls = our_ddpm_mod.JointDDPM, \
            REF.en_diffusion.EnVariationalDiffusion
    elif kind == "conditional":
        cfg = base_cfg()
        our_cls, ref_cls = our_ddpm_mod.ConditionalDDPM, \
            REF.conditional.ConditionalDDPM
    elif kind == "simple":
        cfg = base_cfg()
        our_cls, ref_cls = our_ddpm_mod.SimpleConditionalDDPM, \
            REF.conditional.SimpleConditionalDDPM
    else:
        raise ValueError(kind)

    ref_dyn = build_ref_dynamics(cfg, seed=5)
    params = convert_ref(ref_dyn, cfg)
    hist = make_histogram()

    RefQueued, ref_queue = rb.make_queued_ref(ref_cls, REF.en_diffusion)
    ref = RefQueued(
        dynamics=ref_dyn, atom_nf=cfg["atom_nf"],
        residue_nf=cfg["residue_nf"], n_dims=3, size_histogram=hist,
        timesteps=T_STEPS, noise_schedule="polynomial_2",
        noise_precision=1e-4, loss_type="l2", norm_values=NORM_VALUES,
        norm_biases=(None, 0.0))
    ref.eval()

    OurQueued = rb.make_queued_ddpm(our_cls)
    ours = OurQueued(
        dynamics=build_our_dynamics(cfg), atom_nf=cfg["atom_nf"],
        residue_nf=cfg["residue_nf"], n_dims=3,
        size_distribution=SizeDistribution(hist), timesteps=T_STEPS,
        noise_schedule="polynomial_2", noise_precision=1e-4,
        loss_type="l2", norm_values=NORM_VALUES, norm_biases=(None, 0.0))
    return ours, params, ref, ref_queue


def make_batches(cfg_seed=7, center="joint"):
    cfg = base_cfg()
    inp = make_inputs(cfg, seed=cfg_seed, center=center)
    ligand = {
        "x": jnp.asarray(inp["x_l"]), "one_hot": jnp.asarray(inp["h_l"]),
        "mask": jnp.asarray(inp["m_l"]),
        "size": jnp.asarray(LIG_SIZES, jnp.int32),
    }
    pocket = {
        "x": jnp.asarray(inp["x_p"]), "one_hot": jnp.asarray(inp["h_p"]),
        "mask": jnp.asarray(inp["m_p"]),
        "size": jnp.asarray(PKT_SIZES, jnp.int32),
    }
    ligand_t = {
        "x": ragged_t(inp["x_l"], LIG_SIZES),
        "one_hot": ragged_t(inp["h_l"], LIG_SIZES),
        "mask": torch.as_tensor(rb.batch_index(LIG_SIZES)),
        "size": torch.as_tensor(LIG_SIZES),
    }
    pocket_t = {
        "x": ragged_t(inp["x_p"], PKT_SIZES),
        "one_hot": ragged_t(inp["h_p"], PKT_SIZES),
        "mask": torch.as_tensor(rb.batch_index(PKT_SIZES)),
        "size": torch.as_tensor(PKT_SIZES),
    }
    return ligand, pocket, ligand_t, pocket_t


REF_TERM_ORDER = ["delta_log_px", "error_t_lig", "error_t_pocket",
                  "SNR_weight", "loss_0_x_ligand", "loss_0_x_pocket",
                  "loss_0_h", "neg_log_constants", "kl_prior", "log_pN",
                  "t_int", "xh_lig_hat"]


@pytest.mark.parametrize("kind,training", [
    ("conditional", True), ("conditional", False),
    ("joint", True), ("joint", False),
    ("simple", False),
])
def test_loss_terms_parity(kind, training, monkeypatch):
    ours, params, ref, ref_queue = build_pair(kind)
    ours.set_queue([])
    ligand, pocket, ligand_t, pocket_t = make_batches()

    # identical timestep draw on both sides (includes a t=0 row when
    # training, to exercise the loss_0 selection masks)
    t_fix = np.array([[0 if training else 1], [3], [T_STEPS]], np.int64)
    real_randint = torch.randint

    def fake_torch_randint(low, high, size=None, **kw):
        if size == (B, 1) and high == T_STEPS + 1:
            return torch.as_tensor(t_fix)
        return real_randint(low, high, size=size, **kw)

    monkeypatch.setattr(torch, "randint", fake_torch_randint)
    monkeypatch.setattr(
        jax.random, "randint",
        lambda key, shape, minval, maxval, dtype=jnp.int32:
            jnp.asarray(t_fix, dtype))

    feeder = rb.NoiseFeeder(ours._noise_queue, ref_queue, LIG_SIZES,
                            PKT_SIZES, NL, NP, ours.atom_nf,
                            ours.residue_nf, seed=13)
    push = feeder.push_joint if kind == "joint" else feeder.push_conditional
    push(1 if training else 2)

    ref.train(training)
    with torch.no_grad():
        ref_terms = dict(zip(REF_TERM_ORDER, ref(ligand_t, pocket_t)))
    with jax.disable_jit():
        our_terms = ours.loss_terms(params, jax.random.PRNGKey(0),
                                    ligand, pocket, training=training)

    assert not ours._noise_queue and not ref_queue, "unconsumed noise"

    for name in REF_TERM_ORDER:
        if name == "xh_lig_hat":
            a = rb.to_ragged(our_terms[name], LIG_SIZES)
            b = ref_terms[name].numpy()
        elif name in ("error_t_pocket", "loss_0_x_pocket") \
                and kind != "joint":
            continue  # reference returns literal 0.0 scalars here
        else:
            a = np.asarray(our_terms[name], np.float64).reshape(-1)
            b = ref_terms[name].numpy().astype(np.float64).reshape(-1)
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-4, err_msg=name)


# ===========================================================================
# 3. reverse-chain sampling parity with an injected identical noise stream
# ===========================================================================

def test_conditional_chain_parity():
    ours, params, ref, ref_queue = build_pair("conditional")
    ours.set_queue([])
    _, pocket, _, pocket_t = make_batches(center="none")
    lig_sizes = [5, 3, 4]
    lig_mask = jnp.asarray(rb.pad_mask(lig_sizes, NL))

    feeder = rb.NoiseFeeder(ours._noise_queue, ref_queue, lig_sizes,
                            PKT_SIZES, NL, NP, ours.atom_nf,
                            ours.residue_nf, seed=21)
    T = 6
    feeder.push_conditional(1 + T + 1)  # prior + T steps + decode
    # duplicate the identical stream for the second (reference) run
    ref_stream = list(ref_queue)

    with jax.disable_jit():
        xh_lig, xh_pkt = ours.sample_given_pocket(
            params, jax.random.PRNGKey(0), pocket, lig_mask, timesteps=T)
    assert not ours._noise_queue

    ref_queue.clear()
    ref_queue.extend(ref_stream)
    with torch.no_grad():
        out_lig, out_pkt, lig_idx, pkt_idx = ref.sample_given_pocket(
            {k: v.clone() if torch.is_tensor(v) else v
             for k, v in pocket_t.items()},
            torch.as_tensor(lig_sizes), timesteps=T)
    assert not ref_queue

    # ours always re-projects the final CoM; the reference only on drift —
    # apply the same projection to the reference output before comparing
    x_l, x_p = REF.conditional.ConditionalDDPM.remove_mean_batch(
        out_lig[:, :3], out_pkt[:, :3], lig_idx, pkt_idx)

    np.testing.assert_allclose(
        rb.to_ragged(xh_lig[..., :3], lig_sizes), x_l.numpy(),
        atol=1e-4, rtol=1e-3, err_msg="final ligand coords")
    np.testing.assert_allclose(
        rb.to_ragged(xh_lig[..., 3:], lig_sizes), out_lig[:, 3:].numpy(),
        atol=1e-6, rtol=0, err_msg="final ligand one-hot")
    np.testing.assert_allclose(
        rb.to_ragged(xh_pkt[..., :3], PKT_SIZES), x_p.numpy(),
        atol=1e-4, rtol=1e-3, err_msg="final pocket coords")


def test_joint_chain_parity():
    ours, params, ref, ref_queue = build_pair("joint")
    ours.set_queue([])
    ligand, pocket, _, _ = make_batches(center="joint")
    lig_mask, pkt_mask = ligand["mask"], pocket["mask"]

    feeder = rb.NoiseFeeder(ours._noise_queue, ref_queue, LIG_SIZES,
                            PKT_SIZES, NL, NP, ours.atom_nf,
                            ours.residue_nf, seed=22)
    T = 6
    feeder.push_joint(1 + T + 1)
    ref_stream = list(ref_queue)

    with jax.disable_jit():
        xh_lig, xh_pkt = ours.sample(
            params, jax.random.PRNGKey(0), (lig_mask, pkt_mask), timesteps=T)
    assert not ours._noise_queue

    ref_queue.clear()
    ref_queue.extend(ref_stream)
    with torch.no_grad():
        out_lig, out_pkt, lig_idx, pkt_idx = ref.sample(
            B, torch.as_tensor(LIG_SIZES), torch.as_tensor(PKT_SIZES),
            timesteps=T)
    assert not ref_queue

    x_all = REF.en_diffusion.EnVariationalDiffusion.remove_mean_batch(
        torch.cat([out_lig[:, :3], out_pkt[:, :3]]),
        torch.cat([lig_idx, pkt_idx]))
    n_lig = out_lig.shape[0]

    np.testing.assert_allclose(
        rb.to_ragged(xh_lig[..., :3], LIG_SIZES), x_all[:n_lig].numpy(),
        atol=1e-4, rtol=1e-3, err_msg="final ligand coords")
    np.testing.assert_allclose(
        rb.to_ragged(xh_lig[..., 3:], LIG_SIZES), out_lig[:, 3:].numpy(),
        atol=1e-6, rtol=0, err_msg="final ligand one-hot")
    np.testing.assert_allclose(
        rb.to_ragged(xh_pkt[..., :3], PKT_SIZES), x_all[n_lig:].numpy(),
        atol=1e-4, rtol=1e-3, err_msg="final pocket coords")


# ===========================================================================
# 4. learned GammaNetwork conversion parity
# ===========================================================================

def test_gamma_network_parity():
    torch.manual_seed(3)
    ref_gamma = REF.en_diffusion.GammaNetwork()
    sd = {f"ddpm.gamma.{k}": v.detach().numpy()
          for k, v in ref_gamma.state_dict().items()}
    # converter requires the dynamics subtree; splice gamma params directly
    from diffsbdd_tpu.diffusion import schedule as sched
    gm = our_ddpm_mod.DDPMBase.__new__(our_ddpm_mod.DDPMBase)  # just gamma
    gamma_module = sched.GammaNetwork()

    from diffsbdd_tpu.convert.torch_ckpt import _t, _v
    params = {"params": {
        "l1": {"kernel": _t(sd["ddpm.gamma.l1.weight"]),
               "bias": _v(sd["ddpm.gamma.l1.bias"])},
        "l2": {"kernel": _t(sd["ddpm.gamma.l2.weight"]),
               "bias": _v(sd["ddpm.gamma.l2.bias"])},
        "l3": {"kernel": _t(sd["ddpm.gamma.l3.weight"]),
               "bias": _v(sd["ddpm.gamma.l3.bias"])},
        "gamma_0": _v(sd["ddpm.gamma.gamma_0"]),
        "gamma_1": _v(sd["ddpm.gamma.gamma_1"]),
    }}
    t = np.linspace(0.0, 1.0, 33, dtype=np.float32).reshape(-1, 1)
    with torch.no_grad():
        ref_vals = ref_gamma(torch.as_tensor(t)).numpy()
        gt0 = ref_gamma.gamma_tilde(torch.zeros(1, 1)).item()
        gt1 = ref_gamma.gamma_tilde(torch.ones(1, 1)).item()
    our_vals = np.asarray(gamma_module.apply(params, jnp.asarray(t)))
    # conditioning: the (gt - gt0)/(gt1 - gt0) normalization amplifies f32
    # reduction-order differences in the 1024-wide l3 dot by |gt|/span
    # (~61/0.26 at fresh init, measured layer error 1.1e-5 -> ~7e-4 final);
    # both implementations are exact to their own summation order
    amplification = max(abs(gt0), abs(gt1)) / max(abs(gt1 - gt0), 1e-6)
    atol = max(1e-5, 3e-5 * amplification * 15.0)
    np.testing.assert_allclose(our_vals, ref_vals, atol=atol, rtol=1e-4)
