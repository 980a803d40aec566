import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsbdd_tpu.diffusion.ddpm import (
    ConditionalDDPM, JointDDPM, SimpleConditionalDDPM, num_nodes_to_mask)
from diffsbdd_tpu.diffusion.size_prior import SizeDistribution
from diffsbdd_tpu.models.dynamics import EGNNDynamics
from diffsbdd_tpu.ops.masked import masked_mean, masked_sum

A, R = 4, 5
NL, NP, B = 6, 8, 2
T = 10


def make_batches(key):
    ks = jax.random.split(key, 4)
    lig_sizes = np.array([4, 6])
    pkt_sizes = np.array([8, 5])
    m_l = jnp.asarray(num_nodes_to_mask(lig_sizes, NL))
    m_p = jnp.asarray(num_nodes_to_mask(pkt_sizes, NP))
    x_l = jax.random.normal(ks[0], (B, NL, 3)) * m_l[..., None]
    x_p = jax.random.normal(ks[1], (B, NP, 3)) * m_p[..., None]
    oh_l = jax.nn.one_hot(
        jax.random.randint(ks[2], (B, NL), 0, A), A) * m_l[..., None]
    oh_p = jax.nn.one_hot(
        jax.random.randint(ks[3], (B, NP), 0, R), R) * m_p[..., None]
    ligand = {"x": x_l, "one_hot": oh_l, "mask": m_l,
              "size": jnp.asarray(lig_sizes)}
    pocket = {"x": x_p, "one_hot": oh_p, "mask": m_p,
              "size": jnp.asarray(pkt_sizes)}
    return ligand, pocket


def make_ddpm(cls, **kw):
    update_pocket = cls is JointDDPM
    dyn = EGNNDynamics(
        atom_nf=A, residue_nf=R, joint_nf=8, hidden_nf=16, n_layers=1,
        attention=True, tanh=True, inv_sublayers=1, norm_constant=1.0,
        update_pocket_coords=update_pocket)
    hist = np.ones((NL + 1, NP + 1))
    return cls(dynamics=dyn, atom_nf=A, residue_nf=R, n_dims=3,
               size_distribution=SizeDistribution(hist), timesteps=T,
               noise_schedule="polynomial_2", noise_precision=5e-4,
               loss_type="l2", norm_values=(1.0, 4.0), **kw)


@pytest.fixture(scope="module")
def setup():
    ligand, pocket = make_batches(jax.random.PRNGKey(0))
    out = {}
    for cls in (JointDDPM, ConditionalDDPM, SimpleConditionalDDPM):
        ddpm = make_ddpm(cls)
        params = ddpm.init_params(jax.random.PRNGKey(1), ligand, pocket)
        out[cls.__name__] = (ddpm, params)
    return ligand, pocket, out


@pytest.mark.quick
def test_normalize_roundtrip(setup):
    ligand, pocket, models = setup
    ddpm, _ = models["ConditionalDDPM"]
    lig_n, _ = ddpm.normalize(ligand, pocket)
    x, h = ddpm.unnormalize(lig_n["x"], lig_n["one_hot"])
    np.testing.assert_allclose(np.asarray(x), np.asarray(ligand["x"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ligand["one_hot"]),
                               atol=1e-6)


@pytest.mark.parametrize("name", ["JointDDPM", "ConditionalDDPM",
                                  "SimpleConditionalDDPM"])
@pytest.mark.quick
@pytest.mark.parametrize("training", [True, False])
def test_loss_terms(setup, name, training):
    ligand, pocket, models = setup
    ddpm, params = models[name]
    terms = ddpm.loss_terms(params, jax.random.PRNGKey(2), ligand, pocket,
                            training=training)
    for k in ("delta_log_px", "error_t_lig", "error_t_pocket", "SNR_weight",
              "loss_0_x_ligand", "loss_0_x_pocket", "loss_0_h",
              "neg_log_constants", "kl_prior", "log_pN", "t_int"):
        v = terms[k]
        assert v.shape == (B,), (k, v.shape)
        assert bool(jnp.all(jnp.isfinite(v))), k
    assert terms["xh_lig_hat"].shape == (B, NL, 3 + A)
    if name != "JointDDPM":
        np.testing.assert_allclose(np.asarray(terms["error_t_pocket"]), 0.0)
    # kl_prior must be small for a well-formed terminal distribution
    assert float(jnp.abs(terms["kl_prior"]).max()) < 50.0


def test_joint_noised_representation_statistics(setup):
    ligand, pocket, models = setup
    ddpm, params = models["JointDDPM"]
    lig_n, pkt_n = ddpm.normalize(ligand, pocket)
    xh_l = jnp.concatenate([lig_n["x"], lig_n["one_hot"]], -1)
    xh_p = jnp.concatenate([pkt_n["x"], pkt_n["one_hot"]], -1)
    gamma_t = ddpm.gamma(params, jnp.full((B, 1), 0.5))
    z_l, z_p, e_l, e_p = ddpm.noised_representation(
        jax.random.PRNGKey(3), xh_l, xh_p, lig_n, pkt_n, gamma_t)
    # padded lanes stay zero
    np.testing.assert_allclose(
        np.asarray(z_l * (1 - lig_n["mask"][..., None])), 0.0)
    # reconstruction: (z - sigma*eps)/alpha == x
    from diffsbdd_tpu.diffusion import schedule as S
    a = S.alpha(gamma_t)[:, None, :]
    s = S.sigma(gamma_t)[:, None, :]
    rec = (z_l - s * e_l) / a * lig_n["mask"][..., None]
    np.testing.assert_allclose(np.asarray(rec), np.asarray(xh_l), atol=1e-5)
    # positional noise is CoM-free over the combined system
    com = (masked_sum(e_l[..., :3], lig_n["mask"])
           + masked_sum(e_p[..., :3], pkt_n["mask"]))
    np.testing.assert_allclose(np.asarray(com), 0.0, atol=1e-5)


def test_conditional_noised_representation(setup):
    ligand, pocket, models = setup
    ddpm, params = models["ConditionalDDPM"]
    lig_n, pkt_n = ddpm.normalize(ligand, pocket)
    xh_l = jnp.concatenate([lig_n["x"], lig_n["one_hot"]], -1)
    xh_p = jnp.concatenate([pkt_n["x"], pkt_n["one_hot"]], -1)
    gamma_t = ddpm.gamma(params, jnp.full((B, 1), 0.5))
    z_l, xh_p2, eps = ddpm.noised_representation(
        jax.random.PRNGKey(4), xh_l, xh_p, lig_n["mask"], pkt_n["mask"], gamma_t)
    # ligand z is CoM-free
    np.testing.assert_allclose(
        np.asarray(masked_mean(z_l[..., :3], lig_n["mask"])), 0.0, atol=1e-5)
    # pocket got translated by the same shift, so relative geometry is intact
    p0 = np.asarray(xh_p[..., :3])
    p1 = np.asarray(xh_p2[..., :3])
    mp = np.asarray(pkt_n["mask"])
    for b in range(B):
        v = mp[b] > 0
        np.testing.assert_allclose(
            p1[b][v] - p1[b][v].mean(0), p0[b][v] - p0[b][v].mean(0), atol=1e-5)
    # pocket features untouched
    np.testing.assert_allclose(np.asarray(xh_p2[..., 3:]),
                               np.asarray(xh_p[..., 3:]))


def test_conditional_sampling(setup):
    ligand, pocket, models = setup
    ddpm, params = models["ConditionalDDPM"]
    lig_mask = jnp.asarray(num_nodes_to_mask(np.array([5, 3]), NL))
    xh_lig, xh_pkt = ddpm.sample_given_pocket(
        params, jax.random.PRNGKey(5), pocket, lig_mask)
    assert xh_lig.shape == (B, NL, 3 + A)
    assert xh_pkt.shape == (B, NP, 3 + R)
    assert bool(jnp.all(jnp.isfinite(xh_lig)))
    # ligand CoM-free in the sampled frame
    np.testing.assert_allclose(
        np.asarray(masked_mean(xh_lig[..., :3], lig_mask)), 0.0, atol=1e-3)
    # one-hot decode: each valid node has exactly one active class
    oh = np.asarray(xh_lig[..., 3:])
    m = np.asarray(lig_mask)
    assert np.all(oh.sum(-1)[m > 0] == 1.0)
    assert np.all(oh.sum(-1)[m == 0] == 0.0)
    # pocket relative geometry preserved (translation only)
    p0 = np.asarray(pocket["x"])
    p1 = np.asarray(xh_pkt[..., :3])
    mp = np.asarray(pocket["mask"])
    for b in range(B):
        v = mp[b] > 0
        np.testing.assert_allclose(
            p1[b][v] - p1[b][v].mean(0), p0[b][v] - p0[b][v].mean(0), atol=1e-3)


def test_joint_sampling(setup):
    ligand, pocket, models = setup
    ddpm, params = models["JointDDPM"]
    lig_mask = jnp.asarray(num_nodes_to_mask(np.array([5, 3]), NL))
    pkt_mask = jnp.asarray(num_nodes_to_mask(np.array([6, 7]), NP))
    xh_lig, xh_pkt = ddpm.sample(
        params, jax.random.PRNGKey(6), (lig_mask, pkt_mask))
    assert xh_lig.shape == (B, NL, 3 + A)
    assert xh_pkt.shape == (B, NP, 3 + R)
    com = (masked_sum(xh_lig[..., :3], lig_mask)
           + masked_sum(xh_pkt[..., :3], pkt_mask))
    np.testing.assert_allclose(np.asarray(com), 0.0, atol=1e-3)


def test_conditional_inpaint_preserves_fixed_geometry(setup):
    ligand, pocket, models = setup
    ddpm, params = models["ConditionalDDPM"]
    lig_fixed = jnp.zeros((B, NL)).at[:, :2].set(1.0) * ligand["mask"]
    xh_lig, xh_pkt = ddpm.inpaint(
        params, jax.random.PRNGKey(7), ligand, pocket, lig_fixed,
        resamplings=2, timesteps=T)
    assert xh_lig.shape == (B, NL, 3 + A)
    assert bool(jnp.all(jnp.isfinite(xh_lig)))
    # pairwise distance between the two fixed atoms is approximately preserved
    d_in = jnp.linalg.norm(ligand["x"][:, 0] - ligand["x"][:, 1], axis=-1)
    d_out = jnp.linalg.norm(xh_lig[:, 0, :3] - xh_lig[:, 1, :3], axis=-1)
    np.testing.assert_allclose(np.asarray(d_out), np.asarray(d_in), atol=0.5)
    # fixed atom types survive the clamp
    np.testing.assert_allclose(np.asarray(xh_lig[:, :2, 3:]),
                               np.asarray(ligand["one_hot"][:, :2]), atol=1e-5)


def test_joint_inpaint_runs(setup):
    ligand, pocket, models = setup
    ddpm, params = models["JointDDPM"]
    lig_fixed = jnp.zeros((B, NL))
    pkt_fixed = jnp.ones((B, NP)) * pocket["mask"]
    xh_lig, xh_pkt = ddpm.inpaint(
        params, jax.random.PRNGKey(8), ligand, pocket, lig_fixed, pkt_fixed,
        resamplings=2, jump_length=2, timesteps=T)
    assert xh_lig.shape == (B, NL, 3 + A)
    assert bool(jnp.all(jnp.isfinite(xh_lig)))
    # all-pocket-fixed: pocket internal geometry preserved
    p0 = np.asarray(pocket["x"])
    p1 = np.asarray(xh_pkt[..., :3])
    mp = np.asarray(pocket["mask"])
    for b in range(B):
        v = mp[b] > 0
        np.testing.assert_allclose(
            p1[b][v] - p1[b][v].mean(0), p0[b][v] - p0[b][v].mean(0), atol=0.3)


def test_diversify(setup):
    ligand, pocket, models = setup
    ddpm, params = models["ConditionalDDPM"]
    xh_lig, xh_pkt = ddpm.diversify(
        params, jax.random.PRNGKey(9), ligand, pocket, noising_steps=3)
    assert xh_lig.shape == (B, NL, 3 + A)
    assert bool(jnp.all(jnp.isfinite(xh_lig)))


def test_simple_conditional_sampling(setup):
    ligand, pocket, models = setup
    ddpm, params = models["SimpleConditionalDDPM"]
    lig_mask = jnp.asarray(num_nodes_to_mask(np.array([5, 3]), NL))
    xh_lig, xh_pkt = ddpm.sample_given_pocket(
        params, jax.random.PRNGKey(10), pocket, lig_mask)
    assert xh_lig.shape == (B, NL, 3 + A)
    # simple variant: pocket coordinates only shifted to its own CoM frame
    p0 = np.asarray(pocket["x"])
    mp = np.asarray(pocket["mask"])
    p1 = np.asarray(xh_pkt[..., :3])
    for b in range(B):
        v = mp[b] > 0
        np.testing.assert_allclose(
            p1[b][v], p0[b][v] - p0[b][v].mean(0), atol=1e-4)


def test_simple_conditional_segmented_and_chain_center(setup):
    """Regression: ALL SimpleConditionalDDPM sampling entrypoints must enter
    the pocket-CoM frame (only sample_given_pocket did; the segmented/chain
    variants ran at absolute coordinates — garbage for off-center pockets)."""
    ligand, pocket, models = setup
    ddpm, params = models["SimpleConditionalDDPM"]
    lig_mask = jnp.asarray(num_nodes_to_mask(np.array([5, 3]), NL))
    # shift the pocket far off-center: results must be invariant
    far = dict(pocket)
    far["x"] = (pocket["x"] + 100.0) * pocket["mask"][..., None]

    ref_l, ref_p = ddpm.sample_given_pocket(
        params, jax.random.PRNGKey(10), pocket, lig_mask)

    seg_l, seg_p = ddpm.sample_given_pocket_segmented(
        params, jax.random.PRNGKey(10), far, lig_mask, segment=4)
    np.testing.assert_allclose(np.asarray(seg_l), np.asarray(ref_l),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(seg_p), np.asarray(ref_p),
                               atol=1e-3)

    frames_l, _ = ddpm.sample_given_pocket_chain(
        params, jax.random.PRNGKey(10), far, lig_mask, return_frames=1)
    np.testing.assert_allclose(np.asarray(frames_l[-1]), np.asarray(ref_l),
                               atol=1e-3)

    # diversify also relies on the explicit centering (remove_mean is the
    # identity here): invariance to the pocket shift
    div_ref = ddpm.diversify(params, jax.random.PRNGKey(11), ligand, pocket,
                             noising_steps=3)
    lig_far = dict(ligand)
    lig_far["x"] = (ligand["x"] + 100.0) * ligand["mask"][..., None]
    div_far = ddpm.diversify(params, jax.random.PRNGKey(11), lig_far, far,
                             noising_steps=3)
    np.testing.assert_allclose(np.asarray(div_far[0]), np.asarray(div_ref[0]),
                               atol=1e-3)


def test_repaint_schedule():
    ddpm = make_ddpm(JointDDPM)
    # resamplings=1, jump=1 -> plain reverse schedule
    s_arr, jumps = ddpm._repaint_plan(1, 1, T)
    np.testing.assert_array_equal(s_arr, np.arange(T - 1, -1, -1))
    assert jumps.sum() == 0
    # with resampling, every s is visited and total step count matches the
    # reference schedule length
    sched = ddpm.get_repaint_schedule(3, 2, T)
    s_arr, jumps = ddpm._repaint_plan(3, 2, T)
    assert len(s_arr) == sum(sched)
    assert s_arr[-1] == 0
    # each jump moves t forward by jump_length, each step moves s down one
    s = T - 1
    for si, ji in zip(s_arr, jumps):
        assert si == s
        if ji > 0:
            s += ji
        s -= 1
    assert s == -1


def test_segmented_sampler_matches_plain(setup):
    """Segmented dispatch must reproduce the monolithic scan exactly (the
    per-step keys are folded from the same scan key)."""
    ligand, pocket, models = setup
    ddpm, params = models["ConditionalDDPM"]
    lig_mask = jnp.asarray(num_nodes_to_mask(np.array([5, 3]), NL))
    rng = jax.random.PRNGKey(11)
    a_lig, a_pkt = ddpm.sample_given_pocket(params, rng, pocket, lig_mask)
    b_lig, b_pkt = ddpm.sample_given_pocket_segmented(
        params, rng, pocket, lig_mask, segment=3)
    np.testing.assert_allclose(np.asarray(b_lig), np.asarray(a_lig), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_pkt), np.asarray(a_pkt), atol=1e-5)


def test_joint_segmented_sampler_matches_plain(setup):
    """Segmented joint generation must reproduce the monolithic scan exactly
    (same key split + per-step fold-in)."""
    ligand, pocket, models = setup
    ddpm, params = models["JointDDPM"]
    masks = (ligand["mask"], pocket["mask"])
    rng = jax.random.PRNGKey(13)
    a_lig, a_pkt = ddpm.sample(params, rng, masks)
    for segment in (3, 1000):
        b_lig, b_pkt = ddpm.sample_segmented(params, rng, masks,
                                             segment=segment)
        np.testing.assert_allclose(np.asarray(b_lig), np.asarray(a_lig),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(b_pkt), np.asarray(a_pkt),
                                   atol=1e-5)


def test_joint_inpaint_segmented_equals_monolithic(setup):
    """The segmented joint RePaint driver must produce a bit-identical
    trajectory (same scan key + per-iteration fold-in) to the single-scan
    inpaint, across chunk boundaries and jump-back steps."""
    ligand, pocket, models = setup
    ddpm, params = models["JointDDPM"]
    lig_fixed = jnp.zeros((B, NL)).at[:, :2].set(1.0) * ligand["mask"]
    pkt_fixed = jnp.ones((B, NP)) * pocket["mask"]
    key = jax.random.PRNGKey(21)
    kwargs = dict(resamplings=3, jump_length=2, timesteps=T)
    mono = ddpm.inpaint(params, key, ligand, pocket, lig_fixed, pkt_fixed,
                        **kwargs)
    for segment in (4, 7, 1000):  # mid-chunk, uneven, single-chunk
        seg = ddpm.inpaint_segmented(params, key, ligand, pocket, lig_fixed,
                                     pkt_fixed, segment=segment, **kwargs)
        np.testing.assert_allclose(np.asarray(seg[0]), np.asarray(mono[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(seg[1]), np.asarray(mono[1]),
                                   atol=1e-5)


def test_conditional_inpaint_segmented_equals_monolithic(setup):
    ligand, pocket, models = setup
    for name in ("ConditionalDDPM", "SimpleConditionalDDPM"):
        ddpm, params = models[name]
        lig_fixed = jnp.zeros((B, NL)).at[:, :2].set(1.0) * ligand["mask"]
        key = jax.random.PRNGKey(22)
        for center in ("ligand", "pocket"):
            kwargs = dict(resamplings=2, timesteps=T, center=center)
            mono = ddpm.inpaint(params, key, ligand, pocket, lig_fixed,
                                **kwargs)
            seg = ddpm.inpaint_segmented(params, key, ligand, pocket,
                                         lig_fixed, segment=7, **kwargs)
            np.testing.assert_allclose(np.asarray(seg[0]),
                                       np.asarray(mono[0]), atol=1e-5,
                                       err_msg=f"{name}/{center}")
            np.testing.assert_allclose(np.asarray(seg[1]),
                                       np.asarray(mono[1]), atol=1e-5,
                                       err_msg=f"{name}/{center}")
