import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsbdd_tpu.config import load_config
from diffsbdd_tpu.diffusion.ddpm import num_nodes_to_mask
from diffsbdd_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from diffsbdd_tpu.train.lj import WeightSchedule, lj_potential
from diffsbdd_tpu.train.loop import (GradNormQueue, Trainer, TrainState,
                                     create_train_state, make_eval_step,
                                     make_train_step, restore_checkpoint,
                                     save_checkpoint)
from diffsbdd_tpu.train.module import LigandPocketDDPM, build_module_from_config

NL, NP, B = 8, 16, 4


def tiny_config(**over):
    cfg = load_config(overrides={
        "dataset": "crossdock",
        "mode": "pocket_conditioning",
        "pocket_representation": "CA",
        "lr": 1e-3,
        "auxiliary_loss": True,
        "egnn_params": {"joint_nf": 8, "hidden_nf": 16, "n_layers": 1,
                        "inv_sublayers": 1, "attention": True, "tanh": True,
                        "norm_constant": 1,
                        "reflection_equivariant": False},
        "diffusion_params": {"diffusion_steps": 10,
                             "normalize_factors": [1, 4]},
        "tpu": {"n_lig_max": NL, "n_pocket_max": NP, "lig_bucket": 4,
                "pocket_bucket": 8},
        **over,
    })
    return cfg


def make_batch(key, module):
    ks = jax.random.split(key, 4)
    lig_sizes = np.array([5, 7, 4, 6])
    pkt_sizes = np.array([12, 9, 16, 10])
    m_l = jnp.asarray(num_nodes_to_mask(lig_sizes, NL))
    m_p = jnp.asarray(num_nodes_to_mask(pkt_sizes, NP))
    A, R = module.atom_nf, module.residue_nf
    ligand = {
        "x": jax.random.normal(ks[0], (B, NL, 3)) * m_l[..., None],
        "one_hot": jax.nn.one_hot(
            jax.random.randint(ks[1], (B, NL), 0, A), A) * m_l[..., None],
        "mask": m_l, "size": jnp.asarray(lig_sizes, jnp.int32),
    }
    pocket = {
        "x": jax.random.normal(ks[2], (B, NP, 3)) * m_p[..., None],
        "one_hot": jax.nn.one_hot(
            jax.random.randint(ks[3], (B, NP), 0, R), R) * m_p[..., None],
        "mask": m_p, "size": jnp.asarray(pkt_sizes, jnp.int32),
    }
    return ligand, pocket


@pytest.fixture(scope="module")
def module_and_params():
    cfg = tiny_config()
    hist = np.ones((NL + 1, NP + 1))
    module = build_module_from_config(cfg, hist)
    params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
    return cfg, module, params


def test_loss_fn_runs(module_and_params):
    cfg, module, params = module_and_params
    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)
    loss, info = module.loss_fn(params, jax.random.PRNGKey(2), ligand, pocket,
                                training=True)
    assert np.isfinite(float(loss))
    assert "weighted_lj" in info  # auxiliary loss active
    loss_eval, _ = module.loss_fn(params, jax.random.PRNGKey(2), ligand,
                                  pocket, training=False)
    assert np.isfinite(float(loss_eval))


def test_training_zero_nan_guard(module_and_params):
    """A NaN in the EGNN velocity output corrupts one training step instead
    of the loss (reference dynamics.py:155-158: vel[isnan]=0 in training,
    error at eval)."""
    import flax

    cfg, module, params = module_and_params
    flat = flax.traverse_util.flatten_dict(params["dynamics"])
    poisoned = {
        k: (np.full_like(v, np.nan) if "coord_mlp" in "/".join(map(str, k))
            and str(k[-1]) == "kernel" and v.ndim == 2 and v.shape[1] == 1
            else v)
        for k, v in flat.items()}
    assert any(np.isnan(np.asarray(v)).any() for v in poisoned.values())
    bad = dict(params)
    bad["dynamics"] = flax.traverse_util.unflatten_dict(poisoned)

    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)
    loss, _ = module.loss_fn(bad, jax.random.PRNGKey(2), ligand, pocket,
                             training=True)
    assert np.isfinite(float(loss))
    loss_eval, _ = module.loss_fn(bad, jax.random.PRNGKey(2), ligand, pocket,
                                  training=False)
    assert not np.isfinite(float(loss_eval))


def test_lj_potential():
    # two atoms at optimal radius -> potential = -1 per directed pair
    x = jnp.array([[[0.0, 0, 0], [1.2, 0, 0]]])
    one_hot = jnp.array([[[1.0, 0], [1.0, 0]]])
    mask = jnp.ones((1, 2))
    rm = np.array([[120.0, 0.0], [0.0, 0.0]])  # 1.2 A
    pot = lj_potential(x, one_hot, mask, rm, norm_value=1.0)
    np.testing.assert_allclose(np.asarray(pot), [-2.0], rtol=1e-4)
    # clamped when atoms overlap
    x2 = jnp.array([[[0.0, 0, 0], [0.1, 0, 0]]])
    pot2 = lj_potential(x2, one_hot, mask, rm, norm_value=1.0, clamp=3.0)
    assert float(pot2[0]) <= 6.0


def test_weight_schedule():
    ws = WeightSchedule(T=10, max_weight=1.0, mode="linear")
    np.testing.assert_allclose(float(ws(jnp.array(0))), 1.0)
    np.testing.assert_allclose(float(ws(jnp.array(10))), 0.0)
    wc = WeightSchedule(T=10, max_weight=0.5, mode="constant")
    np.testing.assert_allclose(float(wc(jnp.array(7))), 0.5)


def test_gradnorm_queue():
    q = GradNormQueue.create()
    mean, std = q.stats()
    np.testing.assert_allclose(float(mean), 3000.0)
    for v in [1.0, 2.0, 3.0]:
        q = q.push(jnp.asarray(v))
    mean, std = q.stats()
    np.testing.assert_allclose(float(mean), (3000 + 6) / 4, rtol=1e-5)
    # flushing: after QUEUE_LEN pushes the 3000 seed is gone
    for _ in range(60):
        q = q.push(jnp.asarray(1.0))
    mean, _ = q.stats()
    np.testing.assert_allclose(float(mean), 1.0, rtol=1e-4)


def test_train_step_decreases_loss(module_and_params):
    cfg, module, params = module_and_params
    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)
    state = create_train_state(params, lr=1e-3)
    train_step = make_train_step(module, lr=1e-3, clip_grad=True)

    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(8):
        # fixed rng -> same noise draw, loss must go down on this sample
        state, info = train_step(state, jax.random.PRNGKey(7), ligand, pocket)
        losses.append(float(info["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    assert "grad_norm" in info


def test_train_step_multidevice(module_and_params):
    """DP over the simulated 8-device CPU mesh: batch sharded, params
    replicated, results identical to single-device execution."""
    cfg, module, params = module_and_params
    assert len(jax.devices()) == 8
    mesh = make_mesh(4)
    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)

    state = create_train_state(params, lr=1e-3)
    train_step = make_train_step(module, lr=1e-3, clip_grad=True)

    state_r = replicate(state, mesh)
    lig_s = shard_batch(ligand, mesh)
    pkt_s = shard_batch(pocket, mesh)
    state2, info_sharded = train_step(state_r, jax.random.PRNGKey(7),
                                      lig_s, pkt_s)
    _, info_single = train_step(state, jax.random.PRNGKey(7), ligand, pocket)
    np.testing.assert_allclose(float(info_sharded["loss"]),
                               float(info_single["loss"]), rtol=1e-4)


def test_train_step_shard_map(module_and_params):
    """Explicit shard_map DP tier (used for the Pallas-kernel path, which
    GSPMD cannot partition): per-shard grads pmean-reduced, params stay
    replicated, training progresses."""
    cfg, module, params = module_and_params
    mesh = make_mesh(4)
    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)

    state = replicate(create_train_state(params, lr=1e-3), mesh)
    train_step = make_train_step(module, lr=1e-3, clip_grad=True, mesh=mesh)
    lig_s = shard_batch(ligand, mesh)
    pkt_s = shard_batch(pocket, mesh)
    losses = []
    for i in range(4):
        state, info = train_step(state, jax.random.PRNGKey(7), lig_s, pkt_s)
        losses.append(float(info["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 4
    # outputs of the pmean'd shard_map stay replicated across the mesh
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_train_step_shard_map_grad_accum(module_and_params):
    """shard_map DP composes with in-jit micro-batch accumulation."""
    cfg, module, params = module_and_params
    mesh = make_mesh(2)
    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)
    state = replicate(create_train_state(params, lr=1e-3), mesh)
    train_step = make_train_step(module, lr=1e-3, clip_grad=False,
                                 accumulate_grad_batches=2, mesh=mesh)
    state, info = train_step(state, jax.random.PRNGKey(7),
                             shard_batch(ligand, mesh),
                             shard_batch(pocket, mesh))
    assert np.isfinite(float(info["loss"]))


def test_eval_step(module_and_params):
    cfg, module, params = module_and_params
    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)
    eval_step = make_eval_step(module)
    info = eval_step(params, jax.random.PRNGKey(3), ligand, pocket)
    assert np.isfinite(float(info["loss"]))


def test_eval_step_shard_map(module_and_params):
    """Validation on the shard_map tier (the Pallas multi-device path must
    not fall back to GSPMD, which would all-gather + replicate the kernels);
    the pmean'd loss matches the single-device eval closely."""
    cfg, module, params = module_and_params
    mesh = make_mesh(4)
    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)
    eval_step = make_eval_step(module, mesh=mesh)
    info = eval_step(params, jax.random.PRNGKey(3),
                     shard_batch(ligand, mesh), shard_batch(pocket, mesh))
    # per-shard RNG folding changes the t/noise draws, and the eval VLB has
    # huge variance under random-init params — assert execution + shape
    # semantics, not closeness
    assert np.isfinite(float(info["loss"]))
    assert jax.tree.leaves(info)[0].sharding.is_fully_replicated


def test_shard_map_grad_accum_divisibility_error(module_and_params):
    """Clear error when accumulate_grad_batches does not divide the
    per-shard batch (the global batch was divisible, the shards are not)."""
    import pytest

    cfg, module, params = module_and_params
    mesh = make_mesh(4)
    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)  # B=8
    state = replicate(create_train_state(params, lr=1e-3), mesh)
    train_step = make_train_step(module, lr=1e-3, clip_grad=False,
                                 accumulate_grad_batches=4, mesh=mesh)
    with pytest.raises(ValueError, match="per-shard"):
        train_step(state, jax.random.PRNGKey(7),
                   shard_batch(ligand, mesh), shard_batch(pocket, mesh))


def test_checkpoint_roundtrip(tmp_path, module_and_params):
    cfg, module, params = module_and_params
    state = create_train_state(params, lr=1e-3)
    save_checkpoint(tmp_path, state, cfg.to_dict(), name="last")
    # perturb and restore
    zeroed = TrainState(
        params=jax.tree.map(jnp.zeros_like, state.params),
        opt_state=state.opt_state, queue=state.queue, step=state.step)
    restored, config = restore_checkpoint(tmp_path, zeroed, name="last")
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params)
    assert all(jax.tree.leaves(chex_equal))
    assert config["dataset"] == "crossdock"


def test_joint_and_simple_modes_loss(module_and_params):
    hist = np.ones((NL + 1, NP + 1))
    for mode in ("joint", "pocket_conditioning_simple"):
        cfg = tiny_config(mode=mode)
        module = build_module_from_config(cfg, hist)
        params = module.init_params(jax.random.PRNGKey(0), batch_size=2)
        ligand, pocket = make_batch(jax.random.PRNGKey(1), module)
        loss, info = module.loss_fn(params, jax.random.PRNGKey(2), ligand,
                                    pocket, training=True)
        assert np.isfinite(float(loss)), mode


def test_gradient_accumulation(module_and_params):
    """k micro-batches with averaged grads: loss finite, params update; with
    identical micro-batches the update matches the monolithic step."""
    cfg, module, params = module_and_params
    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)

    # duplicate the same 4-sample batch so micro-batches see identical data
    lig2 = jax.tree.map(lambda a: jnp.concatenate([a, a], 0), ligand)
    pkt2 = jax.tree.map(lambda a: jnp.concatenate([a, a], 0), pocket)

    from diffsbdd_tpu.train.loop import create_train_state, make_train_step
    state = create_train_state(params, lr=1e-3)
    step_acc = make_train_step(module, lr=1e-3, clip_grad=False,
                               accumulate_grad_batches=2)
    new_acc, info_acc = step_acc(state, jax.random.PRNGKey(7), lig2, pkt2)
    assert np.isfinite(float(info_acc["loss"]))
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        state.params, new_acc.params)
    assert any(jax.tree.leaves(changed))


@pytest.mark.quick
def test_chained_train_step_matches_sequential(module_and_params):
    """make_train_step(chain_steps=K) scans K full optimizer steps in one
    dispatch; with the same per-step keys it must reproduce the sequential
    single-step path (the chaining exists only to amortize per-dispatch
    host latency, benchmarks/loss_glue_probe.py)."""
    cfg, module, params = module_and_params
    step1 = make_train_step(module, lr=1e-3, clip_grad=True)
    stepK = make_train_step(module, lr=1e-3, clip_grad=True, chain_steps=2)

    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    batches = [make_batch(jax.random.PRNGKey(s), module) for s in range(4)]

    state_a = create_train_state(params, lr=1e-3)
    infos_a = []
    for k, (lig, pkt) in zip(keys, batches):
        state_a, info = step1(state_a, k, lig, pkt)
        infos_a.append(info)

    state_b = create_train_state(params, lr=1e-3)
    infos_b = []
    for half in (slice(0, 2), slice(2, 4)):
        ks = jnp.stack(list(keys[half]))
        ligs = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[b[0] for b in batches[half]])
        pkts = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[b[1] for b in batches[half]])
        state_b, infos = stepK(state_b, ks, ligs, pkts)
        infos_b.extend(jax.tree.map(lambda a: a[j], infos) for j in range(2))

    assert int(state_b.step) == int(state_a.step) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        state_a.params, state_b.params)
    for ia, ib in zip(infos_a, infos_b):
        np.testing.assert_allclose(float(ia["loss"]), float(ib["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(ia["grad_norm"]),
                                   float(ib["grad_norm"]), rtol=1e-5)


def test_trainer_chained_matches_single_and_flushes(tmp_path,
                                                    module_and_params):
    """Trainer with tpu.steps_per_dispatch=2 over 3 batches/epoch: two steps
    go through the chained dispatch, the odd tail through the single-step
    path; logging cadence and final params match the unchained trainer."""
    cfg0, module, params = module_and_params

    class RecordingLogger:
        def __init__(self):
            self.records = []

        def log(self, metrics, step):
            self.records.append((step, dict(metrics)))

    batches = []
    for seed in range(3):
        ligand, pocket = make_batch(jax.random.PRNGKey(seed), module)
        batches.append({"ligand": ligand, "pocket": pocket})

    results = {}
    for label, k_chain in (("single", 1), ("chained", 2)):
        cfg = tiny_config(logdir=str(tmp_path), run_name=f"chain-{label}",
                          batch_size=B, log_every_n_steps=1,
                          tpu={"n_lig_max": NL, "n_pocket_max": NP,
                               "lig_bucket": 4, "pocket_bucket": 8,
                               "steps_per_dispatch": k_chain})
        logger = RecordingLogger()
        trainer = Trainer(module, cfg, train_loader=batches, val_loader=None,
                          logger=logger)
        state = create_train_state(params, lr=cfg.lr)
        state, _ = trainer.fit(state, jax.random.PRNGKey(5), n_epochs=2)
        steps = [s for s, m in logger.records
                 if any(k.endswith("/train") for k in m)]
        assert steps == [1, 2, 3, 4, 5, 6], (label, steps)
        results[label] = state

    assert int(results["chained"].step) == int(results["single"].step) == 6
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        results["single"].params, results["chained"].params)


def test_trainer_logs_every_step(tmp_path, module_and_params):
    """Per-step metric logging of every loss term, matching the reference's
    self.log of the full info dict each training_step
    (lightning_modules.py:333-335)."""
    cfg, module, params = module_and_params
    cfg = tiny_config(logdir=str(tmp_path), run_name="logtest",
                      batch_size=B, log_every_n_steps=1)

    class RecordingLogger:
        def __init__(self):
            self.records = []

        def log(self, metrics, step):
            self.records.append((step, dict(metrics)))

    batches = []
    for seed in range(3):
        ligand, pocket = make_batch(jax.random.PRNGKey(seed), module)
        batches.append({"ligand": ligand, "pocket": pocket})

    logger = RecordingLogger()
    trainer = Trainer(module, cfg, train_loader=batches, val_loader=None,
                      logger=logger)
    state = create_train_state(params, lr=cfg.lr)
    trainer.fit(state, jax.random.PRNGKey(5), n_epochs=2)

    train_records = [(s, m) for s, m in logger.records
                     if any(k.endswith("/train") for k in m)]
    assert [s for s, _ in train_records] == [1, 2, 3, 4, 5, 6]
    for _, metrics in train_records:
        for term in ("loss", "error_t_lig", "error_t_pocket", "kl_prior",
                     "loss_0", "SNR_weight", "log_pN", "grad_norm"):
            assert f"{term}/train" in metrics, term
