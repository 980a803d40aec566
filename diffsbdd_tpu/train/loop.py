"""Training loop: optax AdamW(amsgrad), adaptive gradient clipping, DP mesh,
Orbax checkpointing, metric logging.

Reference behaviors reproduced (from /root/reference/lightning_modules.py and
train.py): AdamW with amsgrad and weight decay 1e-12 (:183-185), gradient-norm
clipping at 1.5*mean + 2*std of a 50-step history (:874-899) — here the queue
is a fixed-shape on-device circular buffer so the whole train step stays
jitted — best+last checkpointing on validation loss (train.py:103-110), and
metric dicts with the reference's names.
"""
from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from diffsbdd_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                        shard_stacked_batch)

QUEUE_LEN = 50  # matches utils.Queue(max_len=50)


@struct.dataclass
class GradNormQueue:
    """Fixed-shape circular buffer of recent gradient norms (device-resident)."""

    values: jnp.ndarray  # (QUEUE_LEN,)
    count: jnp.ndarray   # () int32 — number of valid entries
    ptr: jnp.ndarray     # () int32 — next write position

    @classmethod
    def create(cls) -> "GradNormQueue":
        # seeded with one large value that gets flushed, like the reference
        values = jnp.zeros((QUEUE_LEN,), jnp.float32).at[0].set(3000.0)
        return cls(values=values, count=jnp.asarray(1, jnp.int32),
                   ptr=jnp.asarray(1, jnp.int32))

    def stats(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mask = (jnp.arange(QUEUE_LEN) < self.count).astype(jnp.float32)
        denom = jnp.maximum(self.count.astype(jnp.float32), 1.0)
        mean = jnp.sum(self.values * mask) / denom
        var = jnp.sum(((self.values - mean) ** 2) * mask) / denom
        return mean, jnp.sqrt(var)

    def push(self, value) -> "GradNormQueue":
        values = self.values.at[self.ptr % QUEUE_LEN].set(value)
        return GradNormQueue(
            values=values,
            count=jnp.minimum(self.count + 1, QUEUE_LEN),
            ptr=(self.ptr + 1) % QUEUE_LEN)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    queue: GradNormQueue
    step: jnp.ndarray


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """AdamW(amsgrad=True, weight_decay=1e-12) (lightning_modules.py:183-185)."""
    return optax.chain(
        optax.scale_by_amsgrad(),
        optax.add_decayed_weights(1e-12),
        optax.scale(-lr),
    )


def create_train_state(params, lr: float) -> TrainState:
    opt = make_optimizer(lr)
    return TrainState(params=params, opt_state=opt.init(params),
                      queue=GradNormQueue.create(),
                      step=jnp.asarray(0, jnp.int32))


def make_train_step(module, lr: float, clip_grad: bool = True,
                    accumulate_grad_batches: int = 1, mesh=None,
                    chain_steps: int = 1):
    """Build the jitted train step for a LigandPocketDDPM module.

    Data parallelism, two tiers:

    * ``mesh=None`` (default): jit with the batch sharded over the mesh
      'data' axis and params replicated; XLA GSPMD inserts the gradient
      all-reduce.  Bit-identical to single-device execution.
    * ``mesh=<multi-device Mesh>``: the loss+grad computation runs inside
      ``shard_map`` over the 'data' axis — each device differentiates its
      local batch shard and the gradients are ``pmean``-reduced over ICI.
      This is required for the fused Pallas kernel path (``pallas_call`` is
      opaque to GSPMD's propagation, which would otherwise all-gather the
      batch and run the kernels replicated).  Like the reference's DDP ranks
      (train.py:118-119), each shard folds its axis index into the step RNG,
      so noise draws differ per shard (statistically, not bit-, identical
      to the single-device step).

    ``accumulate_grad_batches`` > 1 splits the (per-shard) batch into
    micro-batches and averages gradients inside one jitted ``lax.scan`` —
    the on-chip equivalent of Lightning's accumulation
    (crossdock_fullatom_joint.yml sets accumulate_grad_batches: 4).

    ``chain_steps`` > 1 returns a CHAINED step instead: one dispatch runs
    ``chain_steps`` full optimizer steps over a stacked batch via
    ``lax.scan``.  Signature changes to ``(state, rngs, ligands, pockets)``
    where ``rngs`` is a stacked ``(chain_steps,)`` array of PRNG keys and
    the batch leaves carry a leading ``(chain_steps,)`` axis
    (``parallel.mesh.shard_stacked_batch``); the info dict comes back with
    the same leading axis.  Bit-identical to ``chain_steps`` sequential
    calls of the single-step function with the same keys — the point is
    purely to amortize per-dispatch host latency (measured ~23 ms per
    execute call through the remote-device tunnel,
    benchmarks/loss_glue_probe.py), which a sequential host loop pays per
    optimizer step.
    """
    opt = make_optimizer(lr)
    k_acc = accumulate_grad_batches
    use_shmap = mesh is not None and mesh.size > 1

    def loss_fn(params, rng, lig, pkt):
        return module.loss_fn(params, rng, lig, pkt, training=True)

    def compute_grads(params, rng, ligand, pocket):
        """(grads, loss, info) for one (possibly per-shard) batch, with
        in-jit micro-batch accumulation."""
        if k_acc <= 1:
            (loss, info), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, rng, ligand, pocket)
            return grads, loss, info

        B = ligand["x"].shape[0]
        if B % k_acc != 0:
            # on the shard_map tier B is the PER-SHARD batch, i.e. the
            # global batch must be divisible by mesh.size * k_acc
            raise ValueError(
                f"accumulate_grad_batches={k_acc} must divide the "
                f"{'per-shard ' if use_shmap else ''}batch size {B}"
                + (f" (= global batch / {mesh.size} devices)"
                   if use_shmap else ""))

        def split(d):
            return jax.tree.map(
                lambda a: a.reshape((k_acc, B // k_acc) + a.shape[1:]), d)

        lig_mb, pkt_mb = split(ligand), split(pocket)
        rngs = jax.random.split(rng, k_acc)

        def micro(carry, inp):
            lig, pkt, key = inp
            (loss, info), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, key, lig, pkt)
            acc_grads, acc_loss = carry
            acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
            return (acc_grads, acc_loss + loss), info

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        (grads, loss), infos = jax.lax.scan(
            micro, (zero_grads, 0.0), (lig_mb, pkt_mb, rngs))
        grads = jax.tree.map(lambda g: g / k_acc, grads)
        loss = loss / k_acc
        info = jax.tree.map(lambda x: x.mean(0), infos)
        info["loss"] = loss
        return grads, loss, info

    if use_shmap:
        from jax.sharding import PartitionSpec as P

        def shard_fn(params, rng, ligand, pocket):
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            grads, loss, info = compute_grads(params, rng, ligand, pocket)
            return jax.lax.pmean((grads, loss, info), "data")

        grad_call = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=(P(), P(), P()), check_vma=False)
    else:
        grad_call = compute_grads

    def step_body(state: TrainState, rng, ligand, pocket):
        grads, loss, info = grad_call(state.params, rng, ligand, pocket)

        queue = state.queue
        if clip_grad:
            # allow 150% + 2*stdev of recent history (lightning_modules.py:874-899)
            mean, std = queue.stats()
            max_norm = 1.5 * mean + 2.0 * std
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
            queue = queue.push(jnp.minimum(gnorm, max_norm))
            info["grad_norm"] = gnorm
            info["max_grad_norm"] = max_norm

        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               queue=queue, step=state.step + 1)
        return new_state, info

    if chain_steps <= 1:
        return jax.jit(step_body)

    @jax.jit
    def train_step_chained(state: TrainState, rngs, ligands, pockets):
        def body(st, inp):
            key, lig, pkt = inp
            return step_body(st, key, lig, pkt)
        return jax.lax.scan(body, state, (rngs, ligands, pockets))

    return train_step_chained


def make_eval_step(module, mesh=None):
    """Validation loss step.

    ``mesh``: same contract as ``make_train_step`` — on a multi-device mesh
    with the fused Pallas kernels, evaluation must also run inside
    ``shard_map`` (``pallas_call`` is opaque to GSPMD, which would otherwise
    all-gather the batch and run the kernels replicated on every device).
    """
    def loss_info(params, rng, ligand, pocket):
        _, info = module.loss_fn(params, rng, ligand, pocket, training=False)
        return info

    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        def shard_fn(params, rng, ligand, pocket):
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            info = loss_info(params, rng, ligand, pocket)
            return jax.lax.pmean(info, "data")

        call = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=P(), check_vma=False)
    else:
        call = loss_info

    @jax.jit
    def eval_step(params, rng, ligand, pocket):
        return call(params, rng, ligand, pocket)

    return eval_step


# ---------------------------------------------------------------------------
# checkpointing (Orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir, state: TrainState, config_dict: Dict,
                    name: str = "last"):
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute() / name
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "queue": jax.device_get({
                "values": state.queue.values, "count": state.queue.count,
                "ptr": state.queue.ptr}),
            "step": int(state.step),
        }, force=True)
    with open(Path(ckpt_dir) / f"{name}.config.json", "w") as f:
        json.dump(config_dict, f, indent=2, default=str)


def restore_checkpoint(ckpt_dir, state: TrainState, name: str = "last"):
    """Restore weights + optimizer + config (train.py:56-63 resume semantics)."""
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute() / name
    template = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "queue": jax.device_get({
            "values": state.queue.values, "count": state.queue.count,
            "ptr": state.queue.ptr}),
        "step": 0,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    cfg_file = Path(ckpt_dir) / f"{name}.config.json"
    config = json.loads(cfg_file.read_text()) if cfg_file.exists() else None
    new_state = TrainState(
        params=restored["params"], opt_state=restored["opt_state"],
        queue=GradNormQueue(
            values=jnp.asarray(restored["queue"]["values"]),
            count=jnp.asarray(restored["queue"]["count"]),
            ptr=jnp.asarray(restored["queue"]["ptr"])),
        step=jnp.asarray(restored["step"], jnp.int32))
    return new_state, config


# ---------------------------------------------------------------------------
# full training driver
# ---------------------------------------------------------------------------

class Trainer:
    """Epoch-driven trainer with periodic eval, best/last checkpoints and
    optional wandb logging — the pl.Trainer-shaped shell around the jitted
    steps."""

    def __init__(self, module, cfg, train_loader, val_loader, logger=None,
                 evaluator=None):
        self.module = module
        self.cfg = cfg
        # num_workers > 0 (the reference DataLoader knob, train.py:76) maps
        # to a background prefetch thread: the host assembles the next
        # batches while the device runs the current dispatch
        n_prefetch = int(cfg.get("num_workers", 0) or 0)
        if n_prefetch > 0 and train_loader is not None:
            from diffsbdd_tpu.data.dataset import PrefetchLoader
            train_loader = PrefetchLoader(train_loader,
                                          depth=max(2, n_prefetch))
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.logger = logger
        self.evaluator = evaluator  # SamplingEvaluator for periodic eval
        import jax as _jax
        n_dev = cfg.tpu.mesh_data if cfg.tpu.mesh_data > 0 \
            else len(_jax.devices())
        # the data axis must divide the batch size
        while cfg.batch_size % n_dev != 0:
            n_dev -= 1
        self.mesh = make_mesh(n_dev)
        # multi-host: host-side work (metrics files, checkpoints, sampling
        # eval) runs on process 0 only, like the reference's rank-0 eval
        # (lightning_modules.py:385); the jitted steps run on all hosts
        self.is_main_process = _jax.process_index() == 0
        # multi-device + fused-kernel path: explicit shard_map DP (GSPMD
        # cannot partition pallas_call); otherwise GSPMD handles sharding
        impl = module.dynamics._resolve_impl() \
            if hasattr(module.dynamics, "_resolve_impl") else "xla"
        k_acc = cfg.get("accumulate_grad_batches", 1)
        shmap_mesh = self.mesh \
            if (self.mesh.size > 1 and impl == "pallas") else None
        if shmap_mesh is not None and k_acc > 1 \
                and (cfg.batch_size // self.mesh.size) % k_acc != 0:
            raise ValueError(
                f"batch_size={cfg.batch_size} over {self.mesh.size} devices "
                f"gives per-shard batch {cfg.batch_size // self.mesh.size}, "
                f"not divisible by accumulate_grad_batches={k_acc}; adjust "
                f"batch_size or tpu.mesh_data")
        # K>1 chains K optimizer steps into one dispatch (lax.scan over
        # stacked batches) — bit-identical to the sequential loop, but pays
        # the per-dispatch host latency once per K steps instead of per step
        self.chain_steps = max(1, int(cfg.tpu.get("steps_per_dispatch", 1)))
        self.train_step = make_train_step(
            module, cfg.lr, cfg.clip_grad,
            accumulate_grad_batches=k_acc, mesh=shmap_mesh)
        self.train_step_chained = None
        if self.chain_steps > 1:
            self.train_step_chained = make_train_step(
                module, cfg.lr, cfg.clip_grad,
                accumulate_grad_batches=k_acc, mesh=shmap_mesh,
                chain_steps=self.chain_steps)
        self.eval_step = make_eval_step(module, mesh=shmap_mesh)
        self.best_val = float("inf")
        # per-step metric logging of every loss term, like the reference's
        # self.log_metrics(info, 'train') each training_step
        # (lightning_modules.py:333-335); interval configurable to bound
        # host<->device sync cost on TPU
        self.log_every_n_steps = int(cfg.get("log_every_n_steps", 1))
        self.ckpt_dir = Path(cfg.logdir) / cfg.run_name / "checkpoints"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)

    def log(self, metrics: Dict, split: str, step: int):
        if not self.is_main_process:
            return
        named = {f"{k}/{split}": float(v) for k, v in metrics.items()}
        if self.logger is not None:
            self.logger.log(named, step=step)

    def _run_single(self, state, step_rng, batch, step):
        ligand = shard_batch(batch["ligand"], self.mesh)
        pocket = shard_batch(batch["pocket"], self.mesh)
        state, train_info = self.train_step(state, step_rng, ligand, pocket)
        step += 1
        if step % self.log_every_n_steps == 0:
            self.log(jax.device_get(train_info), "train", step)
        return state, train_info, step

    def _run_chained(self, state, buf, step):
        """Dispatch len(buf) == chain_steps optimizer steps in one call."""
        K = len(buf)
        keys = jnp.stack([k for k, _ in buf])
        ligands = shard_stacked_batch([b["ligand"] for _, b in buf],
                                      self.mesh)
        pockets = shard_stacked_batch([b["pocket"] for _, b in buf],
                                      self.mesh)
        state, infos = self.train_step_chained(state, keys, ligands, pockets)
        to_log = [j for j in range(K)
                  if (step + j + 1) % self.log_every_n_steps == 0]
        if to_log:
            host = jax.device_get(infos)
            for j in to_log:
                self.log(jax.tree.map(lambda a: a[j], host), "train",
                         step + j + 1)
        # last step's metrics, device-resident (epoch print syncs lazily)
        train_info = jax.tree.map(lambda a: a[-1], infos)
        return state, train_info, step + K

    def fit(self, state, rng, n_epochs: int, eval_every: int = 1):
        state = replicate(state, self.mesh)
        # host-side step counter: state.step increments by exactly 1 per
        # train_step call, and int(state.step) every iteration would force a
        # host-device sync per step, defeating log_every_n_steps' purpose of
        # bounding sync cost
        step = int(state.step)
        train_info = None
        for epoch in range(n_epochs):
            t0 = time.time()
            buf = []
            for batch in self.train_loader:
                rng, step_rng = jax.random.split(rng)
                if self.train_step_chained is not None:
                    buf.append((step_rng, batch))
                    if len(buf) == self.chain_steps:
                        state, train_info, step = self._run_chained(
                            state, buf, step)
                        buf = []
                    continue
                state, train_info, step = self._run_single(
                    state, step_rng, batch, step)
            # epoch size not divisible by chain_steps: the tail runs through
            # the single-step function (same body, one compile on first use)
            for step_rng, batch in buf:
                state, train_info, step = self._run_single(
                    state, step_rng, batch, step)

            if (epoch + 1) % eval_every == 0 and self.val_loader is not None:
                val_losses = []
                for batch in self.val_loader:
                    rng, step_rng = jax.random.split(rng)
                    ligand = shard_batch(batch["ligand"], self.mesh)
                    pocket = shard_batch(batch["pocket"], self.mesh)
                    info = self.eval_step(state.params, step_rng, ligand, pocket)
                    val_losses.append(float(info["loss"]))
                val_loss = float(np.mean(val_losses))
                self.log({"loss": val_loss}, "val", step)
                if self.is_main_process:
                    # save_model owns the sidecar format (incl. the
                    # raw-vs-smoothed histogram rule) — don't re-implement
                    from diffsbdd_tpu.checkpoint import save_model
                    save_model(self.ckpt_dir, self.module, state, self.cfg,
                               name="last")
                    if val_loss < self.best_val:
                        self.best_val = val_loss
                        save_model(self.ckpt_dir, self.module, state,
                                   self.cfg, name="best")

            # periodic sampling-quality eval + visualization
            # (lightning_modules.py:382-410); rank 0 only, as in the
            # reference
            if self.evaluator is not None and self.is_main_process:
                ep = self.cfg.eval_params
                do_eval = (epoch + 1) % self.cfg.eval_epochs == 0
                do_vis = (epoch + 1) % self.cfg.visualize_sample_epoch == 0
                do_chain = (epoch + 1) % self.cfg.visualize_chain_epoch == 0
                eval_params = state.params
                if (do_eval or do_vis or do_chain) and jax.process_count() > 1:
                    # multi-host: params live on the global mesh and are not
                    # fully addressable from this process alone; pull the
                    # (replicated) values to host so the rank-0 evaluator's
                    # jitted sampling runs as an ordinary local computation
                    eval_params = jax.device_get(state.params)
                if do_eval:
                    rng, k = jax.random.split(rng)
                    tic = time.time()
                    metrics = self.evaluator.sample_and_analyze(
                        eval_params, k, ep.n_eval_samples,
                        batch_size=ep.get("eval_batch_size"))
                    self.log(metrics, "val", step)
                    print(f"Evaluation took {time.time() - tic:.2f} seconds")
                if do_vis:
                    rng, k = jax.random.split(rng)
                    self.evaluator.sample_and_save(
                        eval_params, k, ep.n_visualize_samples, epoch=epoch)
                if do_chain:
                    rng, k = jax.random.split(rng)
                    self.evaluator.sample_chain_and_save(
                        eval_params, k, ep.keep_frames, epoch=epoch)
            if train_info is not None:
                print(f"epoch {epoch}: {time.time() - t0:.1f}s "
                      f"loss={float(train_info['loss']):.4f}")
            else:  # empty train shard (e.g. tiny dataset over many hosts)
                print(f"epoch {epoch}: {time.time() - t0:.1f}s (no batches)")
        return state, rng
