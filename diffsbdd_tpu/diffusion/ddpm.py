"""E(3)-equivariant DDPMs over padded ligand/pocket graphs.

TPU-native re-design of the reference diffusion stack (behavioral spec:
/root/reference/equivariant_diffusion/en_diffusion.py for the joint model and
conditional_model.py for the pocket-conditional variants).  Structural
differences, none of which change the math on valid nodes:

* batches are padded fixed-shape dicts
  ``{'x': (B,N,3), 'one_hot': (B,N,F), 'mask': (B,N), 'size': (B,)}``;
* every T-step sampling loop is a jitted ``jax.lax.scan`` with threaded PRNG
  keys and precomputed gamma tables, so the whole reverse chain runs on chip
  with zero host round-trips (the reference runs a Python loop of T separate
  CUDA launches, en_diffusion.py:612 / conditional_model.py:518);
* RePaint resampling (conditional_model.py:616-666) and the joint jump
  schedule (en_diffusion.py:653-674) are flattened into uniform scans over
  precomputed per-iteration step/flag arrays;
* randomness is explicit key-threading — parity tests must inject noise
  rather than compare RNG streams (SURVEY.md §7).

Class map (reference -> here):
  EnVariationalDiffusion  -> JointDDPM
  ConditionalDDPM         -> ConditionalDDPM
  SimpleConditionalDDPM   -> SimpleConditionalDDPM
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffsbdd_tpu.diffusion import schedule as sched
from diffsbdd_tpu.diffusion.size_prior import SizeDistribution
from diffsbdd_tpu.geom import com
from diffsbdd_tpu.ops.masked import masked_mean, masked_sum, sum_except_batch

Array = jnp.ndarray
Batch = Dict[str, Array]


def num_nodes_to_mask(num_nodes: np.ndarray, n_max: int) -> np.ndarray:
    """Host-side: (B,) node counts -> (B, n_max) validity mask."""
    num_nodes = np.asarray(num_nodes)
    return (np.arange(n_max)[None, :] < num_nodes[:, None]).astype(np.float32)


def _xh(d: Batch) -> Array:
    return jnp.concatenate([d["x"], d["one_hot"]], axis=-1)


class DDPMBase:
    """Shared machinery for all three model variants."""

    def __init__(
        self,
        dynamics,  # EGNNDynamics linen module
        atom_nf: int,
        residue_nf: int,
        n_dims: int,
        size_distribution: SizeDistribution,
        timesteps: int = 1000,
        noise_schedule: str = "learned",
        noise_precision: float = 1e-4,
        loss_type: str = "vlb",
        norm_values: Tuple[float, float] = (1.0, 1.0),
        norm_biases: Tuple[Optional[float], float] = (None, 0.0),
        virtual_node_idx: Optional[int] = None,
    ):
        if loss_type not in {"vlb", "l2"}:
            raise ValueError(loss_type)
        if noise_schedule == "learned" and loss_type != "vlb":
            raise ValueError("a learned schedule requires the vlb objective")

        self.dynamics = dynamics
        self.atom_nf = atom_nf
        self.residue_nf = residue_nf
        self.n_dims = n_dims
        self.num_classes = atom_nf
        self.T = timesteps
        self.loss_type = loss_type
        self.norm_values = tuple(norm_values)
        self.norm_biases = tuple(norm_biases)
        self.size_distribution = size_distribution
        self.vnode_idx = virtual_node_idx
        self.learned_gamma = noise_schedule == "learned"
        if self.learned_gamma:
            self.gamma_module = sched.GammaNetwork()
            self.gamma_table = None
        else:
            self.gamma_module = None
            self.gamma_table = sched.NoiseSchedule.create(
                noise_schedule, timesteps, noise_precision)
            self._check_norm_values()

    # ------------------------------------------------------------------ setup
    def _check_norm_values(self, num_stdevs: int = 8):
        """Guard against categorical normalization washing out (en_diffusion.py:68-81)."""
        gamma_0 = float(self.gamma_table(jnp.zeros(())))
        sigma_0 = float(sched.sigma(jnp.asarray(gamma_0)))
        norm_value = self.norm_values[1]
        if sigma_0 * num_stdevs > 1.0 / norm_value:
            raise ValueError(
                f"Normalization value {norm_value} probably too large with "
                f"sigma_0 {sigma_0:.5f} and 1/norm_value {1.0 / norm_value}")

    def init_params(self, rng, ligand: Batch, pocket: Batch):
        ligand, pocket = self.normalize(ligand, pocket)
        B = ligand["x"].shape[0]
        t = jnp.zeros((B, 1))
        k1, k2 = jax.random.split(rng)
        params = {"dynamics": self.dynamics.init(
            k1, _xh(ligand), _xh(pocket), t, ligand["mask"], pocket["mask"])}
        if self.learned_gamma:
            params["gamma"] = self.gamma_module.init(k2, t)
        return params

    # ----------------------------------------------------------------- basics
    def gamma(self, params, t: Array) -> Array:
        if self.learned_gamma:
            return self.gamma_module.apply(params["gamma"], t)
        return self.gamma_table(t)

    def apply_dynamics(self, params, xh_lig, xh_pkt, t, m_l, m_p,
                       shared_pocket: bool = False, zero_nan: bool = False,
                       block_fuse: bool = False):
        # block_fuse: sampling-path-only whole-block kernel fusion
        # (ops/egnn_block_fused.py); the training loss keeps the split
        # kernels whose backward runs the fused Pallas gradient kernels
        return self.dynamics.apply(
            params["dynamics"], xh_lig, xh_pkt, t, m_l, m_p,
            shared_pocket=shared_pocket, zero_nan=zero_nan,
            block_fuse=block_fuse)

    def normalize(self, ligand: Optional[Batch] = None, pocket: Optional[Batch] = None):
        """x /= norm_x; one_hot = (one_hot - bias) / norm_h (en_diffusion.py:880-895)."""
        def norm(d):
            if d is None:
                return None
            out = dict(d)
            out["x"] = d["x"] / self.norm_values[0]
            out["one_hot"] = (
                d["one_hot"].astype(jnp.float32) - self.norm_biases[1]
            ) / self.norm_values[1]
            return out
        return norm(ligand), norm(pocket)

    def unnormalize(self, x: Array, h_cat: Array):
        return (x * self.norm_values[0],
                h_cat * self.norm_values[1] + self.norm_biases[1])

    def unnormalize_z(self, z: Array) -> Array:
        x, h = self.unnormalize(z[..., :self.n_dims], z[..., self.n_dims:])
        return jnp.concatenate([x, h], axis=-1)

    def subspace_dimensionality(self, input_size: Array) -> Array:
        """(N-1)*d on the translation-invariant subspace (en_diffusion.py:914-917)."""
        return (input_size - 1) * self.n_dims

    @staticmethod
    def gaussian_kl(mu_norm2: Array, q_sigma: Array, p_sigma: Array, d) -> Array:
        """KL(N(mu_q, q_sigma) || N(0, p_sigma)) with dimension d (en_diffusion.py:839-853)."""
        return (d * jnp.log(p_sigma / q_sigma)
                + 0.5 * (d * q_sigma**2 + mu_norm2) / (p_sigma**2)
                - 0.5 * d)

    def sigma(self, gamma: Array) -> Array:
        return sched.sigma(gamma)

    def alpha(self, gamma: Array) -> Array:
        return sched.alpha(gamma)

    @staticmethod
    def snr(gamma: Array) -> Array:
        return sched.snr(gamma)

    def xh_given_zt_and_epsilon(self, z_t, eps, gamma_t, mask):
        """EDM eq. (7): denoised estimate from z_t and predicted epsilon."""
        alpha_t = self.alpha(gamma_t)[:, None, :]
        sigma_t = self.sigma(gamma_t)[:, None, :]
        return (z_t / alpha_t - eps * sigma_t / alpha_t) * mask[..., None]

    def delta_log_px(self, num_nodes: Array) -> Array:
        return -self.subspace_dimensionality(num_nodes) * math.log(self.norm_values[0])

    def log_constants_p_x_given_z0(self, params, n_nodes: Array, batch_size: int) -> Array:
        """Constant part of log p(x|z0) (en_diffusion.py:171-183)."""
        degrees_of_freedom_x = self.subspace_dimensionality(n_nodes)
        gamma_0 = self.gamma(params, jnp.zeros((batch_size, 1)))
        log_sigma_x = 0.5 * gamma_0[:, 0]
        return degrees_of_freedom_x * (-log_sigma_x - 0.5 * math.log(2 * math.pi))

    def _log_ph_cat(self, one_hot_norm: Array, z_h: Array, sigma_0_cat: Array,
                    mask: Array, epsilon: float = 1e-10) -> Array:
        """Discretized-Gaussian categorical likelihood, summed per graph.

        Mirrors en_diffusion.py:216-255: integrate N(z_h, sigma_0_cat) over
        [h-0.5, h+0.5] around the one-hot peak, normalize over classes, pick
        the true class.
        """
        one_hot = one_hot_norm * self.norm_values[1] + self.norm_biases[1]
        estimated = z_h * self.norm_values[1] + self.norm_biases[1]
        centered = estimated - 1.0
        s = sigma_0_cat[:, None, :]
        # clamp at 0: f32 erf is not monotone at ulp level in the saturated
        # tails, so the difference can come out at -1e-8 and NaN the log
        prob_mass = jnp.maximum(
            sched.cdf_standard_gaussian((centered + 0.5) / s)
            - sched.cdf_standard_gaussian((centered - 0.5) / s), 0.0)
        log_ph_prop = jnp.log(prob_mass + epsilon)
        log_z = jax.nn.logsumexp(log_ph_prop, axis=-1, keepdims=True)
        log_probs = log_ph_prop - log_z
        return sum_except_batch(log_probs * one_hot, mask)

    # ------------------------------------------------------------------ noise
    def sample_gaussian(self, key, shape, mask) -> Array:
        return jax.random.normal(key, shape) * mask[..., None]


class JointDDPM(DDPMBase):
    """Diffuses ligand and pocket together (reference EnVariationalDiffusion)."""

    update_pocket_coords = True

    # -------------------------------------------------------------- subspace
    @staticmethod
    def remove_mean(x_lig, x_pkt, m_l, m_p):
        return com.remove_mean_joint(x_lig, x_pkt, m_l, m_p)

    def sample_combined_noise(self, key, lig: Batch, pkt: Batch):
        """CoM-free positional noise + iid feature noise for both domains."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        B, NL = lig["mask"].shape
        NP = pkt["mask"].shape[1]
        ex_l = self.sample_gaussian(k1, (B, NL, self.n_dims), lig["mask"])
        ex_p = self.sample_gaussian(k2, (B, NP, self.n_dims), pkt["mask"])
        ex_l, ex_p = self.remove_mean(ex_l, ex_p, lig["mask"], pkt["mask"])
        ex_l = ex_l * lig["mask"][..., None]
        ex_p = ex_p * pkt["mask"][..., None]
        eh_l = self.sample_gaussian(k3, (B, NL, self.atom_nf), lig["mask"])
        eh_p = self.sample_gaussian(k4, (B, NP, self.residue_nf), pkt["mask"])
        return (jnp.concatenate([ex_l, eh_l], -1),
                jnp.concatenate([ex_p, eh_p], -1))

    def noised_representation(self, key, xh_lig, xh_pkt, lig: Batch, pkt: Batch, gamma_t):
        alpha_t = self.alpha(gamma_t)[:, None, :]
        sigma_t = self.sigma(gamma_t)[:, None, :]
        eps_lig, eps_pkt = self.sample_combined_noise(key, lig, pkt)
        z_lig = (alpha_t * xh_lig + sigma_t * eps_lig) * lig["mask"][..., None]
        z_pkt = (alpha_t * xh_pkt + sigma_t * eps_pkt) * pkt["mask"][..., None]
        return z_lig, z_pkt, eps_lig, eps_pkt

    # ------------------------------------------------------------------ loss
    def kl_prior(self, params, xh_lig, xh_pkt, lig: Batch, pkt: Batch) -> Array:
        """KL(q(z_T|x) || N(0,1)) over both domains (en_diffusion.py:109-155)."""
        num_nodes = lig["size"] + pkt["size"]
        B = xh_lig.shape[0]
        gamma_T = self.gamma(params, jnp.ones((B, 1)))
        alpha_T = self.alpha(gamma_T)[:, None, :]

        mu_l = alpha_T * xh_lig
        mu_p = alpha_T * xh_pkt
        sigma_T = self.sigma(gamma_T)[:, 0]

        nd = self.n_dims
        ones = jnp.ones_like(sigma_T)
        mu_norm2_h = (sum_except_batch(mu_l[..., nd:] ** 2, lig["mask"])
                      + sum_except_batch(mu_p[..., nd:] ** 2, pkt["mask"]))
        kl_h = self.gaussian_kl(mu_norm2_h, sigma_T, ones, d=1.0)

        mu_norm2_x = (sum_except_batch(mu_l[..., :nd] ** 2, lig["mask"])
                      + sum_except_batch(mu_p[..., :nd] ** 2, pkt["mask"]))
        d_x = self.subspace_dimensionality(num_nodes)
        kl_x = self.gaussian_kl(mu_norm2_x, sigma_T, ones, d_x)
        return kl_x + kl_h

    def log_pxh_given_z0_without_constants(
            self, ligand: Batch, z0_lig, eps_lig, net_lig,
            pocket: Batch, z0_pkt, eps_pkt, net_pkt, gamma_0, epsilon=1e-10):
        nd = self.n_dims
        sigma_0 = self.sigma(gamma_0)
        sigma_0_cat = sigma_0 * self.norm_values[1]

        log_px_lig = -0.5 * sum_except_batch(
            (eps_lig[..., :nd] - net_lig[..., :nd]) ** 2, ligand["mask"])
        log_px_pkt = -0.5 * sum_except_batch(
            (eps_pkt[..., :nd] - net_pkt[..., :nd]) ** 2, pocket["mask"])

        log_ph = (self._log_ph_cat(ligand["one_hot"], z0_lig[..., nd:],
                                   sigma_0_cat, ligand["mask"], epsilon)
                  + self._log_ph_cat(pocket["one_hot"], z0_pkt[..., nd:],
                                     sigma_0_cat, pocket["mask"], epsilon))
        return log_px_lig, log_px_pkt, log_ph

    def loss_terms(self, params, rng, ligand: Batch, pocket: Batch,
                   training: bool) -> Dict[str, Any]:
        """All VLB/L2 loss ingredients; weighting happens in the trainer.

        Mirrors EnVariationalDiffusion.forward (en_diffusion.py:336-469).
        """
        ligand, pocket = self.normalize(ligand, pocket)
        B = ligand["x"].shape[0]
        nd = self.n_dims

        delta_log_px = self.delta_log_px(ligand["size"] + pocket["size"])

        k_t, k_noise, k_noise0 = jax.random.split(rng, 3)
        lowest_t = 0 if training else 1
        t_int = jax.random.randint(k_t, (B, 1), lowest_t, self.T + 1).astype(jnp.float32)
        s_int = t_int - 1
        t_is_zero = (t_int == 0).astype(jnp.float32)
        t_is_not_zero = 1.0 - t_is_zero
        s = s_int / self.T
        t = t_int / self.T
        gamma_s = self.gamma(params, s)
        gamma_t = self.gamma(params, t)

        xh_lig = _xh(ligand)
        xh_pkt = _xh(pocket)

        z_t_lig, z_t_pkt, eps_lig, eps_pkt = self.noised_representation(
            k_noise, xh_lig, xh_pkt, ligand, pocket, gamma_t)
        # training passes zero_nan (dynamics.py:155-158): a transient NaN in
        # the EGNN output corrupts one step instead of poisoning the params
        net_lig, net_pkt = self.apply_dynamics(
            params, z_t_lig, z_t_pkt, t, ligand["mask"], pocket["mask"],
            zero_nan=training)

        xh_lig_hat = self.xh_given_zt_and_epsilon(
            z_t_lig, net_lig, gamma_t, ligand["mask"])

        error_t_lig = sum_except_batch((eps_lig - net_lig) ** 2, ligand["mask"])
        error_t_pkt = sum_except_batch((eps_pkt - net_pkt) ** 2, pocket["mask"])

        snr_weight = (1 - self.snr(gamma_s - gamma_t))[:, 0]
        neg_log_constants = -self.log_constants_p_x_given_z0(
            params, ligand["size"] + pocket["size"], B)
        kl_prior = self.kl_prior(params, xh_lig, xh_pkt, ligand, pocket)

        if training:
            log_px_lig, log_px_pkt, log_ph = \
                self.log_pxh_given_z0_without_constants(
                    ligand, z_t_lig, eps_lig, net_lig,
                    pocket, z_t_pkt, eps_pkt, net_pkt, gamma_t)
            loss_0_x_lig = -log_px_lig * t_is_zero[:, 0]
            loss_0_x_pkt = -log_px_pkt * t_is_zero[:, 0]
            loss_0_h = -log_ph * t_is_zero[:, 0]
            error_t_lig = error_t_lig * t_is_not_zero[:, 0]
            error_t_pkt = error_t_pkt * t_is_not_zero[:, 0]
        else:
            t_zeros = jnp.zeros_like(s)
            gamma_0 = self.gamma(params, t_zeros)
            z_0_lig, z_0_pkt, eps_0_lig, eps_0_pkt = self.noised_representation(
                k_noise0, xh_lig, xh_pkt, ligand, pocket, gamma_0)
            net_0_lig, net_0_pkt = self.apply_dynamics(
                params, z_0_lig, z_0_pkt, t_zeros, ligand["mask"], pocket["mask"])
            log_px_lig, log_px_pkt, log_ph = \
                self.log_pxh_given_z0_without_constants(
                    ligand, z_0_lig, eps_0_lig, net_0_lig,
                    pocket, z_0_pkt, eps_0_pkt, net_0_pkt, gamma_0)
            loss_0_x_lig = -log_px_lig
            loss_0_x_pkt = -log_px_pkt
            loss_0_h = -log_ph

        log_pn = self.size_distribution.log_prob(ligand["size"], pocket["size"])

        info = {
            "eps_hat_lig_x": jnp.mean(masked_mean(
                jnp.abs(net_lig[..., :nd]).mean(-1, keepdims=True),
                ligand["mask"])),
            "eps_hat_lig_h": jnp.mean(masked_mean(
                jnp.abs(net_lig[..., nd:]).mean(-1, keepdims=True),
                ligand["mask"])),
            "eps_hat_pocket_x": jnp.mean(masked_mean(
                jnp.abs(net_pkt[..., :nd]).mean(-1, keepdims=True),
                pocket["mask"])),
            "eps_hat_pocket_h": jnp.mean(masked_mean(
                jnp.abs(net_pkt[..., nd:]).mean(-1, keepdims=True),
                pocket["mask"])),
        }
        return dict(
            delta_log_px=delta_log_px,
            error_t_lig=error_t_lig, error_t_pocket=error_t_pkt,
            SNR_weight=snr_weight,
            loss_0_x_ligand=loss_0_x_lig, loss_0_x_pocket=loss_0_x_pkt,
            loss_0_h=loss_0_h, neg_log_constants=neg_log_constants,
            kl_prior=kl_prior, log_pN=log_pn, t_int=t_int[:, 0],
            xh_lig_hat=xh_lig_hat, info=info)

    # --------------------------------------------------------------- sampling
    def _denoise_step(self, params, key, z_lig, z_pkt, lig_mask, pkt_mask,
                      s_norm, t_norm):
        """One ancestral step z_t -> z_s for both domains (en_diffusion.py:503-557)."""
        gamma_s = self.gamma(params, s_norm)
        gamma_t = self.gamma(params, t_norm)
        sigma2_tgs, sigma_tgs, alpha_tgs = sched.sigma_and_alpha_t_given_s(
            gamma_t, gamma_s)
        sigma_s = self.sigma(gamma_s)[:, None, :]
        sigma_t = self.sigma(gamma_t)[:, None, :]

        eps_lig, eps_pkt = self.apply_dynamics(
            params, z_lig, z_pkt, t_norm, lig_mask, pkt_mask,
            block_fuse=True)

        coef = (sigma2_tgs / alpha_tgs / sigma_t[:, :, 0])[:, None, :]
        mu_lig = z_lig / alpha_tgs[:, None, :] - coef * eps_lig
        mu_pkt = z_pkt / alpha_tgs[:, None, :] - coef * eps_pkt
        sigma = (sigma_tgs[:, None, :] * sigma_s / sigma_t)

        # split kept (not key used directly) so existing trajectories stay
        # bit-identical; the second half is unused by design
        k1, _ = jax.random.split(key)
        noise_lig, noise_pkt = self.sample_combined_noise(
            k1, {"mask": lig_mask}, {"mask": pkt_mask})
        zs_lig = (mu_lig + sigma * noise_lig) * lig_mask[..., None]
        zs_pkt = (mu_pkt + sigma * noise_pkt) * pkt_mask[..., None]

        nd = self.n_dims
        zx_l, zx_p = self.remove_mean(
            zs_lig[..., :nd], zs_pkt[..., :nd], lig_mask, pkt_mask)
        zs_lig = jnp.concatenate([zx_l * lig_mask[..., None], zs_lig[..., nd:]], -1)
        zs_pkt = jnp.concatenate([zx_p * pkt_mask[..., None], zs_pkt[..., nd:]], -1)
        return zs_lig, zs_pkt

    def _noise_step(self, params, key, z_lig, z_pkt, lig_mask, pkt_mask,
                    gamma_t, gamma_s):
        """One forward jump z_s -> z_t (en_diffusion.py:479-501)."""
        _, sigma_tgs, alpha_tgs = sched.sigma_and_alpha_t_given_s(gamma_t, gamma_s)
        mu_lig = alpha_tgs[:, None, :] * z_lig
        mu_pkt = alpha_tgs[:, None, :] * z_pkt
        noise_lig, noise_pkt = self.sample_combined_noise(
            key, {"mask": lig_mask}, {"mask": pkt_mask})
        zt_lig = (mu_lig + sigma_tgs[:, None, :] * noise_lig) * lig_mask[..., None]
        zt_pkt = (mu_pkt + sigma_tgs[:, None, :] * noise_pkt) * pkt_mask[..., None]
        nd = self.n_dims
        zx_l, zx_p = self.remove_mean(
            zt_lig[..., :nd], zt_pkt[..., :nd], lig_mask, pkt_mask)
        zt_lig = jnp.concatenate([zx_l * lig_mask[..., None], zt_lig[..., nd:]], -1)
        zt_pkt = jnp.concatenate([zx_p * pkt_mask[..., None], zt_pkt[..., nd:]], -1)
        return zt_lig, zt_pkt

    def sample_p_xh_given_z0(self, params, key, z0_lig, z0_pkt, lig_mask, pkt_mask):
        """Final decode step (en_diffusion.py:263-288)."""
        B = z0_lig.shape[0]
        nd = self.n_dims
        t_zeros = jnp.zeros((B, 1))
        gamma_0 = self.gamma(params, t_zeros)
        sigma_x = self.snr(-0.5 * gamma_0)[:, None, :]
        net_lig, net_pkt = self.apply_dynamics(
            params, z0_lig, z0_pkt, t_zeros, lig_mask, pkt_mask,
            block_fuse=True)

        alpha_0 = self.alpha(gamma_0)[:, None, :]
        sigma_0 = self.sigma(gamma_0)[:, None, :]
        mu_lig = 1.0 / alpha_0 * (z0_lig - sigma_0 * net_lig)
        mu_pkt = 1.0 / alpha_0 * (z0_pkt - sigma_0 * net_pkt)

        noise_lig, noise_pkt = self.sample_combined_noise(
            key, {"mask": lig_mask}, {"mask": pkt_mask})
        xh_lig = (mu_lig + sigma_x * noise_lig) * lig_mask[..., None]
        xh_pkt = (mu_pkt + sigma_x * noise_pkt) * pkt_mask[..., None]

        x_lig, h_lig = self.unnormalize(xh_lig[..., :nd], z0_lig[..., nd:])
        x_pkt, h_pkt = self.unnormalize(xh_pkt[..., :nd], z0_pkt[..., nd:])
        h_lig = jax.nn.one_hot(jnp.argmax(h_lig, -1), self.atom_nf) * lig_mask[..., None]
        h_pkt = jax.nn.one_hot(jnp.argmax(h_pkt, -1), self.residue_nf) * pkt_mask[..., None]
        return x_lig, h_lig, x_pkt, h_pkt

    @partial(jax.jit, static_argnums=(0,), static_argnames=("timesteps",))
    def sample(self, params, rng, masks, timesteps: Optional[int] = None):
        """Unconditional joint generation; masks = (lig_mask, pocket_mask).

        The T-step reverse chain is one lax.scan (reference loop:
        en_diffusion.py:580-651).
        """
        timesteps = self.T if timesteps is None else timesteps
        lig_mask, pkt_mask = masks
        B, NL = lig_mask.shape
        NP = pkt_mask.shape[1]
        nd = self.n_dims

        k_init, k_scan, k_final = jax.random.split(rng, 3)
        z_lig, z_pkt = self.sample_combined_noise(
            k_init, {"mask": lig_mask}, {"mask": pkt_mask})

        def step(carry, s):
            z_lig, z_pkt = carry
            key = jax.random.fold_in(k_scan, s)
            s_arr = jnp.full((B, 1), s, jnp.float32) / timesteps
            t_arr = jnp.full((B, 1), s + 1, jnp.float32) / timesteps
            z_lig, z_pkt = self._denoise_step(
                params, key, z_lig, z_pkt, lig_mask, pkt_mask, s_arr, t_arr)
            return (z_lig, z_pkt), None

        (z_lig, z_pkt), _ = jax.lax.scan(
            step, (z_lig, z_pkt), jnp.arange(timesteps - 1, -1, -1))

        x_lig, h_lig, x_pkt, h_pkt = self.sample_p_xh_given_z0(
            params, k_final, z_lig, z_pkt, lig_mask, pkt_mask)

        # unconditional CoG re-projection (reference projects on drift > 5e-2,
        # en_diffusion.py:637-644; projecting always is idempotent)
        x_lig, x_pkt = self.remove_mean(x_lig, x_pkt, lig_mask, pkt_mask)
        x_lig = x_lig * lig_mask[..., None]
        x_pkt = x_pkt * pkt_mask[..., None]
        return (jnp.concatenate([x_lig, h_lig], -1),
                jnp.concatenate([x_pkt, h_pkt], -1))

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("n_steps", "timesteps"))
    def _denoise_segment(self, params, rng, z_lig, z_pkt, lig_mask, pkt_mask,
                         s_start, n_steps: int, timesteps: int):
        """n_steps consecutive joint reverse steps starting at s = s_start
        (descending); used by the segmented sampler."""
        B = lig_mask.shape[0]

        def step(carry, k):
            z_lig, z_pkt = carry
            sv = s_start - k
            key = jax.random.fold_in(rng, sv)
            s_arr = jnp.full((B, 1), sv, jnp.float32) / timesteps
            t_arr = (jnp.full((B, 1), sv, jnp.float32) + 1) / timesteps
            z_lig, z_pkt = self._denoise_step(
                params, key, z_lig, z_pkt, lig_mask, pkt_mask, s_arr, t_arr)
            return (z_lig, z_pkt), None

        (z_lig, z_pkt), _ = jax.lax.scan(
            step, (z_lig, z_pkt), jnp.arange(n_steps))
        return z_lig, z_pkt

    def sample_segmented(self, params, rng, masks,
                         timesteps: Optional[int] = None, segment: int = 100):
        """Same chain as ``sample`` but dispatched in ``segment``-step jitted
        chunks (identical trajectory: per-step keys are folded from the scan
        key) — keeps every device execution short where a single monolithic
        T-step dispatch would trip execution watchdogs."""
        timesteps = self.T if timesteps is None else timesteps
        lig_mask, pkt_mask = masks

        k_init, k_scan, k_final = jax.random.split(rng, 3)
        z_lig, z_pkt = self.sample_combined_noise(
            k_init, {"mask": lig_mask}, {"mask": pkt_mask})

        s = timesteps - 1
        while s >= 0:
            n = min(segment, s + 1)
            z_lig, z_pkt = self._denoise_segment(
                params, k_scan, z_lig, z_pkt, lig_mask, pkt_mask,
                jnp.asarray(s, jnp.float32), n_steps=n, timesteps=timesteps)
            s -= n

        x_lig, h_lig, x_pkt, h_pkt = self.sample_p_xh_given_z0(
            params, k_final, z_lig, z_pkt, lig_mask, pkt_mask)
        x_lig, x_pkt = self.remove_mean(x_lig, x_pkt, lig_mask, pkt_mask)
        x_lig = x_lig * lig_mask[..., None]
        x_pkt = x_pkt * pkt_mask[..., None]
        return (jnp.concatenate([x_lig, h_lig], -1),
                jnp.concatenate([x_pkt, h_pkt], -1))

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("timesteps", "return_frames"))
    def sample_chain(self, params, rng, masks, timesteps: Optional[int] = None,
                     return_frames: int = 1):
        """Like ``sample`` but also returns ``return_frames`` intermediate
        states (unnormalized) for trajectory visualization
        (en_diffusion.py:606-626 frame saving)."""
        timesteps = self.T if timesteps is None else timesteps
        assert 0 < return_frames <= timesteps
        assert timesteps % return_frames == 0
        lig_mask, pkt_mask = masks
        B = lig_mask.shape[0]

        k_init, k_scan, k_final = jax.random.split(rng, 3)
        z_lig, z_pkt = self.sample_combined_noise(
            k_init, {"mask": lig_mask}, {"mask": pkt_mask})

        stride = timesteps // return_frames

        def step(carry, s):
            z_lig, z_pkt = carry
            key = jax.random.fold_in(k_scan, s)
            s_arr = jnp.full((B, 1), s, jnp.float32) / timesteps
            t_arr = jnp.full((B, 1), s + 1, jnp.float32) / timesteps
            z_lig, z_pkt = self._denoise_step(
                params, key, z_lig, z_pkt, lig_mask, pkt_mask, s_arr, t_arr)
            return (z_lig, z_pkt), (self.unnormalize_z(z_lig),
                                    self.unnormalize_z(z_pkt))

        (z_lig, z_pkt), (frames_lig, frames_pkt) = jax.lax.scan(
            step, (z_lig, z_pkt), jnp.arange(timesteps - 1, -1, -1))

        x_lig, h_lig, x_pkt, h_pkt = self.sample_p_xh_given_z0(
            params, k_final, z_lig, z_pkt, lig_mask, pkt_mask)
        x_lig, x_pkt = self.remove_mean(x_lig, x_pkt, lig_mask, pkt_mask)
        final_lig = jnp.concatenate([x_lig * lig_mask[..., None], h_lig], -1)
        final_pkt = jnp.concatenate([x_pkt * pkt_mask[..., None], h_pkt], -1)

        frames_lig = frames_lig[stride - 1::stride].at[-1].set(final_lig)
        frames_pkt = frames_pkt[stride - 1::stride].at[-1].set(final_pkt)
        return frames_lig, frames_pkt

    @staticmethod
    def get_repaint_schedule(resamplings: int, jump_length: int, timesteps: int):
        """Segment lengths for the RePaint jump schedule (en_diffusion.py:653-674)."""
        schedule = []
        curr_t = 0
        while curr_t < timesteps:
            if curr_t + jump_length < timesteps:
                if len(schedule) > 0:
                    schedule[-1] += jump_length
                    schedule.extend([jump_length] * (resamplings - 1))
                else:
                    schedule.extend([jump_length] * resamplings)
                curr_t += jump_length
            else:
                residual = timesteps - curr_t
                if len(schedule) > 0:
                    schedule[-1] += residual
                else:
                    schedule.append(residual)
                curr_t += residual
        return list(reversed(schedule))

    def _repaint_plan(self, resamplings, jump_length, timesteps):
        """Flatten the jump schedule into per-iteration (s, jump_flag) arrays."""
        schedule = self.get_repaint_schedule(resamplings, jump_length, timesteps)
        s_list, jump_list = [], []
        s = timesteps - 1
        for i, n_steps in enumerate(schedule):
            for j in range(n_steps):
                s_list.append(s)
                do_jump = (j == n_steps - 1) and (i < len(schedule) - 1)
                jump_list.append(jump_length if do_jump else 0)
                if do_jump:
                    s += jump_length
                s -= 1
        return np.asarray(s_list, np.int32), np.asarray(jump_list, np.int32)

    @partial(jax.jit, static_argnums=(0,))
    def _joint_inpaint_prep(self, rng, ligand: Batch, pocket: Batch,
                            lig_fixed: Array, pocket_fixed: Array):
        """Normalize, center on the known-part CoM, and draw the prior —
        shared by the monolithic and segmented inpaint drivers."""
        ligand, pocket = self.normalize(ligand, pocket)
        nd = self.n_dims
        m_l, m_p = ligand["mask"], pocket["mask"]

        xh0_lig = _xh(ligand)
        xh0_pkt = _xh(pocket)

        # center on the CoM of the known parts
        fixed_l = lig_fixed * m_l
        fixed_p = pocket_fixed * m_p
        total = (masked_sum(ligand["x"], fixed_l) + masked_sum(pocket["x"], fixed_p))
        count = jnp.sum(fixed_l, 1) + jnp.sum(fixed_p, 1)
        mean_known = total / jnp.maximum(count, 1e-12)[:, None]
        xh0_lig = xh0_lig.at[..., :nd].add(-mean_known[:, None, :] * m_l[..., None])
        xh0_pkt = xh0_pkt.at[..., :nd].add(-mean_known[:, None, :] * m_p[..., None])

        k_init, k_scan, k_final = jax.random.split(rng, 3)
        z_lig, z_pkt = self.sample_combined_noise(
            k_init, {"mask": m_l}, {"mask": m_p})
        ctx = dict(ligand=ligand, pocket=pocket, xh0_lig=xh0_lig,
                   xh0_pkt=xh0_pkt, lig_fixed=lig_fixed,
                   pocket_fixed=pocket_fixed, fixed_l=fixed_l,
                   fixed_p=fixed_p, count=count)
        return ctx, z_lig, z_pkt, k_scan, k_final

    def _joint_repaint_body(self, params, k_scan, ctx, timesteps: int,
                            z_lig, z_pkt, s, jump, it):
        """One RePaint iteration at level ``s`` (en_diffusion.py:690-760)."""
        nd = self.n_dims
        ligand, pocket = ctx["ligand"], ctx["pocket"]
        m_l, m_p = ligand["mask"], pocket["mask"]
        lig_fixed, pocket_fixed = ctx["lig_fixed"], ctx["pocket_fixed"]
        fixed_l, fixed_p, count = ctx["fixed_l"], ctx["fixed_p"], ctx["count"]
        B = m_l.shape[0]

        def fixed_com(zl, zp):
            tot = masked_sum(zl[..., :nd], fixed_l) + masked_sum(zp[..., :nd], fixed_p)
            return tot / jnp.maximum(count, 1e-12)[:, None]

        # fold in the flat iteration index: with resamplings > 1 the same
        # (s, jump) pair recurs across resampling rounds and must not
        # reuse a PRNG key
        key = jax.random.fold_in(k_scan, it)
        k1, k2, k3 = jax.random.split(key, 3)
        s_norm = jnp.full((B, 1), s, jnp.float32) / timesteps
        t_norm = (jnp.full((B, 1), s, jnp.float32) + 1) / timesteps
        gamma_s = self.gamma(params, s_norm)

        # known part re-noised to level s
        zk_lig, zk_pkt, _, _ = self.noised_representation(
            k1, ctx["xh0_lig"], ctx["xh0_pkt"], ligand, pocket, gamma_s)
        # unknown part denoised one step
        zu_lig, zu_pkt = self._denoise_step(
            params, k2, z_lig, z_pkt, m_l, m_p, s_norm, t_norm)

        # align the CoM of the fixed nodes before combining
        delta = fixed_com(zu_lig, zu_pkt) - fixed_com(zk_lig, zk_pkt)
        zk_lig = zk_lig.at[..., :nd].add(delta[:, None, :] * m_l[..., None])
        zk_pkt = zk_pkt.at[..., :nd].add(delta[:, None, :] * m_p[..., None])

        z_lig = zk_lig * lig_fixed[..., None] + zu_lig * (1 - lig_fixed[..., None])
        z_pkt = zk_pkt * pocket_fixed[..., None] + zu_pkt * (1 - pocket_fixed[..., None])
        z_lig = z_lig * m_l[..., None]
        z_pkt = z_pkt * m_p[..., None]

        def jump_back(args):
            zl, zp = args
            t_jump = (jnp.full((B, 1), s, jnp.float32) + jump) / timesteps
            gamma_t = self.gamma(params, t_jump)
            return self._noise_step(params, k3, zl, zp, m_l, m_p,
                                    gamma_t, gamma_s)

        return jax.lax.cond(jump > 0, jump_back, lambda a: a, (z_lig, z_pkt))

    @partial(jax.jit, static_argnums=(0,))
    def _joint_inpaint_decode(self, params, k_final, ctx, z_lig, z_pkt):
        m_l = ctx["ligand"]["mask"]
        m_p = ctx["pocket"]["mask"]
        x_lig, h_lig, x_pkt, h_pkt = self.sample_p_xh_given_z0(
            params, k_final, z_lig, z_pkt, m_l, m_p)
        x_lig, x_pkt = self.remove_mean(x_lig, x_pkt, m_l, m_p)
        x_lig = x_lig * m_l[..., None]
        x_pkt = x_pkt * m_p[..., None]
        return (jnp.concatenate([x_lig, h_lig], -1),
                jnp.concatenate([x_pkt, h_pkt], -1))

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("resamplings", "jump_length", "timesteps"))
    def inpaint(self, params, rng, ligand: Batch, pocket: Batch,
                lig_fixed: Array, pocket_fixed: Array,
                resamplings: int = 1, jump_length: int = 1,
                timesteps: Optional[int] = None):
        """RePaint-style joint inpainting (en_diffusion.py:676-837).

        ``lig_fixed``/``pocket_fixed`` are (B, N) {0,1} masks of clamped nodes.
        """
        timesteps = self.T if timesteps is None else timesteps
        ctx, z_lig, z_pkt, k_scan, k_final = self._joint_inpaint_prep(
            rng, ligand, pocket, lig_fixed, pocket_fixed)

        s_arr_np, jump_np = self._repaint_plan(resamplings, jump_length, timesteps)

        def step(carry, inp):
            s, jump, it = inp
            carry = self._joint_repaint_body(
                params, k_scan, ctx, timesteps, *carry, s, jump, it)
            return carry, None

        (z_lig, z_pkt), _ = jax.lax.scan(
            step, (z_lig, z_pkt),
            (jnp.asarray(s_arr_np), jnp.asarray(jump_np),
             jnp.arange(len(s_arr_np), dtype=jnp.int32)))

        return self._joint_inpaint_decode(params, k_final, ctx, z_lig, z_pkt)

    @partial(jax.jit, static_argnums=(0,), static_argnames=("timesteps",))
    def _joint_inpaint_segment(self, params, k_scan, ctx, z_lig, z_pkt,
                               s_arr, jump_arr, it_arr, timesteps: int):
        def step(carry, inp):
            s, jump, it = inp
            carry = self._joint_repaint_body(
                params, k_scan, ctx, timesteps, *carry, s, jump, it)
            return carry, None

        (z_lig, z_pkt), _ = jax.lax.scan(
            step, (z_lig, z_pkt), (s_arr, jump_arr, it_arr))
        return z_lig, z_pkt

    def inpaint_segmented(self, params, rng, ligand: Batch, pocket: Batch,
                          lig_fixed: Array, pocket_fixed: Array,
                          resamplings: int = 1, jump_length: int = 1,
                          timesteps: Optional[int] = None,
                          segment: int = 100, shared_pocket: bool = False):
        """``inpaint`` dispatched in ``segment``-iteration jitted chunks.

        ``shared_pocket`` is accepted for call-site symmetry with the
        conditional model but ignored: the joint model diffuses the pocket,
        so its features are never batch-invariant.

        Bit-identical trajectory (same scan key, same per-iteration fold-in)
        with host round-trips only between chunks, so a T=500 x R=20 RePaint
        run never exceeds a device-execution watchdog (see
        sample_given_pocket_segmented)."""
        timesteps = self.T if timesteps is None else timesteps
        ctx, z_lig, z_pkt, k_scan, k_final = self._joint_inpaint_prep(
            rng, ligand, pocket, lig_fixed, pocket_fixed)
        s_arr_np, jump_np = self._repaint_plan(resamplings, jump_length,
                                               timesteps)
        n_total = len(s_arr_np)
        it0 = 0
        while it0 < n_total:
            n = min(segment, n_total - it0)
            z_lig, z_pkt = self._joint_inpaint_segment(
                params, k_scan, ctx, z_lig, z_pkt,
                jnp.asarray(s_arr_np[it0:it0 + n]),
                jnp.asarray(jump_np[it0:it0 + n]),
                jnp.arange(it0, it0 + n, dtype=jnp.int32),
                timesteps=timesteps)
            it0 += n
        return self._joint_inpaint_decode(params, k_final, ctx, z_lig, z_pkt)


class ConditionalDDPM(DDPMBase):
    """Pocket-conditional model: only the ligand diffuses; the pocket is fixed
    context whose coordinates translate with the ligand-CoM-free frame
    (reference ConditionalDDPM, conditional_model.py:12-696)."""

    update_pocket_coords = False

    @staticmethod
    def remove_mean(x_lig, x_pkt, m_l, m_p):
        return com.remove_mean_conditional(x_lig, x_pkt, m_l, m_p)

    def sample_normal_zero_com(self, key, mu_lig, xh_pkt, sigma, m_l, m_p):
        """Sample ligand normal and re-project to the ligand-CoM-free frame
        (conditional_model.py:140-160)."""
        B, NL = m_l.shape
        eps = self.sample_gaussian(key, (B, NL, self.n_dims + self.atom_nf), m_l)
        out_lig = (mu_lig + sigma * eps) * m_l[..., None]
        nd = self.n_dims
        x_l, x_p = self.remove_mean(out_lig[..., :nd], xh_pkt[..., :nd], m_l, m_p)
        out_lig = jnp.concatenate([x_l * m_l[..., None], out_lig[..., nd:]], -1)
        xh_pkt = jnp.concatenate([x_p * m_p[..., None], xh_pkt[..., nd:]], -1)
        return out_lig, xh_pkt

    def noised_representation(self, key, xh_lig, xh_pkt, m_l, m_p, gamma_t):
        """q(z_t | x) for the ligand only (conditional_model.py:162-183)."""
        alpha_t = self.alpha(gamma_t)[:, None, :]
        sigma_t = self.sigma(gamma_t)[:, None, :]
        B, NL = m_l.shape
        eps = self.sample_gaussian(key, (B, NL, self.n_dims + self.atom_nf), m_l)
        z_lig = (alpha_t * xh_lig + sigma_t * eps) * m_l[..., None]
        nd = self.n_dims
        x_l, x_p = self.remove_mean(z_lig[..., :nd], xh_pkt[..., :nd], m_l, m_p)
        z_lig = jnp.concatenate([x_l * m_l[..., None], z_lig[..., nd:]], -1)
        xh_pkt = jnp.concatenate([x_p * m_p[..., None], xh_pkt[..., nd:]], -1)
        return z_lig, xh_pkt, eps

    def kl_prior(self, params, xh_lig, lig: Batch) -> Array:
        """Ligand-only KL(q(z_T|x) || N(0,1)) (conditional_model.py:20-56)."""
        B = xh_lig.shape[0]
        gamma_T = self.gamma(params, jnp.ones((B, 1)))
        alpha_T = self.alpha(gamma_T)[:, None, :]
        mu = alpha_T * xh_lig
        sigma_T = self.sigma(gamma_T)[:, 0]
        nd = self.n_dims
        ones = jnp.ones_like(sigma_T)
        mu_norm2_h = sum_except_batch(mu[..., nd:] ** 2, lig["mask"])
        kl_h = self.gaussian_kl(mu_norm2_h, sigma_T, ones, d=1.0)
        mu_norm2_x = sum_except_batch(mu[..., :nd] ** 2, lig["mask"])
        d_x = self.subspace_dimensionality(lig["size"])
        kl_x = self.gaussian_kl(mu_norm2_x, sigma_T, ones, d_x)
        return kl_x + kl_h

    def log_pxh_given_z0_without_constants(self, ligand: Batch, z0_lig,
                                           eps_lig, net_lig, gamma_0,
                                           epsilon=1e-10):
        nd = self.n_dims
        sigma_0 = self.sigma(gamma_0)
        sigma_0_cat = sigma_0 * self.norm_values[1]
        sq_err = (eps_lig[..., :nd] - net_lig[..., :nd]) ** 2
        if self.vnode_idx is not None:
            # virtual-node coordinates do not contribute (conditional_model.py:76-78)
            is_virtual = ligand["one_hot"][..., self.vnode_idx] > 0
            sq_err = sq_err * (1.0 - is_virtual[..., None].astype(sq_err.dtype))
        log_px = -0.5 * sum_except_batch(sq_err, ligand["mask"])
        log_ph = self._log_ph_cat(ligand["one_hot"], z0_lig[..., nd:],
                                  sigma_0_cat, ligand["mask"], epsilon)
        return log_px, log_ph

    def loss_terms(self, params, rng, ligand: Batch, pocket: Batch,
                   training: bool) -> Dict[str, Any]:
        """Mirrors ConditionalDDPM.forward (conditional_model.py:202-330)."""
        ligand, pocket = self.normalize(ligand, pocket)
        B = ligand["x"].shape[0]
        nd = self.n_dims
        m_l, m_p = ligand["mask"], pocket["mask"]

        delta_log_px = self.delta_log_px(ligand["size"])

        k_t, k_noise, k_noise0 = jax.random.split(rng, 3)
        lowest_t = 0 if training else 1
        t_int = jax.random.randint(k_t, (B, 1), lowest_t, self.T + 1).astype(jnp.float32)
        s_int = t_int - 1
        t_is_zero = (t_int == 0).astype(jnp.float32)
        t_is_not_zero = 1.0 - t_is_zero
        s = s_int / self.T
        t = t_int / self.T
        gamma_s = self.gamma(params, s)
        gamma_t = self.gamma(params, t)

        xh0_lig = _xh(ligand)
        xh0_pkt = _xh(pocket)
        # center input on the ligand CoM (conditional_model.py:242-245)
        x_l, x_p = self.remove_mean(xh0_lig[..., :nd], xh0_pkt[..., :nd], m_l, m_p)
        xh0_lig = jnp.concatenate([x_l * m_l[..., None], xh0_lig[..., nd:]], -1)
        xh0_pkt = jnp.concatenate([x_p * m_p[..., None], xh0_pkt[..., nd:]], -1)

        z_t_lig, xh_pkt, eps_lig = self.noised_representation(
            k_noise, xh0_lig, xh0_pkt, m_l, m_p, gamma_t)
        # zero_nan in training: see JointDDPM.loss_terms
        net_lig, _ = self.apply_dynamics(params, z_t_lig, xh_pkt, t, m_l, m_p,
                                         zero_nan=training)

        xh_lig_hat = self.xh_given_zt_and_epsilon(z_t_lig, net_lig, gamma_t, m_l)

        sq_err = (eps_lig - net_lig) ** 2
        if self.vnode_idx is not None:
            is_virtual = (ligand["one_hot"][..., self.vnode_idx] > 0)
            coord_scale = 1.0 - is_virtual[..., None].astype(sq_err.dtype)
            sq_err = jnp.concatenate(
                [sq_err[..., :nd] * coord_scale, sq_err[..., nd:]], axis=-1)
        error_t_lig = sum_except_batch(sq_err, m_l)

        snr_weight = (1 - self.snr(gamma_s - gamma_t))[:, 0]
        neg_log_constants = -self.log_constants_p_x_given_z0(params, ligand["size"], B)
        kl_prior = self.kl_prior(params, xh0_lig, ligand)

        if training:
            log_px, log_ph = self.log_pxh_given_z0_without_constants(
                ligand, z_t_lig, eps_lig, net_lig, gamma_t)
            loss_0_x_lig = -log_px * t_is_zero[:, 0]
            loss_0_h = -log_ph * t_is_zero[:, 0]
            error_t_lig = error_t_lig * t_is_not_zero[:, 0]
        else:
            t_zeros = jnp.zeros_like(s)
            gamma_0 = self.gamma(params, t_zeros)
            z_0_lig, xh_pkt0, eps_0 = self.noised_representation(
                k_noise0, xh0_lig, xh0_pkt, m_l, m_p, gamma_0)
            net_0, _ = self.apply_dynamics(params, z_0_lig, xh_pkt0, t_zeros, m_l, m_p)
            log_px, log_ph = self.log_pxh_given_z0_without_constants(
                ligand, z_0_lig, eps_0, net_0, gamma_0)
            loss_0_x_lig = -log_px
            loss_0_h = -log_ph

        log_pn = self.size_distribution.log_prob_n1_given_n2(
            ligand["size"], pocket["size"])

        info = {
            "eps_hat_lig_x": jnp.mean(masked_mean(
                jnp.abs(net_lig[..., :nd]).mean(-1, keepdims=True), m_l)),
            "eps_hat_lig_h": jnp.mean(masked_mean(
                jnp.abs(net_lig[..., nd:]).mean(-1, keepdims=True), m_l)),
        }
        zero = jnp.zeros_like(error_t_lig)
        return dict(
            delta_log_px=delta_log_px,
            error_t_lig=error_t_lig, error_t_pocket=zero,
            SNR_weight=snr_weight,
            loss_0_x_ligand=loss_0_x_lig, loss_0_x_pocket=zero,
            loss_0_h=loss_0_h, neg_log_constants=neg_log_constants,
            kl_prior=kl_prior, log_pN=log_pn, t_int=t_int[:, 0],
            xh_lig_hat=xh_lig_hat, info=info)

    # --------------------------------------------------------------- sampling
    def _denoise_step(self, params, key, z_lig, xh_pkt, m_l, m_p, s_norm,
                      t_norm, shared_pocket: bool = False):
        """One ligand ancestral step (conditional_model.py:432-464).

        ``shared_pocket=True`` enables the batch-invariant pocket
        factorization in the first GCL — valid only when one pocket is
        replicated across the batch (the generate_ligands/test-set sampling
        layout, lightning_modules.py:797 ``repeats=n_samples``)."""
        gamma_s = self.gamma(params, s_norm)
        gamma_t = self.gamma(params, t_norm)
        sigma2_tgs, sigma_tgs, alpha_tgs = sched.sigma_and_alpha_t_given_s(
            gamma_t, gamma_s)
        sigma_s = self.sigma(gamma_s)[:, None, :]
        sigma_t = self.sigma(gamma_t)[:, None, :]

        eps_lig, _ = self.apply_dynamics(params, z_lig, xh_pkt, t_norm, m_l,
                                         m_p, shared_pocket=shared_pocket,
                                         block_fuse=True)
        coef = (sigma2_tgs / alpha_tgs / sigma_t[:, :, 0])[:, None, :]
        mu_lig = z_lig / alpha_tgs[:, None, :] - coef * eps_lig
        sigma = sigma_tgs[:, None, :] * sigma_s / sigma_t
        return self.sample_normal_zero_com(key, mu_lig, xh_pkt, sigma, m_l, m_p)

    def _noise_step(self, params, key, zs_lig, xh_pkt, m_l, m_p, gamma_t, gamma_s):
        """One forward step z_s -> z_t (conditional_model.py:420-430)."""
        _, sigma_tgs, alpha_tgs = sched.sigma_and_alpha_t_given_s(gamma_t, gamma_s)
        mu_lig = alpha_tgs[:, None, :] * zs_lig
        return self.sample_normal_zero_com(
            key, mu_lig, xh_pkt, sigma_tgs[:, None, :], m_l, m_p)

    @partial(jax.jit, static_argnums=(0,))
    def sample_p_xh_given_z0(self, params, key, z0_lig, xh_pkt, m_l, m_p):
        """Final decode (conditional_model.py:112-135)."""
        B = z0_lig.shape[0]
        nd = self.n_dims
        t_zeros = jnp.zeros((B, 1))
        gamma_0 = self.gamma(params, t_zeros)
        sigma_x = self.snr(-0.5 * gamma_0)[:, None, :]
        net_lig, _ = self.apply_dynamics(params, z0_lig, xh_pkt, t_zeros,
                                         m_l, m_p, block_fuse=True)
        alpha_0 = self.alpha(gamma_0)[:, None, :]
        sigma_0 = self.sigma(gamma_0)[:, None, :]
        mu_lig = 1.0 / alpha_0 * (z0_lig - sigma_0 * net_lig)
        xh_lig, xh_pkt = self.sample_normal_zero_com(
            key, mu_lig, xh_pkt, sigma_x, m_l, m_p)

        x_lig, h_lig = self.unnormalize(xh_lig[..., :nd], z0_lig[..., nd:])
        x_pkt, h_pkt = self.unnormalize(xh_pkt[..., :nd], xh_pkt[..., nd:])
        h_lig = jax.nn.one_hot(jnp.argmax(h_lig, -1), self.atom_nf) * m_l[..., None]
        return x_lig * m_l[..., None], h_lig, x_pkt * m_p[..., None], h_pkt

    @partial(jax.jit, static_argnums=(0,))
    def _prior_sample(self, key, pocket: Batch, lig_mask):
        """z_T ~ N(pocket CoM, I), re-projected (conditional_model.py:500-508)."""
        B, NL = lig_mask.shape
        mu_x = masked_mean(pocket["x"], pocket["mask"])  # (B, 3)
        mu = jnp.concatenate(
            [jnp.broadcast_to(mu_x[:, None, :], (B, NL, self.n_dims)),
             jnp.zeros((B, NL, self.atom_nf))], axis=-1)
        sigma = jnp.ones((B, 1, 1))
        return self.sample_normal_zero_com(
            key, mu * lig_mask[..., None], _xh(pocket), sigma, lig_mask,
            pocket["mask"])

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("timesteps", "shared_pocket"))
    def sample_given_pocket(self, params, rng, pocket: Batch, lig_mask,
                            timesteps: Optional[int] = None,
                            shared_pocket: bool = False):
        """Pocket-conditional generation as a single on-chip scan
        (reference loop: conditional_model.py:478-555)."""
        timesteps = self.T if timesteps is None else timesteps
        _, pocket = self.normalize(pocket=pocket)
        B = lig_mask.shape[0]
        m_p = pocket["mask"]

        k_init, k_scan, k_final = jax.random.split(rng, 3)
        z_lig, xh_pkt = self._prior_sample(k_init, pocket, lig_mask)

        def step(carry, s):
            z_lig, xh_pkt = carry
            key = jax.random.fold_in(k_scan, s)
            s_arr = jnp.full((B, 1), s, jnp.float32) / timesteps
            t_arr = jnp.full((B, 1), s + 1, jnp.float32) / timesteps
            z_lig, xh_pkt = self._denoise_step(
                params, key, z_lig, xh_pkt, lig_mask, m_p, s_arr, t_arr,
                shared_pocket=shared_pocket)
            return (z_lig, xh_pkt), None

        (z_lig, xh_pkt), _ = jax.lax.scan(
            step, (z_lig, xh_pkt), jnp.arange(timesteps - 1, -1, -1))

        x_lig, h_lig, x_pkt, h_pkt = self.sample_p_xh_given_z0(
            params, k_final, z_lig, xh_pkt, lig_mask, m_p)

        # final CoG re-projection (conditional_model.py:541-547)
        x_lig, x_pkt = self.remove_mean(x_lig, x_pkt, lig_mask, m_p)
        x_lig = x_lig * lig_mask[..., None]
        return (jnp.concatenate([x_lig, h_lig], -1),
                jnp.concatenate([x_pkt, h_pkt], -1))

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("n_steps", "timesteps", "shared_pocket"))
    def _denoise_segment(self, params, rng, z_lig, xh_pkt, lig_mask, pkt_mask,
                         s_start, n_steps: int, timesteps: int,
                         shared_pocket: bool = False):
        """n_steps consecutive reverse steps starting at s = s_start
        (descending).  Used by the segmented sampler."""
        B = lig_mask.shape[0]

        def step(carry, k):
            z_lig, xh_pkt = carry
            sv = s_start - k
            key = jax.random.fold_in(rng, sv)
            s_arr = jnp.full((B, 1), sv, jnp.float32) / timesteps
            t_arr = (jnp.full((B, 1), sv, jnp.float32) + 1) / timesteps
            z_lig, xh_pkt = self._denoise_step(
                params, key, z_lig, xh_pkt, lig_mask, pkt_mask, s_arr, t_arr,
                shared_pocket=shared_pocket)
            return (z_lig, xh_pkt), None

        (z_lig, xh_pkt), _ = jax.lax.scan(
            step, (z_lig, xh_pkt), jnp.arange(n_steps))
        return z_lig, xh_pkt

    def sample_given_pocket_segmented(self, params, rng, pocket: Batch,
                                      lig_mask, timesteps: Optional[int] = None,
                                      segment: int = 100,
                                      shared_pocket: bool = False):
        """Same chain as ``sample_given_pocket`` but dispatched in
        ``segment``-step jitted chunks.  Numerically identical trajectory
        structure (per-step keys are folded from the scan key), with host
        round-trips only every ``segment`` steps — useful where a single
        device dispatch must stay short (execution watchdogs)."""
        timesteps = self.T if timesteps is None else timesteps
        _, pocket = self.normalize(pocket=pocket)
        m_p = pocket["mask"]
        k_init, k_scan, k_final = jax.random.split(rng, 3)
        z_lig, xh_pkt = self._prior_sample(k_init, pocket, lig_mask)

        s = timesteps - 1
        while s >= 0:
            n = min(segment, s + 1)
            z_lig, xh_pkt = self._denoise_segment(
                params, k_scan, z_lig, xh_pkt, lig_mask, m_p,
                jnp.asarray(s, jnp.float32), n_steps=n, timesteps=timesteps,
                shared_pocket=shared_pocket)
            s -= n

        x_lig, h_lig, x_pkt, h_pkt = self.sample_p_xh_given_z0(
            params, k_final, z_lig, xh_pkt, lig_mask, m_p)
        x_lig, x_pkt = self.remove_mean(x_lig, x_pkt, lig_mask, m_p)
        x_lig = x_lig * lig_mask[..., None]
        return (jnp.concatenate([x_lig, h_lig], -1),
                jnp.concatenate([x_pkt, h_pkt], -1))

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("timesteps", "return_frames"))
    def sample_given_pocket_chain(self, params, rng, pocket: Batch, lig_mask,
                                  timesteps: Optional[int] = None,
                                  return_frames: int = 1):
        """``sample_given_pocket`` with intermediate frames
        (conditional_model.py:512-532 frame saving)."""
        timesteps = self.T if timesteps is None else timesteps
        assert 0 < return_frames <= timesteps
        assert timesteps % return_frames == 0
        _, pocket = self.normalize(pocket=pocket)
        B = lig_mask.shape[0]
        m_p = pocket["mask"]

        k_init, k_scan, k_final = jax.random.split(rng, 3)
        z_lig, xh_pkt = self._prior_sample(k_init, pocket, lig_mask)
        stride = timesteps // return_frames

        def step(carry, s):
            z_lig, xh_pkt = carry
            key = jax.random.fold_in(k_scan, s)
            s_arr = jnp.full((B, 1), s, jnp.float32) / timesteps
            t_arr = jnp.full((B, 1), s + 1, jnp.float32) / timesteps
            z_lig, xh_pkt = self._denoise_step(
                params, key, z_lig, xh_pkt, lig_mask, m_p, s_arr, t_arr)
            return (z_lig, xh_pkt), (self.unnormalize_z(z_lig),
                                     self.unnormalize_z(xh_pkt))

        (z_lig, xh_pkt), (frames_lig, frames_pkt) = jax.lax.scan(
            step, (z_lig, xh_pkt), jnp.arange(timesteps - 1, -1, -1))

        x_lig, h_lig, x_pkt, h_pkt = self.sample_p_xh_given_z0(
            params, k_final, z_lig, xh_pkt, lig_mask, m_p)
        final_lig = jnp.concatenate([x_lig, h_lig], -1)
        final_pkt = jnp.concatenate([x_pkt, h_pkt], -1)
        frames_lig = frames_lig[stride - 1::stride].at[-1].set(final_lig)
        frames_pkt = frames_pkt[stride - 1::stride].at[-1].set(final_pkt)
        return frames_lig, frames_pkt

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("noising_steps", "shared_pocket"))
    def diversify(self, params, rng, ligand: Batch, pocket: Batch,
                  noising_steps: int, shared_pocket: bool = False):
        """Partial noising + short reverse chain (conditional_model.py:332-409)."""
        ligand, pocket = self.normalize(ligand, pocket)
        B = ligand["x"].shape[0]
        nd = self.n_dims
        m_l, m_p = ligand["mask"], pocket["mask"]

        k_noise, k_scan, k_final = jax.random.split(rng, 3)

        # partially_noised_ligand (conditional_model.py:332-362)
        t_int = jnp.full((B, 1), noising_steps, jnp.float32)
        gamma_t = self.gamma(params, t_int / self.T)
        xh0_lig = _xh(ligand)
        xh0_pkt = _xh(pocket)
        x_l, x_p = self.remove_mean(xh0_lig[..., :nd], xh0_pkt[..., :nd], m_l, m_p)
        xh0_lig = jnp.concatenate([x_l * m_l[..., None], xh0_lig[..., nd:]], -1)
        xh0_pkt = jnp.concatenate([x_p * m_p[..., None], xh0_pkt[..., nd:]], -1)
        z_lig, xh_pkt, _ = self.noised_representation(
            k_noise, xh0_lig, xh0_pkt, m_l, m_p, gamma_t)

        def step(carry, s):
            z_lig, xh_pkt = carry
            key = jax.random.fold_in(k_scan, s)
            s_arr = jnp.full((B, 1), s, jnp.float32) / self.T
            t_arr = jnp.full((B, 1), s + 1, jnp.float32) / self.T
            z_lig, xh_pkt = self._denoise_step(
                params, key, z_lig, xh_pkt, m_l, m_p, s_arr, t_arr,
                shared_pocket=shared_pocket)
            return (z_lig, xh_pkt), None

        (z_lig, xh_pkt), _ = jax.lax.scan(
            step, (z_lig, xh_pkt), jnp.arange(noising_steps - 1, -1, -1))

        x_lig, h_lig, x_pkt, h_pkt = self.sample_p_xh_given_z0(
            params, k_final, z_lig, xh_pkt, m_l, m_p)
        return (jnp.concatenate([x_lig, h_lig], -1),
                jnp.concatenate([x_pkt, h_pkt], -1))

    @partial(jax.jit, static_argnums=(0,), static_argnames=("center",))
    def _cond_inpaint_prep(self, rng, ligand: Batch, pocket: Batch,
                           lig_fixed: Array, center: str = "ligand"):
        """Normalize, center, and draw the conditional inpainting prior
        (conditional_model.py:589-607); shared by both inpaint drivers."""
        if center not in ("ligand", "pocket"):
            raise NotImplementedError(f"centering option {center}")
        ligand, pocket = self.normalize(ligand, pocket)
        B = ligand["x"].shape[0]
        nd = self.n_dims
        m_l, m_p = ligand["mask"], pocket["mask"]
        lf = lig_fixed * m_l

        xh0_pkt = _xh(pocket)
        com_pocket_0 = masked_mean(pocket["x"], m_p)
        xh0_ligand = _xh(ligand)

        if center == "ligand":
            mean_known = masked_sum(ligand["x"], lf) / jnp.maximum(
                jnp.sum(lf, 1), 1e-12)[:, None]
        else:  # pocket
            mean_known = com_pocket_0

        # prior centered at the known part's CoM
        NL = m_l.shape[1]
        mu = jnp.concatenate(
            [jnp.broadcast_to(mean_known[:, None, :], (B, NL, nd)),
             jnp.zeros((B, NL, self.atom_nf))], axis=-1)
        k_init, k_scan, k_final = jax.random.split(rng, 3)
        z_lig, xh_pkt = self.sample_normal_zero_com(
            k_init, mu * m_l[..., None], xh0_pkt, jnp.ones((B, 1, 1)), m_l, m_p)
        ctx = dict(ligand=ligand, m_p=m_p, lf=lf, lig_fixed=lig_fixed,
                   xh0_ligand=xh0_ligand, com_pocket_0=com_pocket_0)
        return ctx, z_lig, xh_pkt, k_scan, k_final

    def _cond_repaint_body(self, params, k_scan, ctx, timesteps: int,
                           resamplings: int, z_lig, xh_pkt, s, u,
                           shared_pocket: bool = False):
        """One conditional RePaint iteration (conditional_model.py:616-666).

        Returns ((z_lig, xh_pkt), pre) where ``pre`` is the end-of-cycle
        state before the optional re-noise (used for trajectory frames)."""
        nd = self.n_dims
        ligand = ctx["ligand"]
        m_l, m_p = ligand["mask"], ctx["m_p"]
        lf, lig_fixed = ctx["lf"], ctx["lig_fixed"]
        B = m_l.shape[0]

        key = jax.random.fold_in(k_scan, s * resamplings + u)
        k1, k2, k3 = jax.random.split(key, 3)
        s_norm = jnp.full((B, 1), s, jnp.float32) / timesteps
        t_norm = (jnp.full((B, 1), s, jnp.float32) + 1) / timesteps
        gamma_s = self.gamma(params, s_norm)
        gamma_t = self.gamma(params, t_norm)

        # denoise the unknown part
        z_unknown, xh_pkt = self._denoise_step(
            params, k1, z_lig, xh_pkt, m_l, m_p, s_norm, t_norm,
            shared_pocket=shared_pocket)

        # re-noise the known part in the current (translated) pocket frame
        com_pocket = masked_mean(xh_pkt[..., :nd], m_p)
        x_known = ligand["x"] + (com_pocket - ctx["com_pocket_0"])[:, None, :]
        xh_ligand = jnp.concatenate(
            [x_known * m_l[..., None], ctx["xh0_ligand"][..., nd:]], -1)
        z_known, xh_pkt, _ = self.noised_representation(
            k2, xh_ligand, xh_pkt, m_l, m_p, gamma_s)

        # align CoM of the fixed nodes, shifting pocket along
        denom = jnp.maximum(jnp.sum(lf, 1), 1e-12)[:, None]
        com_noised = masked_sum(z_known[..., :nd], lf) / denom
        com_denoised = masked_sum(z_unknown[..., :nd], lf) / denom
        dx = com_denoised - com_noised
        z_known = z_known.at[..., :nd].add(dx[:, None, :] * m_l[..., None])
        xh_pkt = xh_pkt.at[..., :nd].add(dx[:, None, :] * m_p[..., None])

        z_lig = z_known * lig_fixed[..., None] + z_unknown * (1 - lig_fixed[..., None])
        z_lig = z_lig * m_l[..., None]

        def renoise(args):
            zl, xp = args
            return self._noise_step(params, k3, zl, xp, m_l, m_p,
                                    gamma_t, gamma_s)

        pre = (z_lig, xh_pkt)
        z_lig, xh_pkt = jax.lax.cond(
            u < resamplings - 1, renoise, lambda a: a, (z_lig, xh_pkt))
        return (z_lig, xh_pkt), pre

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("timesteps", "resamplings", "shared_pocket"))
    def _cond_inpaint_segment(self, params, k_scan, ctx, z_lig, xh_pkt,
                              s_arr, u_arr, timesteps: int, resamplings: int,
                              shared_pocket: bool = False):
        def step(carry, inp):
            s, u = inp
            carry, _ = self._cond_repaint_body(
                params, k_scan, ctx, timesteps, resamplings, *carry, s, u,
                shared_pocket=shared_pocket)
            return carry, None

        (z_lig, xh_pkt), _ = jax.lax.scan(
            step, (z_lig, xh_pkt), (s_arr, u_arr))
        return z_lig, xh_pkt

    def inpaint_segmented(self, params, rng, ligand: Batch, pocket: Batch,
                          lig_fixed: Array, resamplings: int = 1,
                          timesteps: Optional[int] = None,
                          center: str = "ligand", segment: int = 100,
                          shared_pocket: bool = False):
        """``inpaint`` dispatched in ``segment``-iteration jitted chunks —
        bit-identical trajectory (same per-iteration key fold-in), bounded
        per-dispatch execution time.  Trajectory frames are not collected;
        use the monolithic ``inpaint`` with ``return_frames`` for those."""
        timesteps = self.T if timesteps is None else timesteps
        ctx, z_lig, xh_pkt, k_scan, k_final = self._cond_inpaint_prep(
            rng, ligand, pocket, lig_fixed, center=center)

        s_seq = np.repeat(np.arange(timesteps - 1, -1, -1), resamplings)
        u_seq = np.tile(np.arange(resamplings), timesteps)
        n_total = len(s_seq)
        it0 = 0
        while it0 < n_total:
            n = min(segment, n_total - it0)
            z_lig, xh_pkt = self._cond_inpaint_segment(
                params, k_scan, ctx, z_lig, xh_pkt,
                jnp.asarray(s_seq[it0:it0 + n]),
                jnp.asarray(u_seq[it0:it0 + n]),
                timesteps=timesteps, resamplings=resamplings,
                shared_pocket=shared_pocket)
            it0 += n

        m_l, m_p = ctx["ligand"]["mask"], ctx["m_p"]
        x_lig, h_lig, x_pkt, h_pkt = self.sample_p_xh_given_z0(
            params, k_final, z_lig, xh_pkt, m_l, m_p)  # jitted decode
        return (jnp.concatenate([x_lig, h_lig], -1),
                jnp.concatenate([x_pkt, h_pkt], -1))

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("resamplings", "timesteps", "center",
                              "return_frames"))
    def inpaint(self, params, rng, ligand: Batch, pocket: Batch,
                lig_fixed: Array, resamplings: int = 1,
                timesteps: Optional[int] = None, center: str = "ligand",
                return_frames: int = 1):
        """Conditional RePaint inpainting (conditional_model.py:557-686).

        The (T x resamplings) double loop is flattened into one scan over
        (s, u) pairs; the re-noise step runs under a flag for u < R-1.
        With ``return_frames`` > 1 the unnormalized state at the end of each
        resampling cycle is collected (chronological order, final decode
        last) — the trajectory output behind inpaint.py's --save_traj.
        """
        timesteps = self.T if timesteps is None else timesteps
        assert 0 < return_frames <= timesteps
        assert timesteps % return_frames == 0

        ctx, z_lig, xh_pkt, k_scan, k_final = self._cond_inpaint_prep(
            rng, ligand, pocket, lig_fixed, center=center)
        m_l, m_p = ctx["ligand"]["mask"], ctx["m_p"]

        s_seq = np.repeat(np.arange(timesteps - 1, -1, -1), resamplings)
        u_seq = np.tile(np.arange(resamplings), timesteps)

        def step(carry, inp):
            s, u = inp
            (z_lig, xh_pkt), pre = self._cond_repaint_body(
                params, k_scan, ctx, timesteps, resamplings, *carry, s, u)
            # frame BEFORE the optional re-noise (end-of-cycle state)
            frame = (self.unnormalize_z(pre[0]), self.unnormalize_z(pre[1])) \
                if return_frames > 1 else None
            return (z_lig, xh_pkt), frame

        (z_lig, xh_pkt), frames = jax.lax.scan(
            step, (z_lig, xh_pkt), (jnp.asarray(s_seq), jnp.asarray(u_seq)))

        x_lig, h_lig, x_pkt, h_pkt = self.sample_p_xh_given_z0(
            params, k_final, z_lig, xh_pkt, m_l, m_p)
        final_lig = jnp.concatenate([x_lig, h_lig], -1)
        final_pkt = jnp.concatenate([x_pkt, h_pkt], -1)

        if return_frames > 1:
            # end-of-resampling-cycle states: scan index (i+1)*R - 1 per s
            frames_lig, frames_pkt = frames
            frames_lig = frames_lig[resamplings - 1::resamplings]
            frames_pkt = frames_pkt[resamplings - 1::resamplings]
            stride = timesteps // return_frames
            frames_lig = frames_lig[stride - 1::stride].at[-1].set(final_lig)
            frames_pkt = frames_pkt[stride - 1::stride].at[-1].set(final_pkt)
            return frames_lig, frames_pkt
        return final_lig, final_pkt


class SimpleConditionalDDPM(ConditionalDDPM):
    """Conditional model without the CoM-subspace trick
    (conditional_model.py:702-746): the likelihood lives in the pocket-CoM
    frame and no projection is applied."""

    def subspace_dimensionality(self, input_size):
        return input_size * self.n_dims

    @staticmethod
    def remove_mean(x_lig, x_pkt, m_l, m_p):
        return com.remove_mean_simple(x_lig, x_pkt, m_l, m_p)

    def _center_on_pocket(self, ligand: Optional[Batch], pocket: Batch):
        pocket_com = masked_mean(pocket["x"], pocket["mask"])
        out_p = dict(pocket)
        out_p["x"] = (pocket["x"] - pocket_com[:, None, :]) * pocket["mask"][..., None]
        out_l = None
        if ligand is not None:
            out_l = dict(ligand)
            out_l["x"] = (ligand["x"] - pocket_com[:, None, :]) * ligand["mask"][..., None]
        return out_l, out_p

    def loss_terms(self, params, rng, ligand, pocket, training):
        ligand, pocket = self._center_on_pocket(ligand, pocket)
        return super().loss_terms(params, rng, ligand, pocket, training)

    # Every sampling entrypoint must enter the pocket-CoM frame first: the
    # reference funnels all sampling through one method that centers
    # (conditional_model.py:738-746); here the segmented and chain variants
    # are separate entrypoints and remove_mean_simple is the identity, so a
    # missing centering would leave the prior mean at absolute PDB
    # coordinates (tens of A, amplified ~1/alpha_T through the chain).

    def sample_given_pocket(self, params, rng, pocket, lig_mask,
                            timesteps=None, shared_pocket: bool = False):
        _, pocket = self._center_on_pocket(None, pocket)
        return super().sample_given_pocket(
            params, rng, pocket, lig_mask, timesteps=timesteps,
            shared_pocket=shared_pocket)

    def sample_given_pocket_segmented(self, params, rng, pocket, lig_mask,
                                      timesteps=None, segment: int = 100,
                                      shared_pocket: bool = False):
        _, pocket = self._center_on_pocket(None, pocket)
        return super().sample_given_pocket_segmented(
            params, rng, pocket, lig_mask, timesteps=timesteps,
            segment=segment, shared_pocket=shared_pocket)

    def sample_given_pocket_chain(self, params, rng, pocket, lig_mask,
                                  timesteps=None, return_frames: int = 1):
        _, pocket = self._center_on_pocket(None, pocket)
        return super().sample_given_pocket_chain(
            params, rng, pocket, lig_mask, timesteps=timesteps,
            return_frames=return_frames)

    def diversify(self, params, rng, ligand, pocket, noising_steps,
                  shared_pocket: bool = False):
        # the base's remove_mean is an identity here, so the pocket-CoM
        # frame must be entered explicitly
        ligand, pocket = self._center_on_pocket(ligand, pocket)
        # keyword: noising_steps is static by NAME on the base's jit
        return super().diversify(params, rng, ligand, pocket,
                                 noising_steps=noising_steps,
                                 shared_pocket=shared_pocket)

    # inpaint needs no override: _cond_inpaint_prep centers on the
    # ligand/pocket CoM itself (translation-invariant in its inputs), so
    # the frame is correct for this model class too.
