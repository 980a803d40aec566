"""Noise schedules and the gamma -> (alpha, sigma) algebra.

Semantics match the reference DDPM (see /root/reference/equivariant_diffusion/
en_diffusion.py:865-878 for the alpha/sigma maps and :1105-1190 for the
predefined schedules; the learned monotone schedule is the VDM-style network at
:1031-1102).  Everything here is either a pure numpy table builder (host-side,
executed once at model construction) or a tiny jittable function.

Design: on TPU the schedule is a precomputed fp64->fp32 lookup table living in
device memory; ``gamma(t)`` inside a jitted sampler is a single gather, so the
whole T-step ancestral chain stays on chip.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def cosine_alphas2(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cumulative alpha^2 for the Nichol&Dhariwal cosine schedule.

    Mirrors reference ``cosine_beta_schedule`` (en_diffusion.py:1105-1122):
    betas are clipped at 0.999 and alphas2 rebuilt as a cumprod.
    """
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    betas = np.clip(betas, a_min=0, a_max=0.999)
    alphas = 1.0 - betas
    return np.cumprod(alphas, axis=0)


def clip_noise_schedule(alphas2: np.ndarray, clip_value: float = 0.001) -> np.ndarray:
    """Clip the per-step ratio alpha_t^2/alpha_{t-1}^2 from below.

    Mirrors reference ``clip_noise_schedule`` (en_diffusion.py:1125-1138).
    """
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = np.clip(alphas_step, a_min=clip_value, a_max=1.0)
    return np.cumprod(alphas_step, axis=0)


def polynomial_alphas2(timesteps: int, s: float = 1e-4, power: float = 3.0) -> np.ndarray:
    """alpha^2 schedule (1 - (t/T)^power)^2 with ratio clipping and precision.

    Mirrors reference ``polynomial_schedule`` (en_diffusion.py:1141-1155).
    """
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    return precision * alphas2 + s


def gamma_table(noise_schedule: str, timesteps: int, precision: float) -> np.ndarray:
    """gamma(t) = log(sigma_t^2 / alpha_t^2) lookup table of length T+1.

    Mirrors reference ``PredefinedNoiseSchedule`` (en_diffusion.py:1158-1190).
    ``noise_schedule`` is 'cosine' or 'polynomial_<power>'.
    """
    if noise_schedule == "cosine":
        alphas2 = cosine_alphas2(timesteps)
    elif "polynomial" in noise_schedule:
        splits = noise_schedule.split("_")
        if len(splits) != 2:
            raise ValueError(f"Bad polynomial schedule name: {noise_schedule}")
        power = float(splits[1])
        alphas2 = polynomial_alphas2(timesteps, s=precision, power=power)
    else:
        raise ValueError(noise_schedule)

    sigmas2 = 1 - alphas2
    log_alphas2 = np.log(alphas2)
    log_sigmas2 = np.log(sigmas2)
    # gamma = -(log alpha^2 - log sigma^2)
    return (-(log_alphas2 - log_sigmas2)).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Predefined (non-learned) noise schedule as an on-device lookup table."""

    gammas: jnp.ndarray  # (T+1,)
    timesteps: int

    @classmethod
    def create(cls, noise_schedule: str, timesteps: int, precision: float) -> "NoiseSchedule":
        table = gamma_table(noise_schedule, timesteps, precision)
        return cls(gammas=jnp.asarray(table), timesteps=timesteps)

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        """gamma at normalized time t in [0, 1]; shape-preserving gather."""
        t_int = jnp.round(t * self.timesteps).astype(jnp.int32)
        return self.gammas[t_int]


# ---------------------------------------------------------------------------
# gamma -> alpha/sigma algebra (jittable scalars/arrays)
# ---------------------------------------------------------------------------

def alpha(gamma: jnp.ndarray) -> jnp.ndarray:
    """alpha_t = sqrt(sigmoid(-gamma_t))  (en_diffusion.py:870-873)."""
    return jnp.sqrt(jax.nn.sigmoid(-gamma))


def sigma(gamma: jnp.ndarray) -> jnp.ndarray:
    """sigma_t = sqrt(sigmoid(gamma_t))  (en_diffusion.py:865-868)."""
    return jnp.sqrt(jax.nn.sigmoid(gamma))


def snr(gamma: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio alpha^2/sigma^2 = exp(-gamma)."""
    return jnp.exp(-gamma)


def sigma_and_alpha_t_given_s(gamma_t: jnp.ndarray, gamma_s: jnp.ndarray):
    """Transition coefficients for q(z_t | z_s) with t > s.

    Returns (sigma^2_{t|s}, sigma_{t|s}, alpha_{t|s}); mirrors
    en_diffusion.py:83-107 including the numerically-stable expm1/softplus
    formulation.
    """
    sigma2_t_given_s = -jnp.expm1(jax.nn.softplus(gamma_s) - jax.nn.softplus(gamma_t))
    log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
    log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
    alpha_t_given_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
    sigma_t_given_s = jnp.sqrt(sigma2_t_given_s)
    return sigma2_t_given_s, sigma_t_given_s, alpha_t_given_s


def cdf_standard_gaussian(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2)))


# ---------------------------------------------------------------------------
# Learned monotone schedule (VDM-style GammaNetwork, en_diffusion.py:1031-1102)
# ---------------------------------------------------------------------------

try:  # flax is a baked-in dependency; guard only to keep numpy-only imports light
    import flax.linen as nn

    class PositiveDense(nn.Module):
        """Dense layer with softplus-positive weights (en_diffusion.py:1031-1061)."""

        features: int
        use_bias: bool = True
        weight_init_offset: float = -2.0

        @nn.compact
        def __call__(self, x):
            in_features = x.shape[-1]

            def kernel_init(key, shape, dtype=jnp.float32):
                # torch kaiming_uniform_(a=sqrt(5)) (the reference/nn.Linear
                # default): gain = sqrt(2/(1+5)) = 1/sqrt(3), bound =
                # gain*sqrt(3/fan_in) = 1/sqrt(fan_in); plus the negative
                # offset so softplus(w) starts small.
                bound = 1.0 / math.sqrt(shape[0])
                w = jax.random.uniform(key, shape, dtype, -bound, bound)
                return w + self.weight_init_offset

            kernel = self.param("kernel", kernel_init, (in_features, self.features))
            y = x @ jax.nn.softplus(kernel)
            if self.use_bias:
                bound = 1.0 / math.sqrt(in_features)
                bias = self.param(
                    "bias",
                    lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                    (self.features,),
                )
                y = y + bias
            return y

    class GammaNetwork(nn.Module):
        """Monotonic gamma(t) network normalized to [gamma_0, gamma_1]."""

        @nn.compact
        def __call__(self, t):
            l1 = PositiveDense(1, name="l1")
            l2 = PositiveDense(1024, name="l2")
            l3 = PositiveDense(1, name="l3")
            gamma_0 = self.param("gamma_0", lambda k: jnp.array([-5.0]))
            gamma_1 = self.param("gamma_1", lambda k: jnp.array([10.0]))

            def gamma_tilde(u):
                l1_u = l1(u)
                return l1_u + l3(jax.nn.sigmoid(l2(l1_u)))

            zeros = jnp.zeros_like(t)
            ones = jnp.ones_like(t)
            g0, g1, gt = gamma_tilde(zeros), gamma_tilde(ones), gamma_tilde(t)
            normalized = (gt - g0) / (g1 - g0)
            return gamma_0 + (gamma_1 - gamma_0) * normalized

except ImportError:  # pragma: no cover
    PositiveDense = None
    GammaNetwork = None
