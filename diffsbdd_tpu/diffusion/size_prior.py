"""Joint (n_ligand, n_pocket) size prior.

Equivalent of the reference ``DistributionNodes`` (en_diffusion.py:958-1028):
a smoothed 2-D histogram over node counts provides the categorical prior
p(N_lig, N_pocket), its marginals and both conditionals.

Sampling is host-side numpy (it decides *shapes*, so it can never live inside
jit); log-probs are exposed both as numpy and as gather-ready jnp tables so the
training loss term log p(N) stays on chip.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class SizeDistribution:
    def __init__(self, histogram):
        # Keep the raw (unsmoothed) histogram so checkpoints can persist it:
        # re-smoothing an already-normalized prob table would add 1e-3 per
        # cell and flatten the prior toward uniform on every save/load cycle.
        self.raw_histogram = np.asarray(histogram, dtype=np.float64)
        histogram = self.raw_histogram + 1e-3
        if histogram.ndim != 2:
            raise ValueError("size histogram must be 2-D: (n_lig+1, n_pocket+1)")
        self.prob = histogram / histogram.sum()
        self.n1_max = histogram.shape[0] - 1
        self.n2_max = histogram.shape[1] - 1

        # log p(n1, n2)
        self.log_prob_table = np.log(self.prob)
        # conditionals p(n1 | n2) (columns) and p(n2 | n1) (rows)
        col_sums = self.prob.sum(axis=0, keepdims=True)
        row_sums = self.prob.sum(axis=1, keepdims=True)
        self.prob_n1_given_n2 = self.prob / col_sums
        self.prob_n2_given_n1 = self.prob / row_sums
        self.log_prob_n1_given_n2_table = np.log(self.prob_n1_given_n2)
        self.log_prob_n2_given_n1_table = np.log(self.prob_n2_given_n1)

        # device-side copies for in-jit log-prob gathers
        self.log_prob_jnp = jnp.asarray(self.log_prob_table, dtype=jnp.float32)
        self.log_prob_n1_given_n2_jnp = jnp.asarray(
            self.log_prob_n1_given_n2_table, dtype=jnp.float32)

        p = self.prob.reshape(-1)
        self.entropy = float(-(p * np.log(p)).sum())

    # ------------------------------------------------------------------ host
    def sample(self, n_samples: int = 1, rng: np.random.Generator | None = None):
        """Sample (n_lig, n_pocket) pairs from the joint prior."""
        rng = rng or np.random.default_rng()
        flat = self.prob.reshape(-1)
        idx = rng.choice(len(flat), size=n_samples, p=flat)
        n1, n2 = np.unravel_index(idx, self.prob.shape)
        return n1.astype(np.int32), n2.astype(np.int32)

    def sample_conditional(self, n1=None, n2=None, rng: np.random.Generator | None = None):
        """Sample n1 ~ p(n1|n2) (or n2 ~ p(n2|n1)); exactly one arg given."""
        if (n1 is None) == (n2 is None):
            raise ValueError("exactly one of n1/n2 must be given")
        rng = rng or np.random.default_rng()
        if n2 is not None:
            cond = np.asarray(n2)
            cond = np.clip(cond, 0, self.n2_max)
            table = self.prob_n1_given_n2
            out = np.array([
                rng.choice(table.shape[0], p=table[:, c]) for c in cond
            ])
        else:
            cond = np.asarray(n1)
            cond = np.clip(cond, 0, self.n1_max)
            table = self.prob_n2_given_n1
            out = np.array([
                rng.choice(table.shape[1], p=table[c, :]) for c in cond
            ])
        return out.astype(np.int32)

    # ---------------------------------------------------------------- device
    def log_prob(self, n1, n2):
        """log p(n1, n2) — jittable gather on padded int arrays."""
        return self.log_prob_jnp[n1, n2]

    def log_prob_n1_given_n2(self, n1, n2):
        """log p(n1 | n2) — jittable gather (conditional model's log pN)."""
        return self.log_prob_n1_given_n2_jnp[n1, n2]
