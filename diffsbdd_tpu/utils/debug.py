"""Paranoid-mode invariant checks and NaN detection.

The reference enforces correctness with runtime asserts inside the sampling
loops (``assert_mean_zero_with_mask``, en_diffusion.py:925-930; NaN guards
dynamics.py:155-159).  Python asserts don't fire under jit, so here the same
invariants are exposed two ways:

* host-side ``check_*`` helpers for eager/paranoid runs and tests,
* ``checkify``-wrapped variants that run *inside* jitted code and surface
  errors after the fact (SURVEY.md §5 'race detection / sanitizers').
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from diffsbdd_tpu.geom.com import mean_zero_relative_error


def check_mean_zero(x, mask, tol: float = 1e-2, what: str = "coordinates"):
    """Host-side CoM-free assertion (eager; call outside jit)."""
    err = float(mean_zero_relative_error(x, mask))
    assert err < tol, f"{what}: mean is not zero, relative error {err:.2e}"


def check_finite(tree, what: str = "pytree"):
    """Host-side finiteness assertion over a whole pytree."""
    bad = [p for p, leaf in
           jax.tree_util.tree_flatten_with_path(tree)[0]
           if not bool(jnp.all(jnp.isfinite(leaf)))]
    assert not bad, f"{what}: non-finite values at {[str(b) for b in bad]}"


def checkify_mean_zero(x, mask, tol: float = 1e-2):
    """In-jit CoM check; returns nothing, raises via checkify on error."""
    err = mean_zero_relative_error(x, mask)
    checkify.check(err < tol, "mean is not zero, relative error {err}",
                   err=err)


def checked(fn, *, errors=checkify.float_checks):
    """Wrap a jittable fn so NaN/Inf production raises after execution.

    Usage::

        safe_loss = checked(module.loss_fn)
        err, out = safe_loss(params, rng, ligand, pocket, True)
        err.throw()
    """
    return checkify.checkify(fn, errors=errors)
