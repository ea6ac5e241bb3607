"""Misfit functionals (spec north star: L2 trace residual; SURVEY.md §2).

All misfits are plain differentiable JAX: the adjoint source is generated
automatically by AD through the residual (the custom VJP in adjoint.py
receives the seismogram cotangent and injects it at the receivers).
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_misfit(seis: jnp.ndarray, d_obs: jnp.ndarray, weights=None) -> jnp.ndarray:
    """0.5 * ||R p - d||^2, optionally trace-weighted."""
    r = seis - d_obs
    if weights is not None:
        r = r * weights
    return 0.5 * jnp.sum(r * r)


def l2_residual(seis: jnp.ndarray, d_obs: jnp.ndarray) -> jnp.ndarray:
    """The raw residual (adjoint source for the L2 misfit)."""
    return seis - d_obs


def normalized_l2_misfit(seis: jnp.ndarray, d_obs: jnp.ndarray, eps: float = 1e-12):
    """Trace-normalized L2 (robust to source amplitude errors): misfit on
    unit-energy traces [GENRE: Shen 2014-style global correlation]."""
    sn = seis / (jnp.linalg.norm(seis, axis=0, keepdims=True) + eps)
    dn = d_obs / (jnp.linalg.norm(d_obs, axis=0, keepdims=True) + eps)
    return 0.5 * jnp.sum((sn - dn) ** 2)
