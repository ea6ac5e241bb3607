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


def normalized_l2_misfit(
    seis: jnp.ndarray, d_obs: jnp.ndarray, weights=None, eps: float = 1e-12
):
    """Trace-normalized L2 (robust to source amplitude errors): misfit on
    unit-energy traces [GENRE: Shen 2014-style global correlation —
    per unit-norm trace 0.5||sn-dn||^2 = 1 - <sn, dn>]."""
    sn = seis / (jnp.linalg.norm(seis, axis=0, keepdims=True) + eps)
    dn = d_obs / (jnp.linalg.norm(d_obs, axis=0, keepdims=True) + eps)
    r = sn - dn
    if weights is not None:
        r = r * weights
    return 0.5 * jnp.sum(r * r)


def envelope(x: jnp.ndarray, axis: int = 0, eps: float = 1e-12) -> jnp.ndarray:
    """Instantaneous-amplitude envelope |x + i H x| via the FFT analytic
    signal [GENRE: Taner 1979]. ``eps`` inside the sqrt keeps the misfit
    differentiable where the envelope vanishes. TPU-resident (fp32 FFT)."""
    n = x.shape[axis]
    X = jnp.fft.fft(x, axis=axis)
    h = jnp.zeros(n, X.real.dtype).at[0].set(1.0)
    if n % 2 == 0:
        h = h.at[n // 2].set(1.0).at[1 : n // 2].set(2.0)
    else:
        h = h.at[1 : (n + 1) // 2].set(2.0)
    shape = [1] * x.ndim
    shape[axis] = n
    a = jnp.fft.ifft(X * h.reshape(shape), axis=axis)
    return jnp.sqrt(a.real**2 + a.imag**2 + eps)


def envelope_misfit(
    seis: jnp.ndarray, d_obs: jnp.ndarray, weights=None, eps: float = 1e-12
):
    """0.5 * ||E(R p) - E(d)||^2 with E the envelope — insensitive to
    constant phase rotations and far less cycle-skip-prone than L2 at low
    frequencies [GENRE: Wu, Luo & Wu 2014]. The adjoint source comes from
    AD through the analytic-signal FFT."""
    r = envelope(seis, axis=0, eps=eps) - envelope(d_obs, axis=0, eps=eps)
    if weights is not None:
        r = r * weights
    return 0.5 * jnp.sum(r * r)


#: Functional registry for config/driver selection (FwiProblem.misfit).
#: Signature: f(seis, d_obs, weights=None) -> scalar.
MISFITS = {
    "l2": l2_misfit,
    "normalized_l2": normalized_l2_misfit,
    "envelope": envelope_misfit,
}
