"""Shift-and-scale stencil application for the jnp twin kernels.

``apply_stencil`` realises ``out[i] = sum_k taps[k] * f[i + k - r]`` with
zero (Dirichlet) boundary handling, via jnp.pad + static slices — XLA fuses
the shifted adds into a single vectorised loop on TPU/CPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def apply_stencil(f: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """Correlate ``f`` with static ``taps`` (tuple of floats, odd length)
    along ``axis``; zero padding outside."""
    r = len(taps) // 2
    pads = [(0, 0)] * f.ndim
    pads[axis] = (r, r)
    fp = jnp.pad(f, pads)
    n = f.shape[axis]
    out = None
    for k, c in enumerate(taps):
        if c == 0.0:
            continue
        term = c * lax.slice_in_dim(fp, k, k + n, axis=axis)
        out = term if out is None else out + term
    return out


def staggered_diff(f: jnp.ndarray, taps, axis: int, plus: bool) -> jnp.ndarray:
    """Staggered first difference (elastic kernels).

    ``plus=True``:  D+ f at i+1/2:  sum_k taps[k] (f[i+1+k] - f[i-k])
    ``plus=False``: D- f at i:      sum_k taps[k] (f[i+k]   - f[i-1-k])
    Zero padding outside. ``taps`` already includes the 1/h factor or the
    caller divides afterwards.
    """
    r = len(taps)
    pads = [(0, 0)] * f.ndim
    pads[axis] = (r, r)
    fp = jnp.pad(f, pads)
    n = f.shape[axis]
    out = None
    for k, c in enumerate(taps):
        if plus:
            hi = lax.slice_in_dim(fp, r + 1 + k, r + 1 + k + n, axis=axis)
            lo = lax.slice_in_dim(fp, r - k, r - k + n, axis=axis)
        else:
            hi = lax.slice_in_dim(fp, r + k, r + k + n, axis=axis)
            lo = lax.slice_in_dim(fp, r - 1 - k, r - 1 - k + n, axis=axis)
        term = c * (hi - lo)
        out = term if out is None else out + term
    return out


def scaled_taps(coeffs, h: float, power: int = 1):
    """Static tuple of python-float taps scaled by 1/h**power."""
    return tuple(float(c) / float(h) ** power for c in coeffs)
