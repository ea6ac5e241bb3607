"""Source time functions (spec C1; SURVEY.md §2 `wavelets.py`)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def ricker(f0: float, dt: float, nt: int, t0: float | None = None, dtype=jnp.float32):
    """Ricker wavelet ``(1 - 2 pi^2 f0^2 tau^2) exp(-pi^2 f0^2 tau^2)``.

    Args:
      f0: peak frequency in Hz.
      dt: sample interval in seconds.
      nt: number of samples.
      t0: delay; defaults to ``1.5 / f0`` so the wavelet starts ~quiescent.
    """
    if t0 is None:
        t0 = 1.5 / f0
    t = np.arange(nt) * dt - t0
    arg = (np.pi * f0 * t) ** 2
    w = (1.0 - 2.0 * arg) * np.exp(-arg)
    return jnp.asarray(w, dtype=dtype)


def ricker_np(f0: float, dt: float, nt: int, t0: float | None = None) -> np.ndarray:
    """NumPy float64 twin of :func:`ricker` for the oracle path."""
    if t0 is None:
        t0 = 1.5 / f0
    t = np.arange(nt) * dt - t0
    arg = (np.pi * f0 * t) ** 2
    return (1.0 - 2.0 * arg) * np.exp(-arg)


def gaussian_derivative(f0: float, dt: float, nt: int, t0: float | None = None, dtype=jnp.float32):
    """First-derivative-of-Gaussian wavelet (useful for elastic tests)."""
    if t0 is None:
        t0 = 1.2 / f0
    t = np.arange(nt) * dt - t0
    a = (np.pi * f0) ** 2
    w = -2.0 * a * t * np.exp(-a * t * t)
    w = w / np.max(np.abs(w))
    return jnp.asarray(w, dtype=dtype)
