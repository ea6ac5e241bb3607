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


def ormsby(f1: float, f2: float, f3: float, f4: float, dt: float, nt: int,
           t0: float | None = None, dtype=jnp.float32):
    """Ormsby wavelet with trapezoidal amplitude spectrum over the corner
    frequencies f1 < f2 < f3 < f4 (Hz) — the standard band-specified
    source for field-data matching (Ryan 1994, CSEG Recorder):

        w(t) = [A4 sinc^2(pi f4 t) - A3 sinc^2(pi f3 t)]
             - [A2 sinc^2(pi f2 t) - A1 sinc^2(pi f1 t)],
        Ak = pi fk^2 / (f_hi - f_lo) of the corresponding pair,

    normalized to unit peak. ``t0`` defaults to 1.5/f2 (quiescent start
    of the low-side ramp)."""
    if not (f1 < f2 < f3 < f4):
        raise ValueError("ormsby needs f1 < f2 < f3 < f4")
    if t0 is None:
        t0 = 1.5 / f2
    t = np.arange(nt) * dt - t0

    def term(fa, fb):
        # (pi fb^2 sinc^2(fb t) - pi fa^2 sinc^2(fa t)) / (fb - fa)
        sa = np.sinc(fa * t)
        sb = np.sinc(fb * t)
        return (np.pi * fb**2 * sb**2 - np.pi * fa**2 * sa**2) / (fb - fa)

    w = term(f3, f4) - term(f1, f2)
    w = w / np.max(np.abs(w))
    return jnp.asarray(w, dtype=dtype)
