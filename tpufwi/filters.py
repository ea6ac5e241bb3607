"""Zero-phase low-pass filtering for multiscale frequency continuation.

Spec C3 (BASELINE.json:9); [GENRE: Bunks et al. 1995]. The filter response
is designed host-side with SciPy (Butterworth magnitude-squared => zero
phase) and applied in JAX via rFFT along the time axis, so the op is linear,
differentiable, and TPU-resident. The same filter must be applied to the
observed data and to the source wavelet (SURVEY.md §2 `filters.py`).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _lowpass_response(nt: int, dt: float, fmax: float, order: int) -> np.ndarray:
    """|H(f)|^2 of a Butterworth low-pass sampled at rfft frequencies."""
    f = np.fft.rfftfreq(nt, dt)
    # |H|^2 of an analog Butterworth prototype: 1 / (1 + (f/fc)^(2n));
    # squaring once more makes it the zero-phase (forward-backward) response.
    h2 = 1.0 / (1.0 + (f / fmax) ** (2 * order))
    return h2


def lowpass(x: jnp.ndarray, dt: float, fmax: float, order: int = 6, axis: int = 0):
    """Zero-phase Butterworth low-pass along ``axis`` (default: time).

    Works for wavelets (nt,), seismograms (nt, nrec), and shot gathers
    (nshot, nt, nrec) with the appropriate ``axis``.
    """
    nt = x.shape[axis]
    h2 = jnp.asarray(_lowpass_response(nt, float(dt), float(fmax), order), x.dtype)
    shape = [1] * x.ndim
    shape[axis] = h2.shape[0]
    X = jnp.fft.rfft(x, axis=axis)
    X = X * h2.reshape(shape)
    return jnp.fft.irfft(X, n=nt, axis=axis).astype(x.dtype)
