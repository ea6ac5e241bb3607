"""Zero-phase low-pass filtering for multiscale frequency continuation.

Spec C3 (BASELINE.json:9); [GENRE: Bunks et al. 1995]. The filter response
is designed host-side with SciPy (Butterworth magnitude-squared => zero
phase) and applied in JAX via rFFT along the time axis, so the op is linear,
differentiable, and TPU-resident. The same filter must be applied to the
observed data and to the source wavelet (SURVEY.md §2 `filters.py`).
"""

from __future__ import annotations

import functools

import jax
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


def lowpass_response(nt: int, dt: float, fmax: float, order: int = 6) -> np.ndarray:
    """Zero-phase response for apply_response() on length-nt signals
    (sampled at the 2*nt padded rFFT frequencies; see apply_response)."""
    return _lowpass_response(2 * nt, float(dt), float(fmax), order)


def apply_response(x: jnp.ndarray, h2, axis: int = 0) -> jnp.ndarray:
    """Apply a precomputed real spectral response as a LINEAR (2x zero-
    padded) convolution along ``axis``; differentiable, TPU-resident.

    ``h2`` must be sampled at ``rfftfreq(2*nt, dt)`` (lowpass_response).
    Padding matters: a circular application wraps the zero-phase filter's
    pre-ring around the trace ends. An all-ones ``h2`` is an exact
    identity.
    """
    nt = x.shape[axis]
    nfft = 2 * nt
    h2 = jnp.asarray(h2, x.dtype)
    shape = [1] * x.ndim
    shape[axis] = h2.shape[0]
    X = jnp.fft.rfft(x, n=nfft, axis=axis)
    X = X * h2.reshape(shape)
    y = jnp.fft.irfft(X, n=nfft, axis=axis).astype(x.dtype)
    return jax.lax.slice_in_dim(y, 0, nt, axis=axis)


def lowpass(x: jnp.ndarray, dt: float, fmax: float, order: int = 6, axis: int = 0):
    """Zero-phase Butterworth low-pass along ``axis`` (default: time).

    Works for wavelets (nt,), seismograms (nt, nrec), and shot gathers
    (nshot, nt, nrec) with the appropriate ``axis``.

    NOTE on multiscale consistency: band-limiting the *source wavelet* is
    NOT equivalent to band-limiting the *seismograms* — the zero-phase
    filter pre-rings (~1.6% of energy before t=0 for an 8 Hz cut on an
    11 Hz Ricker) and the wavelet's pre-ring clips at t=0, a measured 10%
    relative commutator ||lowpass(forward(w)) - forward(lowpass(w))||.
    The stage objectives therefore propagate the FULL-BAND wavelet and
    filter the synthetics inside the misfit (invert.FwiProblem._build:
    J = 0.5 ||H R p - H d||^2 via apply_response), which treats both
    sides of the residual identically by construction.
    """
    nt = x.shape[axis]
    h2 = lowpass_response(nt, float(dt), float(fmax), order)
    return apply_response(x, h2, axis=axis)


def bandpass_response(nt: int, dt: float, fmin: float, fmax: float,
                      order: int = 6) -> np.ndarray:
    """Zero-phase band-pass |H|^2: Butterworth high-pass (1/(1+(fc/f)^2n))
    times the low-pass — for real-data workflows that must also reject
    energy BELOW the source band (swell/ground-roll noise floor).
    Sampled like lowpass_response for apply_response()."""
    n2 = 2 * nt
    f = np.fft.rfftfreq(n2, float(dt))
    lp = 1.0 / (1.0 + (f / float(fmax)) ** (2 * order))
    # overflow-free high-pass form: f^2n / (f^2n + fmin^2n)
    fn = f ** (2 * order)
    hp = fn / (fn + float(fmin) ** (2 * order))
    return lp * hp


def bandpass(x: jnp.ndarray, dt: float, fmin: float, fmax: float,
             order: int = 6, axis: int = 0):
    """Zero-phase Butterworth band-pass along ``axis`` — the lowpass()
    sibling with a high-pass edge at ``fmin`` (same linear-convolution
    application and the same multiscale-consistency caveat)."""
    nt = x.shape[axis]
    h2 = bandpass_response(nt, float(dt), float(fmin), float(fmax), order)
    return apply_response(x, h2, axis=axis)
