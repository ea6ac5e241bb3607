"""Source-wavelet estimation (Pratt 1999-style frequency-domain Wiener
correction).

The seismogram is LINEAR in the source wavelet (the wave equation is
linear and injection is ``c2dt2[src] * w[t]``), so for a fixed model the
synthetic traces are S_r = G_r * w (time convolution with the per-trace
Green's function). The least-squares source correction that maps the
current synthetics onto the observed data is therefore the classic Wiener
filter, closed-form per frequency:

    F(f) = sum_traces conj(S(f)) D(f) / (sum_traces |S(f)|^2 + eps)

and the corrected wavelet is w' = irfft(rfft(w) * F). One forward pass
per estimate; no extra gradient machinery. With band-limited (stage-
filtered) data the filter is only constrained in-band — the eps
regularization (relative to the peak spectral energy) drives it to zero
out-of-band, so the correction must be applied to the SAME band-limited
wavelet the stage uses (the driver does exactly that; see
invert.FwiProblem.stage_objectives(source_est=True)).

All ops are rFFTs and pointwise complex math on (nshot, nt, nrec)
arrays — TPU-resident, differentiable (though the estimate is normally
used inside jax.lax.stop_gradient semantics: it is re-computed per stage,
not differentiated through).
"""

from __future__ import annotations

import jax.numpy as jnp


def source_filter(seis: jnp.ndarray, d_obs: jnp.ndarray,
                  eps_rel: float = 1e-4) -> jnp.ndarray:
    """Closed-form Wiener source-correction spectrum.

    Args:
      seis, d_obs: matching (..., nt, nrec) synthetic/observed gathers
        (any number of leading shot axes); time is axis -2.
      eps_rel: water level relative to the peak of the stacked synthetic
        power spectrum.

    Returns:
      (nt//2 + 1,) complex correction F with the property that
      ``irfft(rfft(trace) * F)`` least-squares-matches d_obs over all
      traces simultaneously.
    """
    S = jnp.fft.rfft(seis, axis=-2)
    D = jnp.fft.rfft(d_obs, axis=-2)
    axes = tuple(i for i in range(S.ndim) if i != S.ndim - 2)
    num = jnp.sum(jnp.conj(S) * D, axis=axes)
    den = jnp.sum(jnp.abs(S) ** 2, axis=axes)
    eps = eps_rel * jnp.max(den)
    return num / (den + eps)


def apply_filter(w: jnp.ndarray, F: jnp.ndarray) -> jnp.ndarray:
    """Apply a correction spectrum to a (nt,) wavelet (zero-phase safe:
    plain spectral product, the filter carries its own phase)."""
    nt = w.shape[0]
    return jnp.fft.irfft(jnp.fft.rfft(w) * F, n=nt).astype(w.dtype)


def estimate_wavelet(seis: jnp.ndarray, d_obs: jnp.ndarray, w: jnp.ndarray,
                     eps_rel: float = 1e-4) -> jnp.ndarray:
    """One-shot estimate: corrected wavelet from current synthetics.

    ``seis`` must have been computed WITH wavelet ``w`` on the current
    model; the return value is the least-squares source for that model.
    """
    return apply_filter(w, source_filter(seis, d_obs, eps_rel))
