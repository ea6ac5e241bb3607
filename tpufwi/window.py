"""Trace windowing and muting operators for the misfit layer.

Standard FWI data-preprocessing masks (SURVEY.md §2 `misfit.py` row;
roadmap item: "time-windowing/offset-muting operators in the misfit
layer"). All builders return dense (nt, nrec) float weight masks that
multiply BOTH the synthetic and observed seismograms inside the misfit
(``l2_misfit(..., weights=mask)``), so the masked objective stays a true
least-squares functional and the adjoint source is automatically the
masked residual — no special-casing in the gradient engine.

Masks are built once per stage on the host side of the objective (they
depend only on geometry and config, not on the model), stay resident on
device, and broadcast over the shot axis when all shots share a common
receiver layout; per-shot masks stack to (nshot, nt, nrec).

Everything is plain jnp: tiny O(nt * nrec) arrays, no Pallas needed —
the masks are folded into the residual subtraction by XLA fusion.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _cos_ramp(x):
    """0 -> 1 smoothly on x in [0, 1] (cosine taper); clipped outside."""
    xc = np.clip(x, 0.0, 1.0)
    return 0.5 * (1.0 - np.cos(np.pi * xc))


def time_window(nt: int, dt: float, t0: float, t1: float,
                taper: float = 0.0, dtype=jnp.float32) -> jnp.ndarray:
    """(nt, 1) mask passing t in [t0, t1], cosine-tapered over ``taper`` s.

    Broadcasts over receivers. ``taper=0`` gives a boxcar. Masks are
    static (geometry/config only), so they are built in fp64 NumPy — no
    fp32 time-axis rounding at the window edges — and cast once.
    """
    t = np.arange(nt, dtype=np.float64) * dt
    if taper > 0.0:
        w = _cos_ramp((t - t0) / taper) * _cos_ramp((t1 - t) / taper)
    else:
        w = ((t >= t0) & (t <= t1)).astype(np.float64)
    return jnp.asarray(w[:, None], dtype)


def canonical_nt(nt: int, multiple: int = 128) -> int:
    """Round ``nt`` up to the next multiple of ``multiple``.

    Compile-cost control (docs/ROADMAP.md item 12): the time-loop length
    is baked into every compiled program, so each distinct nt — which
    falls out of `t_max / cfl_dt(c_max)` and therefore varies with every
    model/grid tweak — costs a fresh compile (~10 min for the scanres
    Pallas engine). Snapping nt to a coarse ladder collapses nearby
    configurations onto one program, so the persistent .jax_cache hits
    across runs. 128 bounds the wasted propagation at <20% for nt >= 640
    and shrinks relatively as nt grows.
    """
    if multiple <= 0:
        raise ValueError(f"multiple must be positive, got {multiple}")
    return int(-(-int(nt) // multiple) * multiple)


def pad_time(x: jnp.ndarray, nt_pad: int, axis: int = 0) -> jnp.ndarray:
    """Zero-pad ``x`` along ``axis`` (the time axis) up to ``nt_pad``."""
    n = x.shape[axis]
    if n > nt_pad:
        raise ValueError(f"pad_time: length {n} exceeds target {nt_pad}")
    if n == nt_pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis if axis >= 0 else x.ndim + axis] = (0, nt_pad - n)
    return jnp.pad(x, widths)


def offset_mute(
    nt: int,
    dt: float,
    offsets: jnp.ndarray,
    v_mute: float,
    t_off: float = 0.0,
    taper: float = 0.0,
    mode: str = "below",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(nt, nrec) linear-moveout mute about t_cut(x) = |offset|/v_mute + t_off.

    ``mode="below"`` keeps t > t_cut (top mute: removes the direct/refracted
    arrival cone, the standard early-mute in FWI); ``mode="above"`` keeps
    t < t_cut (bottom mute: removes late coda/multiples). ``taper`` is the
    cosine-ramp width in seconds centred on the cut line.

    Args:
      offsets: (nrec,) source-receiver offsets in metres (may be signed;
        the absolute value is used).
    """
    if mode not in ("below", "above"):
        raise ValueError(f"mode must be 'below' or 'above', got {mode!r}")
    t = np.arange(nt, dtype=np.float64)[:, None] * dt
    t_cut = np.abs(np.asarray(offsets, np.float64))[None, :] / v_mute + t_off
    s = t - t_cut if mode == "below" else t_cut - t
    if taper > 0.0:
        return jnp.asarray(_cos_ramp(s / taper + 0.5), dtype)
    return jnp.asarray(s >= 0.0, dtype)


def offset_range_mask(offsets: jnp.ndarray, min_offset: float = 0.0,
                      max_offset: float = jnp.inf,
                      dtype=jnp.float32) -> jnp.ndarray:
    """(1, nrec) mask keeping |offset| in [min_offset, max_offset]."""
    ao = np.abs(np.asarray(offsets, np.float64))
    return jnp.asarray(
        ((ao >= min_offset) & (ao <= max_offset))[None, :], dtype
    )


def combine(*masks) -> jnp.ndarray:
    """Product of broadcast-compatible masks ((nt,1) x (nt,nrec) x (1,nrec))."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else out * m
    if out is None:
        raise ValueError("combine() needs at least one non-None mask")
    return out


def shot_offsets(geom, h: float = 1.0, axis: int = -1) -> jnp.ndarray:
    """(nrec,) per-receiver offsets from a single-shot Geometry, in
    grid-index units times ``h`` (pass the inline cell size for metres;
    the shared padding offset cancels in the difference).

    Uses the last (inline) coordinate axis by default; for multi-source
    shots the first source is the offset origin (standard for the
    split-spread single-source surveys built by acquisition.py).
    """
    src = jnp.asarray(geom.src_idx)[0, axis]
    return (jnp.asarray(geom.rcv_idx)[:, axis] - src) * h
