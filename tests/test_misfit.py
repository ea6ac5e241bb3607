"""Misfit functionals (misfit.py): envelope correctness (analytic
amplitude, phase-rotation invariance), AD gradient vs finite differences,
registry wiring through FwiProblem, and an FWI sanity run where the
envelope objective decreases like L2 does."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import hilbert

from tpufwi.misfit import (
    MISFITS,
    envelope,
    envelope_misfit,
    l2_misfit,
    normalized_l2_misfit,
)


def _gabor(nt, dt, f0, t0, phase=0.0):
    t = np.arange(nt) * dt - t0
    return np.exp(-(t**2) * (2 * f0) ** 2) * np.cos(2 * np.pi * f0 * t + phase)


def test_envelope_matches_scipy_hilbert():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((257, 5))  # odd AND even lengths below
    for n in (257, 256):
        e_ref = np.abs(hilbert(x[:n], axis=0))
        e_got = np.asarray(envelope(jnp.asarray(x[:n]), axis=0, eps=0.0))
        assert np.abs(e_got - e_ref).max() < 1e-10


def test_envelope_phase_rotation_invariance():
    """A 90-degree phase rotation leaves the envelope (hence the envelope
    misfit) unchanged while the L2 misfit sees a large residual."""
    nt, dt, f0 = 400, 0.002, 12.0
    s0 = _gabor(nt, dt, f0, 0.3)
    s90 = _gabor(nt, dt, f0, 0.3, phase=np.pi / 2)
    a, b = jnp.asarray(s0[:, None]), jnp.asarray(s90[:, None])
    J_env = float(envelope_misfit(a, b))
    J_l2 = float(l2_misfit(a, b))
    assert J_env < 2e-2 * J_l2, (J_env, J_l2)


def test_misfit_gradients_match_finite_differences():
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.standard_normal((64, 3)))
    d = jnp.asarray(rng.standard_normal((64, 3)))
    v = jnp.asarray(rng.standard_normal((64, 3)))
    for name, fn in MISFITS.items():
        g = jax.grad(lambda x: fn(x, d))(s)
        h = 1e-6
        fd = (fn(s + h * v, d) - fn(s - h * v, d)) / (2 * h)
        got = float(jnp.vdot(g, v))
        assert abs(got - float(fd)) < 1e-6 * max(1.0, abs(float(fd))), name


def test_weights_mask_the_functionals():
    rng = np.random.default_rng(4)
    s = jnp.asarray(rng.standard_normal((32, 4)))
    d = jnp.asarray(rng.standard_normal((32, 4)))
    w = jnp.zeros((32, 4)).at[:, :2].set(1.0)
    for name, fn in MISFITS.items():
        full = float(fn(s, d))
        masked = float(fn(s, d, weights=w))
        half = float(fn(s[:, :2], d[:, :2]))
        assert masked < full, name
        # normalized_l2's per-trace norms and w2's global shift constant
        # both see all traces, so masked != exactly-half for those
        if name not in ("normalized_l2", "w2"):
            assert abs(masked - half) < 1e-10 * max(1.0, abs(half)), name


def test_w2_monotone_in_time_shift_where_l2_saturates():
    """The W2 misfit keeps growing with the time shift between two
    wavelets (it measures transport distance), while L2 saturates once
    the wavelets stop overlapping — the cycle-skipping failure mode W2
    exists to fix."""
    from tpufwi.misfit import w2_misfit
    from tpufwi.wavelets import ricker_np

    nt, dt, f0 = 500, 0.002, 10.0
    base = np.zeros(nt)
    wlt = ricker_np(f0, dt, 120)
    base[60:180] = wlt
    shifts = [10, 40, 90, 160]
    d = jnp.asarray(base[:, None])
    w2 = []
    l2 = []
    for s in shifts:
        shifted = jnp.asarray(np.roll(base, s)[:, None])
        w2.append(float(w2_misfit(shifted, d)))
        l2.append(float(l2_misfit(shifted, d)))
    assert all(b > 1.2 * a for a, b in zip(w2, w2[1:])), w2
    # L2 blind past no-overlap: the two largest shifts are ~equal
    assert abs(l2[-1] - l2[-2]) < 0.02 * l2[-1], l2
    # zero at the optimum
    assert w2_misfit(d, d) < 1e-12


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_fwi_problem_envelope_objective_decreases():
    """FwiProblem(misfit='envelope'): one L-BFGS stage on a tiny lens
    model reduces the objective (adjoint source via AD through the
    analytic-signal FFT)."""
    from tpufwi import AcousticPropagator, Grid
    from tpufwi.acquisition import split_spread_survey
    from tpufwi.invert import FwiProblem
    from tpufwi.optimize import minimize
    from tpufwi.wavelets import ricker

    nz, nx = 60, 100
    vp_true = np.full((nz, nx), 2000.0, np.float32)
    vp_true[30:42, 40:70] = 1820.0
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    dt = grid.cfl_dt(2300.0, safety=0.7)
    nt = 380
    w = ricker(9.0, dt, nt, dtype=jnp.float32)
    prop = AcousticPropagator(grid, dt, 9.0, 2300.0, dtype=jnp.float32,
                              impl="jnp")
    geoms = split_spread_survey(grid, 3, src_z=2, rcv_z=2, rcv_dx=3)
    vp_t = jnp.asarray(vp_true)
    d_obs = jnp.stack([
        prop(vp_t, jax.tree.map(lambda x: x[i], geoms), w) for i in range(3)
    ])
    problem = FwiProblem(prop=prop, geoms=geoms, d_obs=d_obs, wavelet=w,
                         dt=dt, misfit="envelope")
    vg, loss = problem.stage_objectives(fmax=None)
    vp0 = jnp.full((nz, nx), 2000.0, jnp.float32)
    J0, g0 = vg(vp0)
    assert np.isfinite(float(J0)) and float(J0) > 0
    assert np.all(np.isfinite(np.asarray(g0)))
    vp1, _ = minimize(vg, vp0, iterations=5, method="lbfgs",
                      bounds=(1600.0, 2400.0))
    J1 = float(loss(vp1))
    assert J1 < 0.7 * float(J0), (float(J0), J1)


def test_traveltime_quadratic_in_shift_and_zero_at_optimum():
    """The soft cross-correlation traveltime misfit tracks the SHIFT
    itself: J(shift) ~ 0.5 shift^2 across shifts well beyond a period
    (where L2 has long gone non-monotonic), J(d, d) = 0 with zero
    gradient, and pure amplitude scaling contributes nothing."""
    from tpufwi.misfit import traveltime_misfit
    from tpufwi.wavelets import ricker_np

    nt, dt, f0 = 500, 0.002, 10.0  # period = 50 samples
    base = np.zeros(nt)
    base[60:180] = ricker_np(f0, dt, 120)
    d = jnp.asarray(base[:, None])

    shifts = [5, 20, 60, 120]  # up to 2.4 periods
    taus = []
    for s in shifts:
        J = float(traveltime_misfit(jnp.asarray(np.roll(base, s)[:, None]), d))
        taus.append(np.sqrt(2.0 * J))
    for s, tau in zip(shifts, taus):
        assert abs(tau - s) < 0.15 * s, (s, tau)

    assert float(traveltime_misfit(d, d)) < 1e-16
    g = jax.grad(lambda x: traveltime_misfit(x, d))(d)
    assert float(jnp.max(jnp.abs(g))) < 1e-12
    # kinematic-only: amplitude error alone is invisible
    assert float(traveltime_misfit(2.5 * d, d)) < 1e-16


def test_bandpass_filter():
    """Zero-phase band-pass: passes the in-band tone, rejects both the
    low- and high-side tones by >40 dB, kills DC, differentiable."""
    from tpufwi.filters import bandpass

    nt, dt = 1000, 1e-3
    t = np.arange(nt) * dt
    x = jnp.asarray(
        (np.sin(2 * np.pi * 2 * t) + np.sin(2 * np.pi * 20 * t)
         + np.sin(2 * np.pi * 80 * t)).astype(np.float32))
    y = np.asarray(bandpass(x, dt, 8.0, 40.0))
    f = np.fft.rfftfreq(nt, dt)
    Y, X = np.abs(np.fft.rfft(y)), np.abs(np.fft.rfft(np.asarray(x)))
    amp = lambda fr, S: S[np.argmin(np.abs(f - fr))]
    assert amp(20.0, Y) / amp(20.0, X) > 0.98
    assert amp(2.0, Y) / amp(2.0, X) < 0.01
    assert amp(80.0, Y) / amp(80.0, X) < 0.01
    # the DC bin of the designed response is exactly zero (a finite
    # boxcar still shows % -level edge transients after truncation —
    # that is windowing, not the filter)
    from tpufwi.filters import bandpass_response

    h2 = bandpass_response(nt, dt, 8.0, 40.0)
    assert h2[0] == 0.0
    dc = np.asarray(bandpass(jnp.ones(nt, jnp.float32), dt, 8.0, 40.0))
    assert np.abs(dc[300:-300]).max() < 0.05
    g = jax.grad(lambda v: jnp.sum(bandpass(v, dt, 8.0, 40.0) ** 2))(x)
    assert bool(jnp.isfinite(g).all())
