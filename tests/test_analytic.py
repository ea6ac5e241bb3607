"""Analytic 2D Green's-function check (SURVEY.md §4.2).

For  p_tt = c^2 Lap p + c^2 w(t) * hx*hz * delta2(x - xs)   (which is the
continuum limit of our injection p+ += dt^2 c^2 w at one cell), the exact
trace at distance r is

    p(r, t) = (hx*hz / (2 pi)) * Int_0^{acosh(c t / r)} w(t - (r/c) cosh u) du

(2D causal Green's function H(t - r/c) / (2 pi sqrt(t^2 - r^2/c^2)) [GENRE],
with the integrable singularity removed by the tau = (r/c) cosh u
substitution). FD solution on a fine grid must match in phase and amplitude
to a few percent.
"""

import jax.numpy as jnp
import numpy as np

from tpufwi import AcousticPropagator, Geometry, Grid
from tpufwi.wavelets import ricker_np


def _analytic_trace(r, c, h, w, dt, nt):
    # sample convention: seis[t] records p at time (t+1)*dt (the propagator
    # records p_next produced by step t, which consumed w[t] at time t*dt)
    t = (np.arange(nt) + 1) * dt  # observation times
    t_src = np.arange(nt) * dt  # wavelet sample times
    wav = lambda tau: np.interp(tau, t_src, w, left=0.0, right=0.0)
    out = np.zeros(nt)
    for i, ti in enumerate(t):
        if ti * c <= r:
            continue
        umax = np.arccosh(c * ti / r)
        u = np.linspace(0.0, umax, 400)
        integrand = wav(ti - (r / c) * np.cosh(u))
        out[i] = (h * h / (2 * np.pi)) * np.trapezoid(integrand, u)
    return out




def test_matches_2d_greens_function():
    c, f0 = 2000.0, 12.0
    h = 5.0  # fine grid to keep numerical dispersion small
    nz = nx = 240
    grid = Grid(shape=(nz, nx), h=(h, h), pml=20, order=8)
    dt = grid.cfl_dt(c, safety=0.5)
    nt = int(0.42 / dt)
    w = ricker_np(f0, dt, nt)
    src = np.array([[nz // 2, nx // 2]])
    r_cells = 60
    rcv = np.array([[nz // 2, nx // 2 + r_cells]])
    prop = AcousticPropagator(grid, dt, f0, c, dtype=jnp.float64)
    geom = Geometry.from_physical(grid, src, rcv)
    seis = np.asarray(prop(jnp.full(grid.shape, c, jnp.float64), geom, jnp.asarray(w)))[:, 0]

    ref = _analytic_trace(r_cells * h, c, h, w, dt, nt)
    # compare on the window around the arrival
    scale = np.abs(ref).max()
    err = np.linalg.norm(seis - ref) / np.linalg.norm(ref)
    assert scale > 0
    assert err < 0.01, f"rel L2 error vs analytic {err:.3f}"
    # arrival-time check: peak within 2 samples of analytic peak
    assert abs(int(np.argmax(seis)) - int(np.argmax(ref))) <= 2
