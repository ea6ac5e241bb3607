"""Grid-refinement convergence study (SURVEY.md §4.3): the trace error vs
the analytic 2D Green's function must shrink at ~the spatial FD order
(time step held fixed and small so the O(dt^2) floor stays below)."""


import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi import AcousticPropagator, Geometry, Grid
from tpufwi.wavelets import ricker_np



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def _analytic(r, c, h, w, dt, nt):
    t_obs = (np.arange(nt) + 1) * dt
    t_src = np.arange(nt) * dt
    wav = lambda tau: np.interp(tau, t_src, w, left=0.0, right=0.0)
    out = np.zeros(nt)
    for i, ti in enumerate(t_obs):
        if ti * c <= r:
            continue
        u = np.linspace(0.0, np.arccosh(c * ti / r), 600)
        out[i] = (h * h / (2 * np.pi)) * np.trapezoid(wav(ti - (r / c) * np.cosh(u)), u)
    return out


def _trace(order, h, dt, nt, w, c=2000.0, L=1280.0, r_m=320.0):
    n = int(L / h)
    grid = Grid(shape=(n, n), h=(h, h), pml=12, order=order)
    prop = AcousticPropagator(grid, dt, 7.0, c, dtype=jnp.float64)
    src = np.array([[n // 2, n // 4]])
    rcv = np.array([[n // 2, n // 4 + int(r_m / h)]])
    geom = Geometry.from_physical(grid, src, rcv)
    # scale amplitude by 1/h^2 so the source moment is h-independent
    return np.asarray(
        prop(jnp.full(grid.shape, c, jnp.float64), geom, jnp.asarray(w) / h / h)
    )[:, 0]


@pytest.mark.parametrize("order,min_rate", [(4, 10.0), (8, 50.0)])
def test_spatial_convergence_order(order, min_rate):
    """Richardson: ||u_h - u_{h/2}|| ~ C h^p, so successive-difference
    ratios approach 2^p (16 for order 4, 256 for order 8). This cancels the
    shared O(dt^2) time-stepping floor that a comparison against the
    analytic solution bottoms out on."""
    c, f0 = 2000.0, 7.0
    dt = 0.25 * Grid(shape=(10, 10), h=(4.0, 4.0), order=order).cfl_dt(c, safety=1.0)
    nt = int(0.45 / dt)
    w = ricker_np(f0, dt, nt)
    u16 = _trace(order, 16.0, dt, nt, w)
    u8 = _trace(order, 8.0, dt, nt, w)
    u4 = _trace(order, 4.0, dt, nt, w)
    d1 = np.linalg.norm(u16 - u8)
    d2 = np.linalg.norm(u8 - u4)
    rate = d1 / d2
    assert rate > min_rate, f"order {order}: Richardson ratio {rate:.1f}"


def test_fine_grid_matches_analytic():
    """Absolute accuracy anchor: finest grid within 0.1% of the analytic
    Green's function (time/quadrature floor included)."""
    order, c, f0 = 8, 2000.0, 7.0
    dt = 0.25 * Grid(shape=(10, 10), h=(4.0, 4.0), order=order).cfl_dt(c, safety=1.0)
    nt = int(0.45 / dt)
    w = ricker_np(f0, dt, nt)
    u4 = _trace(order, 4.0, dt, nt, w)
    ref = _analytic(320.0, c, 1.0, w, dt, nt)
    err = np.linalg.norm(u4 - ref) / np.linalg.norm(ref)
    assert err < 1e-3, f"fine-grid vs analytic rel err {err:.2e}"
