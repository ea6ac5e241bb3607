"""fp32 long-run robustness (SURVEY.md §7 hard parts): thousands of steps
at production dtype must stay bounded and track the fp64 solution."""

import pytest

import jax.numpy as jnp
import numpy as np

from tpufwi import AcousticPropagator, Geometry, Grid
from tpufwi.wavelets import ricker_np



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def test_fp32_drift_over_3000_steps():
    grid = Grid(shape=(60, 80), h=(10.0, 10.0), pml=12, order=8)
    c, f0 = 2200.0, 14.0
    dt = grid.cfl_dt(c, safety=0.7)
    nt = 3000
    rng = np.random.default_rng(0)
    vp = np.clip(2000 + 150 * rng.standard_normal(grid.shape), 1800, 2400)
    w = ricker_np(f0, dt, nt)
    src = np.array([[30, 20]])
    rcv = np.array([[30, 60]])
    geom = Geometry.from_physical(grid, src, rcv)

    tr64 = np.asarray(
        AcousticPropagator(grid, dt, f0, 2400.0, dtype=jnp.float64)(
            jnp.asarray(vp), geom, jnp.asarray(w)
        )
    )[:, 0]
    tr32 = np.asarray(
        AcousticPropagator(grid, dt, f0, 2400.0, dtype=jnp.float32)(
            jnp.asarray(vp, jnp.float32), geom, jnp.asarray(w, jnp.float32)
        )
    )[:, 0]

    assert np.isfinite(tr32).all()
    scale = np.abs(tr64).max()
    # absolute drift stays small relative to the signal over the whole run
    assert np.abs(tr32 - tr64).max() / scale < 5e-4
    # the late-time tail (where roundoff has accumulated longest) is nearly
    # quiescent after CPML absorption; its absolute error must stay at the
    # same roundoff level relative to the global signal
    tail = slice(nt - 500, nt)
    assert np.abs(tr32[tail] - tr64[tail]).max() / scale < 5e-5
