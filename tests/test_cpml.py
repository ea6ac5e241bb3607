"""CPML efficacy (SURVEY.md §4.4): interior energy after the wave exits
must drop below -60 dB of peak; a rigid (pml=0) box must NOT decay."""

import jax.numpy as jnp
import numpy as np

from tpufwi import AcousticPropagator, Geometry, Grid
from tpufwi.wavelets import ricker_np


def _energy_trace(pml):
    nz, nx, c, f0 = 60, 60, 2000.0, 15.0
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=pml, order=4)
    dt = grid.cfl_dt(c, safety=0.7)
    # long enough for several box transits
    nt = int(3.0 * nz * 10.0 / c / dt)
    w = ricker_np(f0, dt, nt)
    prop = AcousticPropagator(grid, dt, f0, c, dtype=jnp.float64)
    geom = Geometry.from_physical(grid, np.array([[nz // 2, nx // 2]]), np.array([[4, 4]]))
    e = prop.wavefield_energy(jnp.full(grid.shape, c, jnp.float64), geom, jnp.asarray(w))
    return np.asarray(e)


def test_cpml_absorbs_below_minus_60db():
    e = _energy_trace(pml=20)
    peak = e.max()
    tail = e[-1]
    db = 10 * np.log10(tail / peak)
    assert db < -60.0, f"residual interior energy {db:.1f} dB"


def test_rigid_box_does_not_decay():
    e = _energy_trace(pml=0)
    peak = e.max()
    tail = e[len(e) // 2 :].max()
    db = 10 * np.log10(tail / peak)
    assert db > -10.0, f"rigid box unexpectedly lost energy: {db:.1f} dB"
