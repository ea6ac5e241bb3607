"""RTM (rtm.py): a horizontal reflector migrates to its depth with
laterally coherent polarity, and a point scatterer focuses near its true
position. Uses the jnp engine on tiny grids (the image IS the FWI
gradient, whose numerics are covered by test_adjoint)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import AcousticPropagator, Grid
from tpufwi.acquisition import split_spread_survey
from tpufwi.invert import FwiProblem
from tpufwi.rtm import migrate
from tpufwi.wavelets import ricker


def _problem(vp_true, grid, f0, n_shots):
    dt = grid.cfl_dt(float(vp_true.max()) * 1.1, safety=0.7)
    nt = int(1.0 / dt)
    w = ricker(f0, dt, nt, dtype=jnp.float32)
    prop = AcousticPropagator(grid, dt, f0, float(vp_true.max()) * 1.1,
                              dtype=jnp.float32, impl="jnp")
    geoms = split_spread_survey(grid, n_shots, src_z=2, rcv_z=2, rcv_dx=2)
    vp_t = jnp.asarray(vp_true, jnp.float32)
    d_obs = jnp.stack([
        prop(vp_t, jax.tree.map(lambda x: x[i], geoms), w)
        for i in range(n_shots)
    ])
    return FwiProblem(prop=prop, geoms=geoms, d_obs=d_obs, wavelet=w, dt=dt)


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_reflector_migrates_to_depth():
    nz, nx, zr = 72, 110, 44
    vp = np.full((nz, nx), 2000.0, np.float32)
    vp[zr:] = 2400.0
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    problem = _problem(vp, grid, f0=11.0, n_shots=4)
    img = np.asarray(
        migrate(problem, jnp.full((nz, nx), 2000.0, jnp.float32),
                mask_top=10)
    )
    # depth profile of image energy over the central third peaks at the
    # reflector (within a wavelength/4 tolerance)
    mid = img[:, nx // 3 : 2 * nx // 3]
    prof = np.sum(mid**2, axis=1)
    zpk = int(np.argmax(prof))
    assert abs(zpk - zr) <= 4, f"reflector imaged at z={zpk}, true {zr}"
    # laterally coherent polarity along the imaged reflector
    row = mid[zpk]
    assert (np.sign(row) == np.sign(row[row.size // 2])).mean() > 0.9


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_point_scatterer_focuses():
    nz, nx, z0, x0 = 64, 96, 36, 48
    vp = np.full((nz, nx), 2000.0, np.float32)
    vp[z0 - 1 : z0 + 2, x0 - 1 : x0 + 2] = 2300.0
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    problem = _problem(vp, grid, f0=12.0, n_shots=4)
    img = np.asarray(
        migrate(problem, jnp.full((nz, nx), 2000.0, jnp.float32),
                mask_top=10)
    )
    zpk, xpk = np.unravel_index(np.argmax(np.abs(img)), img.shape)
    assert abs(zpk - z0) <= 4 and abs(xpk - x0) <= 4, (
        f"scatterer imaged at ({zpk},{xpk}), true ({z0},{x0})"
    )
