"""C5 end-to-end: tiny 3D acoustic FWI (shot batch + domain-shardable
simulator) reduces misfit and recovers a velocity anomaly's sign."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import Geometry, Grid
from tpufwi.adjoint import make_simulator
from tpufwi.misfit import l2_misfit
from tpufwi.optimize import minimize
from tpufwi.wavelets import ricker_np



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def test_fwi3d_reduces_misfit():
    grid = Grid(shape=(20, 16, 24), h=(20.0, 20.0, 20.0), pml=5, order=4)
    c_max, f0 = 2400.0, 9.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 110
    w = jnp.asarray(ricker_np(f0, dt, nt))

    vp_true = np.full(grid.shape, 2200.0)
    vp_true[8:14, 6:11, 9:16] = 2000.0  # slow box
    vp0 = jnp.full(grid.shape, 2200.0)

    # two crosswell-ish shots, receivers on an opposing plane
    rcv = np.array([[y, z, 20] for y in range(3, 18, 3) for z in (4, 8, 12)])
    geoms = [
        Geometry.from_physical(grid, np.array([[y, 8, 3]]), rcv) for y in (6, 13)
    ]
    geoms = jax.tree.map(lambda *a: jnp.stack(a), *geoms)

    sim = make_simulator(grid, dt, f0, c_max, dtype=jnp.float64)
    pad = grid.pad

    def c2of(v):
        return (jnp.pad(v, [(pad, pad)] * 3, mode="edge") * dt) ** 2

    def forward_all(v):
        return jax.vmap(lambda si, ri: sim(c2of(v), w, si, ri))(
            geoms.src_idx, geoms.rcv_idx
        )

    d_obs = forward_all(jnp.asarray(vp_true))

    def loss(v):
        return l2_misfit(forward_all(v), d_obs)

    vg = jax.jit(jax.value_and_grad(loss))
    J0 = float(loss(vp0))
    vp, infos = minimize(vg, vp0, iterations=8, method="lbfgs", bounds=(1900.0, 2500.0))
    J1 = float(loss(vp))
    assert J1 < 0.25 * J0, f"3D FWI J ratio {J1/J0:.2f}"
    # recovered perturbation must be negative inside the slow box
    dv = np.asarray(vp) - 2200.0
    assert dv[8:14, 6:11, 9:16].mean() < -10.0
