"""Pallas fused adjoint == jnp adjoint engine (interpret mode, CPU).

The jnp custom-VJP gradient is itself proven exact against full AD and the
dot-product test (tests/test_adjoint.py); here the fused-kernel path must
reproduce it to fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import Geometry, Grid
from tpufwi.adjoint import make_simulator
from tpufwi.adjoint_pallas import make_simulator_pallas
from tpufwi.wavelets import ricker_np


def _setup(order=4):
    grid = Grid(shape=(48, 72), h=(10.0, 10.0), pml=10, order=order)
    c_max, f0 = 2500.0, 14.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 140
    rng = np.random.default_rng(0)
    vp = np.clip(2000 + 200 * rng.standard_normal(grid.shape), 1700, 2500)
    pad = grid.pad
    c2 = jnp.asarray((np.pad(vp, pad, mode="edge") * dt) ** 2, jnp.float32)
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    geom = Geometry.from_physical(
        grid, np.array([[24, 36]]), np.stack([np.full(20, 5), np.arange(5, 65, 3)], 1)
    )
    return grid, dt, f0, c_max, c2, w, geom


def test_pallas_gradient_matches_jnp():
    grid, dt, f0, c_max, c2, w, geom = _setup()
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_p = make_simulator_pallas(grid, dt, f0, c_max, interpret=True)

    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)

    def loss(sim):
        def f(c2_):
            r = sim(c2_, w, geom.src_idx, geom.rcv_idx) - d_obs
            return 0.5 * jnp.sum(r * r)
        return f

    J_j, g_j = jax.value_and_grad(loss(sim_j))(c2 * 1.01)
    J_p, g_p = jax.value_and_grad(loss(sim_p))(c2 * 1.01)

    assert abs(float(J_j) - float(J_p)) / float(J_j) < 1e-4  # fp32 sum-order
    g_j, g_p = np.asarray(g_j), np.asarray(g_p)
    scale = np.abs(g_j).max()
    err = np.abs(g_p - g_j).max() / scale
    assert err < 1e-4, f"pallas vs jnp gradient max rel err {err:.3e}"


def test_pallas_wavelet_gradient_matches_jnp():
    grid, dt, f0, c_max, c2, w, geom = _setup()
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_p = make_simulator_pallas(grid, dt, f0, c_max, interpret=True)
    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)

    def loss(sim):
        def f(w_):
            r = sim(c2, w_, geom.src_idx, geom.rcv_idx) - d_obs
            return 0.5 * jnp.sum(r * r)
        return f

    g_j = jax.grad(loss(sim_j))(w * 1.05)
    g_p = jax.grad(loss(sim_p))(w * 1.05)
    g_j, g_p = np.asarray(g_j), np.asarray(g_p)
    err = np.abs(g_p - g_j).max() / np.abs(g_j).max()
    assert err < 1e-4, f"wavelet grad rel err {err:.3e}"
