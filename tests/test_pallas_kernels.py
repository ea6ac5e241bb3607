"""Pallas fused kernel == jnp twin (SURVEY.md §4.9), interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi import Geometry, Grid
from tpufwi.adjoint import make_simulator
from tpufwi.kernels.acoustic2d_pallas import make_pallas_forward
from tpufwi.wavelets import ricker_np


@pytest.mark.parametrize("order", [4, 8])
def test_fused_forward_matches_jnp(order):
    grid = Grid(shape=(48, 72), h=(10.0, 10.0), pml=10, order=order)
    c_max, f0 = 2500.0, 14.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 120
    rng = np.random.default_rng(0)
    vp = np.clip(2000 + 200 * rng.standard_normal(grid.shape), 1700, 2500)
    pad = grid.pad
    c2dt2 = jnp.asarray((np.pad(vp, pad, mode="edge") * dt) ** 2, jnp.float32)
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    geom = Geometry.from_physical(
        grid, np.array([[24, 36]]), np.stack([np.full(20, 5), np.arange(5, 65, 3)], 1)
    )

    sim_jnp = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32, use_custom_vjp=False)
    sim_pal = make_pallas_forward(grid, dt, f0, c_max, interpret=True)

    s_ref = np.asarray(sim_jnp(c2dt2, w, geom.src_idx, geom.rcv_idx))
    s_pal = np.asarray(sim_pal(c2dt2, w, geom.src_idx, geom.rcv_idx))

    scale = np.abs(s_ref).max()
    err = np.abs(s_pal - s_ref).max() / scale
    assert err < 1e-5, f"pallas vs jnp forward max rel err {err:.3e}"
