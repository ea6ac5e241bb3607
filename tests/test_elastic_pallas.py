"""Fused elastic Pallas kernels == jnp twin (interpret mode, CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi import Geometry, Grid
from tpufwi.kernels.elastic2d_pallas import make_pallas_elastic_forward
from tpufwi.propagators.elastic2d import ElasticPropagator, elastic_cfl_dt
from tpufwi.wavelets import ricker_np


@pytest.mark.parametrize("source_type", ["pressure", "force_z"])
def test_elastic_pallas_matches_jnp(source_type):
    nz, nx, pml, nt, f0 = 40, 50, 8, 120, 12.0
    vp = np.full((nz, nx), 2200.0)
    vp[nz // 2 :] = 2600.0
    vs = vp / 1.8
    rho = 1000.0 + 0.3 * vp
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=pml, order=4)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), 4, safety=0.7)
    w = ricker_np(f0, dt, nt)
    src = np.array([[nz // 2 - 6, nx // 2]])
    rx = np.arange(5, nx - 5, 3)
    rcv = np.stack([np.full_like(rx, 5), rx], 1)
    geom = Geometry.from_physical(grid, src, rcv)

    prop = ElasticPropagator(
        grid, dt, f0, float(vp.max()), dtype=jnp.float32, source_type=source_type
    )
    mats = prop.material_fields(
        jnp.asarray(vp, jnp.float32), jnp.asarray(vs, jnp.float32),
        jnp.asarray(rho, jnp.float32),
    )
    wj = jnp.asarray(w, jnp.float32)
    seis_ref = np.asarray(prop._sim("jnp")(*mats, wj, geom.src_idx, geom.rcv_idx))

    sim_p = make_pallas_elastic_forward(
        grid, dt, f0, float(vp.max()), source_type=source_type, interpret=True
    )
    seis_p = np.asarray(sim_p(mats, wj, geom.src_idx, geom.rcv_idx))

    scale = np.abs(seis_ref).max()
    err = np.abs(seis_p - seis_ref).max() / scale
    assert err < 1e-5, f"elastic pallas vs jnp max rel err {err:.3e} ({source_type})"


def test_propagator_forward_fused_matches_engine():
    nz, nx = 40, 50
    vp = np.full((nz, nx), 2300.0)
    vs = vp / 1.8
    rho = np.full((nz, nx), 2000.0)
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    dt = elastic_cfl_dt(grid.h, 2300.0, 4, safety=0.7)
    w = jnp.asarray(ricker_np(12.0, dt, 100), jnp.float32)
    geom = Geometry.from_physical(grid, np.array([[20, 25]]), np.array([[5, 40]]))
    prop = ElasticPropagator(grid, dt, 12.0, 2300.0, dtype=jnp.float32)
    a = np.asarray(prop(jnp.asarray(vp, jnp.float32), jnp.asarray(vs, jnp.float32),
                        jnp.asarray(rho, jnp.float32), geom, w))
    b = np.asarray(prop.forward_fused(jnp.asarray(vp, jnp.float32),
                                      jnp.asarray(vs, jnp.float32),
                                      jnp.asarray(rho, jnp.float32), geom, w,
                                      interpret=True))
    err = np.abs(a - b).max() / np.abs(a).max()
    assert err < 1e-5, f"forward_fused vs engine {err:.3e}"


@pytest.mark.parametrize("record,source_type", [
    ("v", "pressure"),
    # one representative stays in the fast lane; the other source/record
    # combinations run in the slow lane (same kernels, same algebra)
    pytest.param("p", "pressure", marks=pytest.mark.slow),
    pytest.param("v", "force", marks=pytest.mark.slow),
])
def test_elastic_fused_gradient_matches_xla_engine(record, source_type):
    """Fused Pallas backward (reconstruct + transpose + imaging in two
    kernels, kernels/elastic2d_pallas_bwd.py) == the proven XLA-engine
    gradient (propagators/elastic2d.py, tests/test_elastic.py)."""
    import jax

    from tpufwi.propagators.elastic2d import (
        make_elastic_simulator,
        make_elastic_simulator_fused,
    )

    nz, nx, pml, nt, f0 = 40, 50, 8, 90, 12.0
    rng = np.random.default_rng(3)
    vp = np.clip(2300 + 150 * rng.standard_normal((nz, nx)), 2000, 2600)
    vs = vp / 1.8
    rho = 1000.0 + 0.3 * vp
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=pml, order=4)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), 4, safety=0.7)
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    src = np.array([[nz // 2 - 6, nx // 2], [nz // 2, nx // 2 - 8]])
    rx = np.arange(5, nx - 5, 3)
    rcv = np.stack([np.full_like(rx, 5), rx], 1)
    geom = Geometry.from_physical(grid, src, rcv)

    prop = ElasticPropagator(
        grid, dt, f0, float(vp.max()), dtype=jnp.float32, record=record,
        source_type=source_type,
    )
    mats = prop.material_fields(
        jnp.asarray(vp, jnp.float32), jnp.asarray(vs, jnp.float32),
        jnp.asarray(rho, jnp.float32),
    )
    sim_x = make_elastic_simulator(
        grid, dt, f0, float(vp.max()), dtype=jnp.float32, record=record,
        source_type=source_type,
    )
    sim_f = make_elastic_simulator_fused(
        grid, dt, f0, float(vp.max()), record=record,
        source_type=source_type, interpret=True,
    )
    d_obs = sim_x(*mats, w, geom.src_idx, geom.rcv_idx)

    def loss(sim):
        def f(lam, lam2mu, mu_xz, bx, bz, w_):
            r = sim(lam, lam2mu, mu_xz, bx, bz, w_, geom.src_idx, geom.rcv_idx) - d_obs
            return 0.5 * jnp.sum(r * r)

        return f

    mats_p = tuple(m * 1.02 for m in mats)
    seis_f = sim_f(*mats_p, w, geom.src_idx, geom.rcv_idx)
    seis_x = sim_x(*mats_p, w, geom.src_idx, geom.rcv_idx)
    fscale = float(jnp.abs(seis_x).max())
    assert float(jnp.abs(seis_f - seis_x).max()) < 1e-5 * fscale

    gx = jax.grad(loss(sim_x), argnums=(0, 1, 2, 3, 4, 5))(*mats_p, w)
    gf = jax.grad(loss(sim_f), argnums=(0, 1, 2, 3, 4, 5))(*mats_p, w)
    names = ["lam", "lam2mu", "mu_xz", "buoy_x", "buoy_z", "wavelet"]
    for name, a, b in zip(names, gx, gf):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(a).max(), 1e-30)
        err = np.abs(a - b).max() / scale
        assert err < 2e-4, (
            f"{record}/{source_type}: {name} gradient max rel err {err:.3e}"
        )
