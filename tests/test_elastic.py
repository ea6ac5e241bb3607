"""C4: elastic P-SV forward vs oracle + Vp/Vs/rho adjoint correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi import Geometry, Grid
from tpufwi.kernels.oracle_numpy import oracle_elastic_2d
from tpufwi.propagators.elastic2d import (
    ElasticPropagator,
    elastic_cfl_dt,
    make_elastic_simulator,
)
from tpufwi.wavelets import ricker_np


def _setup(order=4, nz=40, nx=50, pml=8, nt=160, f0=12.0):
    vp = np.full((nz, nx), 2200.0)
    vp[nz // 2 :] = 2600.0
    vs = vp / 1.8
    rho = 1000.0 + 0.3 * vp
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=pml, order=order)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), order, safety=0.7)
    w = ricker_np(f0, dt, nt)
    src = np.array([[nz // 2 - 6, nx // 2]])
    rx = np.arange(5, nx - 5, 3)
    rcv = np.stack([np.full_like(rx, 5), rx], 1)
    return grid, vp, vs, rho, dt, w, src, rcv, f0


@pytest.mark.parametrize("source_type", ["pressure", "force_z"])
def test_elastic_forward_matches_oracle(source_type):
    grid, vp, vs, rho, dt, w, src, rcv, f0 = _setup()
    seis_o, _ = oracle_elastic_2d(
        vp, vs, rho, grid, dt, w, src, rcv, f0, source_type=source_type
    )
    prop = ElasticPropagator(
        grid, dt, f0, float(vp.max()), dtype=jnp.float64, source_type=source_type
    )
    geom = Geometry.from_physical(grid, src, rcv)
    seis = np.asarray(
        prop(jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho), geom, jnp.asarray(w))
    )
    rms = np.sqrt(np.mean((seis - seis_o) ** 2)) / np.sqrt(np.mean(seis_o**2))
    assert rms < 1e-9, f"elastic vs oracle relative RMS {rms:.3e} ({source_type})"


def test_elastic_gradient_matches_full_ad():
    grid, vp, vs, rho, dt, w, src, rcv, f0 = _setup(nt=110)
    geom = Geometry.from_physical(grid, src, rcv)
    prop = ElasticPropagator(grid, dt, f0, float(vp.max()), dtype=jnp.float64)
    sim_ad = make_elastic_simulator(
        grid, dt, f0, float(vp.max()), jnp.float64, use_custom_vjp=False
    )
    wj = jnp.asarray(w)
    vp0, vs0, rho0 = jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho)
    d_obs = prop(vp0 * 1.02, vs0, rho0, geom, wj)

    def loss_custom(m):
        vp_, vs_, rho_ = m
        return 0.5 * jnp.sum((prop(vp_, vs_, rho_, geom, wj) - d_obs) ** 2)

    def loss_ad(m):
        mats = prop.material_fields(*m)
        seis = sim_ad(*mats, wj, geom.src_idx, geom.rcv_idx)
        return 0.5 * jnp.sum((seis - d_obs) ** 2)

    J1, g_c = jax.value_and_grad(loss_custom)(( vp0, vs0, rho0))
    J2, g_a = jax.value_and_grad(loss_ad)((vp0, vs0, rho0))
    assert abs(float(J1) - float(J2)) < 1e-10 * abs(float(J1))

    # Elastic gradient is exact on the interior shrunk by radius+1: the
    # staggered material averaging chains each physical cell to staggered
    # cotangents one cell away, and the cotangent at pad+radius-1 is
    # unreconstructible (its strain reads a PML cell). The outer radius
    # frame is exactly zero by construction.
    # (Unlike the acoustic case the physical gradient is not identically
    # zero on the frame: valid staggered cotangents chain one cell outward
    # through the material averaging. Those frame values are partial and
    # sit against the PML — harmless for optimization.)
    rr = grid.radius + 1
    mask = np.zeros(grid.shape)
    mask[rr:-rr, rr:-rr] = 1.0
    for name, gc, ga in zip(("vp", "vs", "rho"), g_c, g_a):
        gc = np.asarray(gc)
        ga = np.asarray(ga) * mask
        scale = np.abs(ga).max()
        err = np.abs(gc * mask - ga).max() / scale
        assert err < 1e-10, f"{name} grad: custom vs full-AD rel err {err:.3e}"


def test_forward_snapshots_consistent():
    """forward_snapshots returns the identical seismogram as __call__
    plus interior snapshots with live energy (QC/movie path)."""
    import numpy as np

    from tpufwi.propagators.elastic2d import elastic_cfl_dt
    from tpufwi.wavelets import ricker_np

    nz, nx, f0, nt = 40, 50, 12.0, 120
    vp = np.full((nz, nx), 2200.0)
    vs = vp / 1.8
    rho = np.full_like(vp, 1800.0)
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    dt = elastic_cfl_dt(grid.h, 2200.0, 4, safety=0.6)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    geom = Geometry.from_physical(
        grid, np.array([[20, 25]]), np.array([[10, 10], [10, 40]]))
    prop = ElasticPropagator(grid, dt, f0, 2200.0, dtype=jnp.float64)
    args = (jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho), geom, w)
    seis0 = prop(*args)
    seis1, snaps = prop.forward_snapshots(*args, stride=10, field="p")
    assert float(jnp.abs(seis0 - seis1).max()) == 0.0
    assert snaps.shape == (nt // 10, nz, nx)
    assert float(jnp.abs(snaps[-1]).max()) > 0.0
