"""Elastic P-SV free surface (stress-image method, Levander 1988):
oracle/jnp parity, ghost-arrival physics, exact adjoint with the image
inside the boundary-saving custom VJP."""

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


def _setup(order=4, nz=48, nx=50, pml=8, nt=200, f0=12.0, fs=True):
    vp = np.full((nz, nx), 2200.0)
    vp[nz // 2 :] = 2600.0
    vs = vp / 1.8
    rho = 1000.0 + 0.3 * vp
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=pml, order=order,
                free_surface=fs)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), order, safety=0.7)
    w = ricker_np(f0, dt, nt)
    src = np.array([[6, nx // 2]])
    rx = np.arange(5, nx - 5, 3)
    rcv = np.stack([np.full_like(rx, 12), rx], 1)
    return grid, vp, vs, rho, dt, w, src, rcv, f0


@pytest.mark.parametrize("source_type", ["pressure", "force_z"])
def test_forward_matches_oracle_free_surface(source_type):
    grid, vp, vs, rho, dt, w, src, rcv, f0 = _setup()
    seis_o, _ = oracle_elastic_2d(
        vp, vs, rho, grid, dt, w, src, rcv, f0, source_type=source_type
    )
    prop = ElasticPropagator(
        grid, dt, f0, float(vp.max()), dtype=jnp.float64,
        source_type=source_type,
    )
    geom = Geometry.from_physical(grid, src, rcv)
    seis = np.asarray(
        prop(jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho), geom,
             jnp.asarray(w))
    )
    rms = np.sqrt(np.mean((seis - seis_o) ** 2)) / np.sqrt(np.mean(seis_o**2))
    assert rms < 1e-9, f"free-surface elastic vs oracle RMS {rms:.3e}"


def test_surface_ghost_polarity():
    """Vertical-incidence pressure ghost: the free surface reflects the
    explosive source's P pulse with flipped polarity; with an absorbing
    top the ghost window is quiet."""
    nz, nx, f0 = 100, 40, 14.0
    vp = np.full((nz, nx), 2000.0)
    vs = vp / 1.9
    rho = np.full((nz, nx), 1200.0)
    z_s, z_r = 20, 70
    h = 10.0

    def run(fs):
        grid = Grid(shape=(nz, nx), h=(h, h), pml=10, order=4,
                    free_surface=fs)
        dt = elastic_cfl_dt(grid.h, 2000.0, 4, safety=0.7)
        # cover the ghost path + Ricker delay + a full pulse width
        nt = int(((z_s + z_r) * h / 2000.0 + 3.0 / f0) / dt) + 8
        w = ricker_np(f0, dt, nt)
        prop = ElasticPropagator(grid, dt, f0, 2000.0, dtype=jnp.float64,
                                 record="p")
        geom = Geometry.from_physical(
            grid, np.array([[z_s, nx // 2]]), np.array([[z_r, nx // 2]])
        )
        seis = np.asarray(prop(jnp.asarray(vp), jnp.asarray(vs),
                               jnp.asarray(rho), geom, jnp.asarray(w)))[:, 0]
        return seis, dt

    s_fs, dt = run(True)
    s_ab, _ = run(False)
    t0 = 1.5 / f0  # Ricker delay
    i_dir = int(((z_r - z_s) * h / 2000.0 + t0) / dt)
    i_gho = int(((z_r + z_s) * h / 2000.0 + t0) / dt)
    hw = int(0.6 / f0 / dt)

    # direct arrival identical with/without the free surface
    a_dir = s_fs[i_dir - hw : i_dir + hw]
    b_dir = s_ab[i_dir - hw : i_dir + hw]
    assert np.abs(a_dir - b_dir).max() < 1e-3 * np.abs(b_dir).max()

    # ghost present only with the free surface, polarity flipped vs direct
    g_fs = s_fs[i_gho - hw : i_gho + hw]
    g_ab = s_ab[i_gho - hw : i_gho + hw]
    peak_dir = a_dir[np.abs(a_dir).argmax()]
    peak_gho = g_fs[np.abs(g_fs).argmax()]
    assert np.abs(g_fs).max() > 5 * np.abs(g_ab).max(), "no ghost arrival"
    assert peak_dir * peak_gho < 0, "ghost polarity not flipped"
    assert np.abs(peak_gho) > 0.3 * np.abs(peak_dir)


def test_gradient_matches_full_ad_free_surface():
    """Custom boundary-saving VJP == full AD with the stress image inside
    the step (the imaged rows sit inside the ring band, so reconstruction
    stays exact in the valid region)."""
    grid, vp, vs, rho, dt, w, src, rcv, f0 = _setup(nt=120)
    geom = Geometry.from_physical(grid, src, rcv)
    prop = ElasticPropagator(grid, dt, f0, float(vp.max()), dtype=jnp.float64)
    sim_ad = make_elastic_simulator(
        grid, dt, f0, float(vp.max()), jnp.float64, use_custom_vjp=False
    )
    wj = jnp.asarray(w)
    vp0, vs0, rho0 = jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho)
    d_obs = prop(vp0 * 1.02, vs0, rho0, geom, wj)

    def loss_custom(m):
        return 0.5 * jnp.sum((prop(*m, geom, wj) - d_obs) ** 2)

    def loss_ad(m):
        mats = prop.material_fields(*m)
        seis = sim_ad(*mats, wj, geom.src_idx, geom.rcv_idx)
        return 0.5 * jnp.sum((seis - d_obs) ** 2)

    J1, g_c = jax.value_and_grad(loss_custom)((vp0, vs0, rho0))
    J2, g_a = jax.value_and_grad(loss_ad)((vp0, vs0, rho0))
    assert abs(float(J1) - float(J2)) < 1e-10 * abs(float(J1))

    rr = grid.radius + 1
    mask = np.zeros(grid.shape)
    mask[rr:-rr, rr:-rr] = 1.0
    for name, gc, ga in zip(("vp", "vs", "rho"), g_c, g_a):
        gc = np.asarray(gc)
        ga = np.asarray(ga) * mask
        scale = np.abs(ga).max()
        err = np.abs(gc * mask - ga).max() / scale
        assert err < 1e-10, f"{name} fs-grad custom vs AD rel {err:.3e}"


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_fused_engine_matches_jnp_free_surface():
    """The fused Pallas engine (XLA-level image + hand-transposed image_t)
    agrees with the jnp engine: forward and gradient, interpret mode."""
    from tpufwi.propagators.elastic2d import make_elastic_simulator_fused

    grid, vp, vs, rho, dt, w, src, rcv, f0 = _setup(nt=90)
    geom = Geometry.from_physical(grid, src, rcv)
    prop = ElasticPropagator(grid, dt, f0, float(vp.max()), dtype=jnp.float32)
    sim_f = make_elastic_simulator_fused(grid, dt, f0, float(vp.max()),
                                         interpret=True)
    mats32 = jax.tree.map(
        lambda m: m.astype(jnp.float32),
        prop.material_fields(jnp.asarray(vp), jnp.asarray(vs),
                             jnp.asarray(rho)),
    )
    wj = jnp.asarray(w, jnp.float32)
    s_ref = np.asarray(prop(jnp.asarray(vp), jnp.asarray(vs),
                            jnp.asarray(rho), geom, wj))
    s_fus = np.asarray(sim_f(*mats32, wj, geom.src_idx, geom.rcv_idx))
    rms = np.sqrt(np.mean((s_fus - s_ref) ** 2)) / np.sqrt(np.mean(s_ref**2))
    assert rms < 2e-5, f"fused vs jnp fs forward RMS {rms:.3e}"

    d_obs = jnp.asarray(s_ref) * 1.01

    def loss_f(mats):
        return 0.5 * jnp.sum(
            (sim_f(*mats, wj, geom.src_idx, geom.rcv_idx) - d_obs) ** 2
        )

    sim_j = make_elastic_simulator(grid, dt, f0, float(vp.max()),
                                   jnp.float32)

    def loss_j(mats):
        return 0.5 * jnp.sum(
            (sim_j(*mats, wj, geom.src_idx, geom.rcv_idx) - d_obs) ** 2
        )

    g_f = jax.grad(loss_f)(mats32)
    g_j = jax.grad(loss_j)(mats32)
    for name, a, b in zip(("lam", "lam2mu", "mu_xz", "bx", "bz"), g_f, g_j):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-30
        err = np.abs(a - b).max() / scale
        assert err < 1e-4, f"{name} fused vs jnp fs grad rel {err:.3e}"
