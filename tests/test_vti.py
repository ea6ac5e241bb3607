"""VTI pseudo-acoustic engine (kernels/vti_jnp.py): isotropic reduction,
elliptic/anelliptic kinematics along the symmetry axes, stability, and
AD gradients through the checkpointed scan."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import Geometry, Grid
from tpufwi.adjoint import make_simulator, make_simulator_vti
from tpufwi.wavelets import ricker_np


def _pad(a, grid):
    return jnp.pad(jnp.asarray(a, jnp.float64), grid.pad, mode="edge")


def test_isotropic_reduction():
    """eps = delta = 0: p == q and the system equals the isotropic
    collocated engine exactly (same D2+CPML scheme)."""
    nz, nx, f0, nt = 44, 56, 13.0, 220
    rng = np.random.default_rng(0)
    vp = 2000.0 + 180.0 * rng.random((nz, nx))
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=8)
    dt = grid.cfl_dt(float(vp.max()), safety=0.6)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    geom = Geometry.from_physical(
        grid, np.array([[nz // 2, nx // 3]]),
        np.stack([np.full(10, 12), np.arange(6, 46, 4)], 1),
    )
    c2dt2 = _pad(vp, grid) ** 2 * dt * dt
    ones = jnp.ones(grid.padded_shape, jnp.float64)
    sim_v = make_simulator_vti(grid, dt, f0, float(vp.max()), jnp.float64)
    sim_i = make_simulator(grid, dt, f0, float(vp.max()), jnp.float64,
                           use_custom_vjp=False)
    s_v = np.asarray(sim_v(c2dt2, ones, ones, w, geom.src_idx, geom.rcv_idx))
    s_i = np.asarray(sim_i(c2dt2, w, geom.src_idx, geom.rcv_idx))
    rms = np.sqrt(np.mean((s_v - s_i) ** 2)) / np.sqrt(np.mean(s_i**2))
    assert rms < 1e-12, f"VTI(0,0) vs isotropic RMS {rms:.3e}"


def _axis_arrivals(eps, delta, n=150, f0=13.0, vp0=2000.0, d_cells=55):
    """First-arrival times along x and z at equal offsets from a center
    source in a homogeneous VTI medium."""
    grid = Grid(shape=(n, n), h=(10.0, 10.0), pml=12, order=8)
    vmax = vp0 * np.sqrt(1.0 + 2.0 * max(eps, 0.0))
    dt = grid.cfl_dt(vmax, safety=0.55)
    c = n // 2
    t_need = d_cells * 10.0 / vp0 + 2.5 / f0
    nt = int(t_need / dt)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    geom = Geometry.from_physical(
        grid, np.array([[c, c]]),
        np.array([[c, c + d_cells], [c + d_cells, c]]),  # along x, along z
    )
    sim = make_simulator_vti(grid, dt, f0, vmax, jnp.float64)
    vz2 = jnp.full(grid.padded_shape, vp0**2, jnp.float64) * dt * dt
    fe = jnp.full(grid.padded_shape, 1.0 + 2.0 * eps, jnp.float64)
    fd = jnp.full(grid.padded_shape, 1.0 + 2.0 * delta, jnp.float64)
    s = np.asarray(sim(vz2, fe, fd, w, geom.src_idx, geom.rcv_idx))
    t0 = 1.5 / f0  # Ricker delay
    picks = []
    for i in range(2):
        env = np.abs(s[:, i])
        picks.append(np.argmax(env) * dt - t0)
    return picks[0], picks[1], s  # (t_x, t_z, seis)


def test_elliptic_kinematics():
    """eps = delta = 0.18 (elliptic): the horizontal arrival speeds up by
    sqrt(1+2 eps); the vertical one keeps vpz."""
    eps = 0.18
    t_x, t_z, _ = _axis_arrivals(eps, eps)
    d = 55 * 10.0
    vx = d / t_x
    vz = d / t_z
    assert abs(vx - 2000.0 * np.sqrt(1 + 2 * eps)) < 0.04 * vx, vx
    assert abs(vz - 2000.0) < 0.04 * vz, vz


def test_anelliptic_stability_and_kinematics():
    """eps > delta (anelliptic, the standard stable regime): axis phase
    velocities are still vp*sqrt(1+2 eps) horizontally and vp vertically,
    and the run stays bounded (no SV-artifact blowup)."""
    t_x, t_z, s = _axis_arrivals(0.22, 0.08)
    d = 55 * 10.0
    assert abs(d / t_x - 2000.0 * np.sqrt(1.44)) < 0.04 * (d / t_x)
    assert abs(d / t_z - 2000.0) < 0.04 * (d / t_z)
    assert np.isfinite(s).all()
    # bounded coda: late energy below the arrival peak
    assert np.abs(s[-10:]).max() < np.abs(s).max()


def test_gradients_finite_difference():
    nz, nx, f0, nt = 30, 36, 13.0, 90
    rng = np.random.default_rng(3)
    vp = 2000.0 + 100.0 * rng.random((nz, nx))
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    vmax = float(vp.max()) * np.sqrt(1.5)
    dt = grid.cfl_dt(vmax, safety=0.6)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    geom = Geometry.from_physical(
        grid, np.array([[nz // 2, 8]]),
        np.stack([np.full(6, 8), np.arange(8, 32, 4)], 1),
    )
    # plain-AD path: exact everywhere, the FD reference configuration
    sim = make_simulator_vti(grid, dt, f0, vmax, jnp.float64,
                             use_custom_vjp=False)
    vz2 = _pad(vp, grid) ** 2 * dt * dt
    fe = jnp.full(grid.padded_shape, 1.3, jnp.float64)
    fd = jnp.full(grid.padded_shape, 1.1, jnp.float64)

    def loss(vz2_, fe_, fd_, w_):
        s = sim(vz2_, fe_, fd_, w_, geom.src_idx, geom.rcv_idx)
        return jnp.sum(s * s)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(vz2, fe, fd, w)
    md = np.zeros(grid.padded_shape)
    md[grid.pad + 2 : -grid.pad - 2, grid.pad + 2 : -grid.pad - 2] = 1.0
    for i, (x0, h) in enumerate(((vz2, 1e-6), (fe, 1e-5), (fd, 1e-5),
                                 (w, 1e-5))):
        v = rng.standard_normal(np.asarray(x0).shape)
        if v.shape == md.shape:
            v = v * md
        v = jnp.asarray(v)
        args = [vz2, fe, fd, w]
        ap = list(args); ap[i] = args[i] + h * v
        am = list(args); am[i] = args[i] - h * v
        fd_ = (loss(*ap) - loss(*am)) / (2 * h)
        got = float(jnp.vdot(g[i], v))
        rel = abs(got - float(fd_)) / max(1.0, abs(float(fd_)))
        assert rel < 1e-4, (i, rel)


@pytest.mark.slow  # lane triage r5: demo-grade mini inversion, 34 s
def test_vti_fwi_problem_inverts():
    """(vp, eps, delta) driver plumbing: band-limited stage objective
    decreases strongly through invert_multiparameter, and the initial
    gradient points toward the true model on every leaf. (Quantitative
    anisotropy recovery in a 2-shot toy is ill-conditioned — the
    parameter-scaling caveat lives in the VtiFwiProblem docstring.)"""
    from tpufwi.acquisition import split_spread_survey
    from tpufwi.config import StageCfg
    from tpufwi.invert import VtiFwiProblem, invert_multiparameter

    nz, nx, f0, nt = 36, 60, 11.0, 170
    vp_t = np.full((nz, nx), 2000.0, np.float32)
    vp_t[16:26, 20:44] = 2120.0
    ep_t = np.zeros((nz, nx), np.float32)
    ep_t[16:26, 20:44] = 0.08
    dl_t = np.zeros((nz, nx), np.float32)
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    vmax = 2200.0 * np.sqrt(1.2)
    dt = grid.cfl_dt(vmax, safety=0.6)
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    geoms = split_spread_survey(grid, 2, src_z=2, rcv_z=2, rcv_dx=3)
    sim = make_simulator_vti(grid, dt, f0, vmax, jnp.float32)
    pb0 = VtiFwiProblem(sim=sim, grid=grid, dt=dt, geoms=geoms,
                        d_obs=None, wavelet=w)
    vz2, fe, fd = pb0._fields(jnp.asarray(vp_t), jnp.asarray(ep_t),
                              jnp.asarray(dl_t))
    d = jnp.stack([
        sim(vz2, fe, fd, w,
            jax.tree.map(lambda x: x[i], geoms).src_idx,
            jax.tree.map(lambda x: x[i], geoms).rcv_idx)
        for i in range(2)
    ])
    pb = VtiFwiProblem(sim=sim, grid=grid, dt=dt, geoms=geoms,
                       d_obs=d, wavelet=w)
    m0 = (jnp.full((nz, nx), 2000.0, jnp.float32),
          jnp.full((nz, nx), 0.02, jnp.float32),
          jnp.zeros((nz, nx), jnp.float32))
    # the initial gradient points toward the true model (full-tree inner
    # product; per-leaf signs are NOT guaranteed under finite joint
    # anomalies — vp/eps crosstalk)
    vg0, _ = pb.stage_objectives(9.0)
    _, g = vg0(m0)
    truth = (jnp.asarray(vp_t), jnp.asarray(ep_t), jnp.asarray(dl_t))
    d2t = sum(
        float(jnp.vdot(gi, ti - mi)) for gi, mi, ti in zip(g, m0, truth)
    )
    assert d2t < 0, d2t

    Js = []
    m1 = invert_multiparameter(
        pb, m0, [StageCfg(fmax=9.0, iterations=4)],
        bounds=((1850.0, 2250.0), (0.0, 0.2), (0.0, 0.05)),
        log_fn=lambda r: Js.append(r["J"]),
    )
    assert Js[-1] < 0.6 * Js[0], Js
    assert all(np.isfinite(np.asarray(x)).all() for x in m1)


def test_custom_vjp_matches_full_ad():
    """The boundary-saving VTI adjoint (two-field reverse reconstruction
    with ring re-imposition) == checkpointed full AD: J to roundoff,
    model gradients to 1e-10 on the valid interior shrunk by radius+1,
    wavelet cotangent everywhere."""
    nz, nx, f0, nt = 34, 42, 13.0, 110
    rng = np.random.default_rng(9)
    vp = 2000.0 + 120.0 * rng.random((nz, nx))
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    vmax = float(vp.max()) * np.sqrt(1.5)
    dt = grid.cfl_dt(vmax, safety=0.6)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    geom = Geometry.from_physical(
        grid, np.array([[nz // 2, 9]]),
        np.stack([np.full(6, 9), np.arange(9, 33, 4)], 1),
    )
    vz2 = _pad(vp, grid) ** 2 * dt * dt
    fe = _pad(1.22 + 0.1 * rng.random((nz, nx)), grid)
    fd = _pad(1.08 + 0.05 * rng.random((nz, nx)), grid)
    sim_c = make_simulator_vti(grid, dt, f0, vmax, jnp.float64)
    sim_a = make_simulator_vti(grid, dt, f0, vmax, jnp.float64,
                               use_custom_vjp=False)

    def loss(sim):
        return lambda m: jnp.sum(
            sim(m[0], m[1], m[2], m[3], geom.src_idx, geom.rcv_idx) ** 2
        )

    m = (vz2, fe, fd, w)
    Jc, gc = jax.value_and_grad(loss(sim_c))(m)
    Ja, ga = jax.value_and_grad(loss(sim_a))(m)
    assert abs(float(Jc) - float(Ja)) < 1e-12 * abs(float(Ja))
    pad, R = grid.pad, grid.radius + 1
    mask = np.zeros(grid.padded_shape)
    mask[pad + R : -pad - R, pad + R : -pad - R] = 1.0
    for name, a, b in zip(("vz2", "f_eps", "f_del"), gc[:3], ga[:3]):
        a = np.asarray(a) * mask
        b = np.asarray(b) * mask
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        assert rel < 1e-10, (name, rel)
    relw = float(jnp.abs(gc[3] - ga[3]).max() / jnp.abs(ga[3]).max())
    assert relw < 1e-10, relw
