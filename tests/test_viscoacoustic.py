"""Viscoacoustic constant-Q engine (kernels/viscoacoustic_jnp.py +
adjoint.make_simulator_visco): oracle parity, lossless limit, physical
attenuation rate, AD gradients through the checkpointed scan, and the
checkpointed_scan utility itself."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import Geometry, Grid
from tpufwi.adjoint import make_simulator_vd, make_simulator_visco
from tpufwi.kernels.acoustic_vd_jnp import buoy_to_half
from tpufwi.kernels.oracle_numpy import oracle_forward_vd
from tpufwi.kernels.viscoacoustic_jnp import tau_of_q
from tpufwi.wavelets import ricker_np


def _inputs(grid, vp, rho, q, dt):
    pad = grid.pad
    pd = lambda f: jnp.pad(jnp.asarray(f, jnp.float64), pad, mode="edge")
    vp_, rho_ = pd(vp), pd(rho)
    kdt2 = rho_ * vp_**2 * dt * dt
    buoy = 1.0 / rho_
    bh = tuple(buoy_to_half(buoy, ax) for ax in range(grid.ndim))
    tau = tau_of_q(pd(q)) if q is not None else None
    return kdt2, tau, bh


def _setup(nz=44, nx=56, pml=10, order=4, f0=14.0, nt=260, q0=30.0):
    rng = np.random.default_rng(0)
    vp = 2000.0 + 150.0 * rng.random((nz, nx))
    rho = 1200.0 + 200.0 * rng.random((nz, nx))
    q = q0 + 20.0 * rng.random((nz, nx))
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=pml, order=order)
    dt = grid.cfl_dt(float(vp.max()), safety=0.6)
    w = ricker_np(f0, dt, nt)
    src = np.array([[nz // 2, nx // 3]])
    rx = np.arange(6, nx - 6, 4)
    rcv = np.stack([np.full_like(rx, nz // 2 + 5), rx], 1)
    geom = Geometry.from_physical(grid, src, rcv)
    return grid, vp, rho, q, dt, w, geom, f0


def test_matches_oracle():
    grid, vp, rho, q, dt, w, geom, f0 = _setup()
    seis_o = oracle_forward_vd(vp, rho, grid, dt, w, geom.src_idx - grid.pad,
                               geom.rcv_idx - grid.pad, f0, q=q)
    sim = make_simulator_visco(grid, dt, f0, float(vp.max()), jnp.float64)
    kdt2, tau, bh = _inputs(grid, vp, rho, q, dt)
    seis = np.asarray(sim(kdt2, tau, bh, jnp.asarray(w), geom.src_idx,
                          geom.rcv_idx))
    rms = np.sqrt(np.mean((seis - seis_o) ** 2)) / np.sqrt(np.mean(seis_o**2))
    assert rms < 1e-9, f"visco vs oracle RMS {rms:.3e}"


def test_lossless_limit_is_vd():
    """Q -> inf reduces the scheme identically to the vd engine."""
    grid, vp, rho, _, dt, w, geom, f0 = _setup()
    q = np.full(vp.shape, 1e9)
    sim_v = make_simulator_visco(grid, dt, f0, float(vp.max()), jnp.float64)
    sim_a = make_simulator_vd(grid, dt, f0, float(vp.max()), jnp.float64,
                              use_custom_vjp=False)
    kdt2, tau, bh = _inputs(grid, vp, rho, q, dt)
    s_v = np.asarray(sim_v(kdt2, tau, bh, jnp.asarray(w), geom.src_idx,
                           geom.rcv_idx))
    s_a = np.asarray(sim_a(kdt2, bh, jnp.asarray(w), geom.src_idx,
                           geom.rcv_idx))
    rms = np.sqrt(np.mean((s_v - s_a) ** 2)) / np.sqrt(np.mean(s_a**2))
    assert rms < 1e-8, f"Q=inf vs lossless RMS {rms:.3e}"


def test_attenuation_rate_matches_constant_q():
    """Homogeneous Q: the extra decay between two receivers (relative to
    the lossless run, which cancels geometric spreading) matches
    exp(-pi f0 dt_travel / Q) within 15%."""
    nz, nx, f0, Q = 40, 220, 16.0, 25.0
    vp = np.full((nz, nx), 2000.0)
    rho = np.full((nz, nx), 1200.0)
    q = np.full((nz, nx), Q)
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=12, order=8)
    dt = grid.cfl_dt(2000.0, safety=0.6)
    x1, x2 = 60, 180
    src = np.array([[nz // 2, 10]])
    rcv = np.array([[nz // 2, x1], [nz // 2, x2]])
    geom = Geometry.from_physical(grid, src, rcv)
    t2 = (x2 - 10) * 10.0 / 2000.0
    nt = int((t2 + 2.0 / f0) / dt) + 8
    w = ricker_np(f0, dt, nt)
    sim_v = make_simulator_visco(grid, dt, f0, 2000.0, jnp.float64)
    sim_a = make_simulator_vd(grid, dt, f0, 2000.0, jnp.float64,
                              use_custom_vjp=False)
    kdt2, tau, bh = _inputs(grid, vp, rho, q, dt)
    s_v = np.asarray(sim_v(kdt2, tau, bh, jnp.asarray(w), geom.src_idx,
                           geom.rcv_idx))
    s_a = np.asarray(sim_a(kdt2, bh, jnp.asarray(w), geom.src_idx,
                           geom.rcv_idx))
    # spectral amplitude AT f0 (the SLS is pinned exactly there; the
    # broadband peak amplitude would decay slower — Q(w) >= Q0 off-band);
    # the lossless run cancels 2D geometric spreading exactly
    freqs = np.fft.rfftfreq(nt, dt)
    k0 = int(np.argmin(np.abs(freqs - f0)))

    def amp(s):
        return np.abs(np.fft.rfft(s))[k0]

    ratio = (amp(s_v[:, 1]) / amp(s_a[:, 1])) / (
        amp(s_v[:, 0]) / amp(s_a[:, 0])
    )
    dt_travel = (x2 - x1) * 10.0 / 2000.0
    expected = np.exp(-np.pi * f0 * dt_travel / Q)
    assert abs(ratio - expected) < 0.1 * expected, (ratio, expected)


def test_gradients_finite_difference():
    """Directional FD check of the AD gradient (through the checkpointed
    scan) wrt kdt2, tau and the wavelet, fp64."""
    grid, vp, rho, q, dt, w, geom, f0 = _setup(nz=30, nx=36, nt=90)
    sim = make_simulator_visco(grid, dt, f0, float(vp.max()), jnp.float64)
    kdt2, tau, bh = _inputs(grid, vp, rho, q, dt)
    wj = jnp.asarray(w)

    def loss(kdt2_, tau_, w_):
        s = sim(kdt2_, tau_, bh, w_, geom.src_idx, geom.rcv_idx)
        return jnp.sum(s * s)

    g = jax.grad(loss, argnums=(0, 1, 2))(kdt2, tau, wj)
    rng = np.random.default_rng(5)
    # interior-supported directions (the scheme is exact everywhere for
    # plain AD, but keep perturbations off the CPML for conditioning)
    md = np.zeros(grid.padded_shape)
    md[grid.pad + 2 : -grid.pad - 2, grid.pad + 2 : -grid.pad - 2] = 1.0
    for i, (x0, scale) in enumerate(((kdt2, 1e-6), (tau, 1e-5), (wj, 1e-5))):
        v = rng.standard_normal(np.asarray(x0).shape)
        if v.shape == md.shape:
            v = v * md
        v = jnp.asarray(v)
        h = scale
        args = [kdt2, tau, wj]
        ap = list(args); ap[i] = args[i] + h * v
        am = list(args); am[i] = args[i] - h * v
        fd = (loss(*ap) - loss(*am)) / (2 * h)
        got = float(jnp.vdot(g[i], v))
        rel = abs(got - float(fd)) / max(1.0, abs(float(fd)))
        assert rel < 1e-4, (i, rel)  # central-FD truncation floor


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_q_fwi_problem_inverts():
    """(vp, Q) multiparameter driver: one stage on a tiny low-Q anomaly —
    the objective decreases and the Q update has the right sign inside
    the anomaly."""
    from tpufwi.config import StageCfg
    from tpufwi.invert import QFwiProblem, invert_multiparameter

    nz, nx, f0, rho = 36, 60, 12.0, 1000.0
    vp_t = np.full((nz, nx), 2000.0, np.float32)
    q_t = np.full((nz, nx), 100.0, np.float32)
    q_t[14:24, 24:40] = 20.0
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    dt = grid.cfl_dt(2100.0, safety=0.7)
    nt = 170
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    from tpufwi.acquisition import split_spread_survey

    geoms = split_spread_survey(grid, 2, src_z=2, rcv_z=2, rcv_dx=3)
    from tpufwi.adjoint import make_simulator_visco as msv

    sim = msv(grid, dt, f0, 2100.0, jnp.float32)
    pb = QFwiProblem(sim=sim, grid=grid, dt=dt, geoms=geoms,
                     d_obs=None, wavelet=w, rho=rho)
    kdt2, tau, bh = pb._fields(jnp.asarray(vp_t), jnp.asarray(q_t))
    d_obs = jnp.stack([
        sim(kdt2, tau, bh, w,
            jax.tree.map(lambda x: x[i], geoms).src_idx,
            jax.tree.map(lambda x: x[i], geoms).rcv_idx)
        for i in range(2)
    ])
    pb = QFwiProblem(sim=sim, grid=grid, dt=dt, geoms=geoms,
                     d_obs=d_obs, wavelet=w, rho=rho)
    m0 = (jnp.full((nz, nx), 2000.0, jnp.float32),
          jnp.full((nz, nx), 100.0, jnp.float32))
    Js = []
    m1 = invert_multiparameter(
        pb, m0, [StageCfg(fmax=None, iterations=4)],
        bounds=((1800.0, 2200.0), (10.0, 300.0)),
        log_fn=lambda rec: Js.append(rec["J"]),
    )
    assert Js[-1] < 0.8 * Js[0], Js
    dq = np.asarray(m1[1]) - 100.0
    in_mean = dq[14:24, 24:40].mean()
    out_mean = dq[2:10, 24:40].mean()
    # Q decreases inside the low-Q anomaly, and more than outside it
    # (4 L-BFGS iterations split between vp and Q — direction and
    # localization are the testable properties, not amplitude)
    assert in_mean < -0.2, in_mean
    assert in_mean < out_mean - 0.1, (in_mean, out_mean)


def test_checkpointed_scan_matches_lax_scan():
    from jax import lax

    from tpufwi.propagators.remat import checkpointed_scan

    def f(c, x):
        c = 0.9 * c + jnp.tanh(x + c)
        return c, c * c

    xs = jnp.asarray(np.random.default_rng(1).standard_normal(37))

    def total_ref(xs_):
        c, ys = lax.scan(f, 0.1, xs_)
        return c + jnp.sum(ys)

    def total_ck(xs_):
        c, ys = checkpointed_scan(f, 0.1, xs_, chunk=8)  # 37 pads to 40
        return c + jnp.sum(ys)

    v_ref, g_ref = jax.value_and_grad(total_ref)(xs)
    v_ck, g_ck = jax.value_and_grad(total_ck)(xs)
    assert abs(float(v_ref) - float(v_ck)) < 1e-12
    assert float(jnp.abs(g_ref - g_ck).max()) < 1e-12
