"""Eikonal solver + first-arrival traveltime tomography (eikonal.py):
analytic fields, AD gradients, picker, and the tomography driver."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi.eikonal import eikonal, first_breaks, traveltime_tomography



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def test_homogeneous_2d_and_3d():
    """t = r/c in constant media (first-order Godunov + analytic source
    seed: a few percent away from the source, exact along axes)."""
    h, c = 10.0, 2000.0
    n = 81
    t = np.asarray(eikonal(jnp.full((n, n), 1 / c), (h, h),
                           np.array([[40, 40]])))
    zz, xx = np.mgrid[0:n, 0:n]
    r = np.hypot(zz - 40, xx - 40) * h
    m = r > 3 * h
    rel = np.abs(t - r / c)[m] / (r[m] / c)
    assert rel.max() < 0.04, rel.max()

    n3 = 33
    t3 = np.asarray(eikonal(jnp.full((n3,) * 3, 1 / c), (h, h, h),
                            np.array([[16, 16, 16]])))
    g = np.mgrid[0:n3, 0:n3, 0:n3]
    r3 = np.sqrt(sum((gi - 16) ** 2 for gi in g)) * h
    m3 = r3 > 3 * h
    rel3 = np.abs(t3 - r3 / c)[m3] / (r3[m3] / c)
    assert rel3.max() < 0.06, rel3.max()


def test_vertical_gradient_analytic():
    """v(z) = v0 + g z has the closed-form two-point traveltime
    t = acosh(1 + g^2 d^2 / (2 v_src v_rcv)) / g [GENRE]; the solver
    matches within ~1.5% across reflection- and diving-wave paths."""
    h, v0, g = 10.0, 1500.0, 0.9
    nz, nx = 80, 120
    v = (v0 + g * np.arange(nz) * h)[:, None] * np.ones((1, nx))
    t = np.asarray(eikonal(jnp.asarray(1.0 / v), (h, h),
                           np.array([[0, 20]]), n_iter=800))
    for rz, rx in ((0, 100), (60, 80), (70, 20), (40, 110)):
        d = np.hypot(rz * h, (rx - 20) * h)
        t_true = np.arccosh(
            1 + g * g * d * d / (2 * v0 * (v0 + g * rz * h))) / g
        assert abs(t[rz, rx] - t_true) / t_true < 0.02, (rz, rx)


def test_gradient_finite_difference():
    """Slowness gradients through the two-phase (monotone + pure) scan
    match finite differences on a SMOOTH heterogeneous model. (Perfectly
    homogeneous media sit on symmetry-tie kinks of the min-based update
    where the loss is non-smooth — FD there checks a subgradient, which
    is why the test perturbs the background.)"""
    h = 10.0
    nz, nx = 30, 40
    rng = np.random.default_rng(1)
    s0 = jnp.asarray((1 + 0.1 * rng.random((nz, nx))) / 2000.0)
    rcv = (jnp.array([25, 20]), jnp.array([35, 10]))

    def loss(sl):
        t = eikonal(sl, (h, h), np.array([[2, 5]]), n_iter=150)
        return jnp.sum(t[rcv] ** 2)

    g = jax.grad(loss)(s0)
    v = jnp.asarray(np.random.default_rng(0).standard_normal((nz, nx)))
    eps = 1e-9
    fd = (loss(s0 + eps * v) - loss(s0 - eps * v)) / (2 * eps)
    rel = abs(float(jnp.vdot(g, v)) - float(fd)) / abs(float(fd))
    assert rel < 1e-5, rel


def test_first_breaks_picker():
    """Threshold picker returns the onset of each trace within a couple
    of samples, independent of amplitude scale."""
    nt, dt = 400, 1e-3
    onsets = np.array([57, 130, 255])
    seis = np.zeros((nt, 3))
    tax = np.arange(nt) * dt
    for i, o in enumerate(onsets):
        tau = tax - o * dt
        env = np.exp(-((tau - 0.02) / 0.01) ** 2)
        seis[:, i] = (10.0 ** i) * env * np.sin(2 * np.pi * 60 * tau)
    picks = np.asarray(first_breaks(jnp.asarray(seis), dt, frac=0.05))
    assert np.all(np.abs(picks / dt - onsets) < 12), picks / dt


def test_tomography_recovers_anomaly():
    """Crosswell+surface toy: the tomography drops the pick misfit by
    >100x and recovers most of the fast lens (model error < 0.35x of
    the start) — the initial-model-building workflow ahead of FWI."""
    h = 10.0
    nz, nx = 50, 70
    zz, xx = np.mgrid[0:nz, 0:nx]
    v_t = 1800.0 + 8.0 * zz + 250.0 * np.exp(
        -(((zz - 24) / 8) ** 2 + ((xx - 35) / 12) ** 2))
    v_0 = 1800.0 + 8.0 * zz
    s_t, s_0 = jnp.asarray(1 / v_t), jnp.asarray(1 / v_0)
    srcs = np.array([[z, 2] for z in range(4, nz - 4, 8)]
                    + [[2, x] for x in range(10, nx - 10, 14)])
    rcv = np.array([[z, nx - 3] for z in range(4, nz - 4, 6)]
                   + [[nz - 3, x] for x in range(6, nx - 6, 8)])
    t_obs = jnp.stack([
        eikonal(s_t, (h, h), srcs[i : i + 1])[tuple(rcv.T)]
        for i in range(len(srcs))
    ])
    from tpufwi.precondition import gaussian_smooth

    logs = []
    s_inv = traveltime_tomography(
        s_0, (h, h), srcs, rcv, t_obs, n_outer=12,
        bounds=(1 / 3000.0, 1 / 1500.0),
        smooth=lambda g: gaussian_smooth(g, 2.0),
        log_fn=lambda r: logs.append(r))
    assert logs[-1]["J"] < 1e-2 * logs[0]["J"], logs
    v_inv = 1.0 / np.asarray(s_inv)
    err0 = np.sqrt(np.mean((v_0 - v_t) ** 2))
    err1 = np.sqrt(np.mean((v_inv - v_t) ** 2))
    assert err1 / err0 < 0.35, err1 / err0
