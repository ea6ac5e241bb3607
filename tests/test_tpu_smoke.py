"""Hardware CI lane (docs/ROADMAP.md item 11): compiled-kernel parity on
the real TPU, for the fused engines whose CPU coverage is interpret-mode
only. Skipped unless TPUFWI_TEST_PLATFORM=axon (scripts/tpu_ci.sh runs it
together with test_kstep/test_scanres, which self-select compiled mode).

Grids are tiny — the point is Mosaic lowering + compiled numerics, not
throughput (bench/ owns that). Tolerances are fp32-on-TPU: the kernels
pin their MXU products to Precision.HIGHEST, so parity with the jnp
engines is expected at ~1e-5 forward / ~1e-3 gradient."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("TPUFWI_TEST_PLATFORM", "cpu") != "axon",
    reason="hardware lane: set TPUFWI_TEST_PLATFORM=axon",
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpufwi import Geometry, Grid  # noqa: E402


def _elastic_setup(fs):
    from tpufwi.propagators.elastic2d import ElasticPropagator, elastic_cfl_dt
    from tpufwi.wavelets import ricker_np

    nz, nx, f0 = 48, 50, 12.0
    vp = np.full((nz, nx), 2200.0)
    vp[nz // 2 :] = 2600.0
    vs = vp / 1.8
    rho = 1000.0 + 0.3 * vp
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4,
                free_surface=fs)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), 4, safety=0.7)
    w = ricker_np(f0, dt, 110)
    src = np.array([[6, nx // 2]])
    rx = np.arange(5, nx - 5, 3)
    rcv = np.stack([np.full_like(rx, 12), rx], 1)
    geom = Geometry.from_physical(grid, src, rcv)
    prop = ElasticPropagator(grid, dt, f0, float(vp.max()), dtype=jnp.float32)
    mats = jax.tree.map(
        lambda m: m.astype(jnp.float32),
        prop.material_fields(jnp.asarray(vp), jnp.asarray(vs),
                             jnp.asarray(rho)),
    )
    return grid, dt, f0, float(vp.max()), mats, jnp.asarray(w, jnp.float32), geom


@pytest.mark.parametrize("fs", [False, True])
def test_elastic_fused_compiled_forward_and_grad(fs):
    """Compiled fused elastic engine == jnp engine (forward + gradient),
    with and without the free surface (stress/velocity images run at the
    XLA level around the compiled V/S kernels)."""
    from tpufwi.propagators.elastic2d import (
        make_elastic_simulator,
        make_elastic_simulator_fused,
    )

    grid, dt, f0, c_max, mats, w, geom = _elastic_setup(fs)
    sim_j = make_elastic_simulator(grid, dt, f0, c_max, jnp.float32)
    sim_f = make_elastic_simulator_fused(grid, dt, f0, c_max)

    s_j = np.asarray(jax.jit(sim_j)(*mats, w, geom.src_idx, geom.rcv_idx))
    s_f = np.asarray(jax.jit(sim_f)(*mats, w, geom.src_idx, geom.rcv_idx))
    rms = np.sqrt(np.mean((s_f - s_j) ** 2)) / np.sqrt(np.mean(s_j**2))
    assert rms < 1e-4, f"fs={fs} compiled fused vs jnp forward RMS {rms:.3e}"

    d_obs = jnp.asarray(s_j) * 1.01

    def loss(sim):
        def f(m):
            return 0.5 * jnp.sum(
                (sim(*m, w, geom.src_idx, geom.rcv_idx) - d_obs) ** 2
            )

        return jax.jit(jax.grad(f))

    g_j = loss(sim_j)(mats)
    g_f = loss(sim_f)(mats)
    for name, a, b in zip(("lam", "lam2mu", "mu_xz", "bx", "bz"), g_f, g_j):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        assert err < 2e-3, f"fs={fs} {name} compiled grad rel {err:.3e}"


def test_fused2_3d_step_compiled():
    """Compiled fused2 3D step (corr slabs + merged kernel) == the XLA
    strip step after 30 steps, production-like by=16/bz=32 blocks."""
    from tpufwi.kernels.acoustic3d_fused2 import make_acoustic3d_fused_step2
    from tpufwi.kernels.acoustic3d_pallas import (
        crop_y,
        crop_yz,
        extend_y,
        extend_yz,
        make_acoustic3d_strip_step,
    )

    grid = Grid(shape=(24, 30, 40), h=(10.0,) * 3, pml=8, order=8)
    c_max, f0 = 3000.0, 10.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    rng = np.random.default_rng(1)
    NY, NZ, NX = grid.padded_shape
    vp = 2500.0 + 200 * rng.standard_normal((NY, NZ, NX)).astype(np.float32)
    c2 = jnp.asarray(((vp * dt) ** 2).astype(np.float32))
    step_a, zs_a = make_acoustic3d_strip_step(grid, dt, f0, c_max, by=8)
    step_b, zs_b = make_acoustic3d_fused_step2(grid, dt, f0, c_max,
                                               by=16, bz=32, bz_y=32)
    c2a = extend_y(c2, grid, 8)
    c2b = extend_yz(c2, grid, by=16, bz=32)
    imp = jnp.zeros(grid.padded_shape, jnp.float32).at[
        NY // 2, NZ // 2, NX // 2
    ].set(1.0)
    sa, sb = zs_a(), zs_b()
    sa = (sa[0], extend_y(imp, grid, 8), sa[2])
    sb = (sb[0], extend_yz(imp, grid, by=16, bz=32), sb[2])

    def runa(s, c):
        for _ in range(30):
            s = step_a(s, c)
        return s

    def runb(s, c):
        for _ in range(30):
            s = step_b(s, c)
        return s

    sa = jax.jit(runa)(sa, c2a)
    sb = jax.jit(runb)(sb, c2b)
    pa = np.asarray(crop_y(sa[1], grid))
    pb = np.asarray(crop_yz(sb[1], grid))
    err = np.abs(pa - pb).max() / np.abs(pa).max()
    assert err < 1e-5, f"compiled fused2 vs strip step: {err:.3e}"


def test_fused3d_grad_compiled():
    """Compiled fused 3D forward+backward (adjoint3d_pallas R/T kernels)
    == the dimension-agnostic XLA engine on a tiny model."""
    from tpufwi.adjoint import make_simulator
    from tpufwi.adjoint3d_pallas import make_simulator3d_fused
    from tpufwi.wavelets import ricker

    grid = Grid(shape=(24, 30, 40), h=(12.0,) * 3, pml=8, order=8)
    c_max, f0 = 3000.0, 9.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    nt = 70
    w = ricker(f0, dt, nt).astype(jnp.float32)
    rng = np.random.default_rng(3)
    vp = 2500.0 + 150 * rng.standard_normal(grid.shape).astype(np.float32)
    pad = grid.pad
    c2 = jnp.asarray(
        ((np.pad(vp, pad, mode="edge") * dt) ** 2).astype(np.float32)
    )
    rcv = np.array([[y, 6, x] for y in range(6, 20, 6) for x in range(6, 36, 5)])
    geom = Geometry.from_physical(grid, np.array([[12, 6, 20]]), rcv)

    sim_x = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_f = make_simulator3d_fused(grid, dt, f0, c_max, by=8, bz=16)
    d = jax.jit(sim_x)(c2, w, geom.src_idx, geom.rcv_idx) * 1.02

    def lossof(sim):
        return jax.jit(jax.value_and_grad(
            lambda c: 0.5 * jnp.sum(
                (sim(c, w, geom.src_idx, geom.rcv_idx) - d) ** 2
            )
        ))

    Jx, gx = lossof(sim_x)(c2)
    Jf, gf = lossof(sim_f)(c2)
    assert abs(float(Jx) - float(Jf)) < 1e-3 * abs(float(Jx))
    gx, gf = np.asarray(gx), np.asarray(gf)
    R = grid.radius + 1
    m = np.zeros(grid.padded_shape)
    m[pad + R : -pad - R, pad + R : -pad - R, pad + R : -pad - R] = 1.0
    err = np.abs((gf - gx) * m).max() / (np.abs(gx * m).max() + 1e-30)
    assert err < 2e-3, f"compiled fused 3D grad rel {err:.3e}"


def test_new_engines_compile_on_tpu():
    """The XLA-engine physics families added in round 2 (TTI, eikonal)
    compile and run finite on the real chip — they have no Pallas
    kernels, so this pins lax.scan lowering + fp32 numerics only."""
    from tpufwi.adjoint import make_simulator_tti
    from tpufwi.eikonal import eikonal
    from tpufwi.wavelets import ricker_np

    nz, nx, f0, nt = 40, 48, 12.0, 90
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    vmax = 2200.0 * np.sqrt(1.3)
    dt = grid.cfl_dt(vmax, safety=0.7)
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    geom = Geometry.from_physical(
        grid, np.array([[20, 12]]),
        np.stack([np.full(6, 6), np.arange(8, 44, 6)], 1))
    sim = make_simulator_tti(grid, dt, f0, vmax, jnp.float32)
    vz2 = jnp.full(grid.padded_shape, 2000.0**2 * dt * dt, jnp.float32)
    fe = jnp.full(grid.padded_shape, 1.3, jnp.float32)
    fd = jnp.full(grid.padded_shape, 1.1, jnp.float32)
    th = jnp.full(grid.padded_shape, 0.3, jnp.float32)
    trig = (jnp.cos(th) ** 2, jnp.sin(th) ** 2, jnp.sin(2 * th))
    seis = jax.jit(sim)(vz2, fe, fd, *trig, w, geom.src_idx, geom.rcv_idx)
    assert bool(jnp.isfinite(seis).all()) and float(jnp.abs(seis).max()) > 0

    s = jnp.full((nz, nx), 1.0 / 2000.0, jnp.float32)
    t = jax.jit(lambda s_: eikonal(s_, (10.0, 10.0),
                                   np.array([[20, 24]]), n_iter=120))(s)
    r = np.hypot(*np.mgrid[0:nz, 0:nx] - np.array([[[20]], [[24]]])) * 10.0
    m = r > 30.0
    rel = np.abs(np.asarray(t) - r / 2000.0)[m] / (r[m] / 2000.0)
    assert rel.max() < 0.06, rel.max()


def test_auto3d_driver_path_compiled():
    """impl='auto' routes a 3D fp32 grid to the fused engine on the real
    TPU (VERDICT r3 item 2) and its value+grad matches the jnp engine."""
    from tpufwi.misfit import l2_misfit
    from tpufwi.propagators.acoustic2d import AcousticPropagator
    from tpufwi.wavelets import ricker

    vp = np.full((24, 30, 40), 2500.0, np.float32)
    vp[:, 15:, :] = 2900.0
    grid = Grid(shape=vp.shape, h=(10.0,) * 3, pml=8, order=8)
    dt = grid.cfl_dt(2900.0, safety=0.7)
    # nt long enough (and the source deep enough) that the reflection
    # actually reaches the receivers: at nt=80/src_z=2 the gradient is
    # ~1e-9 noise and ANY relative comparison is meaningless (measured:
    # |g|max 3e-9, rel 1.3; at this config |g|max 1.7e-4, rel 4.5e-6)
    nt = 300
    w = jnp.asarray(ricker(8.0, dt, nt), jnp.float32)
    rcv = np.array([[y, 3, x] for y in range(4, 20, 4)
                    for x in range(4, 36, 4)])
    geom = Geometry.from_physical(grid, np.array([[12, 10, 20]]), rcv)

    prop = AcousticPropagator(grid, dt, 8.0, 2900.0, impl="auto")
    assert prop.resolve_impl(geom, nt=nt) == "pallas3d"
    prop_ref = AcousticPropagator(grid, dt, 8.0, 2900.0, impl="jnp")

    vpj = jnp.asarray(vp)
    d_obs = jax.jit(lambda v: prop_ref(v, geom, w))(vpj * 0 + 2600.0)

    def loss(p):
        return jax.jit(
            jax.value_and_grad(lambda v: l2_misfit(p(v, geom, w), d_obs))
        )

    J_f, g_f = loss(prop)(vpj)
    J_j, g_j = loss(prop_ref)(vpj)
    np.testing.assert_allclose(float(J_f), float(J_j), rtol=2e-4)
    rel = float(jnp.linalg.norm(g_f - g_j) / jnp.linalg.norm(g_j))
    assert rel < 1e-4, rel  # measured 4.5e-6 on v5e (2026-08-20)
