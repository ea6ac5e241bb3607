"""Variable-density acoustics: oracle equivalence, density-contrast
physics, and exact gradients for (vp, rho) via the boundary-saving VJP."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from tpufwi import Grid
from tpufwi.adjoint import make_simulator_vd
from tpufwi.kernels.acoustic_vd_jnp import buoy_to_half
from tpufwi.kernels.oracle_numpy import oracle_forward_vd
from tpufwi.misfit import l2_misfit
from tpufwi.wavelets import ricker


def _fields(grid, vp, rho, dt):
    pad = grid.pad
    vp_p = jnp.asarray(np.pad(vp, pad, mode="edge"), jnp.float64)
    rho_p = jnp.asarray(np.pad(rho, pad, mode="edge"), jnp.float64)
    kdt2 = rho_p * vp_p**2 * dt * dt
    buoy = 1.0 / rho_p
    bh = tuple(buoy_to_half(buoy, ax) for ax in range(grid.ndim))
    return kdt2, bh


def test_vd_forward_matches_oracle():
    grid = Grid(shape=(50, 70), h=(10.0, 10.0), pml=10, order=4)
    rng = np.random.default_rng(5)
    vp = 2000.0 + 100 * rng.standard_normal(grid.shape)
    rho = 2000.0 + 300 * rng.standard_normal(grid.shape)
    c_max, f0, nt = float(vp.max()), 12.0, 160
    dt = grid.cfl_dt(c_max, safety=0.5)
    w = ricker(f0, dt, nt, dtype=jnp.float64)
    src = np.array([[25, 20]])
    rcv = np.array([[10, x] for x in range(8, 62, 4)])

    ref = oracle_forward_vd(vp, rho, grid, dt, np.asarray(w), src, rcv, f0)

    sim = make_simulator_vd(grid, dt, f0, c_max, dtype=jnp.float64,
                            use_custom_vjp=False)
    kdt2, bh = _fields(grid, vp, rho, dt)
    pad = grid.pad
    got = np.asarray(sim(kdt2, bh, w, jnp.asarray(src + pad),
                         jnp.asarray(rcv + pad)))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-9, f"vd jnp engine vs fp64 oracle: {err:.3e}"


def test_density_contrast_reflects():
    """A density-only interface (constant vp) must reflect — impedance
    physics the constant-density engine cannot represent."""
    grid = Grid(shape=(80, 60), h=(10.0, 10.0), pml=12, order=4)
    vp = np.full(grid.shape, 2000.0)
    rho_c = np.full(grid.shape, 1500.0)
    rho_j = rho_c.copy()
    rho_j[50:] = 4000.0  # strong density jump at depth
    dt = grid.cfl_dt(2000.0, safety=0.5)
    nt = 380
    f0 = 14.0
    w = ricker(f0, dt, nt, dtype=jnp.float64)
    src = np.array([[6, 30]])
    rcv = np.array([[6, x] for x in range(10, 50, 2)])
    pad = grid.pad

    sim = make_simulator_vd(grid, dt, f0, 2000.0, dtype=jnp.float64,
                            use_custom_vjp=False)

    def run(rho):
        kdt2, bh = _fields(grid, vp, rho, dt)
        return np.asarray(sim(kdt2, bh, w, jnp.asarray(src + pad),
                              jnp.asarray(rcv + pad)))

    s_const = run(rho_c)
    s_jump = run(rho_j)
    # window after the direct wave has passed: two-way time to the
    # interface is 2*440m/2000 = 0.44 s
    t0 = int(0.40 / dt)
    refl = s_jump[t0:] - s_const[t0:]
    e_direct = float(np.sum(s_const[:t0] ** 2))
    e_refl = float(np.sum(refl**2))
    assert e_refl > 1e-4 * e_direct, (
        f"density-only reflection too weak: {e_refl:.3e} vs direct {e_direct:.3e}"
    )
    # and before the reflection window the fields agree (same direct wave)
    e_pre = float(np.sum((s_jump[: t0 // 2] - s_const[: t0 // 2]) ** 2))
    assert e_pre < 1e-6 * e_direct


def test_vd_gradient_boundary_saving_equals_full_ad():
    grid = Grid(shape=(36, 44), h=(12.0, 12.0), pml=8, order=4)
    rng = np.random.default_rng(9)
    vp = 2000.0 + 80 * rng.standard_normal(grid.shape)
    rho = 1800.0 + 150 * rng.standard_normal(grid.shape)
    c_max, f0, nt = float(vp.max()), 12.0, 120
    dt = grid.cfl_dt(c_max, safety=0.5)
    w = ricker(f0, dt, nt, dtype=jnp.float64)
    src = np.array([[18, 10]])
    rcv = np.array([[8, x] for x in range(6, 40, 3)])
    pad = grid.pad
    si = jnp.asarray(src + pad)
    ri = jnp.asarray(rcv + pad)

    sim_bs = make_simulator_vd(grid, dt, f0, c_max, dtype=jnp.float64)
    sim_ad = make_simulator_vd(grid, dt, f0, c_max, dtype=jnp.float64,
                               use_custom_vjp=False)
    kdt2, bh = _fields(grid, vp, rho, dt)
    d_obs = sim_ad(kdt2, bh, w, si, ri)
    kdt2p = kdt2 * 1.04

    def loss(sim):
        return lambda k, b: l2_misfit(sim(k, b, w, si, ri), d_obs)

    (gk_ad, gb_ad) = jax.grad(loss(sim_ad), argnums=(0, 1))(kdt2p, bh)
    (gk_bs, gb_bs) = jax.grad(loss(sim_bs), argnums=(0, 1))(kdt2p, bh)

    rings = sim_bs.rings  # vd rings are 2R-1 wide (composite reach)
    gk_ad = np.asarray(rings.mask_valid(gk_ad))
    gk_bs = np.asarray(gk_bs)
    err_k = np.abs(gk_bs - gk_ad).max() / np.abs(gk_ad).max()
    assert err_k < 1e-9, f"kdt2 gradient: {err_k:.3e}"
    for ax in range(2):
        ga = np.asarray(rings.mask_valid(gb_ad[ax]))
        gb = np.asarray(gb_bs[ax])
        err_b = np.abs(gb - ga).max() / (np.abs(ga).max() + 1e-300)
        assert err_b < 1e-9, f"buoyancy[{ax}] gradient: {err_b:.3e}"


def test_vd_rho_vp_chain_rule_dot_product():
    """End-to-end (vp, rho) gradients through the parameterization pass a
    directional finite-difference check."""
    grid = Grid(shape=(30, 36), h=(12.0, 12.0), pml=8, order=4)
    rng = np.random.default_rng(11)
    vp0 = np.full(grid.shape, 2000.0)
    rho0 = np.full(grid.shape, 1800.0)
    c_max, f0, nt = 2300.0, 12.0, 100
    dt = grid.cfl_dt(c_max, safety=0.5)
    w = ricker(f0, dt, nt, dtype=jnp.float64)
    src = np.array([[15, 8]])
    rcv = np.array([[6, x] for x in range(6, 30, 3)])
    pad = grid.pad
    si = jnp.asarray(src + pad)
    ri = jnp.asarray(rcv + pad)
    sim = make_simulator_vd(grid, dt, f0, c_max, dtype=jnp.float64)

    vp_t = vp0 + 60 * np.tanh(rng.standard_normal(grid.shape))
    rho_t = rho0 + 90 * np.tanh(rng.standard_normal(grid.shape))

    def fields(vp_, rho_):
        vp_p = jnp.asarray(np.zeros(()) , jnp.float64)  # placeholder
        vpp = jnp.pad(vp_, pad, mode="edge")
        rhp = jnp.pad(rho_, pad, mode="edge")
        kdt2 = rhp * vpp**2 * dt * dt
        buoy = 1.0 / rhp
        bh = tuple(buoy_to_half(buoy, ax) for ax in range(2))
        return kdt2, bh

    kt, bt = fields(jnp.asarray(vp_t), jnp.asarray(rho_t))
    d_obs = sim(kt, bt, w, si, ri)

    def J(m):
        vp_, rho_ = m
        kdt2, bh = fields(vp_, rho_)
        return l2_misfit(sim(kdt2, bh, w, si, ri), d_obs)

    m0 = (jnp.asarray(vp0, jnp.float64), jnp.asarray(rho0, jnp.float64))
    J0, g = jax.value_and_grad(J)(m0)
    # random interior-supported direction
    dm_v = rng.standard_normal(grid.shape)
    dm_r = rng.standard_normal(grid.shape)
    mask = np.zeros(grid.shape)
    mask[6:-6, 6:-6] = 1.0
    dm = (jnp.asarray(dm_v * mask), jnp.asarray(dm_r * mask))
    gdot = float(sum(jnp.vdot(gi, di) for gi, di in zip(g, dm)))
    eps = 1e-3
    Jp = float(J(tuple(mi + eps * di for mi, di in zip(m0, dm))))
    Jm = float(J(tuple(mi - eps * di for mi, di in zip(m0, dm))))
    fd = (Jp - Jm) / (2 * eps)
    rel = abs(fd - gdot) / (abs(fd) + 1e-300)
    assert rel < 1e-5, f"(vp,rho) directional FD vs AD: {rel:.3e}"


@pytest.mark.slow  # lane triage r5: demo-grade mini inversion, 24 s
def test_vd_fwi_recovers_density_anomaly():
    """End-to-end (vp, rho) FWI on the vd engine via VdFwiProblem +
    invert_multiparameter: a density-only anomaly (vp true everywhere)
    must reduce the misfit and the rho error."""
    from tpufwi.acquisition import Geometry
    from tpufwi.config import StageCfg
    from tpufwi.invert import VdFwiProblem, invert_multiparameter

    grid = Grid(shape=(40, 56), h=(10.0, 10.0), pml=8, order=4)
    vp_t = np.full(grid.shape, 2000.0)
    rho_t = np.full(grid.shape, 1800.0)
    rho_t[18:26, 20:36] = 2400.0  # density anomaly
    c_max, f0 = 2100.0, 13.0
    dt = grid.cfl_dt(c_max, safety=0.5)
    nt = 260
    w = ricker(f0, dt, nt, dtype=jnp.float64)
    sim = make_simulator_vd(grid, dt, f0, c_max, dtype=jnp.float64)

    rcv = np.array([[4, x] for x in range(4, 52, 2)])
    geom_list = [
        Geometry.from_physical(grid, np.array([[3, x]]), rcv)
        for x in (12, 28, 44)
    ]
    geoms = jax.tree.map(lambda *a: jnp.stack(a), *geom_list)

    def fwd_all(vp_, rho_):
        prob = VdFwiProblem(sim=sim, grid=grid, dt=dt, geoms=geoms,
                            d_obs=None, wavelet=w)
        kdt2, bh = prob._fields(jnp.asarray(vp_), jnp.asarray(rho_))

        def one(g):
            return sim(kdt2, bh, w, g.src_idx, g.rcv_idx)

        return jax.lax.map(one, geoms)

    d_obs = fwd_all(vp_t, rho_t)
    problem = VdFwiProblem(sim=sim, grid=grid, dt=dt, geoms=geoms,
                           d_obs=d_obs, wavelet=w)
    m0 = (jnp.asarray(vp_t, jnp.float64),
          jnp.asarray(np.full(grid.shape, 1800.0), jnp.float64))
    bounds = ((1900.0, 2100.0), (1500.0, 2600.0))
    vg, loss = problem.stage_objectives(None)
    J0 = float(loss(m0))
    m = invert_multiparameter(problem, m0, (StageCfg(None, 10),), bounds)
    J1 = float(loss(m))
    assert J1 < 0.35 * J0, f"misfit only {J1/J0:.2f} of initial"
    e0 = float(np.linalg.norm(np.asarray(m0[1]) - rho_t))
    e1 = float(np.linalg.norm(np.asarray(m[1]) - rho_t))
    # 10 iterations of surface-reflection data constrain the anomaly's
    # top; measured ratio 0.91 on this fixture (misfit ratio passes the
    # much stronger 0.35 bound above)
    assert e1 < 0.93 * e0, f"rho error ratio {e1/e0:.2f}"
