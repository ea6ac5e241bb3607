"""Blocked 3D Pallas leapfrog == jnp twin (interpret mode, CPU)."""

import jax.numpy as jnp
import numpy as np
from jax import lax

from tpufwi import Grid
from tpufwi.cpml import build_profiles
from tpufwi.kernels.acoustic2d_jnp import AcousticParams, make_acoustic_step, zero_state
from tpufwi.kernels.acoustic3d_pallas import make_acoustic3d_step, make_leapfrog3d_kernel
from tpufwi.wavelets import ricker_np


def _grid():
    # padded (40, 36, 44): NY=40 divides BY=8
    return Grid(shape=(24, 20, 28), h=(15.0, 15.0, 15.0), pml=6, order=4)


def test_leapfrog3d_matches_stencil():
    grid = _grid()
    NY, NZ, NX = grid.padded_shape
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((NY, NZ, NX)), jnp.float32)
    p_prev = jnp.asarray(rng.standard_normal((NY, NZ, NX)), jnp.float32)
    c2 = jnp.full((NY, NZ, NX), 0.02, jnp.float32)

    leap = make_leapfrog3d_kernel(grid, interpret=True)
    got = np.asarray(leap(p_prev, p, c2))

    from tpufwi.kernels.stencils import apply_stencil, scaled_taps
    from tpufwi.grid import D2_COEFFS

    lap = sum(
        apply_stencil(p, scaled_taps(D2_COEFFS[4], grid.h[a], 2), a) for a in range(3)
    )
    ref = np.asarray(2.0 * p - p_prev + c2 * lap)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-6, f"3D leapfrog kernel vs stencil: {err:.3e}"


def test_acoustic3d_step_matches_jnp_scan():
    grid = _grid()
    c_max, f0, nt = 2500.0, 10.0, 40
    dt = grid.cfl_dt(c_max, safety=0.7)
    rng = np.random.default_rng(1)
    NY, NZ, NX = grid.padded_shape
    c2 = jnp.asarray(
        ((2000 + 100 * rng.standard_normal((NY, NZ, NX))) * dt) ** 2, jnp.float32
    )
    profs = build_profiles(grid, dt, c_max, f0)
    a3 = tuple(jnp.asarray(p[0], jnp.float32) for p in profs)
    b3 = tuple(jnp.asarray(p[1], jnp.float32) for p in profs)
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    src = jnp.array([[NY // 2, NZ // 2, NX // 2]])

    # jnp reference scan (with source injection)
    jstep = make_acoustic_step(grid)
    params = AcousticParams(c2dt2=c2, a=a3, b=b3, src_idx=src, rcv_idx=src)

    def body_ref(s, w_t):
        s, _ = jstep(s, params, w_t)
        return s, None

    s_ref, _ = lax.scan(body_ref, zero_state(grid.padded_shape, 3, jnp.float32), w)

    # pallas-interior scan
    step = make_acoustic3d_step(grid, dt, f0, c_max, interpret=True)
    coords = tuple(src[..., d] for d in range(3))

    def body_pal(s, w_t):
        p_prev, p, phi, psi = step(s, c2, a3, b3)
        p = p.at[coords].add(c2[coords] * w_t)
        return (p_prev, p, phi, psi), None

    z = jnp.zeros(grid.padded_shape, jnp.float32)
    s0 = (z, z, (z, z, z), (z, z, z))
    (_, p_pal, _, _), _ = lax.scan(body_pal, s0, w)

    ref = np.asarray(s_ref.p)
    got = np.asarray(p_pal)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-5, f"3D fused step vs jnp scan: {err:.3e}"


def test_acoustic3d_strip_step_matches_jnp_scan():
    from tpufwi.kernels.acoustic3d_pallas import (
        extend_y, crop_y, make_acoustic3d_strip_step, y_extended)

    grid = _grid()
    c_max, f0, nt = 2500.0, 10.0, 40
    dt = grid.cfl_dt(c_max, safety=0.7)
    rng = np.random.default_rng(1)
    NY, NZ, NX = grid.padded_shape
    c2 = jnp.asarray(
        ((2000 + 100 * rng.standard_normal((NY, NZ, NX))) * dt) ** 2, jnp.float32
    )
    profs = build_profiles(grid, dt, c_max, f0)
    a3 = tuple(jnp.asarray(p[0], jnp.float32) for p in profs)
    b3 = tuple(jnp.asarray(p[1], jnp.float32) for p in profs)
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    src = jnp.array([[NY // 2, NZ // 2, NX // 2]])

    jstep = make_acoustic_step(grid)
    params = AcousticParams(c2dt2=c2, a=a3, b=b3, src_idx=src, rcv_idx=src)

    def body_ref(s, w_t):
        s, _ = jstep(s, params, w_t)
        return s, None

    s_ref, _ = lax.scan(body_ref, zero_state(grid.padded_shape, 3, jnp.float32), w)

    step, zero_state3 = make_acoustic3d_strip_step(grid, dt, f0, c_max, by=8,
                                                   interpret=True)
    c2e = extend_y(c2, grid, 8)
    coords = tuple(src[..., d] for d in range(3))

    def body_pal(s, w_t):
        p_prev, p, strips = step(s, c2e)
        p = p.at[coords].add(c2e[coords] * w_t)
        return (p_prev, p, strips), None

    (_, p_pal, _), _ = lax.scan(body_pal, zero_state3(), w)
    ref = np.asarray(s_ref.p)
    got = np.asarray(crop_y(p_pal, grid))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-5, f"3D strip-CPML step vs jnp scan: {err:.3e}"


def test_fused_strip_step_matches_xla_strip_step():
    """Fully fused 3D step (z-split leapfrog + six single-call CPML slab
    kernels, kernels/acoustic3d_strips_pallas.py) == the proven XLA-strip
    step over 30 steps from an impulse."""
    from tpufwi.kernels.acoustic3d_pallas import (
        crop_y,
        crop_yz,
        extend_y,
        extend_yz,
        make_acoustic3d_strip_step,
    )
    from tpufwi.kernels.acoustic3d_strips_pallas import (
        make_acoustic3d_fused_step,
    )

    grid = Grid(shape=(24, 30, 40), h=(10.0, 10.0, 10.0), pml=8, order=8)
    c_max, f0 = 3000.0, 10.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    rng = np.random.default_rng(1)
    NY, NZ, NX = grid.padded_shape
    vp = 2500.0 + 200 * rng.standard_normal((NY, NZ, NX)).astype(np.float32)
    c2 = jnp.asarray(((vp * dt) ** 2).astype(np.float32))

    step_a, zs_a = make_acoustic3d_strip_step(grid, dt, f0, c_max, by=8,
                                              interpret=True)
    step_b, zs_b = make_acoustic3d_fused_step(grid, dt, f0, c_max, by=8,
                                              bz=16, interpret=True)
    c2a = extend_y(c2, grid, 8)
    c2b = extend_yz(c2, grid, bz=16)
    imp = jnp.zeros(grid.padded_shape, jnp.float32).at[
        NY // 2, NZ // 2, NX // 2
    ].set(1.0)
    sa = zs_a()
    sb = zs_b()
    sa = (sa[0], extend_y(imp, grid, 8), sa[2])
    sb = (sb[0], extend_yz(imp, grid, bz=16), sb[2])
    for _ in range(30):
        sa = step_a(sa, c2a)
        sb = step_b(sb, c2b)
    pa = np.asarray(crop_y(sa[1], grid))
    pb = np.asarray(crop_yz(sb[1], grid))
    err = np.abs(pa - pb).max() / np.abs(pa).max()
    assert err < 1e-6, f"fused vs XLA-strip 3D step: {err:.3e}"
