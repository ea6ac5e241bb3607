"""Fused 3D backward (adjoint3d_pallas + kernels/acoustic3d_bwd_pallas):
forward parity and gradient parity vs the proven XLA adjoint engine."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from tpufwi import Grid
from tpufwi.adjoint import make_simulator
from tpufwi.adjoint3d_pallas import make_simulator3d_fused
from tpufwi.misfit import l2_misfit
from tpufwi.propagators.boundary import RingSpec
from tpufwi.wavelets import ricker


def _setup(nt=24):
    grid = Grid(shape=(24, 30, 40), h=(10.0, 10.0, 10.0), pml=8, order=8)
    c_max, f0 = 3000.0, 10.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    rng = np.random.default_rng(3)
    NY, NZ, NX = grid.padded_shape
    pad = grid.pad
    vp = 2500.0 + 150 * rng.standard_normal(grid.shape).astype(np.float32)
    vp_pad = np.pad(vp, pad, mode="edge")
    c2 = jnp.asarray(((vp_pad * dt) ** 2).astype(np.float32))
    w = ricker(f0, dt, nt)
    src = jnp.array([[NY // 2, NZ // 2, NX // 2]])
    rx = np.arange(pad + 6, NX - pad - 6, 3, dtype=np.int32)
    rcv = jnp.asarray(
        np.stack([np.full_like(rx, pad + 6), np.full_like(rx, NZ // 2), rx], 1)
    )
    return grid, dt, f0, c_max, c2, w, src, rcv


def test_fused3d_forward_matches_jnp():
    grid, dt, f0, c_max, c2, w, src, rcv = _setup()
    sim_jnp = make_simulator(grid, dt, f0, c_max, use_custom_vjp=False)
    sim_f = make_simulator3d_fused(grid, dt, f0, c_max, by=8, bz=16,
                                   bz_y=16, interpret=True)
    s_ref = np.asarray(sim_jnp(c2, w, src, rcv))
    s_got = np.asarray(sim_f(c2, w, src, rcv))
    err = np.abs(s_got - s_ref).max() / (np.abs(s_ref).max() + 1e-30)
    assert err < 1e-5, f"fused3d forward vs jnp: {err:.3e}"


def test_fused3d_gradient_matches_xla_engine():
    """value_and_grad of an L2 misfit through the fused backward ==
    the jnp engine's boundary-saving custom VJP (both masked to the
    valid region by construction)."""
    grid, dt, f0, c_max, c2, w, src, rcv = _setup()
    sim_jnp = make_simulator(grid, dt, f0, c_max, use_custom_vjp=True)
    sim_f = make_simulator3d_fused(grid, dt, f0, c_max, by=8, bz=16,
                                   bz_y=16, interpret=True)
    d_obs = sim_jnp(c2, w, src, rcv)
    c2p = c2 * 1.03

    def loss(sim):
        return lambda c2_: l2_misfit(sim(c2_, w, src, rcv), d_obs)

    J_ref, g_ref = jax.value_and_grad(loss(sim_jnp))(c2p)
    J_got, g_got = jax.value_and_grad(loss(sim_f))(c2p)
    assert np.allclose(float(J_ref), float(J_got), rtol=1e-5)
    g_ref = np.asarray(g_ref)
    g_got = np.asarray(g_got)
    denom = np.abs(g_ref).max() + 1e-30
    err = np.abs(g_got - g_ref).max() / denom
    assert err < 1e-4, f"fused3d gradient vs XLA engine: {err:.3e}"


@pytest.mark.slow  # lane triage r5: overlaps gradient_matches_xla's
# engine coverage (wavelet cotangent only), 45 s
def test_fused3d_gradient_wavelet_cotangent():
    grid, dt, f0, c_max, c2, w, src, rcv = _setup()
    sim_jnp = make_simulator(grid, dt, f0, c_max, use_custom_vjp=True)
    sim_f = make_simulator3d_fused(grid, dt, f0, c_max, by=8, bz=16,
                                   bz_y=16, interpret=True)
    d_obs = sim_jnp(c2, w, src, rcv)

    def loss(sim):
        return lambda w_: l2_misfit(sim(c2 * 1.02, w_, src, rcv), d_obs)

    g_ref = np.asarray(jax.grad(loss(sim_jnp))(w))
    g_got = np.asarray(jax.grad(loss(sim_f))(w))
    err = np.abs(g_got - g_ref).max() / (np.abs(g_ref).max() + 1e-30)
    assert err < 1e-4, f"fused3d wavelet grad vs XLA engine: {err:.3e}"


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_fused3d_gradient_matches_xla_engine_fold_yz():
    """Same gradient parity with the forward/reconstruction sweeps on
    the fold_y+fold_z merged kernel (pml=12 so S=16 satisfies the
    manual-DMA tile alignment and both can_fold_* hold)."""
    from tpufwi.kernels.acoustic3d_fused2 import can_fold_y, can_fold_z

    grid = Grid(shape=(24, 30, 40), h=(10.0, 10.0, 10.0), pml=12, order=8)
    assert can_fold_z(grid, 32) and can_fold_y(grid, 16)
    c_max, f0 = 3000.0, 10.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    rng = np.random.default_rng(3)
    NY, NZ, NX = grid.padded_shape
    pad = grid.pad
    vp = 2500.0 + 150 * rng.standard_normal(grid.shape).astype(np.float32)
    vp_pad = np.pad(vp, pad, mode="edge")
    c2 = jnp.asarray(((vp_pad * dt) ** 2).astype(np.float32))
    w = ricker(f0, dt, 24)
    src = jnp.array([[NY // 2, NZ // 2, NX // 2]])
    rx = np.arange(pad + 6, NX - pad - 6, 3, dtype=np.int32)
    rcv = jnp.asarray(
        np.stack([np.full_like(rx, pad + 6), np.full_like(rx, NZ // 2), rx], 1)
    )
    sim_jnp = make_simulator(grid, dt, f0, c_max, use_custom_vjp=True)
    sim_f = make_simulator3d_fused(grid, dt, f0, c_max, by=16, bz=32,
                                   bz_y=16, interpret=True)
    d_obs = sim_jnp(c2, w, src, rcv)
    c2p = c2 * 1.03

    def loss(sim):
        return lambda c2_: l2_misfit(sim(c2_, w, src, rcv), d_obs)

    J_ref, g_ref = jax.value_and_grad(loss(sim_jnp))(c2p)
    J_got, g_got = jax.value_and_grad(loss(sim_f))(c2p)
    assert np.allclose(float(J_ref), float(J_got), rtol=1e-5)
    g_ref = np.asarray(g_ref)
    g_got = np.asarray(g_got)
    err = np.abs(g_got - g_ref).max() / (np.abs(g_ref).max() + 1e-30)
    assert err < 1e-4, f"fused3d(fold_yz) gradient vs XLA engine: {err:.3e}"


def _setup_fs(nt=48):
    """Free-surface variant: pressure-release plane at z = pad, receivers
    two rows below the surface (stresses the masked-cotangent injection)."""
    grid = Grid(shape=(24, 30, 40), h=(10.0, 10.0, 10.0), pml=8, order=8,
                free_surface=True)
    c_max, f0 = 3000.0, 10.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    rng = np.random.default_rng(7)
    NY, NZ, NX = grid.padded_shape
    pad = grid.pad
    vp = 2500.0 + 150 * rng.standard_normal(grid.shape).astype(np.float32)
    vp_pad = np.pad(vp, pad, mode="edge")
    c2 = jnp.asarray(((vp_pad * dt) ** 2).astype(np.float32))
    w = ricker(f0, dt, nt)
    src = jnp.array([[NY // 2, pad + 8, NX // 2]])
    rx = np.arange(pad + 6, NX - pad - 6, 3, dtype=np.int32)
    rcv = jnp.asarray(
        np.stack([np.full_like(rx, pad + 6), np.full_like(rx, pad + 2), rx], 1)
    )
    return grid, dt, f0, c_max, c2, w, src, rcv


def test_fused3d_free_surface_forward_matches_jnp():
    grid, dt, f0, c_max, c2, w, src, rcv = _setup_fs()
    sim_jnp = make_simulator(grid, dt, f0, c_max, use_custom_vjp=False)
    sim_f = make_simulator3d_fused(grid, dt, f0, c_max, by=8, bz=16,
                                   bz_y=16, interpret=True)
    s_ref = np.asarray(sim_jnp(c2, w, src, rcv))
    s_got = np.asarray(sim_f(c2, w, src, rcv))
    err = np.abs(s_got - s_ref).max() / (np.abs(s_ref).max() + 1e-30)
    assert err < 1e-5, f"fused3d free-surface forward vs jnp: {err:.3e}"


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_fused3d_free_surface_gradient_matches_xla_engine():
    grid, dt, f0, c_max, c2, w, src, rcv = _setup_fs()
    sim_jnp = make_simulator(grid, dt, f0, c_max, use_custom_vjp=True)
    sim_f = make_simulator3d_fused(grid, dt, f0, c_max, by=8, bz=16,
                                   bz_y=16, interpret=True)
    d_obs = sim_jnp(c2, w, src, rcv)
    c2p = c2 * 1.03

    def loss(sim):
        return lambda c2_: l2_misfit(sim(c2_, w, src, rcv), d_obs)

    J_ref, g_ref = jax.value_and_grad(loss(sim_jnp))(c2p)
    J_got, g_got = jax.value_and_grad(loss(sim_f))(c2p)
    assert np.allclose(float(J_ref), float(J_got), rtol=1e-5)
    g_ref = np.asarray(g_ref)
    g_got = np.asarray(g_got)
    err = np.abs(g_got - g_ref).max() / (np.abs(g_ref).max() + 1e-30)
    # fp32 recon noise over 48 steps: both boundary-saving engines sit
    # ~2e-4 from full AD here (fused 1.6e-4, jnp 2.0e-4 — measured), so
    # their mutual distance is bounded by the same scale, not 1e-4.
    assert err < 5e-4, f"fused3d free-surface gradient: {err:.3e}"


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_fused3d_free_surface_wavelet_cotangent():
    grid, dt, f0, c_max, c2, w, src, rcv = _setup_fs()
    sim_jnp = make_simulator(grid, dt, f0, c_max, use_custom_vjp=True)
    sim_f = make_simulator3d_fused(grid, dt, f0, c_max, by=8, bz=16,
                                   bz_y=16, interpret=True)
    d_obs = sim_jnp(c2, w, src, rcv)

    def loss(sim):
        return lambda w_: l2_misfit(sim(c2 * 1.02, w_, src, rcv), d_obs)

    g_ref = np.asarray(jax.grad(loss(sim_jnp))(w))
    g_got = np.asarray(jax.grad(loss(sim_f))(w))
    err = np.abs(g_got - g_ref).max() / (np.abs(g_ref).max() + 1e-30)
    assert err < 1e-4, f"fused3d free-surface wavelet grad: {err:.3e}"


def test_fused3d_illumination_matches_jnp_path():
    """simulate.illumination (fused forward step) == the propagator's
    generic single-step illumination — the fullscale driver runs the
    fused one (the jnp step crashed the chip at Overthrust shapes,
    runs/tpu_queue10/fullscale2.log)."""
    from tpufwi.acquisition import Geometry
    from tpufwi.propagators.acoustic2d import AcousticPropagator

    grid, dt, f0, c_max, c2, w, src, rcv = _setup()
    sim_f = make_simulator3d_fused(grid, dt, f0, c_max, by=8, bz=16,
                                   bz_y=16, interpret=True)
    il_f = np.asarray(sim_f.illumination(c2, w, src))

    pad = grid.pad
    vp_like = jnp.sqrt(c2) / dt  # c2dt2 -> vp on the padded grid
    prop = AcousticPropagator(grid, dt, f0, c_max, impl="jnp")
    geom = Geometry(src_idx=src, rcv_idx=rcv)
    il_j = np.asarray(
        prop.illumination(vp_like[pad:-pad, pad:-pad, pad:-pad], geom, w)
    )
    assert il_f.shape == il_j.shape
    denom = np.abs(il_j).max() + 1e-30
    assert np.abs(il_f - il_j).max() / denom < 2e-5, (
        np.abs(il_f - il_j).max() / denom
    )
