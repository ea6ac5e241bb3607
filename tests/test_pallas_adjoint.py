"""Pallas fused adjoint == jnp adjoint engine (interpret mode, CPU).

The jnp custom-VJP gradient is itself proven exact against full AD and the
dot-product test (tests/test_adjoint.py); here the fused-kernel path must
reproduce it to fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import Geometry, Grid
from tpufwi.adjoint import make_simulator
from tpufwi.adjoint_pallas import make_simulator_pallas
from tpufwi.wavelets import ricker_np


def _setup(order=4):
    grid = Grid(shape=(48, 72), h=(10.0, 10.0), pml=10, order=order)
    c_max, f0 = 2500.0, 14.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 140
    rng = np.random.default_rng(0)
    vp = np.clip(2000 + 200 * rng.standard_normal(grid.shape), 1700, 2500)
    pad = grid.pad
    c2 = jnp.asarray((np.pad(vp, pad, mode="edge") * dt) ** 2, jnp.float32)
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    geom = Geometry.from_physical(
        grid, np.array([[24, 36]]), np.stack([np.full(20, 5), np.arange(5, 65, 3)], 1)
    )
    return grid, dt, f0, c_max, c2, w, geom


def test_pallas_gradient_matches_jnp():
    grid, dt, f0, c_max, c2, w, geom = _setup()
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_p = make_simulator_pallas(grid, dt, f0, c_max, interpret=True)

    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)

    def loss(sim):
        def f(c2_):
            r = sim(c2_, w, geom.src_idx, geom.rcv_idx) - d_obs
            return 0.5 * jnp.sum(r * r)
        return f

    J_j, g_j = jax.value_and_grad(loss(sim_j))(c2 * 1.01)
    J_p, g_p = jax.value_and_grad(loss(sim_p))(c2 * 1.01)

    assert abs(float(J_j) - float(J_p)) / float(J_j) < 1e-4  # fp32 sum-order
    g_j, g_p = np.asarray(g_j), np.asarray(g_p)
    scale = np.abs(g_j).max()
    err = np.abs(g_p - g_j).max() / scale
    assert err < 1e-4, f"pallas vs jnp gradient max rel err {err:.3e}"


def test_pallas_wavelet_gradient_matches_jnp():
    grid, dt, f0, c_max, c2, w, geom = _setup()
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_p = make_simulator_pallas(grid, dt, f0, c_max, interpret=True)
    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)

    def loss(sim):
        def f(w_):
            r = sim(c2, w_, geom.src_idx, geom.rcv_idx) - d_obs
            return 0.5 * jnp.sum(r * r)
        return f

    g_j = jax.grad(loss(sim_j))(w * 1.05)
    g_p = jax.grad(loss(sim_p))(w * 1.05)
    g_j, g_p = np.asarray(g_j), np.asarray(g_p)
    err = np.abs(g_p - g_j).max() / np.abs(g_j).max()
    assert err < 1e-4, f"wavelet grad rel err {err:.3e}"


def test_merged_reverse_kernel_matches_two_kernel_path():
    # make_fused_reverse_step is kept as a documented alternative (slower on
    # current hardware: its ~35 MB of live VMEM defeats DMA/compute overlap)
    import jax.numpy as jnp
    from tpufwi.kernels.acoustic2d_pallas_bwd import (
        make_fused_adjoint_step, make_fused_reverse_step, make_recon_kernel)
    from tpufwi.kernels.acoustic2d_pallas import strip_profiles, strip_depth
    from tpufwi.propagators.boundary import RingSpec

    grid, dt, f0, c_max, c2, w, geom = _setup()
    NZ, NX = grid.padded_shape
    S = strip_depth(grid)
    nsrc, nrec = 1, geom.rcv_idx.shape[-2]
    profiles = strip_profiles(grid, dt, c_max, f0)
    rings = RingSpec.build(grid)
    rng = np.random.default_rng(0)
    r32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    p_t, p_tp1, q_pm, q_p, gbar = (r32(NZ, NX) for _ in range(5))
    strips = (r32(2, S, NX), r32(2, S, NX), r32(2, NZ, S), r32(2, NZ, S))
    ring_vals = tuple(r32(*[sl.stop - sl.start for sl in s]) for s in rings.slices)
    sz = geom.src_idx[..., 0].reshape(1, 1).astype(jnp.int32)
    sx = geom.src_idx[..., 1].reshape(1, 1).astype(jnp.int32)
    amp = jnp.ones((1, 1), jnp.float32) * 0.3
    rz = geom.rcv_idx[..., 0].reshape(1, nrec).astype(jnp.int32)
    rx = geom.rcv_idx[..., 1].reshape(nrec, 1).astype(jnp.int32)
    yb = r32(nrec, 1)

    recon = make_recon_kernel(grid, interpret=True, nsrc=1)
    step_T = make_fused_adjoint_step(grid, interpret=True, nrec=nrec)
    p_tm1a, lapw = recon(p_tp1, p_t, c2, sz, sx, amp, *ring_vals)
    outa = step_T(q_pm, q_p, c2, lapw, gbar, strips, profiles, rz, rx, yb)

    rev = make_fused_reverse_step(grid, nsrc=1, nrec=nrec, interpret=True)
    outb = rev(p_tp1, p_t, c2, sz, sx, amp, ring_vals, q_pm, q_p, gbar,
               strips, profiles, rz, rx, yb)

    np.testing.assert_allclose(np.asarray(outb[0]), np.asarray(p_tm1a), rtol=0, atol=1e-5)
    for a, b in zip(outa, outb[1:]):
        scale = np.abs(np.asarray(a)).max() + 1e-20
        assert np.abs(np.asarray(b) - np.asarray(a)).max() / scale < 1e-5
