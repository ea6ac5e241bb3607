"""Free-surface (pressure-release) boundary: oracle parity, ghost
polarity physics, and gradient exactness."""

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import AcousticPropagator, Geometry, Grid
from tpufwi.adjoint import make_simulator
from tpufwi.kernels.oracle_numpy import oracle_forward
from tpufwi.wavelets import ricker_np


def test_free_surface_matches_oracle():
    grid = Grid(shape=(50, 62), h=(10.0, 10.0), pml=10, order=4, free_surface=True)
    c, f0 = 2000.0, 12.0
    dt = grid.cfl_dt(c, safety=0.7)
    nt = 240
    vp = np.full(grid.shape, c)
    w = ricker_np(f0, dt, nt)
    src = np.array([[12, 31]])
    rx = np.arange(4, 58, 3)
    rcv = np.stack([np.full_like(rx, 20), rx], 1)
    seis_o, _ = oracle_forward(vp, grid, dt, w, src, rcv, f0)
    prop = AcousticPropagator(grid, dt, f0, c, dtype=jnp.float64)
    geom = Geometry.from_physical(grid, src, rcv)
    seis = np.asarray(prop(jnp.asarray(vp), geom, jnp.asarray(w)))
    rms = np.sqrt(np.mean((seis - seis_o) ** 2)) / np.sqrt(np.mean(seis_o**2))
    assert rms < 1e-9, f"free-surface vs oracle RMS {rms:.3e}"


def test_ghost_has_flipped_polarity():
    # source at 300 m depth, receiver far below: the surface ghost arrives
    # ~2*z_s/c after the direct wave with opposite sign
    grid = Grid(shape=(160, 80), h=(10.0, 10.0), pml=14, order=8, free_surface=True)
    c, f0 = 2000.0, 14.0
    dt = grid.cfl_dt(c, safety=0.7)
    nt = 700
    vp = jnp.full(grid.shape, c, jnp.float64)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    src = np.array([[30, 40]])
    rcv = np.array([[140, 40]])
    prop = AcousticPropagator(grid, dt, f0, c, dtype=jnp.float64)
    geom = Geometry.from_physical(grid, src, rcv)
    tr = np.asarray(prop(vp, geom, w))[:, 0]

    t_dir = (140 - 30) * 10.0 / c + 1.5 / f0
    t_gho = (140 + 30) * 10.0 / c + 1.5 / f0
    i_dir = int(t_dir / dt)
    i_gho = int(t_gho / dt)
    hw = int(0.35 / f0 / dt)
    direct = tr[i_dir - hw : i_dir + hw]
    ghost = tr[i_gho - hw : i_gho + hw]
    # peak amplitudes must have opposite sign
    a_dir = direct[np.argmax(np.abs(direct))]
    a_gho = ghost[np.argmax(np.abs(ghost))]
    assert a_dir * a_gho < 0, f"ghost not flipped: direct {a_dir:.2e}, ghost {a_gho:.2e}"
    assert abs(a_gho) > 0.3 * abs(a_dir)


def test_free_surface_gradient_exact():
    grid = Grid(shape=(40, 50), h=(12.0, 12.0), pml=8, order=4, free_surface=True)
    c_max, f0 = 2600.0, 13.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 130
    rng = np.random.default_rng(2)
    vp = np.clip(2100 + 150 * rng.standard_normal(grid.shape), 1800, 2500)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    src = np.array([[8, 17]])
    rx = np.arange(5, 45, 3)
    rcv = np.stack([np.full_like(rx, 4), rx], 1)
    geom = Geometry.from_physical(grid, src, rcv)
    prop = AcousticPropagator(grid, dt, f0, c_max, dtype=jnp.float64)
    sim_ad = make_simulator(grid, dt, f0, c_max, dtype=jnp.float64, use_custom_vjp=False)
    d_obs = prop(jnp.asarray(vp) * 1.02, geom, w)

    def loss_c(v):
        return 0.5 * jnp.sum((prop(v, geom, w) - d_obs) ** 2)

    def loss_a(v):
        return 0.5 * jnp.sum((sim_ad(prop.c2dt2(v), w, geom.src_idx, geom.rcv_idx) - d_obs) ** 2)

    g_c = np.asarray(jax.grad(loss_c)(jnp.asarray(vp)))
    g_a = np.asarray(jax.grad(loss_a)(jnp.asarray(vp)))
    r = grid.radius
    mask = np.zeros(grid.shape)
    mask[r:-r, r:-r] = 1.0
    err = np.abs(g_c - g_a * mask).max() / np.abs(g_a * mask).max()
    assert err < 1e-11, f"free-surface gradient rel err {err:.3e}"
