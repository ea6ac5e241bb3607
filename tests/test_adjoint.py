"""V2: adjoint dot-product test + gradient correctness (SURVEY.md §4.5).

Three increasingly strict checks of the boundary-saving adjoint engine
(tpufwi/adjoint.py) on small models, fp64 and fp32:

1. The custom-VJP gradient equals the plain-jax-AD gradient (full
   checkpointing through the scan) on the valid region, to roundoff.
2. Adjoint dot-product: <L dm, db> == <dm, L^T db> where L is the exact
   linearization (jvp of the AD path) and L^T the custom VJP.
3. Finite-difference directional-derivative check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi import AcousticPropagator, Geometry, Grid
from tpufwi.adjoint import make_simulator
from tpufwi.wavelets import ricker_np


def _problem(dtype, order=4, nz=40, nx=50, pml=8, nt=160, f0=14.0):
    rng = np.random.default_rng(7)
    grid = Grid(shape=(nz, nx), h=(12.0, 12.0), pml=pml, order=order)
    vp_true = 2000.0 + 300.0 * rng.standard_normal((nz, nx)).cumsum(0) / nz
    vp_true = np.clip(vp_true, 1600.0, 2600.0)
    vp0 = np.full((nz, nx), float(vp_true.mean()))
    c_max = 2800.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    w = ricker_np(f0, dt, nt)
    src = np.array([[6, nx // 3]])
    rx = np.arange(5, nx - 5, 2)
    rcv = np.stack([np.full_like(rx, 4), rx], 1)
    geom = Geometry.from_physical(grid, src, rcv)
    prop = AcousticPropagator(grid, dt, f0, c_max, dtype=dtype)
    sim_ad = make_simulator(grid, dt, f0, c_max, dtype=dtype, use_custom_vjp=False)

    def forward_ad(vp):
        return sim_ad(prop.c2dt2(vp), jnp.asarray(w, dtype), geom.src_idx, geom.rcv_idx)

    d_obs = prop(jnp.asarray(vp_true, dtype), geom, jnp.asarray(w, dtype))
    return grid, prop, forward_ad, geom, jnp.asarray(w, dtype), jnp.asarray(vp0, dtype), d_obs


def _interior_mask(grid):
    m = np.zeros(grid.shape)
    r = grid.radius
    m[r:-r, r:-r] = 1.0
    return m


def test_gradient_matches_full_ad_fp64():
    dtype = jnp.float64
    grid, prop, forward_ad, geom, w, vp0, d_obs = _problem(dtype)

    def loss_custom(vp):
        return 0.5 * jnp.sum((prop(vp, geom, w) - d_obs) ** 2)

    def loss_ad(vp):
        return 0.5 * jnp.sum((forward_ad(vp) - d_obs) ** 2)

    J1, g_custom = jax.value_and_grad(loss_custom)(vp0)
    J2, g_ad = jax.value_and_grad(loss_ad)(vp0)
    assert np.allclose(float(J1), float(J2), rtol=1e-12)

    mask = _interior_mask(grid)
    g_custom = np.asarray(g_custom)
    g_ad = np.asarray(g_ad) * mask
    # custom gradient must vanish on the outer frame by construction
    assert np.all(g_custom * (1 - mask) == 0.0)
    scale = np.abs(g_ad).max()
    assert scale > 0
    err = np.abs(g_custom - g_ad).max() / scale
    assert err < 1e-11, f"custom vs full-AD gradient rel err {err:.3e}"


@pytest.mark.parametrize(
    "dtype,tol",
    [(jnp.float64, 1e-11), (jnp.float32, 1e-4)],
)
def test_adjoint_dot_product(dtype, tol):
    """<L dm, db> == <dm, L^T db>: the graded V2 metric (BASELINE.json:2)."""
    grid, prop, forward_ad, geom, w, vp0, d_obs = _problem(dtype)
    rng = np.random.default_rng(3)
    dm = rng.standard_normal(grid.shape) * _interior_mask(grid)
    dm = jnp.asarray(dm, dtype)
    db = jnp.asarray(rng.standard_normal(d_obs.shape), dtype)

    # forward linearization through the plain-AD path (exact jvp)
    _, Ldm = jax.jvp(forward_ad, (vp0,), (dm,))
    # transpose through the boundary-saving custom VJP
    _, vjp_fn = jax.vjp(lambda v: prop(v, geom, w), vp0)
    (LTdb,) = vjp_fn(db)

    lhs = float(jnp.vdot(Ldm, db))
    rhs = float(jnp.vdot(dm, LTdb))
    denom = float(jnp.linalg.norm(Ldm) * jnp.linalg.norm(db)) + 1e-300
    rel = abs(lhs - rhs) / denom
    assert rel < tol, f"dot-product rel err {rel:.3e} (dtype={dtype})"


def test_gradient_finite_difference():
    dtype = jnp.float64
    grid, prop, forward_ad, geom, w, vp0, d_obs = _problem(dtype, nt=120)

    def loss(vp):
        return 0.5 * jnp.sum((prop(vp, geom, w) - d_obs) ** 2)

    g = jax.grad(loss)(vp0)
    rng = np.random.default_rng(11)
    dv = jnp.asarray(rng.standard_normal(grid.shape) * _interior_mask(grid), dtype)
    gdot = float(jnp.vdot(g, dv))
    eps = 1e-4
    jp = float(loss(vp0 + eps * dv))
    jm = float(loss(vp0 - eps * dv))
    fd = (jp - jm) / (2 * eps)
    rel = abs(fd - gdot) / (abs(fd) + 1e-300)
    assert rel < 1e-7, f"FD check rel err {rel:.3e}"


@pytest.mark.slow  # lane triage r5: distinct remat fallback, 49 s
def test_remat_gradient_matches_rings():
    """gradient="remat" (checkpointed scan, no ring tape) produces the
    same loss and — on the valid interior — the same model/wavelet
    gradients as the boundary-saving path, in 2D and 3D. This is the
    memory escape hatch for full-scale 3D on one chip (adjoint.py
    docstring)."""
    from tpufwi.adjoint import make_simulator
    from tpufwi.wavelets import ricker_np

    for shape, pml in (((30, 36), 8), ((14, 18, 20), 6)):
        grid = Grid(shape=shape, h=(10.0,) * len(shape), pml=pml, order=4)
        rng = np.random.default_rng(0)
        vp = 2000.0 + 150.0 * rng.random(shape)
        dt = grid.cfl_dt(float(vp.max()), safety=0.6)
        w = jnp.asarray(ricker_np(13.0, dt, 70))
        if len(shape) == 2:
            src = np.array([[15, 8]])
            rcv = np.stack([np.full(5, 8), np.arange(8, 28, 4)], 1)
        else:
            src = np.array([[7, 6, 8]])
            rcv = np.array([[7, 6, 14], [5, 9, 12]])
        geom = Geometry.from_physical(grid, src, rcv)
        pads = [(grid.pad, grid.pad)] * len(shape)
        c2dt2 = jnp.pad(jnp.asarray(vp), pads, mode="edge") ** 2 * dt * dt
        s_r = make_simulator(grid, dt, 13.0, float(vp.max()), jnp.float64)
        s_m = make_simulator(grid, dt, 13.0, float(vp.max()), jnp.float64,
                             gradient="remat")

        def loss(sim):
            return lambda c2, w_: jnp.sum(
                sim(c2, w_, geom.src_idx, geom.rcv_idx) ** 2)

        Jr, (gr, wr) = jax.value_and_grad(loss(s_r), argnums=(0, 1))(c2dt2, w)
        Jm, (gm, wm) = jax.value_and_grad(loss(s_m), argnums=(0, 1))(c2dt2, w)
        assert abs(float(Jr - Jm)) <= 1e-12 * float(Jr)
        gm_v = s_r.rings.mask_valid(gm)
        assert float(jnp.abs(gm_v - gr).max()) <= 1e-12 * float(
            jnp.abs(gr).max())
        assert float(jnp.abs(wm - wr).max()) <= 1e-12 * float(
            jnp.abs(wr).max())


def test_bf16_tape_gradient():
    """tape_dtype=bfloat16 halves the ring-tape bytes; the rounding
    perturbs the reverse reconstruction only on the ring, and the model
    gradient it yields stays within ~1e-2 of the fp32-tape gradient in
    direction and magnitude (2D and 3D) — accurate enough for FWI, where
    the gradient feeds a line search. This is the memory lever for 3D
    runs where the tape binds (docs/COMPONENTS.md known constraints)."""
    from tpufwi.adjoint import make_simulator
    from tpufwi.wavelets import ricker_np

    for shape, pml in (((30, 36), 8), ((14, 18, 20), 6)):
        grid = Grid(shape=shape, h=(10.0,) * len(shape), pml=pml, order=4)
        rng = np.random.default_rng(0)
        vp = 2000.0 + 150.0 * rng.random(shape)
        dt = grid.cfl_dt(float(vp.max()), safety=0.6)
        w = jnp.asarray(ricker_np(13.0, dt, 90), jnp.float32)
        if len(shape) == 2:
            src = np.array([[15, 8]])
            rcv = np.stack([np.full(5, 8), np.arange(8, 28, 4)], 1)
        else:
            src = np.array([[7, 6, 8]])
            rcv = np.array([[7, 6, 14], [5, 9, 12]])
        geom = Geometry.from_physical(grid, src, rcv)
        pads = [(grid.pad, grid.pad)] * len(shape)
        c2dt2 = (jnp.pad(jnp.asarray(vp, jnp.float32), pads, mode="edge")
                 ** 2 * dt * dt).astype(jnp.float32)
        s32 = make_simulator(grid, dt, 13.0, float(vp.max()), jnp.float32)
        s16 = make_simulator(grid, dt, 13.0, float(vp.max()), jnp.float32,
                             tape_dtype=jnp.bfloat16)

        assert s16.rings.tape_dtype == jnp.bfloat16
        r0 = s16.rings.extract(jnp.zeros(grid.padded_shape, jnp.float32))
        assert all(r.dtype == jnp.bfloat16 for r in r0)

        def loss(sim):
            return lambda c2: jnp.sum(
                sim(c2, w, geom.src_idx, geom.rcv_idx) ** 2)

        J32, g32 = jax.value_and_grad(loss(s32))(c2dt2)
        J16, g16 = jax.value_and_grad(loss(s16))(c2dt2)
        # identical forward (tape compression only affects the reverse pass)
        assert float(jnp.abs(J32 - J16)) <= 1e-6 * float(J32)
        g32 = np.asarray(g32, np.float64).ravel()
        g16 = np.asarray(g16, np.float64).ravel()
        rel = np.linalg.norm(g16 - g32) / np.linalg.norm(g32)
        cos = float(g16 @ g32 / (np.linalg.norm(g16) * np.linalg.norm(g32)))
        assert rel < 2e-2, f"{shape}: bf16-tape grad rel L2 err {rel:.3e}"
        assert cos > 0.999, f"{shape}: bf16-tape grad cos {cos:.6f}"
