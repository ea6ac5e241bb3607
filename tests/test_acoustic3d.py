"""3D acoustic forward + adjoint through the dimension-agnostic machinery
(spec C5 numerics; sharding tested in test_sharding3d.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import AcousticPropagator, Geometry, Grid
from tpufwi.adjoint import make_simulator
from tpufwi.kernels.oracle_numpy import oracle_forward
from tpufwi.wavelets import ricker_np


def _setup(order=4, dtype=jnp.float64):
    # (y, z, x) layout
    grid = Grid(shape=(28, 24, 30), h=(15.0, 15.0, 15.0), pml=6, order=order)
    c_max, f0 = 2500.0, 10.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 80
    rng = np.random.default_rng(0)
    vp = np.clip(2100 + 150 * rng.standard_normal(grid.shape), 1800, 2500)
    w = ricker_np(f0, dt, nt)
    src = np.array([[14, 12, 15]])
    rcv = np.array([[14, 3, x] for x in range(4, 26, 3)])
    return grid, vp, dt, w, src, rcv, f0


def test_3d_forward_matches_oracle():
    grid, vp, dt, w, src, rcv, f0 = _setup()
    seis_o, _ = oracle_forward(vp, grid, dt, w, src, rcv, f0)
    prop = AcousticPropagator(grid, dt, f0, float(vp.max()), dtype=jnp.float64)
    geom = Geometry.from_physical(grid, src, rcv)
    seis = np.asarray(prop(jnp.asarray(vp), geom, jnp.asarray(w)))
    rms = np.sqrt(np.mean((seis - seis_o) ** 2)) / np.sqrt(np.mean(seis_o**2))
    assert rms < 1e-9, f"3D relative RMS {rms:.3e}"


def test_3d_adjoint_dot_product():
    grid, vp, dt, w, src, rcv, f0 = _setup()
    c_max = float(vp.max())
    prop = AcousticPropagator(grid, dt, f0, c_max, dtype=jnp.float64)
    geom = Geometry.from_physical(grid, src, rcv)
    sim_ad = make_simulator(grid, dt, f0, c_max, dtype=jnp.float64, use_custom_vjp=False)
    wj = jnp.asarray(w)

    def fwd_ad(v):
        return sim_ad(prop.c2dt2(v), wj, geom.src_idx, geom.rcv_idx)

    vp0 = jnp.asarray(vp)
    rng = np.random.default_rng(3)
    r = grid.radius
    mask = np.zeros(grid.shape)
    mask[r:-r, r:-r, r:-r] = 1.0
    dm = jnp.asarray(rng.standard_normal(grid.shape) * mask)
    db = jnp.asarray(rng.standard_normal((len(w), len(rcv))))

    _, Ldm = jax.jvp(fwd_ad, (vp0,), (dm,))
    _, vjp_fn = jax.vjp(lambda v: prop(v, geom, wj), vp0)
    (LTdb,) = vjp_fn(db)
    lhs = float(jnp.vdot(Ldm, db))
    rhs = float(jnp.vdot(dm, LTdb))
    rel = abs(lhs - rhs) / (float(jnp.linalg.norm(Ldm) * jnp.linalg.norm(db)) + 1e-300)
    assert rel < 1e-11, f"3D dot-product rel err {rel:.3e}"
