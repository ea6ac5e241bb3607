"""Kaiser-sinc off-grid source/receiver interpolation (Hicks 2002):
an off-grid receiver must reproduce the trace of a slightly shifted
on-grid experiment far better than nearest-node rounding."""

import jax.numpy as jnp
import numpy as np

from tpufwi import AcousticPropagator, Geometry, Grid
from tpufwi.acquisition import PointSet, kaiser_sinc_weights
from tpufwi.wavelets import ricker_np


def test_weights_partition_of_unity_on_grid():
    w = kaiser_sinc_weights(0.0)
    # on-grid point: the sinc hits 1 at the node, ~0 elsewhere
    assert abs(w[3] - 1.0) < 1e-12
    assert np.abs(np.delete(w, 3)).max() < 1e-12
    # half-offset: symmetric weights, sum ~ 1
    w5 = kaiser_sinc_weights(0.5)
    assert np.allclose(w5, w5[::-1], atol=1e-12)
    assert abs(w5.sum() - 1.0) < 1e-3


def test_offgrid_receiver_matches_shifted_field():
    grid = Grid(shape=(100, 140), h=(10.0, 10.0), pml=12, order=8)
    c, f0 = 2000.0, 12.0
    dt = grid.cfl_dt(c, safety=0.7)
    nt = 420
    w = jnp.asarray(ricker_np(f0, dt, nt))
    vp = jnp.full(grid.shape, c, jnp.float64)
    prop = AcousticPropagator(grid, dt, f0, c, dtype=jnp.float64)
    src = np.array([[50, 30]])

    # reference: on-grid receiver at x-cell 90
    geom_ref = Geometry.from_physical(grid, src, np.array([[50, 90]]))
    trace_ref = np.asarray(prop(vp, geom_ref, w))[:, 0]

    # off-grid experiment: receiver at x = 903.7 m (cell 90.37)
    ps = PointSet.from_coords(grid, np.array([[500.0, 903.7]]))
    _, snaps = prop.forward_snapshots(vp, geom_ref, w)

    # build the off-grid trace by recording the (padded) wavefield; use
    # snapshots (interior) re-padded for simplicity
    pad = grid.pad
    snaps = np.asarray(snaps)
    rec = []
    for t in range(nt):
        f = jnp.asarray(np.pad(snaps[t], pad))
        rec.append(float(ps.record(f)[0]))
    trace_off = np.array(rec)

    # nearest-node trace (cell 90) for comparison of interpolation quality:
    # the true trace at 903.7 m lies between cells 90 and 91
    geom_91 = Geometry.from_physical(grid, src, np.array([[50, 91]]))
    trace_91 = np.asarray(prop(vp, geom_91, w))[:, 0]
    # linear-in-space reference (good proxy for a smooth field)
    trace_interp = 0.63 * trace_ref + 0.37 * trace_91

    err_off = np.linalg.norm(trace_off - trace_interp) / np.linalg.norm(trace_interp)
    err_nn = np.linalg.norm(trace_ref - trace_interp) / np.linalg.norm(trace_interp)
    assert err_off < 0.4 * err_nn, f"kaiser-sinc {err_off:.3e} vs nearest {err_nn:.3e}"
    # absolute bound is loose: the linear-interp "truth" proxy carries its
    # own O(h^2) error of the same order
    assert err_off < 0.05


def test_inject_record_are_exact_transposes():
    # <inject(e), f> == <e, record(f)> for the Kaiser-sinc PointSet, so
    # off-grid acquisition preserves adjoint exactness
    grid = Grid(shape=(40, 50), h=(10.0, 10.0), pml=8, order=4)
    ps = PointSet.from_coords(grid, np.array([[173.3, 261.8], [221.9, 140.2]]))
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal(grid.padded_shape))
    e = jnp.asarray(rng.standard_normal(2))
    lhs = float(jnp.vdot(ps.inject(jnp.zeros(grid.padded_shape), e), f))
    rhs = float(jnp.vdot(e, ps.record(f)))
    assert abs(lhs - rhs) / abs(rhs) < 1e-12


def test_normalized_misfit_ignores_scale():
    from tpufwi.misfit import normalized_l2_misfit

    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.standard_normal((200, 7)))
    s = d * 3.7  # pure amplitude error
    assert float(normalized_l2_misfit(s, d)) < 1e-12
    s2 = d * 3.7 + 0.5 * jnp.asarray(rng.standard_normal((200, 7)))
    assert float(normalized_l2_misfit(s2, d)) > 1e-3
