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


def test_offgrid_simulator_node_aligned_matches_ongrid():
    """make_simulator_offgrid with node-aligned coordinates reproduces
    the on-grid engine exactly (the Kaiser-sinc stencil collapses to a
    delta at zero fractional offset)."""
    import jax

    from tpufwi.adjoint import make_simulator, make_simulator_offgrid
    from tpufwi.acquisition import OffGridGeometry

    grid = Grid(shape=(48, 64), h=(10.0, 10.0), pml=10, order=8)
    c, f0, nt = 2000.0, 13.0, 220
    dt = grid.cfl_dt(c, safety=0.7)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    c2dt2 = jnp.full(grid.padded_shape, (c * dt) ** 2, jnp.float64)
    src_cells = np.array([[24, 16]])
    rcv_cells = np.array([[24, x] for x in range(30, 54, 4)])

    geom = Geometry.from_physical(grid, src_cells, rcv_cells)
    sim_on = make_simulator(grid, dt, f0, c, jnp.float64,
                            use_custom_vjp=False)
    s_on = np.asarray(sim_on(c2dt2, w, geom.src_idx, geom.rcv_idx))

    og = OffGridGeometry.from_continuous(
        grid, src_cells * 10.0, rcv_cells * 10.0
    )
    sim_off = make_simulator_offgrid(grid, dt, f0, c, jnp.float64)
    s_off = np.asarray(sim_off(c2dt2, w, og.src, og.rcv))
    assert np.abs(s_off - s_on).max() < 1e-12 * np.abs(s_on).max()


def test_offgrid_reciprocity():
    """Acoustic reciprocity with matched (transposed) injection/recording
    operators: swapping an off-grid source and receiver in a constant-
    density heterogeneous medium gives the same trace."""
    from tpufwi.adjoint import make_simulator_offgrid
    from tpufwi.acquisition import PointSet

    grid = Grid(shape=(60, 76), h=(10.0, 10.0), pml=10, order=8)
    rng = np.random.default_rng(2)
    vp = 2000.0 + 150.0 * np.repeat(
        np.repeat(rng.random((15, 19)), 4, axis=0), 4, axis=1
    )  # smooth-ish heterogeneity
    f0 = 12.0
    dt = grid.cfl_dt(float(vp.max()), safety=0.6)
    nt = 380
    w = jnp.asarray(ricker_np(f0, dt, nt))
    pad = grid.pad
    c2dt2 = jnp.asarray(np.pad(vp, pad, mode="edge") ** 2 * dt * dt)
    A = np.array([[212.3, 156.8]])
    B = np.array([[367.1, 548.4]])
    sim = make_simulator_offgrid(grid, dt, f0, float(vp.max()), jnp.float64)
    psA = PointSet.from_coords(grid, A)
    psB = PointSet.from_coords(grid, B)
    t_ab = np.asarray(sim(c2dt2, w, psA, psB))[:, 0]
    t_ba = np.asarray(sim(c2dt2, w, psB, psA))[:, 0]
    # reciprocity for the pressure source/receiver pair in constant
    # density: identical up to the (shared) discretization
    rel = np.abs(t_ab - t_ba).max() / np.abs(t_ab).max()
    assert rel < 1e-6, f"off-grid reciprocity violated: {rel:.3e}"


def test_offgrid_gradient_finite_difference():
    import jax

    from tpufwi.adjoint import make_simulator_offgrid
    from tpufwi.acquisition import PointSet

    grid = Grid(shape=(30, 36), h=(10.0, 10.0), pml=8, order=4)
    c, f0, nt = 2000.0, 13.0, 80
    dt = grid.cfl_dt(c, safety=0.7)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    c2dt2 = jnp.full(grid.padded_shape, (c * dt) ** 2, jnp.float64)
    sim = make_simulator_offgrid(grid, dt, f0, c, jnp.float64)
    psA = PointSet.from_coords(grid, np.array([[151.7, 82.4]]))
    psB = PointSet.from_coords(grid, np.array([[148.2, 267.9]]))

    def loss(c2):
        s = sim(c2, w, psA, psB)
        return jnp.sum(s * s)

    g = jax.grad(loss)(c2dt2)
    rng = np.random.default_rng(7)
    md = np.zeros(grid.padded_shape)
    md[grid.pad + 2 : -grid.pad - 2, grid.pad + 2 : -grid.pad - 2] = 1.0
    v = jnp.asarray(rng.standard_normal(md.shape) * md)
    h = 1e-6
    fd = (loss(c2dt2 + h * v) - loss(c2dt2 - h * v)) / (2 * h)
    rel = abs(float(jnp.vdot(g, v)) - float(fd)) / max(1.0, abs(float(fd)))
    assert rel < 1e-5, rel
