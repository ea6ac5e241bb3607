"""C5: 3D domain decomposition — sharded == unsharded (SURVEY.md §4.7).

Both TPU-native shardings are tested on the 8-virtual-device CPU mesh:
the GSPMD constraint path (forward + boundary-saving gradient) and the
explicit shard_map + ppermute halo-exchange path (forward).
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpufwi import AcousticPropagator, Geometry, Grid
from tpufwi.adjoint import make_simulator
from tpufwi.misfit import l2_misfit
from tpufwi.propagators.acoustic3d import ShardedAcoustic3D, domain_sharding
from tpufwi.sharding import make_mesh
from tpufwi.wavelets import ricker_np


def _setup(dtype=jnp.float64):
    # padded dims: (44, 36, 64) for pml=6, order=4 -> divisible by (2, -, 4)
    grid = Grid(shape=(28, 20, 48), h=(15.0, 15.0, 15.0), pml=6, order=4)
    c_max, f0 = 2500.0, 10.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 70
    rng = np.random.default_rng(1)
    vp = np.clip(2100 + 150 * rng.standard_normal(grid.shape), 1800, 2500)
    w = jnp.asarray(ricker_np(f0, dt, nt), dtype)
    src = np.array([[14, 10, 24]])
    rcv = np.array([[y, 3, x] for y in (8, 20) for x in range(6, 42, 4)])
    geom = Geometry.from_physical(grid, src, rcv)
    return grid, jnp.asarray(vp, dtype), dt, w, geom, f0, float(vp.max())


def test_explicit_halo_forward_matches_unsharded():
    grid, vp, dt, w, geom, f0, c_max = _setup()
    prop_ref = AcousticPropagator(grid, dt, f0, c_max, dtype=jnp.float64)
    seis_ref = np.asarray(prop_ref(vp, geom, w))

    mesh = make_mesh({"y": 2, "x": 4})
    prop_sh = ShardedAcoustic3D(grid, dt, f0, c_max, mesh, dtype=jnp.float64)
    seis_sh = np.asarray(jax.jit(lambda v: prop_sh(v, geom, w))(vp))

    err = np.abs(seis_sh - seis_ref).max() / np.abs(seis_ref).max()
    assert err < 1e-11, f"explicit-halo sharded vs unsharded: {err:.3e}"


def test_gspmd_forward_and_gradient_match_unsharded():
    grid, vp, dt, w, geom, f0, c_max = _setup()
    sim_ref = make_simulator(grid, dt, f0, c_max, dtype=jnp.float64)

    mesh = make_mesh({"y": 2, "x": 4})
    sharding = domain_sharding(mesh)
    sim_sh = make_simulator(
        grid, dt, f0, c_max, dtype=jnp.float64, wavefield_sharding=sharding
    )

    pad = grid.pad
    c2 = (jnp.pad(vp, [(pad, pad)] * 3, mode="edge") * dt) ** 2
    c2_sh = jax.device_put(c2, sharding)

    s_ref = np.asarray(sim_ref(c2, w, geom.src_idx, geom.rcv_idx))
    s_sh = np.asarray(jax.jit(sim_sh)(c2_sh, w, geom.src_idx, geom.rcv_idx))
    err = np.abs(s_sh - s_ref).max() / np.abs(s_ref).max()
    assert err < 1e-11, f"gspmd sharded vs unsharded forward: {err:.3e}"

    d_obs = jnp.asarray(s_ref)

    def loss(sim):
        return lambda c2_: l2_misfit(sim(c2_, w, geom.src_idx, geom.rcv_idx), d_obs)

    g_ref = np.asarray(jax.grad(loss(sim_ref))(c2 * 1.01))
    g_sh = np.asarray(jax.jit(jax.grad(loss(sim_sh)))(c2_sh * 1.01))
    err = np.abs(g_sh - g_ref).max() / np.abs(g_ref).max()
    assert err < 1e-10, f"gspmd sharded vs unsharded gradient: {err:.3e}"


# ---------------------------------------------------------------------------
# Fused engine x domain sharding (round-3: VERDICT r2 item 2)
# ---------------------------------------------------------------------------


def _setup_fused():
    """Geometry chosen to exercise the sharded fused engine hard: padded
    NY=64 over 4 y-devices (L=16, two pure-interior slabs), sources on
    two different slabs, receivers strung across ALL slabs in y."""
    grid = Grid(shape=(44, 20, 44), h=(12.0, 12.0, 12.0), pml=8, order=4)
    c_max, f0 = 2500.0, 9.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    nt = 30
    rng = np.random.default_rng(5)
    NY, NZ, NX = grid.padded_shape
    pad = grid.pad
    vp = 2100.0 + 140 * rng.standard_normal(grid.shape).astype(np.float32)
    vp_pad = np.pad(vp, pad, mode="edge")
    c2 = jnp.asarray(((vp_pad * dt) ** 2).astype(np.float32))
    from tpufwi.wavelets import ricker

    w = ricker(f0, dt, nt).astype(jnp.float32)
    ry = np.arange(pad + 2, NY - pad - 2, 3, dtype=np.int32)
    rcv = np.stack(
        [ry, np.full_like(ry, pad + 3), np.full_like(ry, NX // 2)], 1
    )
    srcs = np.array(
        [[[NY // 4, pad + 2, NX // 3]], [[(3 * NY) // 4, pad + 2,
                                          (2 * NX) // 3]]]
    )
    src_idx = jnp.asarray(srcs, jnp.int32)  # (2, 1, 3)
    rcv_idx = jnp.asarray(np.stack([rcv, rcv]), jnp.int32)  # (2, nrec, 3)
    return grid, dt, f0, c_max, c2, w, src_idx, rcv_idx


def test_fused_sharded_representative_fast():
    """Fast-lane representative of the fused+sharded battery (the full
    cases below run in the slow lane): (shot=2, y=2) mesh, short scan —
    forward + boundary-saving gradient vs the unsharded fused engine."""
    from jax.sharding import Mesh
    from tpufwi.adjoint3d_pallas import make_simulator3d_fused
    from tpufwi.adjoint3d_pallas_sharded import (
        make_simulator3d_fused_sharded,
    )
    from tpufwi.misfit import l2_misfit as _l2
    from tpufwi.wavelets import ricker

    grid = Grid(shape=(28, 12, 44), h=(12.0, 12.0, 12.0), pml=8, order=4)
    c_max, f0 = 2500.0, 9.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    rng = np.random.default_rng(5)
    NY, NZ, NX = grid.padded_shape  # (48, 32, 64): py=2 -> L=24
    pad = grid.pad
    vp = 2100.0 + 140 * rng.standard_normal(grid.shape).astype(np.float32)
    c2 = jnp.asarray(((np.pad(vp, pad, mode="edge") * dt) ** 2)
                     .astype(np.float32))
    w = ricker(f0, dt, 12).astype(jnp.float32)
    ry = np.arange(pad + 2, NY - pad - 2, 4, dtype=np.int32)
    rcv = np.stack([ry, np.full_like(ry, pad + 3),
                    np.full_like(ry, NX // 2)], 1)
    src_idx = jnp.asarray(
        [[[NY // 4, pad + 2, NX // 3]],
         [[(3 * NY) // 4, pad + 2, (2 * NX) // 3]]], jnp.int32)
    rcv_idx = jnp.asarray(np.stack([rcv, rcv]), jnp.int32)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("shot", "y"))
    sim_ref = make_simulator3d_fused(
        grid, dt, f0, c_max, by=8, bz=8, bz_y=8, interpret=True
    )
    sim_sh = make_simulator3d_fused_sharded(
        grid, dt, f0, c_max, mesh, by=8, bz=8, bz_y=8, interpret=True
    )
    s_ref = np.stack([
        np.asarray(sim_ref(c2, w, src_idx[i], rcv_idx[i]))
        for i in range(2)
    ])
    s_sh = np.asarray(jax.jit(sim_sh)(c2, w, src_idx, rcv_idx))
    err = np.abs(s_sh - s_ref).max() / (np.abs(s_ref).max() + 1e-30)
    assert err < 1e-5, f"fused sharded vs unsharded forward: {err:.3e}"

    d_obs = jnp.asarray(s_ref)
    c2p = c2 * 1.02
    g_ref = np.asarray(jax.grad(lambda c2_: sum(
        _l2(sim_ref(c2_, w, src_idx[i], rcv_idx[i]), d_obs[i])
        for i in range(2)
    ))(c2p))
    g_sh = np.asarray(jax.jit(jax.grad(
        lambda c2_: _l2(sim_sh(c2_, w, src_idx, rcv_idx), d_obs)
    ))(c2p))
    err = np.abs(g_sh - g_ref).max() / (np.abs(g_ref).max() + 1e-30)
    # looser than the slow-lane 2e-3: this 12-step scan's gradient is
    # barely out of the source imprint, so the ring-imposition roundoff
    # (see the tolerance note below) is large RELATIVE to |g|_max
    # (measured 2.7e-3); the tight bound is held by the slow-lane cases
    assert err < 1e-2, f"fused sharded vs unsharded gradient: {err:.3e}"


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_fused_sharded_forward_and_gradient_match_unsharded():
    """The fused v2 kernels inside shard_map over a (shot=2, y=4) mesh:
    forward seismograms and the boundary-saving gradient both match the
    single-device fused engine (interpret mode, 8 virtual CPU devices).
    SURVEY.md:164 'halo-aware so blocks compose with domain sharding'."""
    from jax.sharding import Mesh
    from tpufwi.adjoint3d_pallas import make_simulator3d_fused
    from tpufwi.adjoint3d_pallas_sharded import (
        make_simulator3d_fused_sharded,
    )
    from tpufwi.misfit import l2_misfit as _l2

    grid, dt, f0, c_max, c2, w, src_idx, rcv_idx = _setup_fused()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("shot", "y"))

    sim_ref = make_simulator3d_fused(
        grid, dt, f0, c_max, by=8, bz=8, bz_y=8, interpret=True
    )
    sim_sh = make_simulator3d_fused_sharded(
        grid, dt, f0, c_max, mesh, by=8, bz=8, bz_y=8, interpret=True
    )

    # forward parity, both shots
    s_ref = np.stack([
        np.asarray(sim_ref(c2, w, src_idx[i], rcv_idx[i]))
        for i in range(2)
    ])
    s_sh = np.asarray(jax.jit(sim_sh)(c2, w, src_idx, rcv_idx))
    err = np.abs(s_sh - s_ref).max() / (np.abs(s_ref).max() + 1e-30)
    assert err < 1e-5, f"fused sharded vs unsharded forward: {err:.3e}"

    # gradient parity through an L2 misfit over both shots
    d_obs = jnp.asarray(s_ref)

    def loss_ref(c2_):
        return sum(
            _l2(sim_ref(c2_, w, src_idx[i], rcv_idx[i]), d_obs[i])
            for i in range(2)
        )

    def loss_sh(c2_):
        return _l2(sim_sh(c2_, w, src_idx, rcv_idx), d_obs)

    c2p = c2 * 1.02
    J_ref, g_ref = jax.value_and_grad(loss_ref)(c2p)
    J_sh, g_sh = jax.jit(jax.value_and_grad(loss_sh))(c2p)
    assert np.allclose(float(J_ref), float(J_sh), rtol=1e-5)
    g_ref, g_sh = np.asarray(g_ref), np.asarray(g_sh)
    err = np.abs(g_sh - g_ref).max() / (np.abs(g_ref).max() + 1e-30)
    # Tolerance note: the sharded reconstruction imposes each slab's
    # LOCAL ring rows with saved forward values; on interior slabs those
    # rows would otherwise be reverse-recomputed, and fp32 forward vs
    # reverse values differ at roundoff (the imposed values are the
    # TRUER ones). Measured: 5e-4 max-norm here, while both engines sit
    # 1.2e-2 from the XLA-engine gradient on this deliberately hard fp32
    # setup — the sharding changes numerics 25x less than the engine
    # family does. py=1 (layout-identical) is BITWISE exact (test below).
    assert err < 2e-3, f"fused sharded vs unsharded gradient: {err:.3e}"


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_fused_sharded_py1_bitwise_identical():
    """With one y device the local layout equals the global one — the
    sharded engine must reproduce the unsharded gradient BITWISE (proves
    the halo/profile/tape plumbing adds no numerical path of its own)."""
    from jax.sharding import Mesh
    from tpufwi.adjoint3d_pallas import make_simulator3d_fused
    from tpufwi.adjoint3d_pallas_sharded import (
        make_simulator3d_fused_sharded,
    )
    from tpufwi.misfit import l2_misfit as _l2

    grid, dt, f0, c_max, c2, w, src_idx, rcv_idx = _setup_fused()
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("shot", "y"))
    sim_ref = make_simulator3d_fused(
        grid, dt, f0, c_max, by=8, bz=8, bz_y=8, interpret=True
    )
    sim_sh = make_simulator3d_fused_sharded(
        grid, dt, f0, c_max, mesh, by=8, bz=8, bz_y=8, interpret=True
    )
    d_obs = jnp.stack([
        sim_ref(c2, w, src_idx[i], rcv_idx[i]) for i in range(2)
    ])
    c2p = c2 * 1.02
    g_ref = np.asarray(jax.grad(lambda c2_: sum(
        _l2(sim_ref(c2_, w, src_idx[i], rcv_idx[i]), d_obs[i])
        for i in range(2)
    ))(c2p))
    g_sh = np.asarray(jax.jit(jax.grad(
        lambda c2_: _l2(sim_sh(c2_, w, src_idx, rcv_idx), d_obs)
    ))(c2p))
    assert np.array_equal(g_sh, g_ref), "py=1 sharded != unsharded bitwise"


def _setup_fused_yz():
    """2-axis domain variant: padded (64, 32, 64) with pml=8/order=4 ->
    y slabs L=32 (py=2), z slabs Lz=16 (pz=2, % bz=8, W=14 <= 16)."""
    grid = Grid(shape=(44, 12, 44), h=(12.0, 12.0, 12.0), pml=8, order=4)
    c_max, f0 = 2500.0, 9.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    nt = 30
    rng = np.random.default_rng(11)
    NY, NZ, NX = grid.padded_shape
    pad = grid.pad
    vp = 2100.0 + 140 * rng.standard_normal(grid.shape).astype(np.float32)
    vp_pad = np.pad(vp, pad, mode="edge")
    c2 = jnp.asarray(((vp_pad * dt) ** 2).astype(np.float32))
    from tpufwi.wavelets import ricker

    w = ricker(f0, dt, nt).astype(jnp.float32)
    # receivers crossing BOTH domain cuts: a y-string at two z depths
    # (one on each z slab) plus sources on different y slabs
    ry = np.arange(pad + 2, NY - pad - 2, 4, dtype=np.int32)
    rcv = np.concatenate([
        np.stack([ry, np.full_like(ry, zrow), np.full_like(ry, NX // 2)], 1)
        for zrow in (pad + 2, NZ - pad - 3)
    ])
    srcs = np.array(
        [[[NY // 4, NZ // 2, NX // 3]],
         [[(3 * NY) // 4, NZ // 2 - 2, (2 * NX) // 3]]]
    )
    src_idx = jnp.asarray(srcs, jnp.int32)
    rcv_idx = jnp.asarray(np.stack([rcv, rcv]), jnp.int32)
    return grid, dt, f0, c_max, c2, w, src_idx, rcv_idx


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_fused_sharded_two_axis_domain_matches_unsharded():
    """VERDICT r3 item 3: the fused engine on a ("shot","y","z") 2x2x2
    mesh — forward seismograms and the boundary-saving gradient match
    the single-device fused engine (interpret mode, 8 virtual CPU
    devices). SURVEY.md §3.5 mesh ("shot","x","y") (this repo's layout
    is (y, z, x))."""
    from jax.sharding import Mesh
    from tpufwi.adjoint3d_pallas import make_simulator3d_fused
    from tpufwi.adjoint3d_pallas_sharded import (
        make_simulator3d_fused_sharded,
    )
    from tpufwi.misfit import l2_misfit as _l2

    grid, dt, f0, c_max, c2, w, src_idx, rcv_idx = _setup_fused_yz()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("shot", "y", "z"))

    sim_ref = make_simulator3d_fused(
        grid, dt, f0, c_max, by=8, bz=8, bz_y=8, interpret=True
    )
    sim_sh = make_simulator3d_fused_sharded(
        grid, dt, f0, c_max, mesh, z_axis="z", by=8, bz=8, bz_y=8,
        interpret=True,
    )

    s_ref = np.stack([
        np.asarray(sim_ref(c2, w, src_idx[i], rcv_idx[i]))
        for i in range(2)
    ])
    s_sh = np.asarray(jax.jit(sim_sh)(c2, w, src_idx, rcv_idx))
    err = np.abs(s_sh - s_ref).max() / (np.abs(s_ref).max() + 1e-30)
    assert err < 1e-5, f"2-axis sharded vs unsharded forward: {err:.3e}"

    d_obs = jnp.asarray(s_ref)

    def loss_ref(c2_):
        return sum(
            _l2(sim_ref(c2_, w, src_idx[i], rcv_idx[i]), d_obs[i])
            for i in range(2)
        )

    def loss_sh(c2_):
        return _l2(sim_sh(c2_, w, src_idx, rcv_idx), d_obs)

    c2p = c2 * 1.02
    J_ref, g_ref = jax.value_and_grad(loss_ref)(c2p)
    J_sh, g_sh = jax.jit(jax.value_and_grad(loss_sh))(c2p)
    assert np.allclose(float(J_ref), float(J_sh), rtol=1e-5)
    g_ref, g_sh = np.asarray(g_ref), np.asarray(g_sh)
    err = np.abs(g_sh - g_ref).max() / (np.abs(g_ref).max() + 1e-30)
    # same tolerance rationale as the (shot, y) case above: interior
    # slabs impose their LOCAL ring rows with saved (truer) forward
    # values where the unsharded engine reverse-recomputes them
    assert err < 2e-3, f"2-axis sharded vs unsharded gradient: {err:.3e}"


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_fused_sharded_wavelet_cotangent_matches():
    from jax.sharding import Mesh
    from tpufwi.adjoint3d_pallas import make_simulator3d_fused
    from tpufwi.adjoint3d_pallas_sharded import (
        make_simulator3d_fused_sharded,
    )
    from tpufwi.misfit import l2_misfit as _l2

    grid, dt, f0, c_max, c2, w, src_idx, rcv_idx = _setup_fused()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("shot", "y"))
    sim_ref = make_simulator3d_fused(
        grid, dt, f0, c_max, by=8, bz=8, bz_y=8, interpret=True
    )
    sim_sh = make_simulator3d_fused_sharded(
        grid, dt, f0, c_max, mesh, by=8, bz=8, bz_y=8, interpret=True
    )
    d_obs = jnp.stack([
        sim_ref(c2, w, src_idx[i], rcv_idx[i]) for i in range(2)
    ])
    c2p = c2 * 1.02

    def loss_ref(w_):
        return sum(
            _l2(sim_ref(c2p, w_, src_idx[i], rcv_idx[i]), d_obs[i])
            for i in range(2)
        )

    g_ref = np.asarray(jax.grad(loss_ref)(w))
    g_sh = np.asarray(jax.jit(jax.grad(
        lambda w_: _l2(sim_sh(c2p, w_, src_idx, rcv_idx), d_obs)
    ))(w))
    err = np.abs(g_sh - g_ref).max() / (np.abs(g_ref).max() + 1e-30)
    assert err < 1e-4, f"sharded wavelet cotangent: {err:.3e}"
