"""Whole-scan-resident engine == jnp adjoint engine (interpret mode, CPU).

The scanres engine (adjoint_pallas_scanres) runs the ENTIRE time loop in
one pallas_call per direction, wavefield state persistent in VMEM scratch
across grid steps; the jnp custom-VJP gradient is the proven oracle
(tests/test_adjoint.py). Covered: seis/J/gradient/wavelet-gradient parity,
time-axis padding (nt not divisible by the chunk size CH), multi-source,
free surface, the receiver-window contract, and the vmap multi-shot path.

Run the same file on hardware with TPUFWI_TEST_PLATFORM=axon.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi import Geometry, Grid
from tpufwi.adjoint import make_simulator
from tpufwi.adjoint_pallas_scanres import make_simulator_pallas_scanres
from tpufwi.propagators.boundary import RingSpec
from tpufwi.wavelets import ricker_np

INTERPRET = jax.default_backend() == "cpu"

# See tests/test_kstep.py: hardware accumulation-order slack vs interpret.
GTOL = 1e-4 if INTERPRET else 2e-3


def _setup(order=8, nt=135, nsrc=1, free_surface=False):
    grid = Grid(
        shape=(48, 72), h=(10.0, 10.0), pml=10, order=order,
        free_surface=free_surface,
    )
    c_max, f0 = 2500.0, 14.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    rng = np.random.default_rng(0)
    vp = np.clip(2000 + 200 * rng.standard_normal(grid.shape), 1700, 2500)
    pad = grid.pad
    c2 = jnp.asarray((np.pad(vp, pad, mode="edge") * dt) ** 2, jnp.float32)
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    src = np.stack(
        [np.full(nsrc, 24), np.linspace(20, 52, nsrc).astype(np.int64)], 1
    )
    geom = Geometry.from_physical(
        grid, src, np.stack([np.full(20, 5), np.arange(5, 65, 3)], 1)
    )
    return grid, dt, f0, c_max, c2, w, geom


def _loss(sim, geom, d_obs):
    def f(c2_, w_):
        r = sim(c2_, w_, geom.src_idx, geom.rcv_idx) - d_obs
        return 0.5 * jnp.sum(r * r)

    return f


@pytest.mark.parametrize("nt", [135, 128, 139])
@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_scanres_matches_jnp(nt):
    grid, dt, f0, c_max, c2, w, geom = _setup(nt=nt)
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_s = make_simulator_pallas_scanres(
        grid, dt, f0, c_max, rcv_rows=16, interpret=INTERPRET
    )
    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)
    s_s = sim_s(c2, w, geom.src_idx, geom.rcv_idx)
    np.testing.assert_allclose(
        np.asarray(s_s), np.asarray(d_obs), atol=1e-5 * float(jnp.abs(d_obs).max())
    )

    J_j, (g_j, gw_j) = jax.value_and_grad(
        _loss(sim_j, geom, d_obs), argnums=(0, 1)
    )(c2 * 1.01, w)
    J_s, (g_s, gw_s) = jax.value_and_grad(
        _loss(sim_s, geom, d_obs), argnums=(0, 1)
    )(c2 * 1.01, w)
    assert abs(float(J_j) - float(J_s)) / float(J_j) < GTOL
    g_j = np.asarray(RingSpec.build(grid).mask_valid(g_j))
    err = np.abs(np.asarray(g_s) - g_j).max() / np.abs(g_j).max()
    assert err < GTOL, f"nt={nt} gradient max rel err {err:.3e}"
    werr = np.abs(np.asarray(gw_s) - np.asarray(gw_j)).max() / np.abs(gw_j).max()
    assert werr < GTOL, f"nt={nt} wavelet-gradient max rel err {werr:.3e}"


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_scanres_multisource():
    grid, dt, f0, c_max, c2, w, geom = _setup(nt=96, nsrc=3)
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_s = make_simulator_pallas_scanres(
        grid, dt, f0, c_max, rcv_rows=16, interpret=INTERPRET
    )
    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)
    J_j, g_j = jax.value_and_grad(_loss(sim_j, geom, d_obs))(c2 * 1.01, w)
    J_s, g_s = jax.value_and_grad(_loss(sim_s, geom, d_obs))(c2 * 1.01, w)
    g_j = np.asarray(RingSpec.build(grid).mask_valid(g_j))
    err = np.abs(np.asarray(g_s) - g_j).max() / np.abs(g_j).max()
    assert err < GTOL, f"multisource gradient max rel err {err:.3e}"


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_scanres_free_surface():
    grid, dt, f0, c_max, c2, w, geom = _setup(nt=96, free_surface=True)
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_s = make_simulator_pallas_scanres(
        grid, dt, f0, c_max, rcv_rows=16, interpret=INTERPRET
    )
    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)
    s_s = sim_s(c2, w, geom.src_idx, geom.rcv_idx)
    np.testing.assert_allclose(
        np.asarray(s_s), np.asarray(d_obs), atol=1e-5 * float(jnp.abs(d_obs).max())
    )
    J_j, g_j = jax.value_and_grad(_loss(sim_j, geom, d_obs))(c2 * 1.01, w)
    J_s, g_s = jax.value_and_grad(_loss(sim_s, geom, d_obs))(c2 * 1.01, w)
    g_j = np.asarray(RingSpec.build(grid).mask_valid(g_j))
    err = np.abs(np.asarray(g_s) - g_j).max() / np.abs(g_j).max()
    assert err < GTOL, f"free-surface gradient max rel err {err:.3e}"


def test_scanres_rcv_window_rejects_concrete_violation():
    grid, dt, f0, c_max, c2, w, _ = _setup(nt=32)
    rcv = np.stack([np.arange(5, 35), np.full(30, 20)], 1)
    geom = Geometry.from_physical(grid, np.array([[24, 36]]), rcv)
    sim_s = make_simulator_pallas_scanres(
        grid, dt, f0, c_max, rcv_rows=16, interpret=INTERPRET
    )
    with pytest.raises(ValueError, match="receiver rows span"):
        sim_s(c2, w, geom.src_idx, geom.rcv_idx)


def test_scanres_rcv_window_poisons_traced_violation():
    grid, dt, f0, c_max, c2, w, _ = _setup(nt=32)
    rcv = np.stack([np.arange(5, 35), np.full(30, 20)], 1)
    geom = Geometry.from_physical(grid, np.array([[24, 36]]), rcv)
    sim_s = make_simulator_pallas_scanres(
        grid, dt, f0, c_max, rcv_rows=16, interpret=INTERPRET
    )
    seis = jax.jit(lambda si, ri: sim_s(c2, w, si, ri))(
        geom.src_idx, geom.rcv_idx
    )
    assert bool(jnp.isnan(seis).any())


# bf16 lap-tape rounding bound for the snapshot engine (the nt-sum
# averages the per-row 2^-8 rounding; measured ~2e-4 on these setups)
SNAP_GTOL = 5e-3


@pytest.mark.parametrize("nt", [
    pytest.param(135, marks=pytest.mark.slow),  # lane triage r5: the
    # 128 case carries the parity contract; 135 re-checks nt padding
    128,
])
def test_scansnap_matches_jnp(nt):
    """Snapshot engine (bf16 lap tape, no reverse reconstruction):
    forward identical to scanres, gradient == jnp up to tape rounding,
    wavelet gradient (tape-independent) at full fp32 parity."""
    grid, dt, f0, c_max, c2, w, geom = _setup(nt=nt)
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_n = make_simulator_pallas_scanres(
        grid, dt, f0, c_max, rcv_rows=16, interpret=INTERPRET,
        tape_mode="snap",
    )
    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)
    s_n = sim_n(c2, w, geom.src_idx, geom.rcv_idx)
    np.testing.assert_allclose(
        np.asarray(s_n), np.asarray(d_obs),
        atol=1e-5 * float(jnp.abs(d_obs).max()),
    )
    J_j, (g_j, gw_j) = jax.value_and_grad(
        _loss(sim_j, geom, d_obs), argnums=(0, 1)
    )(c2 * 1.01, w)
    J_n, (g_n, gw_n) = jax.value_and_grad(
        _loss(sim_n, geom, d_obs), argnums=(0, 1)
    )(c2 * 1.01, w)
    assert abs(float(J_j) - float(J_n)) / float(J_j) < GTOL
    g_j = np.asarray(RingSpec.build(grid).mask_valid(g_j))
    err = np.abs(np.asarray(g_n) - g_j).max() / np.abs(g_j).max()
    assert err < SNAP_GTOL, f"nt={nt} snap gradient max rel err {err:.3e}"
    werr = np.abs(np.asarray(gw_n) - np.asarray(gw_j)).max() / np.abs(gw_j).max()
    assert werr < GTOL, f"nt={nt} snap wavelet-grad max rel err {werr:.3e}"


def test_scansnap_free_surface_and_multisource():
    grid, dt, f0, c_max, c2, w, geom = _setup(
        nt=96, nsrc=3, free_surface=True
    )
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_n = make_simulator_pallas_scanres(
        grid, dt, f0, c_max, rcv_rows=16, interpret=INTERPRET,
        tape_mode="snap",
    )
    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)
    J_j, g_j = jax.value_and_grad(_loss(sim_j, geom, d_obs))(c2 * 1.01, w)
    J_n, g_n = jax.value_and_grad(_loss(sim_n, geom, d_obs))(c2 * 1.01, w)
    assert abs(float(J_j) - float(J_n)) / float(J_j) < GTOL
    g_j = np.asarray(RingSpec.build(grid).mask_valid(g_j))
    err = np.abs(np.asarray(g_n) - g_j).max() / np.abs(g_j).max()
    assert err < SNAP_GTOL, f"snap fs gradient max rel err {err:.3e}"


@pytest.mark.skipif(
    not INTERPRET,
    reason="compiled scanres does not batch its scalar-prefetch inputs "
    "under vmap; multi-shot runs use lax.map (invert.py) or shard_map",
)
def test_scanres_vmap_multishot_matches_sequential():
    grid, dt, f0, c_max, c2, w, _ = _setup(nt=64)
    sim_s = make_simulator_pallas_scanres(
        grid, dt, f0, c_max, rcv_rows=16, interpret=INTERPRET
    )
    rcv = np.stack([np.full(20, 5), np.arange(5, 65, 3)], 1)
    geoms = [
        Geometry.from_physical(grid, np.array([[24, x]]), rcv) for x in (20, 36, 52)
    ]
    batched = jax.tree.map(lambda *a: jnp.stack(a), *geoms)
    seis_b = jax.jit(
        jax.vmap(lambda si, ri: sim_s(c2, w, si, ri))
    )(batched.src_idx, batched.rcv_idx)
    for i, g in enumerate(geoms):
        s_i = sim_s(c2, w, g.src_idx, g.rcv_idx)
        np.testing.assert_allclose(np.asarray(seis_b[i]), np.asarray(s_i), atol=1e-6)
