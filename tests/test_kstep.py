"""K-step fused kernels == jnp adjoint engine (interpret mode, CPU).

The K-step engine (adjoint_pallas_kstep) advances K time steps per
pallas_call; the jnp custom-VJP gradient is the proven oracle
(tests/test_adjoint.py). Also covered: time-axis padding (nt not divisible
by K), multi-source, the receiver-window contract (eager error when the
geometry is concrete; NaN poisoning when it is violated under tracing),
and the multi-shot vmap path (traced geometry).

Run the same file on hardware with TPUFWI_TEST_PLATFORM=axon.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi import Geometry, Grid
from tpufwi.adjoint import make_simulator
from tpufwi.adjoint_pallas_kstep import make_simulator_pallas_kstep
from tpufwi.propagators.boundary import RingSpec
from tpufwi.wavelets import ricker_np

INTERPRET = jax.default_backend() == "cpu"

# K-step is a measured dead end (BASELINE.md round-2: DMA-phase-bound);
# the engine is retained but its parity battery runs in the slow lane
pytestmark = pytest.mark.slow

# Gradient-parity tolerance: interpret mode is bit-disciplined; on hardware
# the two engines accumulate the same ~1e2-step fp32 sums in different
# orders (and the relay compiles with --xla_allow_excess_precision), so the
# max-element rel err lands at ~1e-4..1e-3 (runs/tpu_queue3/tpu_ci.log) —
# accumulation order, not physics.
GTOL = 1e-4 if INTERPRET else 2e-3


def _setup(order=8, nt=135, nsrc=1):
    grid = Grid(shape=(48, 72), h=(10.0, 10.0), pml=10, order=order)
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


def _loss(sim, w, geom, d_obs):
    def f(c2_, w_):
        r = sim(c2_, w_, geom.src_idx, geom.rcv_idx) - d_obs
        return 0.5 * jnp.sum(r * r)

    return f


@pytest.mark.parametrize("K,nt", [(4, 135), (2, 140), (5, 137)])
def test_kstep_matches_jnp(K, nt):
    grid, dt, f0, c_max, c2, w, geom = _setup(nt=nt)
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_k = make_simulator_pallas_kstep(
        grid, dt, f0, c_max, K=K, rcv_rows=16, interpret=INTERPRET
    )
    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)
    s_k = sim_k(c2, w, geom.src_idx, geom.rcv_idx)
    np.testing.assert_allclose(
        np.asarray(s_k), np.asarray(d_obs), atol=1e-5 * float(jnp.abs(d_obs).max())
    )

    J_j, (g_j, gw_j) = jax.value_and_grad(
        _loss(sim_j, w, geom, d_obs), argnums=(0, 1)
    )(c2 * 1.01, w)
    J_k, (g_k, gw_k) = jax.value_and_grad(
        _loss(sim_k, w, geom, d_obs), argnums=(0, 1)
    )(c2 * 1.01, w)
    assert abs(float(J_j) - float(J_k)) / float(J_j) < GTOL
    g_j = np.asarray(RingSpec.build(grid).mask_valid(g_j))
    err = np.abs(np.asarray(g_k) - g_j).max() / np.abs(g_j).max()
    assert err < GTOL, f"K={K} gradient max rel err {err:.3e}"
    werr = np.abs(np.asarray(gw_k) - np.asarray(gw_j)).max() / np.abs(gw_j).max()
    assert werr < GTOL, f"K={K} wavelet-gradient max rel err {werr:.3e}"


def test_kstep_multisource():
    grid, dt, f0, c_max, c2, w, geom = _setup(nt=96, nsrc=3)
    sim_j = make_simulator(grid, dt, f0, c_max, dtype=jnp.float32)
    sim_k = make_simulator_pallas_kstep(
        grid, dt, f0, c_max, K=4, rcv_rows=16, interpret=INTERPRET
    )
    d_obs = sim_j(c2, w, geom.src_idx, geom.rcv_idx)
    J_j, g_j = jax.value_and_grad(_loss(sim_j, w, geom, d_obs))(c2 * 1.01, w)
    J_k, g_k = jax.value_and_grad(_loss(sim_k, w, geom, d_obs))(c2 * 1.01, w)
    g_j = np.asarray(RingSpec.build(grid).mask_valid(g_j))
    err = np.abs(np.asarray(g_k) - g_j).max() / np.abs(g_j).max()
    assert err < GTOL, f"multisource gradient max rel err {err:.3e}"


def test_kstep_rcv_window_rejects_concrete_violation():
    grid, dt, f0, c_max, c2, w, _ = _setup(nt=32)
    pad = grid.pad
    # receivers spread over 30 rows > rcv_rows=16
    rcv = np.stack([np.arange(5, 35), np.full(30, 20)], 1)
    geom = Geometry.from_physical(grid, np.array([[24, 36]]), rcv)
    sim_k = make_simulator_pallas_kstep(
        grid, dt, f0, c_max, K=4, rcv_rows=16, interpret=INTERPRET
    )
    with pytest.raises(ValueError, match="receiver rows span"):
        sim_k(c2, w, geom.src_idx, geom.rcv_idx)
    del pad


def test_kstep_rcv_window_poisons_traced_violation():
    grid, dt, f0, c_max, c2, w, _ = _setup(nt=32)
    rcv = np.stack([np.arange(5, 35), np.full(30, 20)], 1)
    geom = Geometry.from_physical(grid, np.array([[24, 36]]), rcv)
    sim_k = make_simulator_pallas_kstep(
        grid, dt, f0, c_max, K=4, rcv_rows=16, interpret=INTERPRET
    )
    # traced geometry (argument, not closure): violation -> NaN, not silence
    seis = jax.jit(lambda si, ri: sim_k(c2, w, si, ri))(
        geom.src_idx, geom.rcv_idx
    )
    assert bool(jnp.isnan(seis).any())


@pytest.mark.skipif(
    not INTERPRET,
    reason="hardware lane runs under jax_enable_x64, where pallas's vmap "
    "batching rule inserts its own index-map component that lowers as an "
    "i64 constant — Mosaic refuses the mixed-width transform return "
    "('failed to legalize func.return', runs/tpu_queue7/tpu_ci_b.log). "
    "Outside bspec's reach (jax-internal); production multi-shot paths "
    "use lax.map / shard_map, never vmap-of-kstep.",
)
def test_kstep_vmap_multishot_matches_sequential():
    grid, dt, f0, c_max, c2, w, _ = _setup(nt=64)
    sim_k = make_simulator_pallas_kstep(
        grid, dt, f0, c_max, K=4, rcv_rows=16, interpret=INTERPRET
    )
    rcv = np.stack([np.full(20, 5), np.arange(5, 65, 3)], 1)
    geoms = [
        Geometry.from_physical(grid, np.array([[24, x]]), rcv) for x in (20, 36, 52)
    ]
    batched = jax.tree.map(lambda *a: jnp.stack(a), *geoms)
    seis_b = jax.jit(
        jax.vmap(lambda si, ri: sim_k(c2, w, si, ri))
    )(batched.src_idx, batched.rcv_idx)
    for i, g in enumerate(geoms):
        s_i = np.asarray(sim_k(c2, w, g.src_idx, g.rcv_idx))
        atol = 1e-6 if INTERPRET else 1e-5 * float(np.abs(s_i).max())
        np.testing.assert_allclose(np.asarray(seis_b[i]), s_i, atol=atol)
