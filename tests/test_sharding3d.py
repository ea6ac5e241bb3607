"""C5: 3D domain decomposition — sharded == unsharded (SURVEY.md §4.7).

Both TPU-native shardings are tested on the 8-virtual-device CPU mesh:
the GSPMD constraint path (forward + boundary-saving gradient) and the
explicit shard_map + ppermute halo-exchange path (forward).
"""

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
