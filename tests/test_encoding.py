"""Source-encoded (simultaneous-source) FWI: supershot linearity,
exact cross-talk cancellation in expectation, and an encoded inversion
that actually reduces the TRUE multi-shot misfit."""


import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi import AcousticPropagator, Geometry, Grid, ricker
from tpufwi.config import StageCfg
from tpufwi.encoding import (
    EncodedFwiProblem,
    encode_gather,
    encode_wavelet,
    invert_encoded,
    merge_sources,
)



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def _setup(nz=44, nx=56, n_shots=4, nt=260, f0=12.0):
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    dt = grid.cfl_dt(2400.0, safety=0.7)
    w = ricker(f0, dt, nt, dtype=jnp.float64)
    rng = np.random.RandomState(0)
    vp_t = 1900.0 + 60.0 * rng.rand(nz, nx)
    vp_t[18:26, 20:36] += 140.0
    prop = AcousticPropagator(grid, dt, f0=f0, c_max=2400.0, dtype=jnp.float64)
    rx = np.arange(5, nx - 5, 2)
    rcv = np.stack([np.full_like(rx, 4), rx], 1)
    sx = np.linspace(8, nx - 8, n_shots).astype(int)
    geoms = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[Geometry.from_physical(grid, np.array([[4, s]]), rcv) for s in sx],
    )
    vp_tj = jnp.asarray(vp_t)
    d_obs = jnp.stack([
        prop(vp_tj, jax.tree.map(lambda x: x[i], geoms), w)
        for i in range(n_shots)
    ])
    return grid, dt, w, vp_t, prop, geoms, d_obs


def test_supershot_equals_coded_sum():
    """Linearity through the per-source-wavelet path: a +-1-coded
    supershot reproduces sum_s c_s d_s to fp roundoff (the machinery the
    whole feature rests on)."""
    _, _, w, vp_t, prop, geoms, d_obs = _setup()
    vp = jnp.asarray(vp_t)
    codes = jnp.asarray([1.0, -1.0, -1.0, 1.0])
    sup = prop(vp, merge_sources(geoms), encode_wavelet(w, codes))
    ref = encode_gather(d_obs, codes)
    err = float(jnp.max(jnp.abs(sup - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-12, err


def test_crosstalk_cancels_in_expectation():
    """Enumerating ALL code vectors for 2 shots: the average encoded L2
    misfit equals the plain multi-shot misfit exactly (the cross terms
    sum to zero over the full Rademacher ensemble)."""
    _, _, w, vp_t, prop, geoms, d_obs = _setup(n_shots=2)
    vp0 = jnp.asarray(np.full_like(vp_t, 2000.0))
    g_super = merge_sources(geoms)

    # per-shot reference misfit at vp0
    J_ref = 0.0
    for i in range(2):
        syn = prop(vp0, jax.tree.map(lambda x: x[i], geoms), w)
        J_ref += 0.5 * float(jnp.sum((syn - d_obs[i]) ** 2))

    J_enc = []
    for signs in itertools.product([1.0, -1.0], repeat=2):
        c = jnp.asarray(signs)
        syn = prop(vp0, g_super, encode_wavelet(w, c))
        J_enc.append(0.5 * float(jnp.sum((syn - encode_gather(d_obs, c)) ** 2)))
    assert np.isclose(np.mean(J_enc), J_ref, rtol=1e-10)


def test_fixed_spread_enforced():
    grid, dt, w, _, prop, geoms, d_obs = _setup()
    bad_rcv = np.asarray(geoms.rcv_idx).copy()
    bad_rcv[1, 0, 1] += 2  # shot 1 gets a shifted receiver
    bad = Geometry(src_idx=geoms.src_idx, rcv_idx=jnp.asarray(bad_rcv))
    with pytest.raises(ValueError, match="fixed spread"):
        EncodedFwiProblem(prop=prop, geoms=bad, d_obs=d_obs, wavelet=w, dt=dt)


def test_encoded_inversion_reduces_true_misfit():
    """8 encoded iterations (1 sim each) cut the TRUE 4-shot misfit by
    >5x from a constant start — the economics of the method: gradient
    cost independent of n_shots."""
    from tpufwi.invert import FwiProblem

    grid, dt, w, vp_t, prop, geoms, d_obs = _setup()
    pb = EncodedFwiProblem(prop=prop, geoms=geoms, d_obs=d_obs, wavelet=w,
                           dt=dt)
    plain = FwiProblem(prop=prop, geoms=geoms, d_obs=d_obs, wavelet=w, dt=dt)
    _, true_loss = plain.stage_objectives(None)

    vp0 = jnp.full(grid.shape, 2000.0, jnp.float64)
    J0 = float(true_loss(vp0))
    vp1 = invert_encoded(
        pb, vp0, [StageCfg(None, 8)], bounds=(1800.0, 2300.0),
        key=jax.random.PRNGKey(7),
    )
    J1 = float(true_loss(vp1))
    assert J1 < 0.2 * J0, f"encoded FWI true-misfit ratio {J1 / J0:.3f}"


def test_encoded_mesh_matches_local():
    """8 realizations sharded over the 8-device CPU mesh produce the
    same objective and gradient as the local lax.map path (same codes)."""
    from tpufwi.sharding import make_mesh

    grid, dt, w, vp_t, prop, geoms, d_obs = _setup(nt=200)
    vp0 = jnp.full(grid.shape, 2000.0, jnp.float64)
    key = jax.random.PRNGKey(3)

    pb_l = EncodedFwiProblem(prop=prop, geoms=geoms, d_obs=d_obs, wavelet=w,
                             dt=dt, n_realizations=8)
    mesh = make_mesh({"shot": 8})
    pb_m = EncodedFwiProblem(prop=prop, geoms=geoms, d_obs=d_obs, wavelet=w,
                             dt=dt, n_realizations=8, mesh=mesh)

    vg_l, _ = pb_l.objectives(None, key)
    vg_m, _ = pb_m.objectives(None, key)
    Jl, gl = vg_l(vp0)
    Jm, gm = vg_m(vp0)
    assert np.isclose(float(Jl), float(Jm), rtol=1e-12)
    rel = float(jnp.linalg.norm(gl - gm) / jnp.linalg.norm(gl))
    assert rel < 1e-12, rel
