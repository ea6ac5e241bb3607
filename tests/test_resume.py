"""Fault injection: kill the inversion mid-run, resume from checkpoint,
and require bit-identical continuation (SURVEY.md §5 'failure detection')."""

import numpy as np
import pytest

from tpufwi.config import FwiConfig, StageCfg, PropCfg, AcqCfg, PrecondCfg, OptCfg
from tpufwi.invert import build_synthetic_problem, invert


class _Crash(Exception):
    pass


def _cfg(run_dir):
    return FwiConfig(
        stages=(StageCfg(7.0, 3, "lbfgs"), StageCfg(11.0, 3, "lbfgs")),
        prop=PropCfg(order=4, pml=8, cfl_safety=0.7, dtype="float64"),
        acq=AcqCfg(n_shots=3, src_z=2, rcv_z=2, rcv_dx=3, f0=11.0, t_max=0.6),
        precond=PrecondCfg(use_illumination=False, mask_top=2),
        opt=OptCfg(vmin=1600.0, vmax=2600.0),
        run_dir=str(run_dir),
        checkpoint_every=1,
    )


def _true_model():
    from scipy.ndimage import gaussian_filter

    vp = np.full((40, 60), 2000.0)
    vp[18:26, 20:40] = 1800.0
    return gaussian_filter(vp, 1.0)


def test_resume_bit_identical(tmp_path):
    vp_true = _true_model()

    # uninterrupted reference
    cfg_a = _cfg(tmp_path / "a")
    problem, vp0 = build_synthetic_problem(cfg_a, vp_true, dx=10.0)
    vp_ref = invert(problem, vp0, cfg_a)

    # crashed run: die after the 4th accepted iterate (mid stage 2)
    cfg_b = _cfg(tmp_path / "b")
    count = {"n": 0}

    def bomb(rec):
        count["n"] += 1
        if count["n"] == 4:
            raise _Crash()

    with pytest.raises(_Crash):
        invert(problem, vp0, cfg_b, log_fn=bomb)

    # resume and finish
    vp_res = invert(problem, vp0, cfg_b, resume=True)

    assert np.array_equal(np.asarray(vp_ref), np.asarray(vp_res)), (
        "resumed model differs from uninterrupted run"
    )


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_multiparameter_resume_bit_identical(tmp_path):
    """Same fault-injection contract for the multiparameter driver
    (invert_multiparameter run_dir/resume): kill mid-stage-2, resume,
    require bit-identical (vp, vs) against the uninterrupted run."""
    import jax
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    from tpufwi import Geometry, Grid
    from tpufwi.invert import ElasticFwiProblem, invert_multiparameter
    from tpufwi.propagators.elastic2d import ElasticPropagator, elastic_cfl_dt
    from tpufwi.wavelets import ricker_np

    nz, nx, f0 = 36, 44, 12.0
    vp_t = np.full((nz, nx), 2300.0)
    vp_t[14:22, 16:30] = 2100.0
    vp_t = gaussian_filter(vp_t, 1.0)
    vs_t = vp_t / 1.8
    rho = np.full((nz, nx), 2000.0)
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    dt = elastic_cfl_dt(grid.h, float(vp_t.max()), 4, safety=0.7)
    w = jnp.asarray(ricker_np(f0, dt, 200))
    prop = ElasticPropagator(grid, dt, f0, float(vp_t.max()),
                             dtype=jnp.float64, source_type="force_z")
    geoms = []
    for sz in (6, 18, 30):
        rz = np.arange(3, nz - 3, 3)
        geoms.append(Geometry.from_physical(
            grid, np.array([[sz, 3]]),
            np.stack([rz, np.full_like(rz, nx - 4)], 1)))
    geoms = jax.tree.map(lambda *a: jnp.stack(a), *geoms)
    vpj, vsj, rhoj = jnp.asarray(vp_t), jnp.asarray(vs_t), jnp.asarray(rho)
    d_obs = jax.vmap(lambda si, ri: prop(
        vpj, vsj, rhoj, Geometry(src_idx=si, rcv_idx=ri), w
    ))(geoms.src_idx, geoms.rcv_idx)
    problem = ElasticFwiProblem(prop=prop, geoms=geoms, d_obs=d_obs,
                                wavelet=w, dt=dt)
    m0 = (jnp.asarray(gaussian_filter(vp_t, 8.0)),
          jnp.asarray(gaussian_filter(vs_t, 8.0)), rhoj)
    bounds = [(1900.0, 2500.0), (1000.0, 1450.0), (1500.0, 2500.0)]
    stages = [StageCfg(None, 3), StageCfg(None, 3)]

    ref = invert_multiparameter(problem, m0, stages, bounds=bounds,
                                scales="auto",
                                run_dir=str(tmp_path / "mp_a"))

    count = {"n": 0}

    def bomb(rec):
        count["n"] += 1
        if count["n"] == 4:  # mid stage 2
            raise _Crash()

    with pytest.raises(_Crash):
        invert_multiparameter(problem, m0, stages, bounds=bounds,
                              scales="auto",
                              run_dir=str(tmp_path / "mp_b"), log_fn=bomb)

    res = invert_multiparameter(problem, m0, stages, bounds=bounds,
                                scales="auto",
                                run_dir=str(tmp_path / "mp_b"), resume=True)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(res)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # a checkpoint written under different scales must refuse to resume
    with pytest.raises(ValueError, match="different scales"):
        invert_multiparameter(problem, m0, stages, bounds=bounds,
                              scales=[100.0, 100.0, 100.0],
                              run_dir=str(tmp_path / "mp_b"), resume=True)
