"""Engine auto-selection (VERDICT round 2, item 6): impl='auto' must pick
the whole-scan-resident engine when its contract holds (2D, fp32, TPU
backend, every shot's receivers in one 8-aligned 16-row slab) and fall
back with a logged reason otherwise — so the README quick-start path gets
the benched engine, not the single-step one.

The backend check is monkeypatched (the suite runs on CPU); the engines
are built lazily, so selection logic is testable without TPU hardware.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi.acquisition import Geometry
from tpufwi.grid import Grid
from tpufwi.propagators.acoustic2d import AcousticPropagator


def _grid():
    return Grid(shape=(60, 100), h=(10.0, 10.0), pml=10, order=4)


def _prop(impl="auto"):
    grid = _grid()
    dt = grid.cfl_dt(3000.0, safety=0.7)
    return grid, AcousticPropagator(grid, dt, 8.0, 3000.0, impl=impl)


def _surface_geom(grid, rows=(3,)):
    rcv = np.array([[z, x] for z in rows for x in range(4, 96, 4)])
    return Geometry.from_physical(grid, np.array([[2, 50]]), rcv)


def test_auto_is_jnp_on_cpu():
    _, prop = _prop()
    assert prop.impl == "jnp"


def test_auto_defers_on_tpu_and_picks_whole_scan(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _prop()
    assert prop.impl == "auto"  # deferred: geometry-dependent
    geom = _surface_geom(grid)
    # without a wavelet length the snapshot tape cannot be sized ->
    # the rings whole-scan engine
    assert prop.resolve_impl(geom) == "pallas_scanres"
    # with one, and the tape within budget, the snapshot engine
    assert prop.resolve_impl(geom, nt=500) == "pallas_scansnap"


def test_auto_snapshot_tape_budget(monkeypatch):
    """The snapshot engine is skipped when its bf16 lap tape would not
    fit the HBM budget (nt * NZ * NX * 2 bytes), not silently OOM."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _prop()
    geom = _surface_geom(grid)
    NZ, NX = grid.padded_shape
    nt_over = prop.SNAP_TAPE_BUDGET_BYTES // (NZ * NX * 2) + 1
    assert prop.resolve_impl(geom, nt=int(nt_over)) == "pallas_scanres"


def test_auto_falls_back_on_wide_receiver_spread(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _prop()
    # a vertical borehole string spans far more than one 16-row slab
    rcv = np.array([[z, 80] for z in range(2, 50, 2)])
    geom = Geometry.from_physical(grid, np.array([[2, 10]]), rcv)
    assert prop.resolve_impl(geom) == "pallas"
    assert prop.resolve_impl(None) == "pallas"


def test_auto_falls_back_on_traced_geometry(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _prop()
    geom = _surface_geom(grid)
    seen = {}

    def f(rcv_idx):
        g = Geometry(src_idx=geom.src_idx, rcv_idx=rcv_idx)
        seen["impl"] = prop.resolve_impl(g)
        return jnp.float32(0)

    jax.jit(f)(geom.rcv_idx)  # geometry as a traced argument
    assert seen["impl"] == "pallas"


def test_explicit_impl_is_respected(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _prop(impl="jnp")
    assert prop.impl == "jnp"
    assert prop.resolve_impl(_surface_geom(grid)) == "jnp"


def test_fwi_problem_pins_scanres_and_python_loop(monkeypatch):
    """FwiProblem resolves 'auto' once against the concrete survey (its
    jitted objectives see traced geometry, which would conservatively
    fall back) and selects the scanres-compatible shot loop."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _prop()
    geoms = [_surface_geom(grid) for _ in range(2)]
    stacked = jax.tree.map(lambda *x: jnp.stack(x), *geoms)
    nt, nrec = 32, geoms[0].nrec

    from tpufwi.invert import FwiProblem

    problem = FwiProblem(
        prop=prop,
        geoms=stacked,
        d_obs=jnp.zeros((2, nt, nrec), jnp.float32),
        wavelet=jnp.zeros(nt, jnp.float32),
        dt=prop.dt,
    )
    problem._build()  # does not execute — only resolves and traces lazily
    assert prop.impl == "pallas_scansnap"  # nt=32 tape is tiny
    assert problem.shot_loop == "python"


def test_fwi_problem_map_loop_for_jnp_engine():
    grid, prop = _prop()  # CPU: auto -> jnp
    geoms = [_surface_geom(grid) for _ in range(2)]
    stacked = jax.tree.map(lambda *x: jnp.stack(x), *geoms)
    nt, nrec = 32, geoms[0].nrec

    from tpufwi.invert import FwiProblem

    problem = FwiProblem(
        prop=prop,
        geoms=stacked,
        d_obs=jnp.zeros((2, nt, nrec), jnp.float32),
        wavelet=jnp.zeros(nt, jnp.float32),
        dt=prop.dt,
    )
    problem._build()
    assert problem.shot_loop == "map"


# ---- 3D tier (VERDICT r3 item 2): auto routes 3D to the fused engine ----


def _grid3():
    return Grid(shape=(24, 30, 40), h=(10.0,) * 3, pml=8, order=8)


def _prop3(impl="auto"):
    grid = _grid3()
    dt = grid.cfl_dt(3000.0, safety=0.7)
    return grid, AcousticPropagator(grid, dt, 8.0, 3000.0, impl=impl)


def _geom3(grid):
    rcv = np.array([[y, 3, x] for y in range(4, 20, 4)
                    for x in range(4, 36, 4)])
    return Geometry.from_physical(grid, np.array([[12, 2, 20]]), rcv)


def test_auto3d_is_jnp_on_cpu():
    _, prop = _prop3()
    assert prop.impl == "jnp"


def test_auto3d_picks_fused_on_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _prop3()
    assert prop.impl == "auto"  # deferred: nt-dependent (ring-tape budget)
    assert prop.resolve_impl(_geom3(grid), nt=100) == "pallas3d"
    # without a wavelet length the ring tape cannot be sized
    assert prop.resolve_impl(_geom3(grid)) == "jnp"


def test_auto3d_bf16_tape_between_budgets(monkeypatch):
    """fp32 tape over budget but bf16 within -> the bf16-tape engine; both
    over -> jnp fallback (not a silent OOM)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _prop3()
    cells = prop._tape3d_cells_per_step()
    nt_mid = prop.TAPE3D_FP32_BUDGET_BYTES // (cells * 4) + 1
    assert prop.resolve_impl(None, nt=int(nt_mid)) == "pallas3d_bf16"
    nt_over = prop.TAPE3D_BF16_BUDGET_BYTES // (cells * 2) + 1
    assert prop.resolve_impl(None, nt=int(nt_over)) == "jnp"
    assert "exceeds" in prop.resolve_note


def test_fwi_problem_pins_fused3d_and_python_loop(monkeypatch):
    """The driver path: FwiProblem resolves 'auto' once against the 3D
    survey and selects the host shot loop the fused engine needs."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _prop3()
    geoms = [_geom3(grid) for _ in range(2)]
    stacked = jax.tree.map(lambda *x: jnp.stack(x), *geoms)
    nt, nrec = 32, geoms[0].nrec

    from tpufwi.invert import FwiProblem

    problem = FwiProblem(
        prop=prop,
        geoms=stacked,
        d_obs=jnp.zeros((2, nt, nrec), jnp.float32),
        wavelet=jnp.zeros(nt, jnp.float32),
        dt=prop.dt,
    )
    problem._build()  # resolves; engines build lazily (no TPU needed)
    assert prop.impl == "pallas3d"
    assert "fp32 ring tape" in prop.resolve_note
    assert problem.shot_loop == "python"


def test_explicit_pallas3d_on_2d_grid_rejected():
    grid = _grid()
    dt = grid.cfl_dt(3000.0, safety=0.7)
    with pytest.raises(ValueError):
        AcousticPropagator(grid, dt, 8.0, 3000.0, impl="pallas3d")


def test_driver_jsonl_records_engine(tmp_path):
    """Every inversion artifact names the engine that produced it
    (VERDICT r3 item 8): invert() writes an event='engine' record with
    the resolved impl + resolution note per stage."""
    import json
    import os

    from tpufwi.config import AcqCfg, FwiConfig, OptCfg, PrecondCfg, PropCfg, StageCfg
    from tpufwi.invert import build_synthetic_problem, invert

    cfg = FwiConfig(
        stages=(StageCfg(8.0, 1, "lbfgs"),),
        prop=PropCfg(order=4, pml=8, cfl_safety=0.7, dtype="float64",
                     impl="jnp"),
        acq=AcqCfg(n_shots=1, src_z=2, rcv_z=2, rcv_dx=4, f0=11.0,
                   t_max=0.25),
        precond=PrecondCfg(use_illumination=False),
        opt=OptCfg(vmin=1500.0, vmax=2600.0),
        run_dir=str(tmp_path / "run"),
    )
    vp_true = np.full((30, 40), 2000.0)
    vp_true[18:, :] = 2250.0
    problem, vp0 = build_synthetic_problem(cfg, vp_true, dx=10.0)
    invert(problem, vp0, cfg)

    recs = [json.loads(l)
            for l in open(os.path.join(cfg.run_dir, "log.jsonl"))]
    eng = [r for r in recs if r.get("event") == "engine"]
    assert len(eng) == 1 and eng[0]["stage"] == 0
    assert eng[0]["engine"] == "jnp"
    assert eng[0]["note"] == "explicit"


# ---------------------------------------------------------------------------
# elastic (VERDICT r4 item 4: the graded C4 path is the default path)


def _eprop(impl="auto", **kw):
    from tpufwi.propagators.elastic2d import (
        ElasticPropagator, elastic_cfl_dt,
    )

    grid = kw.pop("grid", None) or _grid()
    dt = elastic_cfl_dt(grid.h, 2600.0, grid.order, safety=0.7)
    return grid, ElasticPropagator(grid, dt, 10.0, 2600.0, impl=impl, **kw)


def test_elastic_auto_is_jnp_on_cpu():
    _, prop = _eprop()
    assert prop.impl == "jnp"
    assert prop.resolve_note == "auto: non-TPU backend -> jnp"


def test_elastic_auto_picks_whole_scan_on_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _eprop()
    assert prop.impl == "auto"  # deferred: geometry-dependent
    geom = _surface_geom(grid)
    assert prop.resolve_impl(geom) == "pallas_scan"
    assert prop.resolve_note == "whole-scan elastic engine"
    assert prop.fix_impl_for(geom) == "pallas_scan"
    assert prop.impl == "pallas_scan"  # pinned


def test_elastic_auto_falls_back_per_step(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    grid, prop = _eprop()
    # a vertical borehole string spans far more than one 16-row slab
    rcv = np.array([[z, 80] for z in range(2, 50, 2)])
    geom = Geometry.from_physical(grid, np.array([[2, 10]]), rcv)
    assert prop.resolve_impl(geom) == "pallas"
    assert "receiver rows span" in prop.resolve_note
    assert prop.resolve_impl(None) == "pallas"

    # free surface no longer excludes the whole-scan engine (round-5
    # in-kernel images)
    fs_grid = Grid(shape=(60, 100), h=(10.0, 10.0), pml=10, order=4,
                   free_surface=True)
    _, fs_prop = _eprop(grid=fs_grid)
    assert fs_prop.resolve_impl(_surface_geom(fs_grid)) == "pallas_scan"


def test_elastic_auto_off_fp32_is_jnp(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    _, prop = _eprop(dtype=jnp.float64)
    assert prop.impl == "jnp"


def test_elastic_problem_pins_engine(monkeypatch):
    """ElasticFwiProblem pins impl='auto' against the concrete survey at
    _build time (the jitted objectives see traced geometry, which would
    conservatively fall back). The engine JSONL event is covered by
    test_elastic_fwi.test_invert_multiparameter_logs_engine_event."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    from tpufwi.invert import ElasticFwiProblem

    grid, prop = _eprop()
    geom0 = _surface_geom(grid)
    geoms = jax.tree.map(lambda x: x[None], geom0)  # stacked, 1 shot
    nt, nrec = 40, int(geom0.rcv_idx.shape[-2])
    problem = ElasticFwiProblem(
        prop=prop,
        geoms=geoms,
        d_obs=jnp.zeros((1, nt, nrec, 2), jnp.float32),
        wavelet=jnp.zeros((nt,), jnp.float32),
        dt=prop.dt,
    )
    problem._build()  # selection only — no objective evaluation
    assert prop.impl == "pallas_scan"
    assert prop.resolve_note == "whole-scan elastic engine"
    # compiled whole-scan engines don't tolerate lax.map fusion of
    # their streamed outputs: the problem must host-loop shots
    assert problem.shot_loop == "python"
