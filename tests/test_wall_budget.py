"""Wall-clock budget (FwiConfig.max_wall_s): long inversions under an
external timeout must stop CLEANLY after the current iteration — model
returned, checkpoint written, stop event logged — and be resumable.
(SURVEY.md §5 checkpoint/resume; used by scripts/overthrust_fullscale_ms.py
so the Overthrust-scale run always writes its summary.)"""

import json

import jax.numpy as jnp
import numpy as np

from tpufwi.config import (
    AcqCfg, FwiConfig, OptCfg, PrecondCfg, PropCfg, StageCfg,
)
from tpufwi.invert import build_synthetic_problem, invert


def _cfg(run_dir, checkpoint_every=1, stages=None, **kw):
    return FwiConfig(
        stages=stages
        or (StageCfg(7.0, 3, "lbfgs"), StageCfg(11.0, 3, "lbfgs")),
        prop=PropCfg(order=4, pml=8, cfl_safety=0.7, dtype="float64"),
        acq=AcqCfg(n_shots=2, src_z=2, rcv_z=2, rcv_dx=3, f0=11.0, t_max=0.5),
        precond=PrecondCfg(use_illumination=False, mask_top=2),
        opt=OptCfg(vmin=1600.0, vmax=2600.0),
        run_dir=str(run_dir),
        checkpoint_every=checkpoint_every,
        **kw,
    )


def _true_model():
    from scipy.ndimage import gaussian_filter

    vp = np.full((36, 52), 2000.0)
    vp[16:22, 18:34] = 1820.0
    return gaussian_filter(vp, 1.0)


def _iter_records(run_dir):
    with open(run_dir / "log.jsonl") as f:
        recs = [json.loads(line) for line in f]
    return [r for r in recs if "event" not in r], recs


def test_wall_budget_stops_after_first_iterate_and_resumes(tmp_path):
    vp_true = _true_model()

    # an already-expired budget: the driver must still complete ONE
    # iteration (stop is checked after the accepted iterate, never before
    # any progress), log the stop event, and skip the remaining stages
    cfg = _cfg(tmp_path / "a", max_wall_s=1e-6)
    problem, vp0 = build_synthetic_problem(cfg, vp_true, dx=10.0)
    vp = invert(problem, vp0, cfg)
    iters, recs = _iter_records(tmp_path / "a")
    assert len(iters) == 1, iters
    assert any(r.get("event") == "wall_budget_stop" for r in recs)
    assert not np.array_equal(np.asarray(vp), np.asarray(vp0))

    # the budget-stopped run resumes from its checkpoint and, with the
    # budget lifted, finishes the full schedule
    cfg2 = _cfg(tmp_path / "a")
    vp_fin = invert(problem, vp0, cfg2, resume=True)
    iters2, _ = _iter_records(tmp_path / "a")  # appended to the same log
    assert len(iters2) == 6, len(iters2)
    assert np.isfinite(np.asarray(vp_fin)).all()


def test_budget_stop_checkpoints_between_marks_exactly_once(tmp_path):
    """A wall-budget stop must checkpoint ITS iterate even when
    checkpoint_every would skip it (resume must not replay lost work),
    fire the on_checkpoint hook there, and log exactly ONE
    wall_budget_stop event (ADVICE r4 items 1+3)."""
    vp_true = _true_model()
    cfg = _cfg(tmp_path / "c", checkpoint_every=3, max_wall_s=1e-6)
    problem, vp0 = build_synthetic_problem(cfg, vp_true, dx=10.0)
    calls = []
    invert(problem, vp0, cfg,
           on_checkpoint=lambda s, i, x: calls.append((s, i, x.shape)))
    ck = np.load(tmp_path / "c" / "ckpt.npz")
    assert int(ck["stage"]) == 0 and int(ck["iter"]) == 0
    assert calls == [(0, 0, vp_true.shape)]
    iters, recs = _iter_records(tmp_path / "c")
    stops = [r for r in recs if r.get("event") == "wall_budget_stop"]
    assert len(iters) == 1 and len(stops) == 1
    # on_checkpoint fires AFTER the iterate's JSONL record: a summary
    # refreshed from the hook can count log.jsonl and never under-report
    assert len(calls) == len(iters)


def test_resume_at_stage_boundary_with_expired_budget_progresses(tmp_path):
    """Resume landing exactly on a completed stage's end with an
    already-expired budget must still run one iterate of the NEXT stage
    (the stop gate is 'any iterate ran this invocation', not stage
    index — ADVICE r4 item 2)."""
    vp_true = _true_model()
    one = _cfg(tmp_path / "d", stages=(StageCfg(7.0, 3, "lbfgs"),))
    problem, vp0 = build_synthetic_problem(one, vp_true, dx=10.0)
    invert(problem, vp0, one)  # checkpoint now says stage=0, iter=2
    n_before = len(_iter_records(tmp_path / "d")[0])

    two = _cfg(tmp_path / "d", max_wall_s=1e-6)  # 2-stage, expired budget
    invert(problem, vp0, two, resume=True)
    iters, recs = _iter_records(tmp_path / "d")
    new = iters[n_before:]
    assert len(new) == 1 and new[0]["stage"] == 1, new
    assert any(r.get("event") == "wall_budget_stop" for r in recs)


def test_no_budget_runs_full_schedule(tmp_path):
    vp_true = _true_model()
    cfg = _cfg(tmp_path / "b")  # max_wall_s defaults to 0 = unlimited
    problem, vp0 = build_synthetic_problem(cfg, vp_true, dx=10.0)
    invert(problem, vp0, cfg)
    iters, recs = _iter_records(tmp_path / "b")
    assert len(iters) == 6, len(iters)
    assert not any(r.get("event") == "wall_budget_stop" for r in recs)


def test_linesearch_failure_is_logged(tmp_path):
    """A stage that starts at convergence (first line search fails: zero
    gradient gives no descent direction) must leave a
    event='linesearch_failed' record in the JSONL instead of a silent
    zero-iteration no-op (round-5 finding: the CLI quick config hit
    this invisibly). Shares this file's driver fixtures."""
    import dataclasses

    import jax

    vp_true = _true_model()
    cfg = _cfg(tmp_path / "e", stages=(StageCfg(None, 2, "lbfgs"),))
    problem, vp0 = build_synthetic_problem(cfg, vp_true, dx=10.0)
    # observed data generated AT the initial model: J(vp0) = 0 exactly
    d0 = jnp.stack([
        problem.prop(vp0, jax.tree.map(lambda x: x[i], problem.geoms),
                     problem.wavelet)
        for i in range(int(problem.d_obs.shape[0]))
    ])
    problem = dataclasses.replace(problem, d_obs=d0)
    invert(problem, vp0, cfg)
    iters, recs = _iter_records(tmp_path / "e")
    fails = [r for r in recs if r.get("event") == "linesearch_failed"]
    assert len(iters) == 0 and len(fails) == 1, (iters, recs)
    assert fails[0]["stage"] == 0 and fails[0]["J"] <= 1e-12
