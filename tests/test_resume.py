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
