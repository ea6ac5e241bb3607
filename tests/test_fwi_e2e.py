"""End-to-end multiscale FWI regression on a tiny synthetic model
(SURVEY.md §4.8): model error must decrease substantially in CI minutes."""

import pytest

import numpy as np
import jax.numpy as jnp

from tpufwi.config import FwiConfig, StageCfg, PropCfg, AcqCfg, PrecondCfg, OptCfg
from tpufwi.invert import build_synthetic_problem, invert



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def _tiny_true_model(nz=50, nx=80):
    from scipy.ndimage import gaussian_filter

    vp = np.full((nz, nx), 2000.0)
    vp[22:30, 30:52] = 1750.0  # low-velocity box anomaly
    vp[35:, :] = 2350.0
    return gaussian_filter(vp, 1.0)


def _cfg(tmp_path, iters=(10, 10), method="lbfgs"):
    return FwiConfig(
        stages=tuple(StageCfg(f, n, method) for f, n in zip((6.0, 11.0), iters)),
        prop=PropCfg(order=4, pml=10, cfl_safety=0.7, dtype="float64"),
        acq=AcqCfg(n_shots=4, src_z=2, rcv_z=2, rcv_dx=2, f0=11.0, t_max=0.75),
        precond=PrecondCfg(use_illumination=True, mask_top=2, smooth_sigma=0.8),
        opt=OptCfg(vmin=1600.0, vmax=2600.0),
        run_dir=str(tmp_path / "run"),
        checkpoint_every=1,
    )


def test_fwi_recovers_anomaly(tmp_path):
    vp_true = _tiny_true_model()
    cfg = _cfg(tmp_path)
    problem, vp0 = build_synthetic_problem(cfg, vp_true, dx=10.0)
    err0 = float(np.linalg.norm(np.asarray(vp0) - vp_true))

    vg, loss = problem.stage_objectives(cfg.stages[-1].fmax)
    J0 = float(loss(vp0))

    vp = invert(problem, vp0, cfg)
    err1 = float(np.linalg.norm(np.asarray(vp) - vp_true))
    J1 = float(loss(vp))

    # measured on this fixture: J1/J0 ~ 0.49, err1/err0 ~ 0.51 after 20
    # iterations (reflection-only surface geometry is illumination-limited;
    # the gradient itself is exact to roundoff — tests/test_adjoint.py).
    assert J1 < 0.65 * J0, f"data misfit only {J1/J0:.2f} of initial"
    assert err1 < 0.70 * err0, f"model error ratio {err1/err0:.2f}"


def test_fwi_nlcg_reduces_misfit(tmp_path):
    vp_true = _tiny_true_model()
    cfg = _cfg(tmp_path, iters=(6, 6), method="nlcg")
    problem, vp0 = build_synthetic_problem(cfg, vp_true, dx=10.0)
    vg, loss = problem.stage_objectives(cfg.stages[-1].fmax)
    J0 = float(loss(vp0))
    vp = invert(problem, vp0, cfg)
    J1 = float(loss(vp))
    assert J1 < 0.65 * J0  # measured ~0.50


def test_shot_loop_python_matches_map(tmp_path):
    """FwiProblem.shot_loop='python' (per-shot jitted vg, device-side
    accumulation — required for the compiled scanres engine, which neither
    vmaps nor tolerates lax.map while-body fusion) computes the same loss
    and gradient as the default lax.map path."""
    import dataclasses

    import jax.numpy as jnp

    vp_true = _tiny_true_model()
    cfg = _cfg(tmp_path)
    problem, vp0 = build_synthetic_problem(cfg, vp_true, dx=10.0)
    vg_map, loss_map = problem.stage_objectives(cfg.stages[-1].fmax)
    J_m, g_m = vg_map(vp0)

    problem2 = dataclasses.replace(problem, shot_loop="python")
    vg_py, loss_py = problem2.stage_objectives(cfg.stages[-1].fmax)
    J_p, g_p = vg_py(vp0)

    assert abs(float(J_m) - float(J_p)) / abs(float(J_m)) < 1e-12
    rel = float(jnp.abs(g_m - g_p).max() / jnp.abs(g_m).max())
    assert rel < 1e-12, f"python vs map gradient rel {rel:.2e}"
