"""Grid continuation (multiscale in SPACE): models.resample /
models.coarse_grid drive a coarse-grid low-band stage whose prolongated
result is a measurably better fine-grid starting model. The coarse stage
costs ~1/8 of the fine per iteration in 2D (4x fewer cells, ~2x larger
CFL dt), which is the point of the workflow at production scale."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from tpufwi.config import AcqCfg, FwiConfig, OptCfg, PrecondCfg, PropCfg, StageCfg
from tpufwi.grid import Grid
from tpufwi.invert import build_synthetic_problem, invert
from tpufwi.models import coarse_grid, resample



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def test_resample_adjointness_and_shapes():
    """resample is linear + differentiable; down/up round trip preserves
    smooth fields; coarse_grid preserves the physical extent."""
    g = Grid(shape=(51, 81), h=(10.0, 10.0), pml=10, order=8)
    cg = coarse_grid(g, 2)
    assert cg.shape == (26, 41)
    for (n, h), (m, hc) in zip(zip(g.shape, g.h), zip(cg.shape, cg.h)):
        assert abs((n - 1) * h - (m - 1) * hc) < 1e-9
    z, x = np.meshgrid(np.linspace(0, 1, 51), np.linspace(0, 1, 81),
                       indexing="ij")
    smooth = jnp.asarray(2000 + 300 * np.sin(2 * np.pi * z) * np.cos(np.pi * x))
    rt = resample(resample(smooth, cg.shape), g.shape)
    # measured 25.9 on this field: linear down/up at a non-integer 51->26
    # ratio (half-pixel centers) — bounded well under the 300 amplitude
    assert float(jnp.abs(rt - smooth).max()) < 0.1 * 300
    # differentiable (linear map: constant Jacobian; grad of sum = row sums)
    gsum = jax.grad(lambda m: jnp.sum(resample(m, cg.shape)))(smooth)
    assert float(jnp.sum(gsum)) - cg.shape[0] * cg.shape[1] < 1e-2 * cg.shape[0] * cg.shape[1]


def _cfg(tmp_path, name, shape_stage, order=4):
    return FwiConfig(
        stages=(shape_stage,),
        prop=PropCfg(order=order, pml=10, cfl_safety=0.7, dtype="float64"),
        acq=AcqCfg(n_shots=4, src_z=2, rcv_z=2, rcv_dx=2, f0=11.0, t_max=0.75),
        precond=PrecondCfg(use_illumination=True, mask_top=2, smooth_sigma=0.8),
        opt=OptCfg(vmin=1600.0, vmax=2600.0),
        run_dir=str(tmp_path / name),
        checkpoint_every=0,
    )


def test_coarse_stage_improves_fine_start(tmp_path):
    from scipy.ndimage import gaussian_filter

    vp = np.full((50, 80), 2000.0)
    vp[22:30, 30:52] = 1750.0
    vp[35:, :] = 2350.0
    vp_true = gaussian_filter(vp, 1.0)

    cfg_f = _cfg(tmp_path, "fine", StageCfg(11.0, 0))
    prob_f, vp0 = build_synthetic_problem(cfg_f, vp_true, dx=10.0)
    _, loss_f = prob_f.stage_objectives(11.0)

    # coarse stage: factor-2 grid, low band only
    vp_true_c = np.asarray(resample(jnp.asarray(vp_true), (25, 40)))
    cfg_c = _cfg(tmp_path, "coarse", StageCfg(6.0, 12))
    prob_c, _ = build_synthetic_problem(cfg_c, vp_true_c, dx=10.0 * 79 / 39 / 2)
    vp0_c = resample(vp0, (25, 40))
    vp_c = invert(prob_c, vp0_c, cfg_c)

    vp_up = jnp.clip(resample(vp_c, (50, 80)), 1600.0, 2600.0)

    J_start = float(loss_f(vp0))
    J_cont = float(loss_f(vp_up.astype(vp0.dtype)))
    err0 = float(np.linalg.norm(np.asarray(vp0) - vp_true))
    err1 = float(np.linalg.norm(np.asarray(vp_up) - vp_true))
    # measured 0.69 with 12 coarse iterations; 0.85 guards regressions
    # without being flaky across BLAS/jax versions
    assert J_cont < 0.85 * J_start, f"fine J ratio {J_cont/J_start:.2f}"
    assert err1 < 0.95 * err0, f"model err ratio {err1/err0:.2f}"
