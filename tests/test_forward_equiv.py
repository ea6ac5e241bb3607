"""V1: jnp fast path == independent NumPy oracle to < 1e-6 RMS.

SURVEY.md §4.1. Randomized small models (homogeneous / layered / smooth
random), both FD orders, fp64, identical discretization by construction —
the test verifies the *machinery* (scan, scatter/gather, stencils, CPML
recursion) against the loop-level fp64 oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi import AcousticPropagator, Geometry, Grid
from tpufwi.kernels.oracle_numpy import oracle_forward
from tpufwi.wavelets import ricker_np


def _setup(order, model_kind, nz=50, nx=62, pml=10, nt=240, f0=12.0):
    rng = np.random.default_rng(0)
    if model_kind == "homogeneous":
        vp = np.full((nz, nx), 2000.0)
    elif model_kind == "layered":
        vp = np.full((nz, nx), 1800.0)
        vp[nz // 3 :] = 2300.0
        vp[2 * nz // 3 :] = 2800.0
    else:  # smooth random
        from scipy.ndimage import gaussian_filter

        vp = 2200.0 + 400.0 * gaussian_filter(rng.standard_normal((nz, nx)), 4)
    h = 10.0
    grid = Grid(shape=(nz, nx), h=(h, h), pml=pml, order=order)
    dt = grid.cfl_dt(float(vp.max()), safety=0.7)
    w = ricker_np(f0, dt, nt)
    src = np.array([[nz // 2, nx // 2]])
    rx = np.arange(4, nx - 4, 3)
    rcv = np.stack([np.full_like(rx, 6), rx], 1)
    return grid, vp, dt, w, src, rcv, f0


@pytest.mark.parametrize("order", [4, 8])
@pytest.mark.parametrize("model_kind", ["homogeneous", "layered", "random"])
def test_forward_matches_oracle(order, model_kind):
    grid, vp, dt, w, src, rcv, f0 = _setup(order, model_kind)
    seis_oracle, _ = oracle_forward(vp, grid, dt, w, src, rcv, f0)

    prop = AcousticPropagator(grid, dt, f0, c_max=float(vp.max()), dtype=jnp.float64)
    geom = Geometry.from_physical(grid, src, rcv)
    seis = np.asarray(prop(jnp.asarray(vp), geom, jnp.asarray(w)))

    scale = np.sqrt(np.mean(seis_oracle**2)) + 1e-30
    rms = np.sqrt(np.mean((seis - seis_oracle) ** 2)) / scale
    assert rms < 1e-9, f"relative RMS {rms:.3e} (order={order}, {model_kind})"


def test_forward_fp32_close_to_oracle():
    """fp32 production dtype still < 1e-6 RMS relative (V1 threshold)."""
    grid, vp, dt, w, src, rcv, f0 = _setup(4, "layered")
    seis_oracle, _ = oracle_forward(vp, grid, dt, w, src, rcv, f0)
    prop = AcousticPropagator(grid, dt, f0, c_max=float(vp.max()), dtype=jnp.float32)
    geom = Geometry.from_physical(grid, src, rcv)
    seis = np.asarray(prop(jnp.asarray(vp, jnp.float32), geom, jnp.asarray(w, jnp.float32)))
    scale = np.sqrt(np.mean(seis_oracle**2))
    rms = np.sqrt(np.mean((seis - seis_oracle) ** 2)) / scale
    assert rms < 1e-4, f"fp32 relative RMS {rms:.3e}"


def test_snapshots_match_oracle():
    grid, vp, dt, w, src, rcv, f0 = _setup(4, "homogeneous", nt=150)
    _, snaps_o = oracle_forward(vp, grid, dt, w, src, rcv, f0, snapshot_stride=50)
    prop = AcousticPropagator(grid, dt, f0, c_max=float(vp.max()), dtype=jnp.float64)
    geom = Geometry.from_physical(grid, src, rcv)
    _, snaps = prop.forward_snapshots(jnp.asarray(vp), geom, jnp.asarray(w))
    snaps = np.asarray(snaps)
    for i, so in enumerate(snaps_o):
        s = snaps[50 * (i + 1) - 1]
        rms = np.sqrt(np.mean((s - so) ** 2)) / (np.sqrt(np.mean(so**2)) + 1e-30)
        assert rms < 1e-9, f"snapshot {i}: {rms:.3e}"
