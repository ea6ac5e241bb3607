"""Fused 3D step v2 (kernels/acoustic3d_fused2.py: corr-slab face kernels
+ merged leapfrog/x-face/apply kernel) == the proven XLA-strip step."""

import pytest
import numpy as np
import jax.numpy as jnp

from tpufwi import Grid
from tpufwi.kernels.acoustic3d_pallas import (
    crop_y,
    crop_yz,
    extend_y,
    extend_yz,
    make_acoustic3d_strip_step,
)
from tpufwi.kernels.acoustic3d_fused2 import make_acoustic3d_fused_step2


def _run_pair(grid, by, bz, nsteps=30, x_face=None):
    c_max, f0 = 3000.0, 10.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    rng = np.random.default_rng(1)
    NY, NZ, NX = grid.padded_shape
    vp = 2500.0 + 200 * rng.standard_normal((NY, NZ, NX)).astype(np.float32)
    c2 = jnp.asarray(((vp * dt) ** 2).astype(np.float32))

    step_a, zs_a = make_acoustic3d_strip_step(grid, dt, f0, c_max, by=8,
                                              interpret=True)
    step_b, zs_b = make_acoustic3d_fused_step2(
        grid, dt, f0, c_max, by=by, bz=bz, bz_y=bz, interpret=True,
        x_face=x_face or "mxu",
    )
    c2a = extend_y(c2, grid, 8)
    c2b = extend_yz(c2, grid, by=by, bz=bz)
    imp = jnp.zeros(grid.padded_shape, jnp.float32).at[
        NY // 2, NZ // 2, NX // 2
    ].set(1.0)
    sa = zs_a()
    sb = zs_b()
    sa = (sa[0], extend_y(imp, grid, 8), sa[2])
    sb = (sb[0], extend_yz(imp, grid, by=by, bz=bz), sb[2])
    for _ in range(nsteps):
        sa = step_a(sa, c2a)
        sb = step_b(sb, c2b)
    pa = np.asarray(crop_y(sa[1], grid))
    pb = np.asarray(crop_yz(sb[1], grid))
    return pa, pb


def test_fused2_matches_xla_strip_step():
    """Straddle-heavy configuration: the z-hi window crosses a z-block
    boundary and the y faces span multiple y-blocks."""
    grid = Grid(shape=(24, 30, 40), h=(10.0, 10.0, 10.0), pml=8, order=8)
    pa, pb = _run_pair(grid, by=8, bz=16)
    err = np.abs(pa - pb).max() / np.abs(pa).max()
    assert err < 1e-6, f"fused2 vs XLA-strip 3D step: {err:.3e}"


def test_fused2_matches_xla_strip_step_by16():
    """Production-like block sizes relative to the strip width (BY=16,
    single-block y-face windows; bz covering the whole z face)."""
    grid = Grid(shape=(24, 30, 40), h=(10.0, 10.0, 10.0), pml=8, order=8)
    pa, pb = _run_pair(grid, by=16, bz=32)
    err = np.abs(pa - pb).max() / np.abs(pa).max()
    assert err < 1e-6, f"fused2 vs XLA-strip 3D step: {err:.3e}"


def test_fused2_vpu_x_face_matches_xla_strip_step():
    """x_face="vpu" (shift-sum lane algebra instead of banded MXU
    products) is numerically the same step: the shift-sums ARE the band
    matrices' rows, zero-extension encoded by the scratch margins."""
    grid = Grid(shape=(24, 30, 40), h=(10.0, 10.0, 10.0), pml=8, order=8)
    pa, pb = _run_pair(grid, by=8, bz=16, x_face="vpu")
    err = np.abs(pa - pb).max() / np.abs(pa).max()
    assert err < 1e-6, f"fused2(vpu x-face) vs XLA-strip 3D step: {err:.3e}"


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_fused2_fold_yz_matches_xla_strip_step():
    """fold_y + fold_z: all six CPML faces computed inside the merged
    kernel (manual-DMA staged face state, S=16 so the 8-tile DMA
    alignment holds). can_fold_y/can_fold_z must both hold on this grid
    so the auto default exercises the folded path."""
    from tpufwi.kernels.acoustic3d_fused2 import can_fold_y, can_fold_z

    grid = Grid(shape=(24, 30, 40), h=(10.0, 10.0, 10.0), pml=12, order=8)
    assert can_fold_z(grid, 32) and can_fold_y(grid, 16)
    pa, pb = _run_pair(grid, by=16, bz=32)
    err = np.abs(pa - pb).max() / np.abs(pa).max()
    assert err < 1e-6, f"fused2(fold_yz) vs XLA-strip 3D step: {err:.3e}"


def test_fused2_matches_xla_strip_step_by24():
    """The by=24 throughput candidate (ROADMAP item 5: y-halo read tax
    1.0 -> 0.67 fields/cell): y faces not a multiple of the block, window
    spans misaligned with BY."""
    grid = Grid(shape=(28, 30, 40), h=(10.0, 10.0, 10.0), pml=8, order=8)
    pa, pb = _run_pair(grid, by=24, bz=32)
    err = np.abs(pa - pb).max() / np.abs(pa).max()
    assert err < 1e-6, f"fused2 vs XLA-strip 3D step: {err:.3e}"
