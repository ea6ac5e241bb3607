"""Born operator + LSRTM (lsrtm.py): operator-level adjoint dot-product
test (forward-mode Born vs the boundary-saving transpose), Born linearity
sanity, and CGLS convergence on a point scatterer."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import AcousticPropagator, Grid
from tpufwi.acquisition import split_spread_survey
from tpufwi.invert import FwiProblem
from tpufwi.lsrtm import born_operators, gauss_newton, lsrtm
from tpufwi.wavelets import ricker



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def _problem(vp_true, grid, f0=12.0, n_shots=3):
    dt = grid.cfl_dt(float(vp_true.max()) * 1.1, safety=0.7)
    nt = int(0.9 / dt)
    w = ricker(f0, dt, nt, dtype=jnp.float32)
    prop = AcousticPropagator(grid, dt, f0, float(vp_true.max()) * 1.1,
                              dtype=jnp.float32, impl="jnp")
    geoms = split_spread_survey(grid, n_shots, src_z=2, rcv_z=2, rcv_dx=2)
    vp_t = jnp.asarray(vp_true, jnp.float32)
    d_obs = jnp.stack([
        prop(vp_t, jax.tree.map(lambda x: x[i], geoms), w)
        for i in range(n_shots)
    ])
    return FwiProblem(prop=prop, geoms=geoms, d_obs=d_obs, wavelet=w, dt=dt)


def test_born_adjoint_dot_product():
    """<F dm, dd> == <dm, Ft dd>: forward-mode Born against the
    boundary-saving transpose (the V2 dot-product property at the
    linearized-operator level)."""
    nz, nx = 48, 64
    vp = np.full((nz, nx), 2000.0, np.float32)
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    problem = _problem(vp, grid, n_shots=2)
    F, Ft, _ = born_operators(problem, jnp.asarray(vp))
    rng = np.random.default_rng(0)
    # dm restricted to the valid interior (margin radius+1): the region
    # where the boundary-saving gradient is the exact transpose
    m = grid.radius + 1
    mask = np.zeros((nz, nx), np.float32)
    mask[m:-m, m:-m] = 1.0
    dm = jnp.asarray(rng.standard_normal((nz, nx)).astype(np.float32) * mask)
    Fdm = F(dm)
    dd = jnp.asarray(rng.standard_normal(Fdm.shape), jnp.float32)
    lhs = float(jnp.vdot(Fdm, dd))
    rhs = float(jnp.vdot(dm, Ft(dd) * mask))
    rel = abs(lhs - rhs) / max(abs(lhs), abs(rhs))
    assert rel < 1e-4, f"Born dot-product rel {rel:.3e}"


def test_born_linearity_and_residual():
    """F is linear (fp32 tolerance) and d_lin vanishes when the data were
    made in the migration model itself."""
    nz, nx = 48, 64
    vp = np.full((nz, nx), 2000.0, np.float32)
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    problem = _problem(vp, grid, n_shots=2)
    F, _, d_lin = born_operators(problem, jnp.asarray(vp))
    assert float(jnp.abs(d_lin).max()) < 1e-6 * float(
        jnp.abs(problem.d_obs).max()
    )
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((nz, nx)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nz, nx)), jnp.float32)
    lin = F(2.0 * a - 3.0 * b)
    ref = 2.0 * F(a) - 3.0 * F(b)
    err = float(jnp.abs(lin - ref).max() / (jnp.abs(ref).max() + 1e-30))
    assert err < 1e-4, f"Born linearity {err:.3e}"


def test_lsrtm_converges_and_focuses():
    nz, nx, z0, x0 = 56, 80, 32, 40
    vp = np.full((nz, nx), 2000.0, np.float32)
    vp[z0 - 1 : z0 + 2, x0 - 1 : x0 + 2] = 2200.0
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    problem = _problem(vp, grid, n_shots=3)
    dm, norms = lsrtm(problem, jnp.full((nz, nx), 2000.0, jnp.float32),
                      n_iter=5)
    assert norms[-1] < 0.5 * norms[0], norms
    img = np.abs(np.asarray(dm))
    img[:10] = 0.0  # source/receiver imprint rows
    zpk, xpk = np.unravel_index(np.argmax(img), img.shape)
    assert abs(zpk - z0) <= 4 and abs(xpk - x0) <= 4, (zpk, xpk)
    # the recovered perturbation has the right sign (vp increase)
    assert float(np.asarray(dm)[zpk, xpk]) > 0


def test_gauss_newton_converges():
    """Truncated Gauss-Newton on a smooth lens: the objective drops >3x
    in 4 outer iterations at near-UNIT steps (the GN update is in model
    units — no problem-dependent step scaling), and the recovered
    perturbation peaks at the lens with the right sign. Full amplitude
    recovery is not expected from 3 surface shots (transmission-only
    illumination)."""
    nz, nx = 50, 80
    vp = np.full((nz, nx), 2000.0, np.float32)
    zz, xx = np.mgrid[0:nz, 0:nx]
    vp += 120.0 * np.exp(-(((zz - 28.0) / 8) ** 2 + ((xx - 40.0) / 12) ** 2))
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    problem = _problem(vp.astype(np.float32), grid, n_shots=3)
    alphas = []
    vp1, Js = gauss_newton(
        problem, jnp.full((nz, nx), 2000.0, jnp.float32), outer=4, n_cg=4,
        bounds=(1800.0, 2300.0),
        log_fn=lambda rec: alphas.append(rec["alpha"]),
    )
    assert Js[-1] < Js[0] / 3.0, Js
    assert all(j1 < j0 for j0, j1 in zip(Js, Js[1:])), Js
    assert any(a > 0.5 for a in alphas), alphas  # near-unit GN steps
    dtrue = vp - 2000.0
    drec = np.asarray(vp1) - 2000.0
    corr = float(
        np.vdot(dtrue, drec)
        / (np.linalg.norm(dtrue) * np.linalg.norm(drec) + 1e-30)
    )
    assert corr > 0.25, corr
    sub = np.abs(drec[8:, :])  # skip the source-imprint rows
    zpk, xpk = np.unravel_index(np.argmax(sub), sub.shape)
    assert abs(zpk + 8 - 28) <= 4 and abs(xpk - 40) <= 4, (zpk + 8, xpk)
    assert drec[zpk + 8, xpk] > 0
