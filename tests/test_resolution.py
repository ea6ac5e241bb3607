"""Resolution analysis (resolution.py): PSF via the Born pair, exact
Hessian-diagonal points, and the Hutchinson probe estimator."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import AcousticPropagator, Grid, ricker
from tpufwi.acquisition import split_spread_survey
from tpufwi.invert import FwiProblem
from tpufwi.lsrtm import born_operators
from tpufwi.resolution import (
    hessian_diag_points,
    hessian_diag_probe,
    psf,
)



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def _problem():
    nz, nx, f0, nt = 40, 60, 12.0, 240
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    vp0 = jnp.full((nz, nx), 2000.0, jnp.float32)
    dt = grid.cfl_dt(2100.0, safety=0.6)
    w = ricker(f0, dt, nt)
    geoms = split_spread_survey(grid, 3, src_z=2, rcv_z=2, rcv_dx=2)
    prop = AcousticPropagator(grid, dt, f0=f0, c_max=2100.0)
    d = jnp.stack([
        prop(vp0, jax.tree.map(lambda x: x[i], geoms), w) for i in range(3)
    ])
    return FwiProblem(prop=prop, geoms=geoms, d_obs=d, wavelet=w, dt=dt), vp0


def test_psf_peak_and_diag_identity():
    """The PSF of a unit point scatterer peaks AT the scatterer, and its
    value there equals the exact diagonal ||F e_j||^2 (H e_j evaluated
    at j) — a strong internal-exactness identity tying psf() and
    hessian_diag_points() together."""
    pb, vp0 = _problem()
    pt = (20, 30)
    img = np.asarray(psf(pb, vp0, [pt]))
    peak = np.unravel_index(np.argmax(np.abs(img)), img.shape)
    assert tuple(peak) == pt, peak
    dg = hessian_diag_points(pb, vp0, [pt])
    rel = abs(img[pt] - dg[0]) / dg[0]
    assert rel < 1e-4, (img[pt], dg[0])


def test_diag_illumination_decay():
    """Exact diag entries are positive and decay with depth / toward the
    poorly illuminated corners — the quantity the illumination
    preconditioner approximates."""
    pb, vp0 = _problem()
    shallow, mid, deep_corner = (10, 30), (20, 30), (32, 52)
    dg = hessian_diag_points(pb, vp0, [shallow, mid, deep_corner])
    assert (dg > 0).all(), dg
    assert dg[0] > dg[1] > dg[2], dg


def test_hutchinson_probe_identities():
    """One Rademacher probe: sum_j z_j (H z)_j == ||F z||^2 (requires Ft
    to be F's exact transpose through the estimator path); and a
    16-probe field has a positive interior mean (the trace estimator's
    variance is far below the single-entry variance)."""
    pb, vp0 = _problem()
    grid = pb.prop.grid
    est1 = hessian_diag_probe(pb, vp0, n_probes=1, seed=7)
    # rebuild the same probe (same rng recipe as the implementation)
    rng = np.random.default_rng(7)
    mask = np.zeros(grid.shape, bool)
    m = grid.radius + 1
    mask[m:-m, m:-m] = True
    z = rng.choice(np.asarray([-1.0, 1.0], np.float32),
                   size=grid.shape) * mask
    F, _, _ = born_operators(pb, vp0)
    fz = F(jnp.asarray(z))
    lhs = float(jnp.sum(est1))
    rhs = float(jnp.vdot(fz, fz).real)
    assert abs(lhs - rhs) / rhs < 1e-3, (lhs, rhs)

    est = np.asarray(hessian_diag_probe(pb, vp0, n_probes=16, seed=0))
    assert est[mask].mean() > 0
