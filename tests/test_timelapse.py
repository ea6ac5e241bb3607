"""Time-lapse (4D) double-difference FWI (tpufwi/timelapse.py): the
effective-data algebra is exact, and on a synthetic depletion patch the
double-difference monitor inversion localizes the 4D change better than
the parallel (independent) monitor inversion from the same baseline."""

import pytest

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpufwi import double_difference_problem
from tpufwi.config import AcqCfg, FwiConfig, OptCfg, PrecondCfg, PropCfg, StageCfg
from tpufwi.invert import build_synthetic_problem, invert

PATCH = (slice(24, 31), slice(42, 58))



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def _models(nz=50, nx=80):
    from scipy.ndimage import gaussian_filter

    vp = np.full((nz, nx), 2000.0)
    vp[20:, :] = 2200.0
    vp[35:, :] = 2400.0
    vp_base = gaussian_filter(vp, 1.0)
    vp_mon = vp_base.copy()
    vp_mon[PATCH] += 120.0  # the 4D change (e.g. pressure-up / gas out)
    # the "inverted baseline": imperfect (smoothed) version of the truth
    m_base = gaussian_filter(vp_base, 3.0)
    return vp_base, vp_mon, m_base


def _cfg(tmp_path, name):
    return FwiConfig(
        stages=(StageCfg(9.0, 8),),
        prop=PropCfg(order=4, pml=10, cfl_safety=0.7, dtype="float64"),
        acq=AcqCfg(n_shots=4, src_z=2, rcv_z=2, rcv_dx=2, f0=11.0, t_max=0.75),
        precond=PrecondCfg(use_illumination=True, mask_top=2, smooth_sigma=0.8),
        opt=OptCfg(vmin=1600.0, vmax=2800.0),
        run_dir=str(tmp_path / name),
        checkpoint_every=0,
    )


def test_double_difference_localizes_change(tmp_path):
    vp_base_true, vp_mon_true, m_base = _models()
    cfg = _cfg(tmp_path, "dd")
    problem, _ = build_synthetic_problem(cfg, vp_base_true, dx=10.0)
    mb = jnp.asarray(m_base, jnp.float64)
    d_mon = problem.forward_all(jnp.asarray(vp_mon_true, jnp.float64),
                                problem.wavelet)

    dd = double_difference_problem(problem, mb, d_mon)

    # exactness: at m_base the dd misfit IS the observed 4D difference
    _, loss_dd = dd.stage_objectives(None)
    J_at_base = float(loss_dd(mb))
    J_expect = 0.5 * float(jnp.sum((d_mon - problem.d_obs) ** 2))
    assert abs(J_at_base - J_expect) < 1e-9 * J_expect

    vp_dd = np.asarray(invert(dd, mb, cfg))

    plain = dataclasses.replace(problem, d_obs=d_mon)
    vp_pl = np.asarray(invert(plain, mb, _cfg(tmp_path, "plain")))

    def change_quality(rec):
        ch = rec - m_base
        e_in = float(np.sum(ch[PATCH] ** 2))
        e_tot = float(np.sum(ch**2))
        mean_in = float(ch[PATCH].mean())
        return e_in / e_tot, mean_in

    frac_dd, mean_dd = change_quality(vp_dd)
    frac_pl, mean_pl = change_quality(vp_pl)
    # the dd update concentrates on the true change; the parallel
    # inversion spends most of its update re-fixing baseline model error
    assert mean_dd > 30.0, f"dd recovered patch mean {mean_dd:.1f} m/s"
    assert frac_dd > 2.0 * frac_pl, (frac_dd, frac_pl)
