"""Misfit-layer data operators (window.py) and source estimation
(source_estimation.py): mask construction, weighted objectives through the
driver, and Wiener wavelet recovery on a tiny model."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tpufwi import window
from tpufwi.config import FwiConfig, StageCfg, PropCfg, AcqCfg, PrecondCfg, OptCfg
from tpufwi.invert import build_synthetic_problem
from tpufwi.source_estimation import apply_filter, estimate_wavelet, source_filter


def _cfg(tmp_path, n_shots=2):
    return FwiConfig(
        stages=(StageCfg(8.0, 2),),
        prop=PropCfg(order=4, pml=10, cfl_safety=0.7, dtype="float64"),
        acq=AcqCfg(n_shots=n_shots, src_z=2, rcv_z=2, rcv_dx=2, f0=11.0, t_max=0.6),
        precond=PrecondCfg(use_illumination=False),
        opt=OptCfg(vmin=1600.0, vmax=2600.0),
        run_dir=str(tmp_path / "run"),
    )


def _tiny_model(nz=40, nx=64):
    vp = np.full((nz, nx), 2000.0)
    vp[20:28, 24:40] = 1800.0
    return vp


# ---------------------------------------------------------------- masks


def test_time_window_boxcar_and_taper():
    nt, dt = 100, 0.01
    m = window.time_window(nt, dt, t0=0.2, t1=0.6)
    assert m.shape == (nt, 1)
    t = np.arange(nt) * dt
    np.testing.assert_array_equal(
        np.asarray(m[:, 0]), ((t >= 0.2) & (t <= 0.6)).astype(np.float32)
    )
    mt = np.asarray(window.time_window(nt, dt, 0.2, 0.6, taper=0.1)[:, 0])
    assert mt.min() >= 0.0 and mt.max() <= 1.0
    assert abs(mt[t.searchsorted(0.4)] - 1.0) < 1e-6  # mid passband
    assert mt[0] == 0.0
    # taper is monotone on the ramp
    ramp = mt[(t > 0.1) & (t < 0.21)]
    assert np.all(np.diff(ramp) >= -1e-7)


def test_offset_mute_modes():
    nt, dt = 120, 0.005
    offsets = np.array([0.0, 300.0, 600.0, -900.0])
    v = 1500.0
    below = np.asarray(window.offset_mute(nt, dt, offsets, v, mode="below"))
    above = np.asarray(window.offset_mute(nt, dt, offsets, v, mode="above"))
    assert below.shape == (nt, 4)
    t = np.arange(nt) * dt
    for j, off in enumerate(offsets):
        tc = abs(off) / v
        np.testing.assert_array_equal(below[:, j], (t >= tc).astype(np.float32))
    # complementary up to the boundary sample
    assert np.all(below + above >= 1.0 - 1e-6)
    # tapered version is bounded and hits 0.5 at the cut line
    tap = np.asarray(window.offset_mute(nt, dt, offsets, v, taper=0.05))
    j = 2
    icut = int(round((600.0 / v) / dt))
    assert abs(tap[icut, j] - 0.5) < 0.06


def test_combine_and_offset_range():
    nt, dt = 50, 0.01
    tw = window.time_window(nt, dt, 0.1, 0.4)
    om = window.offset_range_mask(np.array([10.0, 500.0, 2000.0]), 100.0, 1000.0)
    m = window.combine(tw, om, None)
    assert m.shape == (nt, 3)
    assert float(m[:, 0].max()) == 0.0 and float(m[:, 2].max()) == 0.0
    assert float(m[20, 1]) == 1.0


# ------------------------------------------- weighted objectives (driver)


def test_trace_weights_in_problem(tmp_path):
    cfg = _cfg(tmp_path)
    problem, vp0 = build_synthetic_problem(cfg, _tiny_model(), dx=10.0)
    nshot, nt, nrec = problem.d_obs.shape

    # all-ones weights == unweighted
    ones2 = jnp.ones((nt, nrec), problem.d_obs.dtype)
    p_w = dataclasses.replace(problem, trace_weights=ones2)
    vg0, loss0 = problem.stage_objectives(8.0)
    vg1, loss1 = p_w.stage_objectives(8.0)
    J0, g0 = vg0(vp0)
    J1, g1 = vg1(vp0)
    assert np.allclose(float(J0), float(J1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-10)

    # a half-time window strictly reduces the misfit contribution
    half = np.zeros((nt, nrec))
    half[: nt // 2] = 1.0
    p_h = dataclasses.replace(
        problem, trace_weights=jnp.asarray(half, problem.d_obs.dtype)
    )
    _, lossh = p_h.stage_objectives(8.0)
    Jh = float(lossh(vp0))
    assert 0.0 < Jh < float(J0)

    # per-shot 3D weights that replicate the 2D mask agree exactly,
    # on both the lax.map and python shot-loop paths
    w3 = jnp.broadcast_to(
        jnp.asarray(half, problem.d_obs.dtype), (nshot, nt, nrec)
    )
    p_3 = dataclasses.replace(problem, trace_weights=w3)
    vg3, loss3 = p_3.stage_objectives(8.0)
    assert np.allclose(float(loss3(vp0)), Jh, rtol=1e-12)
    p_3py = dataclasses.replace(problem, trace_weights=w3, shot_loop="python")
    vg3p, loss3p = p_3py.stage_objectives(8.0)
    assert np.allclose(float(loss3p(vp0)), Jh, rtol=1e-12)
    gh = vg3(vp0)[1]
    ghp = vg3p(vp0)[1]
    np.testing.assert_allclose(np.asarray(gh), np.asarray(ghp), rtol=1e-9)


def test_canonical_nt_padding(tmp_path):
    """with_canonical_nt: the padded problem's full-band J and gradient
    match the unpadded problem (padded steps are masked out of the
    objective), and band-limited stages agree to filter-edge level."""
    import pytest

    assert window.canonical_nt(648) == 768
    assert window.canonical_nt(768) == 768
    assert window.canonical_nt(1, multiple=100) == 100
    with pytest.raises(ValueError):
        window.canonical_nt(100, multiple=0)
    with pytest.raises(ValueError):
        window.pad_time(jnp.zeros(10), 5)

    cfg = _cfg(tmp_path)
    problem, vp0 = build_synthetic_problem(cfg, _tiny_model(), dx=10.0)
    nt = int(problem.wavelet.shape[0])
    pbp = problem.with_canonical_nt(128)
    ntp = int(pbp.wavelet.shape[0])
    assert ntp % 128 == 0 and ntp >= nt
    assert pbp.d_obs.shape[1] == ntp
    assert pbp.with_canonical_nt(128) is pbp  # already canonical: no-op

    # full band: identical physics in the first nt steps + masked tail
    vg0, _ = problem.stage_objectives(None)
    vg1, _ = pbp.stage_objectives(None)
    J0, g0 = vg0(vp0)
    J1, g1 = vg1(vp0)
    np.testing.assert_allclose(float(J1), float(J0), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-8,
                               atol=1e-12 * float(np.abs(g0).max()))

    # band-limited stage: the in-misfit response is built at the padded
    # nt — agreement is at the filter level, not bitwise
    vg0f, _ = problem.stage_objectives(8.0)
    vg1f, _ = pbp.stage_objectives(8.0)
    J0f, g0f = vg0f(vp0)
    J1f, g1f = vg1f(vp0)
    assert abs(float(J1f) - float(J0f)) < 0.02 * abs(float(J0f))
    cos = float(
        jnp.vdot(g0f, g1f)
        / (jnp.linalg.norm(g0f.ravel()) * jnp.linalg.norm(g1f.ravel()))
    )
    assert cos > 0.999

    # composes with existing 2D weights (pads them with zeros)
    half = np.zeros((nt, problem.d_obs.shape[2]))
    half[: nt // 2] = 1.0
    p_h = dataclasses.replace(
        problem, trace_weights=jnp.asarray(half, problem.d_obs.dtype)
    )
    p_hp = p_h.with_canonical_nt(128)
    assert p_hp.trace_weights.shape == (ntp, problem.d_obs.shape[2])
    _, lh0 = p_h.stage_objectives(None)
    _, lh1 = p_hp.stage_objectives(None)
    np.testing.assert_allclose(float(lh1(vp0)), float(lh0(vp0)), rtol=1e-10)


# ------------------------------------------------------ source estimation


def test_source_filter_recovers_scaling_and_delay(tmp_path):
    """Observed data made with a scaled+delayed wavelet; the Wiener filter
    from synthetics computed with the plain wavelet must recover it."""
    cfg = _cfg(tmp_path)
    problem, vp0 = build_synthetic_problem(cfg, _tiny_model(), dx=10.0)
    w = problem.wavelet
    nt = w.shape[0]
    # true source: 1.7x amplitude, 8-sample delay
    w_true = 1.7 * jnp.roll(w, 8).at[:8].set(0.0)
    d_true = problem.forward_all(jnp.asarray(_tiny_model(), w.dtype), w_true)
    seis = problem.forward_all(jnp.asarray(_tiny_model(), w.dtype), w)

    F = source_filter(seis, d_true, eps_rel=1e-8)
    w_est = apply_filter(w, F)
    # in-band recovery: compare where the ricker has energy
    W = np.abs(np.asarray(jnp.fft.rfft(w)))
    band = W > 0.1 * W.max()
    We = np.asarray(jnp.fft.rfft(w_est))
    Wt = np.asarray(jnp.fft.rfft(w_true))
    rel = np.abs(We[band] - Wt[band]) / np.abs(Wt[band])
    assert rel.max() < 1e-3, f"in-band source spectrum off by {rel.max():.2e}"

    # and the corrected synthetics nearly annihilate the residual
    seis_corr = problem.forward_all(jnp.asarray(_tiny_model(), w.dtype), w_est)
    r0 = float(jnp.sum((seis - d_true) ** 2))
    r1 = float(jnp.sum((seis_corr - d_true) ** 2))
    assert r1 < 1e-6 * r0


def test_estimate_wavelet_identity_when_matched(tmp_path):
    """If the data were made with the current wavelet, estimation is a
    (near-)identity — no spurious correction on a matched source."""
    cfg = _cfg(tmp_path)
    problem, vp0 = build_synthetic_problem(cfg, _tiny_model(), dx=10.0)
    vpt = jnp.asarray(_tiny_model(), problem.wavelet.dtype)
    seis = problem.forward_all(vpt, problem.wavelet)
    w_est = estimate_wavelet(seis, seis, problem.wavelet, eps_rel=1e-8)
    num = float(jnp.linalg.norm(w_est - problem.wavelet))
    den = float(jnp.linalg.norm(problem.wavelet))
    # exact identity only in-band: the eps water level shrinks spectral
    # components where the data has no energy (measured 3.8e-5 here)
    assert num / den < 1e-4


def test_stage_wavelet_reduces_misfit(tmp_path):
    """Driver integration (StageCfg.source_est): stage_wavelet() on the
    TRUE model with mismatched-source data must slash the stage misfit."""
    cfg = _cfg(tmp_path)
    problem, vp0 = build_synthetic_problem(cfg, _tiny_model(), dx=10.0)
    vpt = jnp.asarray(_tiny_model(), problem.wavelet.dtype)
    w_true = 1.5 * problem.wavelet
    problem.d_obs = problem.forward_all(vpt, w_true)

    fmax = cfg.stages[0].fmax
    _, loss_plain = problem.stage_objectives(fmax)
    # noiseless synthetic: tiny water level (the 1e-4 default trades
    # exactness for noise robustness and leaves ~10% residual here)
    w_est = problem.stage_wavelet(vpt, fmax, eps_rel=1e-9)
    _, loss_est = problem.stage_objectives(fmax, wavelet=w_est)
    J_plain = float(loss_plain(vpt))
    J_est = float(loss_est(vpt))
    assert J_est < 1e-4 * J_plain, f"{J_est:.3e} vs {J_plain:.3e}"
