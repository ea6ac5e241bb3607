"""Small-unit coverage: config round-trip/overrides, synthetic models,
filters, preconditioning, wavelets."""

import jax.numpy as jnp
import numpy as np

from tpufwi.config import FwiConfig, StageCfg
from tpufwi.filters import lowpass
from tpufwi.io import marmousi_like, overthrust_like, resample2d
from tpufwi.precondition import gaussian_smooth, precondition
from tpufwi.wavelets import ricker, ricker_np


def test_config_json_roundtrip_and_overrides():
    cfg = FwiConfig()
    cfg2 = FwiConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    cfg3 = cfg.with_overrides(
        ["prop.order=4", "opt.vmax=5000", "acq.n_shots=7", "run_dir=runs/x",
         'stages=[{"fmax": 5.0, "iterations": 3, "method": "nlcg"}]']
    )
    assert cfg3.prop.order == 4 and cfg3.opt.vmax == 5000.0
    assert cfg3.acq.n_shots == 7 and cfg3.run_dir == "runs/x"
    assert cfg3.stages == (StageCfg(5.0, 3, "nlcg"),)


def test_synthetic_models_deterministic_and_sane():
    vp1, dx = marmousi_like(nz=88, nx=200)
    vp2, _ = marmousi_like(nz=88, nx=200)
    assert np.array_equal(vp1, vp2)
    assert vp1.min() >= 1480.0 and vp1.max() <= 4700.0
    assert (vp1[:3] == 1500.0).all()  # water layer
    v3, _ = overthrust_like(nz=40, ny=30, nx=50)
    assert v3.shape == (40, 30, 50) and v3.min() >= 2000.0


def test_resample2d_block_mean():
    m = np.arange(16.0).reshape(4, 4)
    r = resample2d(m, 2)
    assert r.shape == (2, 2)
    assert r[0, 0] == m[:2, :2].mean()


def test_lowpass_kills_high_frequencies():
    dt = 1e-3
    nt = 1024
    t = np.arange(nt) * dt
    x = jnp.asarray(np.sin(2 * np.pi * 5 * t) + np.sin(2 * np.pi * 60 * t))
    y = np.asarray(lowpass(x, dt, fmax=15.0))
    X = np.abs(np.fft.rfft(y))
    f = np.fft.rfftfreq(nt, dt)
    assert X[np.argmin(np.abs(f - 5))] > 100 * X[np.argmin(np.abs(f - 60))]


def test_precondition_chain():
    g = jnp.ones((20, 30))
    illum = jnp.ones((20, 30)) * 2.0
    out = precondition(g, illum=illum, illum_eps=0.0, mask_top=3, smooth_sigma=0.0)
    out = np.asarray(out)
    assert np.allclose(out[3:], 0.5)
    assert np.all(out[:3] == 0.0)
    sm = gaussian_smooth(jnp.zeros((16, 16)).at[8, 8].set(1.0), 1.5)
    assert abs(float(jnp.sum(sm)) - 1.0) < 1e-2  # mass-preserving away from edges


def test_ricker_peak_frequency():
    dt, nt, f0 = 5e-4, 4096, 11.0
    w = np.asarray(ricker(f0, dt, nt, dtype=jnp.float64))
    assert np.allclose(w, ricker_np(f0, dt, nt))
    W = np.abs(np.fft.rfft(w))
    f = np.fft.rfftfreq(nt, dt)
    assert abs(f[np.argmax(W)] - f0) < 0.5


def test_binary_loader_roundtrip(tmp_path):
    """load_float32_bin / resample2d / load_marmousi2(path=...) on the
    committed tiny fixture (VERDICT r1: keep the real-data parse path
    exercised without the 152 MB dataset)."""
    import os

    import numpy as np

    from tpufwi.io import load_float32_bin, load_marmousi2, resample2d

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "vp_50x80_kms.bin")
    raw = load_float32_bin(fix, (50, 80))
    assert raw.shape == (50, 80) and raw.dtype == np.float64
    assert 1.0 < raw.min() < raw.max() < 5.0  # km/s convention in the file

    with np.testing.assert_raises(ValueError):
        load_float32_bin(fix, (51, 80))  # size mismatch must be loud

    down = resample2d(raw, 2)
    assert down.shape == (25, 40)
    np.testing.assert_allclose(down[0, 0], raw[:2, :2].mean(), rtol=1e-12)

    # full loader path: unit conversion (km/s -> m/s) + resampling
    vp, dx = load_marmousi2(path=fix, dx_target=2.5, shape=(50, 80), dx_in=1.25)
    assert vp.shape == (25, 40)
    assert dx == 2.5
    assert 1000.0 < vp.min() < vp.max() < 5000.0  # now m/s


def test_ormsby_wavelet():
    """Trapezoidal spectrum: flat inside (f2, f3), rejected outside
    (f1, f4), unit peak, quiescent start."""
    import numpy as np

    from tpufwi.wavelets import ormsby

    nt, dt = 2000, 1e-3
    w = np.asarray(ormsby(5.0, 10.0, 40.0, 60.0, dt, nt))
    f = np.fft.rfftfreq(nt, dt)
    W = np.abs(np.fft.rfft(w))
    W /= W.max()
    amp = lambda fr: W[np.argmin(np.abs(f - fr))]
    assert amp(25.0) > 0.9 and amp(15.0) > 0.9
    assert amp(2.0) < 0.1 and amp(80.0) < 0.05
    assert abs(w).max() == 1.0 and abs(w[0]) < 0.02
    import pytest

    with pytest.raises(ValueError):
        ormsby(10.0, 5.0, 40.0, 60.0, dt, nt)
