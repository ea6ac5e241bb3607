"""Field-data workflow integration: SEG-Y interchange -> band-pass ->
mute/window weights -> source estimation -> FWI.

One tiny end-to-end rehearsal of the production path for real data: the
"field" gathers are synthetics from an unknown (scaled, delayed) source
plus out-of-band noise, exported to SEG-Y and re-imported (the framework
only ever sees the files), preprocessed with the filters/window
operators, and inverted with a source-estimating stage. Each stage of
the chain is asserted separately so a failure localizes.
"""


import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpufwi import AcousticPropagator, Geometry, Grid, ricker
from tpufwi.filters import bandpass
from tpufwi.invert import FwiProblem
from tpufwi.segy import read_segy, write_segy
from tpufwi.window import combine, offset_mute, shot_offsets, time_window



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

@pytest.fixture(scope="module")
def field_setup():
    from scipy.ndimage import gaussian_filter

    nz, nx, f0 = 40, 60, 11.0
    vp_t = np.full((nz, nx), 2000.0)
    vp_t[18:26, 24:40] = 1820.0
    vp_t = gaussian_filter(vp_t, 1.0)
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=10, order=4)
    dt = grid.cfl_dt(2100.0, safety=0.7)
    nt = int(0.62 / dt)
    w_true = 1.6 * ricker(f0, dt, nt, t0=1.5 / f0 + 0.012, dtype=jnp.float64)
    w_base = ricker(f0, dt, nt, dtype=jnp.float64)
    prop = AcousticPropagator(grid, dt, f0, 2100.0, dtype=jnp.float64)

    n_shots = 3
    sx = np.linspace(8, nx - 8, n_shots).astype(int)
    rx = np.arange(4, nx - 4, 2)
    rcv = np.stack([np.full_like(rx, 2), rx], 1)
    geoms = jax.tree.map(
        lambda *a: jnp.stack(a),
        *[Geometry.from_physical(grid, np.array([[2, s]]), rcv) for s in sx],
    )
    vpj = jnp.asarray(vp_t)
    clean = jnp.stack([
        prop(vpj, jax.tree.map(lambda x: x[i], geoms), w_true)
        for i in range(n_shots)
    ])
    # out-of-band "field" noise: white noise high-passed above 3.2*f0
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(clean.shape)
    spec = np.fft.rfft(noise, axis=1)
    f = np.fft.rfftfreq(nt, dt)
    spec[:, f < 3.2 * f0, :] = 0.0
    noise = np.fft.irfft(spec, n=nt, axis=1)
    noise *= 0.3 * float(jnp.abs(clean).max()) / np.abs(noise).max()
    return dict(grid=grid, dt=dt, nt=nt, f0=f0, prop=prop, geoms=geoms,
                vp_t=vp_t, w_true=w_true, w_base=w_base, sx=sx, rx=rx,
                d_field=np.asarray(clean) + noise)


def test_field_pipeline_end_to_end(field_setup, tmp_path):
    s = field_setup
    dt, nt, f0 = s["dt"], s["nt"], s["f0"]
    n_shots, _, nrec = s["d_field"].shape

    # -- 1. SEG-Y round trip: one file, ffid = shot index ------------------
    path = os.path.join(tmp_path, "field.sgy")
    flat = s["d_field"].transpose(0, 2, 1).reshape(n_shots * nrec, nt)
    ffid = np.repeat(np.arange(1, n_shots + 1), nrec)
    sx_m = np.repeat(s["sx"] * 10.0, nrec)
    gx_m = np.tile(s["rx"] * 10.0, n_shots)
    write_segy(path, flat.astype(np.float32), dt, ffid=ffid, sx=sx_m, gx=gx_m)
    sgy = read_segy(path)
    assert abs(sgy.dt - dt) <= 0.5e-6  # rev-1 stores integer microseconds
    np.testing.assert_allclose(sgy.data, flat, rtol=0, atol=1e-6 * np.abs(flat).max())
    d_obs = np.stack([
        sgy.data[sgy.ffid == i + 1] for i in range(n_shots)
    ]).transpose(0, 2, 1)

    # -- 2. band-pass kills the out-of-band noise --------------------------
    d_bp = np.asarray(bandpass(jnp.asarray(d_obs), dt, 0.25 * f0, 2.2 * f0, axis=1))
    clean = np.asarray(jnp.stack([
        s["prop"](jnp.asarray(s["vp_t"]), jax.tree.map(lambda x: x[i], s["geoms"]),
                  s["w_true"]) for i in range(n_shots)
    ]))
    err_raw = np.linalg.norm(d_obs - clean) / np.linalg.norm(clean)
    err_bp = np.linalg.norm(d_bp - bandpass(jnp.asarray(clean), dt, 0.25 * f0,
                                            2.2 * f0, axis=1)) / np.linalg.norm(clean)
    assert err_bp < 0.15 * err_raw, (err_raw, err_bp)

    # -- 3. window/mute weights (per shot: offsets differ) -----------------
    wts = np.stack([
        np.asarray(combine(
            time_window(nt, dt, 0.0, 0.55, taper=0.03),
            offset_mute(nt, dt, np.asarray(
                shot_offsets(jax.tree.map(lambda x: x[i], s["geoms"]), h=10.0)),
                v_mute=4000.0, t_off=0.3, taper=0.05, mode="above"),
        )) for i in range(n_shots)
    ])
    assert wts.shape == (n_shots, nt, nrec) and 0.0 < wts.mean() < 1.0

    # -- 4. source estimation + FWI on the preprocessed data ---------------
    pb = FwiProblem(prop=s["prop"], geoms=s["geoms"], d_obs=jnp.asarray(d_bp),
                    wavelet=s["w_base"], dt=dt,
                    trace_weights=jnp.asarray(wts))
    fmax = 2.2 * f0  # stage band == preprocessing band
    from scipy.ndimage import gaussian_filter
    vp0 = jnp.asarray(gaussian_filter(s["vp_t"], 8.0))

    w_est = pb.stage_wavelet(vp0, fmax)
    # the Wiener fit sees the scale and the delay of the true source
    # (estimated on the smooth model: amplitude within ~20%)
    scale = float(jnp.linalg.norm(w_est) / jnp.linalg.norm(s["w_base"]))
    assert 1.2 < scale < 2.0, scale
    lag = np.argmax(np.correlate(np.asarray(w_est), np.asarray(s["w_base"]),
                                 "full")) - (nt - 1)
    assert abs(lag * dt - 0.012) < 0.006, lag * dt

    vg, loss = pb.stage_objectives(fmax, wavelet=w_est)
    J0 = float(loss(vp0))
    # base wavelet leaves a much larger misfit than the estimated source
    _, loss_base = pb.stage_objectives(fmax)
    assert J0 < 0.5 * float(loss_base(vp0))

    from tpufwi.optimize import minimize
    vp1, infos = minimize(vg, vp0, 6, bounds=(1700.0, 2300.0),
                          loss_only=loss)
    J1 = float(loss(vp1))
    # the in-band fraction of the noise is an irreducible J floor (~2/3
    # of J0 here) — assert real progress toward it, not noise-free decay
    assert J1 < 0.8 * J0, (J0, J1)
    # the update moves toward the true slow lens
    upd = np.asarray(vp1 - vp0)
    anom = s["vp_t"] - gaussian_filter(s["vp_t"], 8.0)
    corr = float(np.vdot(upd, anom) / (np.linalg.norm(upd) * np.linalg.norm(anom)))
    assert corr > 0.3, corr
