"""3D elastic velocity-stress engine (kernels/elastic3d_jnp.py):
oracle parity, P/S arrival kinematics, and AD gradients through the
checkpointed scan. Tiny grids — the 27-field state is the
correctness/differentiability tier (docstring)."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufwi import Geometry, Grid
from tpufwi.kernels.oracle_numpy import oracle_elastic_3d
from tpufwi.propagators.elastic3d import Elastic3dPropagator, elastic_cfl_dt
from tpufwi.wavelets import ricker_np



pytestmark = pytest.mark.slow  # demo-grade: excluded from the core lane

def _setup(ny=18, nz=20, nx=22, pml=6, order=4, nt=70, f0=14.0):
    rng = np.random.default_rng(0)
    vp = 2200.0 + 150.0 * rng.random((ny, nz, nx))
    vs = vp / 1.8
    rho = 1000.0 + 0.3 * vp
    grid = Grid(shape=(ny, nz, nx), h=(10.0, 10.0, 10.0), pml=pml,
                order=order)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), order, safety=0.6)
    w = ricker_np(f0, dt, nt)
    src = np.array([[ny // 2, nz // 2, nx // 3]])
    rcv = np.array([[y, nz // 2 + 2, x]
                    for y in range(4, ny - 4, 4)
                    for x in range(4, nx - 4, 5)])
    geom = Geometry.from_physical(grid, src, rcv)
    return grid, vp, vs, rho, dt, w, geom, f0


@pytest.mark.parametrize("source_type,record",
                         [("pressure", "v"), ("force_z", "p")])
def test_forward_matches_oracle(source_type, record):
    grid, vp, vs, rho, dt, w, geom, f0 = _setup()
    seis_o = oracle_elastic_3d(
        vp, vs, rho, grid, dt, w,
        geom.src_idx - grid.pad, geom.rcv_idx - grid.pad, f0,
        source_type=source_type, record_fields=record,
    )
    prop = Elastic3dPropagator(grid, dt, f0, float(vp.max()),
                               dtype=jnp.float64, source_type=source_type,
                               record=record)
    seis = np.asarray(prop(jnp.asarray(vp), jnp.asarray(vs),
                           jnp.asarray(rho), geom, jnp.asarray(w)))
    rms = np.sqrt(np.mean((seis - seis_o) ** 2)) / np.sqrt(np.mean(seis_o**2))
    assert rms < 1e-9, f"elastic3d vs oracle RMS {rms:.3e}"


def test_p_and_s_arrivals():
    """Homogeneous medium kinematics at ~3 wavelengths offset: an
    explosive source's pressure arrival travels at vp; a vertical force's
    broadside vz arrival travels at vs (pure far-field S there)."""
    f0 = 13.0
    vp0, vs0 = 2400.0, 1400.0
    ny, nz, nx = 20, 44, 96
    vp = np.full((ny, nz, nx), vp0)
    vs = np.full((ny, nz, nx), vs0)
    rho = np.full((ny, nz, nx), 1200.0)
    grid = Grid(shape=(ny, nz, nx), h=(10.0,) * 3, pml=8, order=4)
    dt = elastic_cfl_dt(grid.h, vp0, 4, safety=0.6)
    cy, cz, cx = ny // 2, nz // 2, 16
    d1, d2 = 28, 56  # differential 280 m: wavelet shape cancels
    t_need = d2 * 10.0 / vs0 + 3.0 / f0
    nt = int(t_need / dt)
    w = ricker_np(f0, dt, nt)
    geom = Geometry.from_physical(
        grid, np.array([[cy, cz, cx]]),
        np.array([[cy, cz, cx + d1], [cy, cz, cx + d2]])
    )
    ddist = (d2 - d1) * 10.0

    def xcorr_delay(a, b):
        xc = np.correlate(b, a, "full")
        k = int(np.argmax(xc))
        y0, y1, y2 = xc[k - 1], xc[k], xc[k + 1]
        frac = 0.5 * (y0 - y2) / (y0 - 2 * y1 + y2)
        return (k + frac - (len(a) - 1)) * dt

    def velocity(source_type, record, comp):
        prop = Elastic3dPropagator(grid, dt, f0, vp0, dtype=jnp.float64,
                                   source_type=source_type, record=record)
        s = np.asarray(prop(jnp.asarray(vp), jnp.asarray(vs),
                            jnp.asarray(rho), geom, jnp.asarray(w)))
        tr = (lambda i: s[:, i]) if record == "p" else (lambda i: s[:, i, comp])
        return ddist / xcorr_delay(tr(0), tr(1))

    v_p = velocity("pressure", "p", None)
    assert abs(v_p - vp0) < 0.04 * vp0, v_p
    v_s = velocity("force_z", "v", 0)  # vz broadside: far-field S
    assert abs(v_s - vs0) < 0.04 * vs0, v_s


def test_gradients_finite_difference():
    grid, vp, vs, rho, dt, w, geom, f0 = _setup(ny=14, nz=16, nx=18, nt=50)
    prop = Elastic3dPropagator(grid, dt, f0, float(vp.max()),
                               dtype=jnp.float64, gradient="remat")
    wj = jnp.asarray(w)
    m0 = (jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho))

    def loss(m):
        s = prop(*m, geom, wj)
        return jnp.sum(s * s)

    g = jax.grad(loss)(m0)
    rng = np.random.default_rng(4)
    for i, h in ((0, 1e-3), (1, 1e-3), (2, 1e-3)):
        v = jnp.asarray(rng.standard_normal(m0[i].shape))
        mp = list(m0); mp[i] = m0[i] + h * v
        mm = list(m0); mm[i] = m0[i] - h * v
        fd = (loss(tuple(mp)) - loss(tuple(mm))) / (2 * h)
        got = float(jnp.vdot(g[i], v))
        rel = abs(got - float(fd)) / max(1.0, abs(float(fd)))
        assert rel < 1e-5, (i, rel)


def test_elastic_fwi_problem_drives_3d():
    """ElasticFwiProblem is propagator-agnostic: with an
    Elastic3dPropagator it produces finite band-limited objectives and a
    (vp, vs, rho) gradient that points toward the true model."""
    from tpufwi.invert import ElasticFwiProblem

    ny, nz, nx, f0, nt = 12, 16, 20, 14.0, 190
    vp_t = np.full((ny, nz, nx), 2200.0, np.float32)
    vp_t[:, 8:12, 6:14] = 2350.0
    vs_t = vp_t / 1.8
    rho_t = np.full((ny, nz, nx), 1400.0, np.float32)
    grid = Grid(shape=(ny, nz, nx), h=(10.0,) * 3, pml=5, order=4)
    dt = elastic_cfl_dt(grid.h, 2350.0, 4, safety=0.6)
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    prop = Elastic3dPropagator(grid, dt, f0, 2350.0, dtype=jnp.float32)
    src = np.array([[[ny // 2, 2, 4]], [[ny // 2, 2, 15]]])
    rcv = np.array([[y, 3, x] for y in range(3, 10, 3)
                    for x in range(3, 18, 4)])
    geoms = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[Geometry.from_physical(grid, s, rcv) for s in src],
    )
    d_obs = jnp.stack([
        prop(jnp.asarray(vp_t), jnp.asarray(vs_t), jnp.asarray(rho_t),
             jax.tree.map(lambda x: x[i], geoms), w)
        for i in range(2)
    ])
    pb = ElasticFwiProblem(prop=prop, geoms=geoms, d_obs=d_obs,
                           wavelet=w, dt=dt)
    vg, loss = pb.stage_objectives(12.0)
    m0 = (jnp.full((ny, nz, nx), 2200.0, jnp.float32),
          jnp.full((ny, nz, nx), 2200.0 / 1.8, jnp.float32),
          jnp.asarray(rho_t))
    J, g = vg(m0)
    assert np.isfinite(float(J)) and float(J) > 0
    truth = (jnp.asarray(vp_t), jnp.asarray(vs_t), jnp.asarray(rho_t))
    d2t = sum(float(jnp.vdot(gi, ti - mi))
              for gi, mi, ti in zip(g, m0, truth))
    assert d2t < 0, d2t


@pytest.mark.parametrize("source_type", ["pressure", "force_z"])
def test_forward_matches_oracle_free_surface(source_type):
    """3D Levander stress image + mid-step velocity image: jnp engine ==
    oracle at machine precision with free_surface on (both engines apply
    the same images in the same step positions)."""
    ny, nz, nx, f0, nt = 20, 24, 26, 12.0, 160
    vp = np.full((ny, nz, nx), 2200.0)
    vp[:, nz // 2 :] = 2600.0
    vs = vp / 1.8
    rho = 1000.0 + 0.3 * vp
    grid = Grid(shape=(ny, nz, nx), h=(10.0, 10.0, 10.0), pml=6, order=4,
                free_surface=True)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), 4, safety=0.6)
    w = ricker_np(f0, dt, nt)
    src = np.array([[10, 4, 13]])
    rcv = np.array([[10, 6, 7], [8, 6, 19], [12, 10, 13]])
    seis_o = oracle_elastic_3d(vp, vs, rho, grid, dt, w, src, rcv, f0,
                               source_type=source_type)
    prop = Elastic3dPropagator(grid, dt, f0, float(vp.max()),
                               dtype=jnp.float64, source_type=source_type)
    geom = Geometry.from_physical(grid, src, rcv)
    seis = np.asarray(prop(jnp.asarray(vp), jnp.asarray(vs),
                           jnp.asarray(rho), geom, jnp.asarray(w)))
    rms = np.sqrt(np.mean((seis - seis_o) ** 2)) / np.sqrt(np.mean(seis_o**2))
    assert rms < 1e-9, f"elastic3d fs vs oracle RMS {rms:.3e}"


def test_free_surface_long_run_stable():
    """The mid-step velocity image keeps the 3D half-space stable: after
    2500 steps (~15x the source duration) the recorded field has decayed
    to < 1e-4 of its peak (the 2D experiments showed end-of-step imaging
    LEAKS and stress-image-only grows exponentially — this pins the 3D
    placement)."""
    ny, nz, nx, f0 = 18, 22, 24, 12.0
    vp = np.full((ny, nz, nx), 2200.0)
    vs = vp / 1.8
    rho = np.full_like(vp, 1800.0)
    grid = Grid(shape=(ny, nz, nx), h=(10.0, 10.0, 10.0), pml=6, order=4,
                free_surface=True)
    dt = elastic_cfl_dt(grid.h, 2200.0, 4, safety=0.6)
    nt = 2500
    w = np.zeros(nt)
    w[:160] = ricker_np(f0, dt, 160)
    prop = Elastic3dPropagator(grid, dt, f0, 2200.0, dtype=jnp.float64,
                               source_type="force_z")
    geom = Geometry.from_physical(
        grid, np.array([[9, 3, 12]]), np.array([[9, 2, 6], [9, 5, 18]]))
    seis = np.asarray(prop(jnp.asarray(vp), jnp.asarray(vs),
                           jnp.asarray(rho), geom, jnp.asarray(w)))
    assert np.isfinite(seis).all()
    peak = np.abs(seis).max()
    late = np.abs(seis[-200:]).max()
    assert late < 1e-4 * peak, (late, peak)


def test_gradients_finite_difference_free_surface():
    """(vp, vs, rho) AD gradients through the imaged step match central
    finite differences — the images are linear maps, so plain AD over
    the checkpointed scan stays exact with free_surface on."""
    ny, nz, nx, f0, nt = 14, 16, 18, 14.0, 60
    rng = np.random.default_rng(5)
    vp = 2200.0 + 150.0 * rng.random((ny, nz, nx))
    vs = vp / 1.8
    rho = 1000.0 + 0.3 * vp
    grid = Grid(shape=(ny, nz, nx), h=(10.0, 10.0, 10.0), pml=6, order=4,
                free_surface=True)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), 4, safety=0.6)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    geom = Geometry.from_physical(
        grid, np.array([[7, 3, 6]]), np.array([[7, 4, 12], [5, 7, 9]]))
    prop = Elastic3dPropagator(grid, dt, f0, float(vp.max()),
                               dtype=jnp.float64, source_type="force_z",
                               gradient="remat")

    def loss(vp_, vs_, rho_):
        s = prop(vp_, vs_, rho_, geom, w)
        return jnp.sum(s * s)

    args = (jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho))
    g = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for i, h in ((0, 1e-2), (1, 1e-2), (2, 1e-2)):
        v = jnp.asarray(rng.standard_normal(args[i].shape))
        ap = list(args); ap[i] = args[i] + h * v
        am = list(args); am[i] = args[i] - h * v
        fd = (loss(*ap) - loss(*am)) / (2 * h)
        got = float(jnp.vdot(g[i], v))
        rel = abs(got - float(fd)) / max(abs(float(fd)), 1e-300)
        assert rel < 1e-5, (i, rel)


@pytest.mark.parametrize("free_surface,source_type",
                         [(False, "pressure"), (True, "force_z")])
def test_rings_gradient_matches_remat(free_surface, source_type):
    """Boundary-saving rings gradient == plain AD over the checkpointed
    scan (the 3D analog of test_elastic_gradient_matches_full_ad): J to
    1e-10 rel and all three material gradients to 1e-10 rel on the
    interior shrunk by radius+1 (staggered material averaging chains one
    cell outward; the outer radius frame is zero by construction on the
    rings path — see RingSpec.mask_valid)."""
    ny, nz, nx, f0, nt = 14, 16, 18, 14.0, 60
    rng = np.random.default_rng(7)
    vp = 2200.0 + 150.0 * rng.random((ny, nz, nx))
    vs = vp / 1.8
    rho = 1000.0 + 0.3 * vp
    grid = Grid(shape=(ny, nz, nx), h=(10.0, 10.0, 10.0), pml=6, order=4,
                free_surface=free_surface)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), 4, safety=0.6)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    geom = Geometry.from_physical(
        grid, np.array([[7, 5, 6]]), np.array([[7, 4, 12], [5, 7, 9]]))
    kw = dict(dtype=jnp.float64, source_type=source_type)
    prop_r = Elastic3dPropagator(grid, dt, f0, float(vp.max()),
                                 gradient="rings", **kw)
    prop_a = Elastic3dPropagator(grid, dt, f0, float(vp.max()),
                                 gradient="remat", **kw)
    m0 = (jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho))
    d_obs = prop_a(m0[0] * 1.02, m0[1], m0[2], geom, w)

    def loss(prop):
        def f(m):
            r = prop(*m, geom, w) - d_obs
            return 0.5 * jnp.sum(r * r)
        return f

    J_r, g_r = jax.value_and_grad(loss(prop_r))(m0)
    J_a, g_a = jax.value_and_grad(loss(prop_a))(m0)
    assert abs(float(J_r) - float(J_a)) < 1e-10 * abs(float(J_a))

    rr = grid.radius + 1
    mask = np.zeros(grid.shape)
    mask[rr:-rr, rr:-rr, rr:-rr] = 1.0
    for name, gr, ga in zip(("vp", "vs", "rho"), g_r, g_a):
        gr = np.asarray(gr) * mask
        ga = np.asarray(ga) * mask
        scale = np.abs(ga).max()
        err = np.abs(gr - ga).max() / scale
        assert err < 1e-10, f"{name}: rings vs remat rel err {err:.3e}"
