"""Distributed semantics without a cluster (SURVEY.md §4.7): 8 virtual CPU
devices. Shot-sharded loss/gradient must equal the sequential per-shot sum."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tpufwi import AcousticPropagator, Grid, split_spread_survey
from tpufwi.misfit import l2_misfit
from tpufwi.sharding import make_mesh, shard_shots, shot_parallel_loss
from tpufwi.wavelets import ricker_np


def _setup(n_shots=8, dtype=jnp.float64):
    grid = Grid(shape=(40, 64), h=(12.0, 12.0), pml=8, order=4)
    c_max, f0 = 2600.0, 13.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 150
    w = jnp.asarray(ricker_np(f0, dt, nt), dtype)
    rng = np.random.default_rng(1)
    vp_true = jnp.asarray(
        np.clip(2100 + 150 * rng.standard_normal(grid.shape), 1800, 2500), dtype
    )
    vp0 = jnp.full(grid.shape, 2100.0, dtype)
    prop = AcousticPropagator(grid, dt, f0, c_max, dtype=dtype)
    geoms = split_spread_survey(grid, n_shots, src_z=4, rcv_z=3, rcv_dx=2)
    d_obs = jax.vmap(lambda g: prop(vp_true, g, w))(geoms)
    return prop, geoms, d_obs, w, vp0


def test_shot_sharded_grad_equals_sequential():
    assert jax.device_count() == 8
    prop, geoms, d_obs, w, vp0 = _setup()
    mesh = make_mesh({"shot": 8})

    def one_shot_loss(vp, geom, d):
        return l2_misfit(prop(vp, geom, w), d)

    total = shot_parallel_loss(one_shot_loss, mesh)
    geoms_s = shard_shots(geoms, mesh)
    d_s = shard_shots(d_obs, mesh)

    J_sh, g_sh = jax.jit(jax.value_and_grad(total))(vp0, geoms_s, d_s)

    # sequential reference
    J_ref = 0.0
    g_ref = jnp.zeros_like(vp0)
    for i in range(8):
        geom_i = jax.tree.map(lambda x: x[i], geoms)
        Ji, gi = jax.value_and_grad(one_shot_loss)(vp0, geom_i, d_obs[i])
        J_ref += float(Ji)
        g_ref = g_ref + gi

    assert abs(float(J_sh) - J_ref) / J_ref < 1e-12
    num = float(jnp.abs(g_sh - g_ref).max())
    den = float(jnp.abs(g_ref).max())
    assert num / den < 1e-11, f"sharded vs sequential grad rel err {num/den:.3e}"


def test_multislice_mesh_shot_dp_matches_sequential():
    """Multi-slice pod layout on virtual devices: shots sharded over the
    flattened ("slice", "shot") product of a {"slice": 2, "shot": 4} mesh
    (DCN outer axis x ICI inner axis on hardware), psum over both axes.
    J and gradient must equal the sequential sum — and the single-axis
    8-device layout — exactly."""
    prop, geoms, d_obs, w, vp0 = _setup()
    mesh = make_mesh({"slice": 2, "shot": 4})
    ax = ("slice", "shot")

    def one_shot_loss(vp, geom, d):
        return l2_misfit(prop(vp, geom, w), d)

    total = shot_parallel_loss(one_shot_loss, mesh, axis=ax)
    J_sh, g_sh = jax.jit(jax.value_and_grad(total))(
        vp0, shard_shots(geoms, mesh, axis=ax), shard_shots(d_obs, mesh, axis=ax)
    )

    J_ref = 0.0
    g_ref = jnp.zeros_like(vp0)
    for i in range(8):
        geom_i = jax.tree.map(lambda x: x[i], geoms)
        Ji, gi = jax.value_and_grad(one_shot_loss)(vp0, geom_i, d_obs[i])
        J_ref += float(Ji)
        g_ref = g_ref + gi

    assert abs(float(J_sh) - J_ref) / J_ref < 1e-12
    rel = float(jnp.abs(g_sh - g_ref).max() / jnp.abs(g_ref).max())
    assert rel < 1e-11, f"multislice vs sequential grad rel err {rel:.3e}"


def test_gradient_accumulation_more_shots_than_devices():
    # 16 shots on 8 devices: 2 sequential shots per device via lax.map
    prop, geoms, d_obs, w, vp0 = _setup(n_shots=16)
    mesh = make_mesh({"shot": 8})

    def one_shot_loss(vp, geom, d):
        return l2_misfit(prop(vp, geom, w), d)

    total = shot_parallel_loss(one_shot_loss, mesh)
    J_sh = float(jax.jit(total)(vp0, shard_shots(geoms, mesh), shard_shots(d_obs, mesh)))
    J_ref = sum(
        float(one_shot_loss(vp0, jax.tree.map(lambda x: x[i], geoms), d_obs[i]))
        for i in range(16)
    )
    assert abs(J_sh - J_ref) / J_ref < 1e-12


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_multiparameter_problem_shot_dp_matches_sequential():
    """VdFwiProblem and QFwiProblem with mesh= : shot-sharded (J, grad)
    == the sequential lax.map path (same problems, mesh=None)."""
    import numpy as np

    from tpufwi.acquisition import split_spread_survey
    from tpufwi.adjoint import make_simulator_vd, make_simulator_visco
    from tpufwi.grid import Grid
    from tpufwi.invert import QFwiProblem, VdFwiProblem
    from tpufwi.wavelets import ricker_np

    nz, nx, f0, nt, nsh = 30, 40, 12.0, 80, 4
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    dt = grid.cfl_dt(2200.0, safety=0.7)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    geoms = split_spread_survey(grid, nsh, src_z=2, rcv_z=2, rcv_dx=4)
    rng = np.random.default_rng(0)
    vp = jnp.asarray(2000.0 + 100 * rng.random((nz, nx)))
    rho = jnp.asarray(1200.0 + 100 * rng.random((nz, nx)))
    qm = jnp.asarray(60.0 + 30 * rng.random((nz, nx)))
    mesh = make_mesh({"shot": nsh}, devices=jax.devices()[:nsh])

    sim_vd = make_simulator_vd(grid, dt, f0, 2200.0, jnp.float64)
    sim_q = make_simulator_visco(grid, dt, f0, 2200.0, jnp.float64)

    for cls, sim, m in (
        (VdFwiProblem, sim_vd, (vp, rho)),
        (QFwiProblem, sim_q, (vp, qm)),
    ):
        mk = lambda mesh_, d: cls(sim=sim, grid=grid, dt=dt, geoms=geoms,
                                  d_obs=d, wavelet=w, mesh=mesh_)
        d0 = jnp.zeros((nsh, nt, len(geoms.rcv_idx[0])))
        vg_seq, _ = mk(None, d0).stage_objectives(None)
        vg_sh, _ = mk(mesh, d0).stage_objectives(None)
        Js, gs = vg_seq(m)
        Jp, gp = vg_sh(m)
        assert abs(float(Js) - float(Jp)) / float(Js) < 1e-12, cls.__name__
        for a, b in zip(gs, gp):
            rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-30))
            assert rel < 1e-11, (cls.__name__, rel)


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_anisotropic_problems_shot_dp_matches_sequential():
    """VtiFwiProblem and TtiFwiProblem with mesh= : shot-sharded
    (J, grad) == the sequential path (the shared _mp_total shard_map
    route, like the Vd/Q test above)."""
    import numpy as np

    from tpufwi.acquisition import split_spread_survey
    from tpufwi.adjoint import make_simulator_tti, make_simulator_vti
    from tpufwi.grid import Grid
    from tpufwi.invert import TtiFwiProblem, VtiFwiProblem
    from tpufwi.wavelets import ricker_np

    nz, nx, f0, nt, nsh = 30, 40, 12.0, 80, 4
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    vmax = 2300.0 * np.sqrt(1.4)
    dt = grid.cfl_dt(vmax, safety=0.7)
    w = jnp.asarray(ricker_np(f0, dt, nt))
    geoms = split_spread_survey(grid, nsh, src_z=2, rcv_z=2, rcv_dx=4)
    rng = np.random.default_rng(0)
    vp = jnp.asarray(2000.0 + 100 * rng.random((nz, nx)))
    eps = jnp.asarray(0.1 + 0.05 * rng.random((nz, nx)))
    dl = eps - 0.05
    theta = jnp.asarray(0.2 * rng.random((nz, nx)))
    mesh = make_mesh({"shot": nsh}, devices=jax.devices()[:nsh])
    d0 = jnp.zeros((nsh, nt, len(geoms.rcv_idx[0])))
    m = (vp, eps, dl)

    sim_v = make_simulator_vti(grid, dt, f0, vmax, jnp.float64)
    sim_t = make_simulator_tti(grid, dt, f0, vmax, jnp.float64)
    mk_v = lambda mesh_: VtiFwiProblem(sim=sim_v, grid=grid, dt=dt,
                                       geoms=geoms, d_obs=d0, wavelet=w,
                                       mesh=mesh_)
    mk_t = lambda mesh_: TtiFwiProblem(sim=sim_t, grid=grid, dt=dt,
                                       theta=theta, geoms=geoms, d_obs=d0,
                                       wavelet=w, mesh=mesh_)
    for name, mk in (("vti", mk_v), ("tti", mk_t)):
        vg_seq, _ = mk(None).stage_objectives(None)
        vg_sh, _ = mk(mesh).stage_objectives(None)
        Js, gs = vg_seq(m)
        Jp, gp = vg_sh(m)
        assert abs(float(Js) - float(Jp)) / float(Js) < 1e-12, name
        for a, b in zip(gs, gp):
            rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-30))
            assert rel < 1e-11, (name, rel)


@pytest.mark.slow  # slow-lane: interpret-mode/demo-grade; fast lane keeps a representative
def test_scanres_shot_dp_shard_map_matches_sequential():
    """P1 composition evidence (VERDICT r2 item 5): the whole-scan-
    resident engine under shard_map shot DP. Compiled scanres does not
    tolerate lax.map while-body fusion, so the shard_map path uses
    shot_loop='unroll' (a static python loop per device); this runs the
    actual pallas kernels in interpret mode on the 8-device CPU mesh and
    checks psum-of-gradients == the sequential per-shot sum."""
    assert jax.device_count() == 8
    from tpufwi.adjoint_pallas_scanres import make_simulator_pallas_scanres
    from tpufwi import split_spread_survey as _survey

    grid = Grid(shape=(40, 64), h=(12.0, 12.0), pml=8, order=4)
    c_max, f0 = 2600.0, 13.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 96
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    rng = np.random.default_rng(2)
    vp_true = jnp.asarray(
        np.clip(2100 + 150 * rng.standard_normal(grid.shape), 1800, 2500),
        jnp.float32,
    )
    vp0 = jnp.full(grid.shape, 2100.0, jnp.float32)
    sim = make_simulator_pallas_scanres(grid, dt, f0, c_max, interpret=True)
    pad = grid.pad

    def c2of(v):
        return (jnp.pad(v, [(pad, pad)] * 2, mode="edge") * dt) ** 2

    n_shots = 16  # 2 local shots per device: exercises the unroll loop
    geoms = _survey(grid, n_shots, src_z=4, rcv_z=3, rcv_dx=2)
    # host-looped observed data (scanres does not batch under vmap)
    d_obs = jnp.stack([
        sim(c2of(vp_true), w,
            jax.tree.map(lambda x: x[i], geoms).src_idx,
            jax.tree.map(lambda x: x[i], geoms).rcv_idx)
        for i in range(n_shots)
    ])

    def one_shot_loss(vp, geom, d):
        return l2_misfit(sim(c2of(vp), w, geom.src_idx, geom.rcv_idx), d)

    mesh = make_mesh({"shot": 8})
    total = shot_parallel_loss(one_shot_loss, mesh, shot_loop="unroll")
    geoms_s = shard_shots(geoms, mesh)
    d_s = shard_shots(d_obs, mesh)
    J_sh, g_sh = jax.jit(jax.value_and_grad(total))(vp0, geoms_s, d_s)

    J_ref, g_ref = 0.0, jnp.zeros_like(vp0)
    for i in range(n_shots):
        geom_i = jax.tree.map(lambda x: x[i], geoms)
        Ji, gi = jax.value_and_grad(one_shot_loss)(vp0, geom_i, d_obs[i])
        J_ref += float(Ji)
        g_ref = g_ref + gi

    assert abs(float(J_sh) - J_ref) / J_ref < 1e-5
    rel = float(jnp.abs(g_sh - g_ref).max()) / float(jnp.abs(g_ref).max())
    assert rel < 1e-5, f"scanres shard_map vs sequential grad: {rel:.3e}"


def test_scansnap_shot_dp_shard_map_matches_sequential():
    """The snapshot engine (round-3 auto default on TPU) under shard_map
    shot DP: same composition as the scanres test above, on the bf16
    lap-tape engine — psum-of-gradients == sequential sum up to the tape
    rounding."""
    assert jax.device_count() == 8
    from tpufwi.adjoint_pallas_scanres import make_simulator_pallas_scanres
    from tpufwi import split_spread_survey as _survey

    grid = Grid(shape=(40, 64), h=(12.0, 12.0), pml=8, order=4)
    c_max, f0 = 2600.0, 13.0
    dt = grid.cfl_dt(c_max, safety=0.7)
    nt = 96
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    rng = np.random.default_rng(3)
    vp_true = jnp.asarray(
        np.clip(2100 + 150 * rng.standard_normal(grid.shape), 1800, 2500),
        jnp.float32,
    )
    vp0 = jnp.full(grid.shape, 2100.0, jnp.float32)
    sim = make_simulator_pallas_scanres(
        grid, dt, f0, c_max, interpret=True, tape_mode="snap"
    )
    pad = grid.pad

    def c2of(v):
        return (jnp.pad(v, [(pad, pad)] * 2, mode="edge") * dt) ** 2

    n_shots = 8
    geoms = _survey(grid, n_shots, src_z=4, rcv_z=3, rcv_dx=2)
    d_obs = jnp.stack([
        sim(c2of(vp_true), w,
            jax.tree.map(lambda x: x[i], geoms).src_idx,
            jax.tree.map(lambda x: x[i], geoms).rcv_idx)
        for i in range(n_shots)
    ])

    def one_shot_loss(vp, geom, d):
        return l2_misfit(sim(c2of(vp), w, geom.src_idx, geom.rcv_idx), d)

    mesh = make_mesh({"shot": 8})
    total = shot_parallel_loss(one_shot_loss, mesh, shot_loop="unroll")
    geoms_s = shard_shots(geoms, mesh)
    d_s = shard_shots(d_obs, mesh)
    J_sh, g_sh = jax.jit(jax.value_and_grad(total))(vp0, geoms_s, d_s)

    J_ref, g_ref = 0.0, jnp.zeros_like(vp0)
    for i in range(n_shots):
        geom_i = jax.tree.map(lambda x: x[i], geoms)
        Ji, gi = jax.value_and_grad(one_shot_loss)(vp0, geom_i, d_obs[i])
        J_ref += float(Ji)
        g_ref = g_ref + gi

    assert abs(float(J_sh) - J_ref) / J_ref < 1e-5
    rel = float(jnp.abs(g_sh - g_ref).max()) / float(jnp.abs(g_ref).max())
    assert rel < 1e-5, f"scansnap shard_map vs sequential grad: {rel:.3e}"


def test_shot_loop_unroll_matches_map_in_problem():
    """FwiProblem.shot_loop='unroll' (the scanres-compatible shard_map
    form) computes the same sharded objective as the default lax.map."""
    import dataclasses
    from tpufwi.invert import FwiProblem

    prop, geoms, d_obs, w, vp0 = _setup(n_shots=8)
    mesh = make_mesh({"shot": 8})
    base = FwiProblem(prop=prop, geoms=geoms, d_obs=d_obs, wavelet=w,
                      dt=prop.dt, mesh=mesh, shot_loop="map")
    unrl = dataclasses.replace(base, shot_loop="unroll")
    vg_m, _ = base.stage_objectives(None)
    vg_u, _ = unrl.stage_objectives(None)
    Jm, gm = vg_m(vp0)
    Ju, gu = vg_u(vp0)
    assert abs(float(Jm) - float(Ju)) / float(Jm) < 1e-12
    rel = float(jnp.abs(gm - gu).max()) / float(jnp.abs(gm).max())
    assert rel < 1e-11, f"unroll vs map sharded grad: {rel:.3e}"


@pytest.mark.slow
def test_elastic_scan_problem_shot_dp_matches_sequential():
    """ElasticFwiProblem on the whole-scan engine under a shot mesh:
    _build selects shot_loop='unroll' (the compiled scan engine cannot
    ride lax.map inside shard_map) and the sharded (J, grad) matches the
    mesh=None host-loop path (round-5 branch; interpret-mode kernels)."""
    import numpy as np

    from tpufwi.acquisition import Geometry
    from tpufwi.grid import Grid
    from tpufwi.invert import ElasticFwiProblem
    from tpufwi.propagators.elastic2d import (
        ElasticPropagator, elastic_cfl_dt,
    )
    from tpufwi.wavelets import ricker_np

    nz, nx, f0, nsh = 36, 48, 12.0, 4
    rng = np.random.default_rng(1)
    vp = np.clip(2300 + 120 * rng.standard_normal((nz, nx)), 2100, 2500)
    vs, rho = vp / 1.8, np.full((nz, nx), 2000.0)
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=8, order=4)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), 4, safety=0.7)
    nt = 64
    w = jnp.asarray(ricker_np(f0, dt, nt), jnp.float32)
    rx = np.arange(5, nx - 5, 3)
    rcv = np.stack([np.full_like(rx, 3), rx], 1)
    geoms = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[Geometry.from_physical(grid, np.array([[3, sx_]]), rcv)
          for sx_ in np.linspace(8, nx - 8, nsh).astype(int)],
    )
    prop = ElasticPropagator(grid, dt, f0, float(vp.max()),
                             impl="pallas_scan", interpret=True)
    pj = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    m = (pj(vp), pj(vs), pj(rho))
    d = jnp.stack([
        prop(*m, jax.tree.map(lambda x: x[i], geoms), w)
        for i in range(nsh)
    ])
    mesh = make_mesh({"shot": nsh}, devices=jax.devices()[:nsh])

    def mk(mesh_):
        return ElasticFwiProblem(prop=prop, geoms=geoms, d_obs=0.9 * d,
                                 wavelet=w, dt=dt, mesh=mesh_)

    pb_seq, pb_sh = mk(None), mk(mesh)
    vg_seq, _ = pb_seq.stage_objectives(None)
    vg_sh, _ = pb_sh.stage_objectives(None)
    assert pb_seq.shot_loop == "python"
    assert pb_sh.shot_loop == "unroll"
    Js, gs = vg_seq(m)
    Jp, gp = vg_sh(m)
    assert abs(float(Js) - float(Jp)) / max(float(Js), 1e-30) < 1e-6
    for a, b in zip(gs, gp):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30))
        assert rel < 1e-5, rel
