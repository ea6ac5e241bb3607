"""Hardware throughput survey of the XLA-engine physics families.

ROADMAP item 17 wants measured evidence before writing fused Pallas
kernels for the round-2 physics engines (variable-density, viscoacoustic,
VTI, TTI, elastic): this script nt-slope-times each engine's forward and
gradient at Marmousi2 scale on whatever backend is active (TPU in anger)
and prints one JSON line per engine/kind, plus a closing summary.

Methodology: identical to tpufwi/bench/bench_stencil.py — every timed
program has a SCALAR output (sum of the seismogram / sum of gradient
elements), and per-step cost is the slope between two nt values, which
cancels dispatch, source-array upload and compile-adjacent constants
(relay-safe). Engines that fail to build/compile are reported and
skipped, not fatal.

Run: python scripts/bench_physics_engines.py   (queued via tpu_queue)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax.numpy as jnp
import numpy as np

from tpufwi.acquisition import Geometry
from tpufwi.grid import Grid, pad_model
from tpufwi.wavelets import ricker_np

NZ = int(os.environ.get("TPUFWI_BENCHENG_NZ", 351))
NX = int(os.environ.get("TPUFWI_BENCHENG_NX", 1701))  # Marmousi2 at 10 m
H = 10.0
PML, ORDER = 12, 8
F0 = 12.0
_NT1 = int(os.environ.get("TPUFWI_BENCHENG_NT", 400))
NTS = (_NT1 // 4, _NT1)
DT = None  # set in main() per CFL


def slope_us(fn, args, nts=NTS, reps=3):
    """Per-step microseconds via the nt-slope of scalar-output programs.

    The wavelet is perturbed per repetition: the relay caches results for
    identical program+inputs, and re-timing a cached call produced the
    negative elastic_fused fwd slope in runs/tpu_queue2/bench_engines.log.
    """
    times = {}
    for nt in nts:
        w0 = jnp.asarray(ricker_np(F0, DT, nt))
        jitted = jax.jit(lambda w_, *a: fn(w_, *a))
        float(jitted(w0, *args))  # compile + warm
        ts = []
        for i in range(reps):
            w = w0 * (1.0 + 1e-4 * (i + 1))
            jax.block_until_ready(w)
            t0 = time.perf_counter()
            float(jitted(w, *args))
            ts.append(time.perf_counter() - t0)
        times[nt] = sorted(ts)[len(ts) // 2]
    return 1e6 * (times[nts[1]] - times[nts[0]]) / (nts[1] - nts[0])


def main():
    global DT
    rng = np.random.default_rng(0)
    cells_holder = {}

    grid = Grid(shape=(NZ, NX), h=(H, H), pml=PML, order=ORDER)
    cells = float(np.prod(grid.padded_shape))
    cells_holder["cells"] = cells
    vp = np.clip(
        2500.0 + 150.0 * rng.standard_normal((NZ, NX)), 1500.0, 4500.0
    ).astype(np.float32)
    c_max = float(vp.max())
    DT = grid.cfl_dt(c_max, safety=0.7)

    src = np.array([[2, NX // 2]])
    rxz = np.stack(
        [np.full(256, 2), np.linspace(5, NX - 6, 256)], -1
    ).astype(np.int32)
    geom = Geometry.from_physical(grid, src, rxz)
    si, ri = geom.src_idx, geom.rcv_idx

    vp_p = jnp.asarray(pad_model(vp, grid))
    rho_p = jnp.asarray(pad_model(np.full_like(vp, 2000.0), grid))

    from tpufwi.adjoint import (
        make_simulator,
        make_simulator_tti,
        make_simulator_vd,
        make_simulator_visco,
        make_simulator_vti,
    )
    from tpufwi.kernels.acoustic_vd_jnp import buoy_to_half
    from tpufwi.kernels.viscoacoustic_jnp import tau_of_q

    base = {}

    def bench(name, build):
        try:
            f_fn, g_fn, args = build()
            for kind, fn in (("fwd", f_fn), ("grad", g_fn)):
                us = slope_us(fn, args)
                rec = {
                    "engine": name,
                    "kind": kind,
                    "us_per_step": round(us, 2),
                    "gcu_per_s": round(cells / us * 1e-3, 2),
                }
                if name == "acoustic_xla":
                    base[kind] = us
                elif base.get(kind):
                    rec["slowdown_vs_acoustic"] = round(us / base[kind], 2)
                print(json.dumps(rec), flush=True)
        except Exception as e:  # noqa: BLE001 — the survey must finish
            print(json.dumps({"engine": name, "error": repr(e)[:300]}),
                  flush=True)

    # ---- acoustic (XLA engine, rings VJP) — the reference point -----
    def build_acoustic():
        sim = make_simulator(grid, DT, F0, c_max)
        c2dt2 = (vp_p * DT) ** 2

        def fwd(w, c2):
            return jnp.sum(sim(c2, w, si, ri) ** 2)

        def grad(w, c2):
            g = jax.grad(lambda m: fwd(w, m))(c2)
            return jnp.sum(jnp.abs(g))

        return fwd, grad, (c2dt2,)

    bench("acoustic_xla", build_acoustic)

    # ---- variable-density acoustic (rings VJP, 2R-1) -----------------
    def build_vd():
        sim = make_simulator_vd(grid, DT, F0, c_max)
        kdt2 = rho_p * (vp_p * DT) ** 2
        buoy = 1.0 / rho_p
        bh = tuple(buoy_to_half(buoy, ax) for ax in range(2))

        def fwd(w, k, b0, b1):
            return jnp.sum(sim(k, (b0, b1), w, si, ri) ** 2)

        def grad(w, k, b0, b1):
            g = jax.grad(lambda m: fwd(w, *m))((k, b0, b1))
            return sum(jnp.sum(jnp.abs(x)) for x in g)

        return fwd, grad, (kdt2, *bh)

    bench("variable_density_xla", build_vd)

    # ---- viscoacoustic constant-Q (checkpointed-scan AD) -------------
    def build_visco():
        sim = make_simulator_visco(grid, DT, F0, c_max)
        kdt2 = rho_p * (vp_p * DT) ** 2
        tau = tau_of_q(jnp.full_like(vp_p, 50.0))
        buoy = 1.0 / rho_p
        bh = tuple(buoy_to_half(buoy, ax) for ax in range(2))

        def fwd(w, k, t, b0, b1):
            return jnp.sum(sim(k, t, (b0, b1), w, si, ri) ** 2)

        def grad(w, k, t, b0, b1):
            g = jax.grad(lambda m: fwd(w, *m))((k, t, b0, b1))
            return sum(jnp.sum(jnp.abs(x)) for x in g)

        return fwd, grad, (kdt2, tau, *bh)

    bench("viscoacoustic_xla", build_visco)

    # ---- VTI pseudo-acoustic (rings VJP on both fields) --------------
    def build_vti():
        eps, dlt = 0.2, 0.1
        cmx = c_max * float(np.sqrt(1 + 2 * eps))
        dt_v = grid.cfl_dt(cmx, safety=0.7)
        sim = make_simulator_vti(grid, dt_v, F0, cmx)
        vz2 = (vp_p * dt_v) ** 2
        fe = jnp.full_like(vp_p, 1 + 2 * eps)
        fd = jnp.full_like(vp_p, 1 + 2 * dlt)

        def fwd(w, v, e, d):
            return jnp.sum(sim(v, e, d, w, si, ri) ** 2)

        def grad(w, v, e, d):
            g = jax.grad(lambda m: fwd(w, *m))((v, e, d))
            return sum(jnp.sum(jnp.abs(x)) for x in g)

        return fwd, grad, (vz2, fe, fd)

    bench("vti_xla", build_vti)

    # ---- TTI pseudo-acoustic (checkpointed-scan AD) -------------------
    def build_tti():
        eps, dlt, theta = 0.2, 0.1, np.pi / 6
        cmx = c_max * float(np.sqrt(1 + 2 * eps))
        dt_t = grid.cfl_dt(cmx, safety=0.6)
        sim = make_simulator_tti(grid, dt_t, F0, cmx)
        vz2 = (vp_p * dt_t) ** 2
        fe = jnp.full_like(vp_p, 1 + 2 * eps)
        fd = jnp.full_like(vp_p, 1 + 2 * dlt)
        c2t = jnp.full_like(vp_p, float(np.cos(theta) ** 2))
        s2t = jnp.full_like(vp_p, float(np.sin(theta) ** 2))
        sn2 = jnp.full_like(vp_p, float(np.sin(2 * theta)))

        def fwd(w, v, e, d, ct, st, s2):
            return jnp.sum(sim(v, e, d, ct, st, s2, w, si, ri) ** 2)

        def grad(w, v, e, d, ct, st, s2):
            g = jax.grad(lambda m: fwd(w, *m))((v, e, d, ct, st, s2))
            return sum(jnp.sum(jnp.abs(x)) for x in g)

        return fwd, grad, (vz2, fe, fd, c2t, s2t, sn2)

    bench("tti_xla", build_tti)

    # ---- elastic P-SV: XLA engine vs fused Pallas ---------------------
    def build_elastic(fused):
        from tpufwi.propagators.elastic2d import (
            ElasticPropagator,
            elastic_cfl_dt,
            make_elastic_simulator,
            make_elastic_simulator_fused,
        )

        egrid = Grid(shape=(NZ, NX), h=(H, H), pml=PML, order=4)
        egeom = Geometry.from_physical(egrid, src, rxz)
        esi, eri = egeom.src_idx, egeom.rcv_idx
        dt_e = elastic_cfl_dt(egrid.h, c_max, 4, safety=0.7)
        make = (make_elastic_simulator_fused if fused
                else make_elastic_simulator)
        sim = make(egrid, dt_e, F0, c_max)
        prop = ElasticPropagator(egrid, dt_e, F0, c_max)  # field prep only
        vpj = jnp.asarray(vp)
        vsj = vpj / 1.8
        rhoj = jnp.full_like(vpj, 2000.0)

        def fwd(w, a, b, c):
            mats = prop.material_fields(a, b, c)
            return jnp.sum(sim(*mats, w, esi, eri) ** 2)

        def grad(w, a, b, c):
            g = jax.grad(lambda m: fwd(w, *m))((a, b, c))
            return sum(jnp.sum(jnp.abs(x)) for x in g)

        return fwd, grad, (vpj, vsj, rhoj)

    bench("elastic_xla", lambda: build_elastic(False))
    bench("elastic_fused_pallas", lambda: build_elastic(True))


if __name__ == "__main__":
    main()
