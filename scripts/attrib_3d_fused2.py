"""Cost attribution for the fused2 3D step at Overthrust scale.

Measures (nt-slope, relay-safe):
  1. merged kernel only (upd slabs = carried zeros)  [by=16]
  2. the 4 corr slab kernels only (carried states)
  3. full step2 at by=24 (fewer y-halo reads)
Run: python scripts/attrib_3d_fused2.py
"""

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
from jax import lax

from tpufwi.grid import Grid
from tpufwi.kernels.acoustic3d_pallas import extend_yz, y_extended, z_extended
from tpufwi.kernels.acoustic3d_fused2 import (
    make_acoustic3d_fused_step2,
    make_corr3d_y,
    make_corr3d_z,
    make_leapfrog3d_merged,
    z_window,
)
from tpufwi.cpml import CpmlProfile

ny, nz, nx = 801, 187, 801
pml, order = 20, 8
grid = Grid(shape=(ny, nz, nx), h=(25.0,) * 3, pml=pml, order=order)
c_max, f0 = 6000.0, 8.0
dt = grid.cfl_dt(c_max, safety=0.7)
rng = np.random.default_rng(0)
NY, NZ, NX = grid.padded_shape
vp = (3000.0 + 100.0 * rng.standard_normal((NY, NZ, NX))).astype(np.float32)
r = grid.radius
S = grid.pml + r
W = S + 2 * r


def slope(prog, arg, nts=(8, 40), reps=3):
    times = {}
    for nt in nts:
        p = prog(nt)
        float(p(arg * 1.01))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(p(arg * (1.01 + 1e-4 * i)))
            ts.append(time.perf_counter() - t0)
        times[nt] = sorted(ts)[len(ts) // 2]
    return (times[nts[1]] - times[nts[0]]) / (nts[1] - nts[0])


def profs3(grid):
    out = []
    for ax in range(3):
        prof = CpmlProfile.build(
            n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
            h=grid.h[ax], dt=dt, c_max=c_max, f0=f0,
        )
        n_pad = grid.padded_shape[ax]
        shp = [(S, 1, 1), (1, S, 1), (1, 1, S)][ax]
        lo = (jnp.asarray(prof.a[:S], jnp.float32).reshape(shp),
              jnp.asarray(prof.b[:S], jnp.float32).reshape(shp))
        hi = (jnp.asarray(prof.a[n_pad - S:], jnp.float32).reshape(shp),
              jnp.asarray(prof.b[n_pad - S:], jnp.float32).reshape(shp))
        out.append((lo, hi))
    return out


def run_merged_only(by, bz):
    NYe, NZe = y_extended(grid, by), z_extended(grid, bz)
    c2 = extend_yz(jnp.asarray((vp * dt) ** 2), grid, by=by, bz=bz)
    merged = make_leapfrog3d_merged(grid, by=by, bz=bz)
    pr = profs3(grid)
    (axl, bxl), (axh, bxh) = pr[2]
    # block-aligned upd shapes (match the factory's padding rules)
    from tpufwi.kernels.acoustic3d_fused2 import _face_span
    WPyl = (_face_span(0, W, by)[1] + 1) * by
    h0, h1, _ = _face_span(NY - W, W, by)
    WPyh = (h1 - h0 + 1) * by
    uyl = jnp.zeros((WPyl, NZe, NX), jnp.float32)
    uyh = jnp.zeros((WPyh, NZe, NX), jnp.float32)
    uzl = jnp.zeros((NYe, z_window(grid, 0)[1], NX), jnp.float32)
    uzh = jnp.zeros((NYe, z_window(grid, 1)[1], NX), jnp.float32)
    zS = jnp.zeros((NYe, NZe, S), jnp.float32)

    def prog(nt):
        @jax.jit
        def f(c2_, uyl_, uyh_, uzl_, uzh_, zS_):
            def body(carry, _):
                pp, p, phl, psl, phh, psh = carry
                pn, phl2, psl2, phh2, psh2 = merged(
                    pp, p, c2_, phl, psl, phh, psh,
                    axl, bxl, axh, bxh, uyl_, uyh_, uzl_, uzh_,
                )
                return (p, pn, phl2, psl2, phh2, psh2), None

            z = jnp.zeros_like(c2_)
            p0 = z.at[NY // 2, NZ // 2, NX // 2].set(1.0)
            (_, p, *_), _ = lax.scan(
                body, (z, p0, zS_, zS_, zS_, zS_), None, length=nt
            )
            return jnp.sum(p * p)

        return lambda c2_: f(c2_, uyl, uyh, uzl, uzh, zS)

    per = slope(prog, c2)
    print(f"merged-only by={by} bz={bz}: {per*1e3:.2f} ms/step", flush=True)


def run_corr_only(by, bz, bz_y):
    NYe, NZe = y_extended(grid, by), z_extended(grid, bz)
    c2 = extend_yz(jnp.asarray((vp * dt) ** 2), grid, by=by, bz=bz)
    pr = profs3(grid)
    cy = {s: make_corr3d_y(grid, s, bz_y, NZe, by) for s in (0, 1)}
    cz = {s: make_corr3d_z(grid, s, by, NYe) for s in (0, 1)}
    offs = {0: (0, NY - W), 1: (0, NZ - W)}

    def prog(nt):
        @jax.jit
        def f(c2_):
            zsl = {
                0: jnp.zeros((S, NZe, NX), jnp.float32),
                1: jnp.zeros((NYe, S, NX), jnp.float32),
            }

            def body(carry, _):
                st, acc = carry
                st2 = []
                tot = acc
                k = 0
                for ax, corr in ((0, cy), (1, cz)):
                    for side in (0, 1):
                        a, b = pr[ax][side]
                        psl = lax.slice_in_dim(
                            c2_, offs[ax][side], offs[ax][side] + W, axis=ax
                        )
                        upd, phi2, psi2 = corr[side](
                            psl, st[k], st[k + 1], a, b, psl
                        )
                        st2 += [phi2, psi2]
                        tot = tot + jnp.sum(upd)
                        k += 2
                return (tuple(st2), tot), None

            st0 = (zsl[0], zsl[0], zsl[0], zsl[0],
                   zsl[1], zsl[1], zsl[1], zsl[1])
            (_, tot), _ = lax.scan(body, (st0, 0.0), None, length=nt)
            return tot

        return f

    per = slope(prog, c2)
    print(f"corr-only by={by}: {per*1e3:.2f} ms/step", flush=True)


def run_full(by, bz):
    c2 = extend_yz(jnp.asarray((vp * dt) ** 2), grid, by=by, bz=bz)
    step2, zs = make_acoustic3d_fused_step2(grid, dt, f0, c_max, by=by, bz=bz)

    def prog(nt):
        @jax.jit
        def f(c2_):
            def body(s, _):
                return step2(s, c2_), None

            s0 = zs()
            s0 = (s0[0], s0[1].at[NY // 2, NZ // 2, NX // 2].set(1.0), s0[2])
            (_, p, _), _ = lax.scan(body, s0, None, length=nt)
            return jnp.sum(p * p)

        return f

    per = slope(prog, c2)
    cells = y_extended(grid, by) * z_extended(grid, bz) * NX
    print(f"full2 by={by} bz={bz}: {per*1e3:.2f} ms/step = "
          f"{cells/per/1e9:.1f} Gcu/s", flush=True)


if __name__ == "__main__":
    run_merged_only(16, 64)
    run_corr_only(16, 64, 16)
    run_full(24, 64)
