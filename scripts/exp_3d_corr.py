"""Where do the corr-slab 5 ms/step go? (fused2 3D step attribution)

runs/tpu_queue2/attrib_3d.log: merged kernel 14.6 ms/step, +5.0 ms for
the 4 CPML corr slab kernels. But the corr kernels' own VMEM/HBM traffic
is worth well under 1 ms — the suspects are the XLA face slices of p
(``lax.slice_in_dim`` materializes a copy; the z-face slice is a strided
middle-axis copy of ~94 MB) that feed them. This isolates:

  a. slices-only: the 4 face slices of a scan-carried p, summed
  b. kernels-only: the 4 corr kernels fed loop-invariant pre-sliced slabs
  c. slices+kernels (the real composition, as in the step)

Run: python scripts/exp_3d_corr.py   (one TPU process at a time)
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

from tpufwi.cpml import CpmlProfile
from tpufwi.grid import Grid
from tpufwi.kernels.acoustic3d_fused2 import make_corr3d_y, make_corr3d_z
from tpufwi.kernels.acoustic3d_pallas import extend_yz, y_extended, z_extended

ny, nz, nx = 801, 187, 801
pml, order = 20, 8
grid = Grid(shape=(ny, nz, nx), h=(25.0,) * 3, pml=pml, order=order)
c_max, f0 = 6000.0, 8.0
dt = grid.cfl_dt(c_max, safety=0.7)
NY, NZ, NX = grid.padded_shape
r = grid.radius
S = grid.pml + r
W = S + 2 * r
by, bz, bz_y = 16, 64, 16
NYe, NZe = y_extended(grid, by), z_extended(grid, bz)
offs = {0: (0, NY - W), 1: (0, NZ - W)}
rng = np.random.default_rng(0)
vp = (3000.0 + 100.0 * rng.standard_normal((NY, NZ, NX))).astype(np.float32)
c2 = extend_yz(jnp.asarray((vp * dt) ** 2), grid, by=by, bz=bz)


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


def profs3():
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


def retrying(fn, name):
    for attempt in range(3):
        try:
            fn()
            return
        except Exception as e:  # noqa: BLE001
            if "remote_compile: HTTP 500" in repr(e) and attempt < 2:
                print(f"{name}: transient 500, retrying", flush=True)
                continue
            print(f"{name}: FAILED {repr(e)[:200]}", flush=True)
            return


def run_slices_only():
    def prog(nt):
        @jax.jit
        def f(c2_):
            def body(p, _):
                tot = 0.0
                for ax in (0, 1):
                    for side in (0, 1):
                        sl = lax.slice_in_dim(
                            p, offs[ax][side], offs[ax][side] + W, axis=ax
                        )
                        tot = tot + jnp.sum(sl)
                # feed tot back so the slices can't be hoisted/elided;
                # 1-element in-place DUS on the carry stays cheap
                return p.at[0, 0, 0].add(1e-30 * tot), None

            p0, _ = lax.scan(body, c2_, None, length=nt)
            return jnp.sum(p0[0, 0])

        return f

    per = slope(prog, c2)
    print(f"slices-only   : {per*1e3:8.2f} ms/step", flush=True)


def run_kernels_only():
    pr = profs3()
    cy = {s: make_corr3d_y(grid, s, bz_y, NZe, by) for s in (0, 1)}
    cz = {s: make_corr3d_z(grid, s, by, NYe) for s in (0, 1)}
    slabs = {
        (0, 0): c2[:W], (0, 1): c2[NY - W : NY],
        (1, 0): c2[:, :W], (1, 1): c2[:, NZ - W : NZ],
    }

    def prog(nt):
        @jax.jit
        def f(c2_):
            st0 = []
            for ax in (0, 1):
                shp = (S, NZe, NX) if ax == 0 else (NYe, S, NX)
                for _ in range(4):
                    st0.append(jnp.zeros(shp, jnp.float32))

            def body(carry, _):
                st, acc = carry
                st2, tot, k = [], acc, 0
                for ax, corr in ((0, cy), (1, cz)):
                    for side in (0, 1):
                        a, b = pr[ax][side]
                        # loop-invariant slabs are fine: the carried
                        # phi/psi force the kernels to run every step
                        sl = slabs[(ax, side)]
                        upd, phi2, psi2 = corr[side](
                            sl, st[k], st[k + 1], a, b, sl
                        )
                        st2 += [phi2, psi2]
                        tot = tot + jnp.sum(upd[0, 0])
                        k += 2
                return (tuple(st2), tot), None

            (_, tot), _ = lax.scan(body, (tuple(st0), 0.0), None, length=nt)
            return tot

        return f

    per = slope(prog, c2)
    print(f"kernels-only  : {per*1e3:8.2f} ms/step", flush=True)


def run_both():
    pr = profs3()
    cy = {s: make_corr3d_y(grid, s, bz_y, NZe, by) for s in (0, 1)}
    cz = {s: make_corr3d_z(grid, s, by, NYe) for s in (0, 1)}

    def prog(nt):
        @jax.jit
        def f(c2_):
            st0 = []
            for ax in (0, 1):
                shp = (S, NZe, NX) if ax == 0 else (NYe, S, NX)
                for _ in range(4):
                    st0.append(jnp.zeros(shp, jnp.float32))

            def body(carry, _):
                p, st, acc = carry
                st2, tot, k = [], acc, 0
                for ax, corr in ((0, cy), (1, cz)):
                    for side in (0, 1):
                        a, b = pr[ax][side]
                        sl = lax.slice_in_dim(
                            p, offs[ax][side], offs[ax][side] + W, axis=ax
                        )
                        upd, phi2, psi2 = corr[side](
                            sl, st[k], st[k + 1], a, b, sl
                        )
                        st2 += [phi2, psi2]
                        tot = tot + jnp.sum(upd[0, 0])
                        k += 2
                return (p.at[0, 0, 0].add(1e-30 * tot), tuple(st2), tot), None

            (_, _, tot), _ = lax.scan(
                body, (c2_, tuple(st0), 0.0), None, length=nt
            )
            return tot

        return f

    per = slope(prog, c2)
    print(f"slices+kernels: {per*1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    retrying(run_slices_only, "slices-only")
    retrying(run_kernels_only, "kernels-only")
    retrying(run_both, "slices+kernels")
    print("done", flush=True)
