"""Hardware parity check for the fold_z merged kernel.

The fold_z design relies on Mosaic's revisit rule: the phi_z/psi_z out
buffers are written ONLY on the face z-row of blocks and their sticky
index maps pin elsewhere; the buffer content must survive the pinned
invocations untouched. Interpret mode models index maps but not buffer
rotation, so this must be checked compiled on the real TPU.

Compares 30 steps of make_acoustic3d_fused_step2 with fold_z=True vs
fold_z=False (the corr-slab path, already hardware-proven) on a small
production-shaped grid (bz=64, pml=20, order 8).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax.numpy as jnp
import numpy as np

from tpufwi.grid import Grid
from tpufwi.kernels.acoustic3d_fused2 import (
    can_fold_z,
    make_acoustic3d_fused_step2,
)
from tpufwi.kernels.acoustic3d_pallas import crop_yz, extend_yz


def main():
    grid = Grid(shape=(64, 112, 128), h=(25.0,) * 3, pml=20, order=8)
    assert can_fold_z(grid, 64), "grid must satisfy the fold_z conditions"
    c_max, f0 = 3000.0, 8.0
    dt = grid.cfl_dt(c_max, safety=0.6)
    rng = np.random.default_rng(3)
    NY, NZ, NX = grid.padded_shape
    vp = 2500.0 + 200 * rng.standard_normal((NY, NZ, NX)).astype(np.float32)
    c2 = extend_yz(jnp.asarray(((vp * dt) ** 2).astype(np.float32)),
                   grid, by=16, bz=64)
    imp = jnp.zeros(grid.padded_shape, jnp.float32).at[
        NY // 2, NZ // 2, NX // 2].set(1.0)

    outs = {}
    for fold in (False, True):
        step, zs = make_acoustic3d_fused_step2(
            grid, dt, f0, c_max, by=16, bz=64, bz_y=16, fold_z=fold)
        s = zs()
        s = (s[0], extend_yz(imp, grid, by=16, bz=64), s[2])

        @jax.jit
        def run(s, c2, step=step):
            def body(st, _):
                return step(st, c2), None
            st, _ = jax.lax.scan(body, s, None, length=30)
            return st[1]

        outs[fold] = np.asarray(crop_yz(run(s, c2), grid))
        print(f"fold_z={fold}: |p|max = {np.abs(outs[fold]).max():.6e}",
              flush=True)
    err = np.abs(outs[True] - outs[False]).max() / np.abs(outs[False]).max()
    print(f"fold_z hardware parity: rel err {err:.3e}", flush=True)
    assert err < 1e-6, "fold_z != slab path on hardware"
    print("FOLD_Z HW PARITY OK", flush=True)


if __name__ == "__main__":
    main()
