#!/usr/bin/env python
"""Hardware probe: free-surface whole-scan elastic engine (round 5).

Interpret mode cannot catch Mosaic layout constraints (four rounds of
history; see pallas_util.check_dma_tiling) — this compiles and runs the
free-surface forward AND value+grad on the real TPU at a small grid and
prints per-step timings. Exits nonzero on compile failure or non-finite
outputs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import jax.numpy as jnp
    import numpy as np

    from tpufwi import Geometry, Grid
    from tpufwi.propagators.elastic2d import (
        ElasticPropagator,
        elastic_cfl_dt,
    )
    from tpufwi.wavelets import ricker

    nz, nx, f0, nt = 96, 512, 12.0, 256
    rng = np.random.default_rng(0)
    vp = np.clip(2300 + 150 * rng.standard_normal((nz, nx)), 2000, 2600)
    vs, rho = vp / 1.8, 1000.0 + 0.3 * vp
    grid = Grid(shape=(nz, nx), h=(10.0, 10.0), pml=14, order=4,
                free_surface=True)
    dt = elastic_cfl_dt(grid.h, float(vp.max()), 4, safety=0.7)
    w = jnp.asarray(ricker(f0, dt, nt), jnp.float32)
    rx = np.arange(8, nx - 8, 4)
    geom = Geometry.from_physical(
        grid, np.array([[4, nx // 2]]),
        np.stack([np.full_like(rx, 3), rx], 1),
    )
    prop = ElasticPropagator(grid, dt, f0, float(vp.max()))
    impl = prop.resolve_impl(geom, nt=nt)
    print(f"free-surface grid, impl='auto' -> {impl} ({prop.resolve_note})",
          flush=True)
    assert impl == "pallas_scan", impl
    vpj, vsj, rhoj = (jnp.asarray(a, jnp.float32) for a in (vp, vs, rho))

    fwd = jax.jit(lambda a, b, c: prop(a, b, c, geom, w))
    t0 = time.time()
    d = fwd(vpj, vsj, rhoj)
    s0 = float(jnp.sum(d * d))  # scalar fetch = relay timing barrier
    print(f"forward compiled+ran in {time.time()-t0:.1f} s, "
          f"sum(d^2)={s0:.4e}", flush=True)
    assert np.isfinite(s0) and s0 > 0

    loss = lambda a, b, c: 0.5 * jnp.sum((prop(a, b, c, geom, w)
                                          - 0.9 * d) ** 2)  # noqa: E731
    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    t0 = time.time()
    J, g = vg(vpj, vsj, rhoj)
    J = float(J)
    gs = [float(jnp.abs(x).max()) for x in g]
    print(f"value+grad compiled+ran in {time.time()-t0:.1f} s, "
          f"J={J:.4e}, grad max {gs}", flush=True)
    assert np.isfinite(J) and all(np.isfinite(x) and x > 0 for x in gs)
    # timed reps (warm)
    for _ in range(2):
        t0 = time.time()
        J2, _ = vg(vpj * (1 + 1e-4 * np.float32(rng.random())), vsj, rhoj)
        float(J2)
        print(f"warm value+grad: {time.time()-t0:.3f} s", flush=True)
    print("FREE-SURFACE TPU PROBE OK", flush=True)


if __name__ == "__main__":
    main()
