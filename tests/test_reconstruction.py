"""Boundary-saving reverse reconstruction == stored forward wavefield
(SURVEY.md §4.6) on the valid region, to float roundoff."""

import jax.numpy as jnp
import numpy as np
from jax import lax

from tpufwi import Grid
from tpufwi.adjoint import make_simulator  # noqa: F401  (import sanity)
from tpufwi.cpml import build_profiles
from tpufwi.kernels.acoustic2d_jnp import (
    AcousticParams,
    make_acoustic_step,
    make_reverse_reconstruct_step,
    zero_state,
)
from tpufwi.propagators.boundary import RingSpec
from tpufwi.wavelets import ricker_np


def test_reconstruction_exact_in_valid_region():
    dtype = jnp.float64
    grid = Grid(shape=(48, 60), h=(10.0, 10.0), pml=10, order=4)
    c_max, f0, nt = 2400.0, 14.0, 200
    dt = grid.cfl_dt(c_max, safety=0.7)
    rng = np.random.default_rng(0)
    vp = np.clip(2000 + 200 * rng.standard_normal(grid.shape), 1700, 2400)
    pad = grid.pad
    c2dt2 = jnp.asarray((np.pad(vp, pad, mode="edge") * dt) ** 2, dtype)

    profs = build_profiles(grid, dt, c_max, f0, dtype=np.float64)
    params = AcousticParams(
        c2dt2=c2dt2,
        a=tuple(jnp.asarray(p[0], dtype) for p in profs),
        b=tuple(jnp.asarray(p[1], dtype) for p in profs),
        src_idx=jnp.array([[pad + 24, pad + 30]]),
        rcv_idx=jnp.array([[pad + 5, pad + 5]]),
    )
    w = jnp.asarray(ricker_np(f0, dt, nt), dtype)
    step = make_acoustic_step(grid)
    recon = make_reverse_reconstruct_step(grid)
    rings = RingSpec.build(grid)

    def body(s, w_t):
        s, _ = step(s, params, w_t)
        return s, (s.p, rings.extract(s.p))

    final, (ps, tape) = lax.scan(body, zero_state(grid.padded_shape, 2, dtype), w)
    ps = np.asarray(ps)  # ps[t] = p_{t+1}

    # reverse reconstruction from the final two slices
    p_t, p_tp1 = final.p_prev, final.p  # p_{nt-1}, p_nt
    valid = rings.valid
    sl = np.s_[valid[0], valid[1]]
    for t in range(nt - 1, 0, -1):
        p_tm1 = recon(p_t, p_tp1, c2dt2, params.src_idx, w[t])
        ring_tm1 = tuple(T[t - 2] for T in tape) if t >= 2 else None
        if ring_tm1 is not None:
            p_tm1 = rings.impose(p_tm1, ring_tm1)
        # p_{t-1} reconstructed; compare on valid region (t-1 >= 1 -> ps[t-2])
        if t - 1 >= 1:
            ref = ps[t - 2]
            got = np.asarray(p_tm1)
            # normalize by the global wavefield amplitude: the roundoff
            # drift is absolute (~eps * amplitude per reverse step), while
            # early-time frames are nearly quiescent.
            scale = np.abs(ps).max()
            err = np.abs(got[sl] - ref[sl]).max() / scale
            assert err < 1e-10, f"t={t-1}: reconstruction err {err:.3e}"
        p_t, p_tp1 = p_tm1, p_t
