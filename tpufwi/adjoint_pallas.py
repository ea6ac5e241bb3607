"""Boundary-saving adjoint engine on the fused Pallas kernels (TPU fast path).

Same contract and same math as tpufwi/adjoint.py (exact discrete transpose,
ring-tape reconstruction, gradient masked to the valid interior), but every
full-grid operation is a fused Mosaic kernel:

  forward:  acoustic2d_pallas.make_fused_forward_step   (one call/step)
  backward: acoustic2d_pallas.make_leapfrog_kernel      (reconstruction+Lap)
            acoustic2d_pallas_bwd.make_fused_adjoint_step (transpose+imaging)

Scatter/gather (source, receivers, ring tape) stay in XLA — they are
O(nrec)/O(perimeter) ops. fp32 only (TPU compute dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .grid import Grid
from .kernels.acoustic2d_pallas import (
    StripState,
    make_fused_forward_step,
    strip_profiles,
    zero_strip_state,
)
from .kernels.acoustic2d_pallas_bwd import make_fused_adjoint_step, make_recon_kernel
from .propagators.boundary import RingSpec


def _int_cotangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def make_simulator_pallas(
    grid: Grid, dt: float, f0: float, c_max: float, interpret: bool = False
):
    """simulate(c2dt2, wavelet, src_idx, rcv_idx) -> seis with the fused
    custom VJP. Drop-in for adjoint.make_simulator (fp32)."""
    step = make_fused_forward_step(grid, interpret=interpret)
    recon = make_recon_kernel(grid, interpret=interpret)
    step_T = make_fused_adjoint_step(grid, interpret=interpret)
    profiles = strip_profiles(grid, dt, c_max, f0)
    rings = RingSpec.build(grid)
    S = profiles[0].shape[1]
    NZ, NX = grid.padded_shape

    def _coords(idx):
        return tuple(idx[..., d] for d in range(2))

    def _fwd_scan(c2dt2, wavelet, src, rcv, with_tape: bool):
        def body(s, w_t):
            s = step(s, c2dt2, profiles)
            p = s.p.at[src].add(c2dt2[src] * w_t, mode="drop")
            s = s._replace(p=p)
            ys = (p[rcv], rings.extract(p)) if with_tape else p[rcv]
            return s, ys

        return lax.scan(body, zero_strip_state(grid, c2dt2.dtype), wavelet)

    @jax.custom_vjp
    def simulate(c2dt2, wavelet, src_idx, rcv_idx):
        _, seis = _fwd_scan(c2dt2, wavelet, _coords(src_idx), _coords(rcv_idx), False)
        return seis

    def simulate_fwd(c2dt2, wavelet, src_idx, rcv_idx):
        final, (seis, tape) = _fwd_scan(
            c2dt2, wavelet, _coords(src_idx), _coords(rcv_idx), True
        )
        res = (c2dt2, wavelet, src_idx, rcv_idx, tape, final.p_prev, final.p)
        return seis, res

    def simulate_bwd(res, seis_bar):
        c2dt2, wavelet, src_idx, rcv_idx, tape, p_last_prev, p_last = res
        src = _coords(src_idx)
        rcv = _coords(rcv_idx)
        dtype = c2dt2.dtype

        def shift2(T):
            z = jnp.zeros((2,) + T.shape[1:], T.dtype)
            return jnp.concatenate([z, T[:-2]], axis=0)

        tape_tm1 = jax.tree.map(shift2, tape)

        # source cells inside the re-imposed ring are overwritten by the
        # tape; their scatter must be dropped (exactness for shallow shots)
        valid = rings.valid
        src_in_valid = jnp.ones((), bool)
        for d in range(2):
            src_in_valid = (
                src_in_valid
                & (src_idx[..., d] >= valid[d].start)
                & (src_idx[..., d] < valid[d].stop)
            )
        src_amp_mask = src_in_valid.astype(c2dt2.dtype)

        def body(carry, xs):
            q_pm, q_p, strips, gbar, p_t, p_tp1 = carry
            ring_tm1, w_t, ybar_t = xs
            # receiver cotangent scatter -> lambda
            q_p_eff = q_p.at[rcv].add(ybar_t, mode="drop")
            # source-term cotangents (exact, incl. the C w delta term)
            wbar_t = jnp.sum(c2dt2[src] * q_p_eff[src])
            gbar = gbar.at[src].add(q_p_eff[src] * w_t, mode="drop")
            # reverse reconstruction + ring imposition + Lap(p_t), fused
            p_tm1, lapw = recon(p_tp1, p_t, c2dt2, *ring_tm1)
            p_tm1 = p_tm1.at[src].add(
                src_amp_mask * c2dt2[src] * w_t, mode="drop"
            )
            # fused transposed step + imaging accumulation
            q_pm_n, q_p_n, gbar_n, pbz, psz, pbx, psx = step_T(
                q_pm, q_p_eff, c2dt2, lapw, gbar, strips, profiles
            )
            return (q_pm_n, q_p_n, (pbz, psz, pbx, psx), gbar_n, p_tm1, p_t), wbar_t

        z2 = jnp.zeros((NZ, NX), dtype)
        strips0 = (
            jnp.zeros((2, S, NX), dtype),
            jnp.zeros((2, S, NX), dtype),
            jnp.zeros((2, NZ, S), dtype),
            jnp.zeros((2, NZ, S), dtype),
        )
        carry0 = (z2, z2, strips0, jnp.zeros((NZ, NX), dtype), p_last_prev, p_last)
        xs = (tape_tm1, wavelet, seis_bar)
        (q_pm, q_p, _, gbar, _, _), wbar = lax.scan(body, carry0, xs, reverse=True)
        gbar = rings.mask_valid(gbar)
        return gbar, wbar, _int_cotangent(src_idx), _int_cotangent(rcv_idx)

    simulate.defvjp(simulate_fwd, simulate_bwd)
    return simulate
