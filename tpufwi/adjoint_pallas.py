"""Boundary-saving adjoint engine on the fused Pallas kernels (TPU fast path).

Same contract and same math as tpufwi/adjoint.py (exact discrete transpose,
ring-tape reconstruction, gradient masked to the valid interior), but every
full-grid operation is a fused Mosaic kernel riding the extended
padded-carry layout (acoustic2d_pallas.PZ/PX aligned zero borders,
persisted through buffer aliasing):

  forward:  acoustic2d_pallas.make_fused_forward_step   (one call/step)
  backward: acoustic2d_pallas_bwd.make_recon_kernel     (reconstruction +
            ring imposition + Lap(p_t))
            acoustic2d_pallas_bwd.make_fused_adjoint_step (transpose +
            receiver MXU injection + imaging)

Scatter/gather that remains in XLA is O(nsrc) only. fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .grid import Grid
from .kernels.acoustic2d_pallas import (
    PX,
    PZ,
    make_fused_forward_step,
    strip_profiles,
    to_ext,
    zero_strip_state,
)
from .kernels.acoustic2d_pallas_bwd import (
    make_fused_adjoint_step,
    make_fused_reverse_step,
    make_recon_kernel,
)
from .propagators.boundary import RingSpec


def _int_cotangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def make_simulator_pallas(
    grid: Grid, dt: float, f0: float, c_max: float, interpret: bool = False
):
    """simulate(c2dt2, wavelet, src_idx, rcv_idx) -> seis with the fused
    custom VJP. Drop-in for adjoint.make_simulator (fp32); takes grid-padded
    (NZ, NX) inputs — the extended carry layout is internal."""
    _step_cache = {}
    _recon_cache = {}
    _step_T_cache = {}
    _rev_cache = {}

    def _rev_for(nsrc, nrec):
        if (nsrc, nrec) not in _rev_cache:
            _rev_cache[(nsrc, nrec)] = make_fused_reverse_step(
                grid, nsrc=nsrc, nrec=nrec, interpret=interpret
            )
        return _rev_cache[(nsrc, nrec)]

    def _step_for(nsrc, with_tape=False):
        key = (nsrc, with_tape)
        if key not in _step_cache:
            _step_cache[key] = make_fused_forward_step(
                grid, interpret=interpret, nsrc=nsrc, with_tape=with_tape
            )
        return _step_cache[key]

    def _recon_for(nsrc):
        if nsrc not in _recon_cache:
            _recon_cache[nsrc] = make_recon_kernel(
                grid, interpret=interpret, nsrc=nsrc
            )
        return _recon_cache[nsrc]

    def _step_T_for(nrec):
        if nrec not in _step_T_cache:
            _step_T_cache[nrec] = make_fused_adjoint_step(
                grid, interpret=interpret, nrec=nrec
            )
        return _step_T_cache[nrec]

    profiles = strip_profiles(grid, dt, c_max, f0)
    rings = RingSpec.build(grid)
    S = profiles[0].shape[1]
    NZ, NX = grid.padded_shape
    # ring slab positions within the extended layout
    ext_slices = tuple(
        (
            slice(sl[0].start + PZ, sl[0].stop + PZ),
            slice(sl[1].start + PX, sl[1].stop + PX),
        )
        for sl in rings.slices
    )

    def _coords(idx):
        return (idx[..., 0] + PZ, idx[..., 1] + PX)

    def _src_vectors(src_idx):
        nsrc = src_idx.shape[-2]
        sz = src_idx[..., 0].reshape(1, nsrc).astype(jnp.int32)
        sx = src_idx[..., 1].reshape(1, nsrc).astype(jnp.int32)
        return nsrc, sz, sx

    def _fwd_scan(c2e, c2dt2, wavelet, src_idx, rcv, with_tape: bool):
        nsrc, sz, sx = _src_vectors(src_idx)
        step = _step_for(nsrc, with_tape)
        srcp = (src_idx[..., 0], src_idx[..., 1])
        c2src = c2dt2[srcp].reshape(1, nsrc)

        def body(s, w_t):
            # source injection AND (when taping) boundary-ring extraction
            # happen inside the fused kernel — XLA scatters/slab gathers
            # around it cost full-carry copies per step
            if with_tape:
                s, rings_t = step(s, c2e, profiles, sz, sx, c2src * w_t)
                return s, (s.p[rcv], rings_t)
            s = step(s, c2e, profiles, sz, sx, c2src * w_t)
            return s, s.p[rcv]

        return lax.scan(body, zero_strip_state(grid, c2e.dtype), wavelet)

    @jax.custom_vjp
    def simulate(c2dt2, wavelet, src_idx, rcv_idx):
        _, seis = _fwd_scan(
            to_ext(c2dt2, "edge"), c2dt2, wavelet, src_idx, _coords(rcv_idx), False
        )
        return seis

    def simulate_fwd(c2dt2, wavelet, src_idx, rcv_idx):
        final, (seis, tape) = _fwd_scan(
            to_ext(c2dt2, "edge"), c2dt2, wavelet, src_idx, _coords(rcv_idx), True
        )
        res = (c2dt2, wavelet, src_idx, rcv_idx, tape, final.p_prev, final.p)
        return seis, res

    def simulate_bwd(res, seis_bar):
        c2dt2, wavelet, src_idx, rcv_idx, tape, p_last_prev, p_last = res
        # the backward pass runs entirely in the plain (NZ, NX) layout: the
        # extended carry pays off only in the forward scan (the transposed
        # step fills a padded u-scratch anyway, and the reconstruction's
        # scratch fill is cheaper than the +19% array churn)
        from .kernels.acoustic2d_pallas import from_ext

        p_last_prev = from_ext(p_last_prev, grid)
        p_last = from_ext(p_last, grid)
        srcp = (src_idx[..., 0], src_idx[..., 1])
        dtype = c2dt2.dtype

        # Receiver-cotangent injection fused into the transposed-step
        # kernel as an MXU one-hot matmul; the one-hot factors are built
        # in-kernel from these raw index vectors (acoustic2d_pallas_bwd).
        nrec = rcv_idx.shape[-2]
        rz = rcv_idx[..., 0].reshape(1, nrec).astype(jnp.int32)
        rx = rcv_idx[..., 1].reshape(nrec, 1).astype(jnp.int32)

        def shift2(T):
            z = jnp.zeros((2,) + T.shape[1:], T.dtype)
            return jnp.concatenate([z, T[:-2]], axis=0)

        tape_tm1 = jax.tree.map(shift2, tape)

        nsrc, sz, sx = _src_vectors(src_idx)
        recon = _recon_for(nsrc)
        step_T = _step_T_for(nrec)

        # lambda at the source cells (wbar/gbar source terms) without
        # materializing the dense injection: per-source selector over ybar
        sel = jnp.zeros((nrec, src_idx.shape[-2]), dtype)
        sel = jnp.where(
            (rcv_idx[..., 0][:, None] == src_idx[..., 0][None, :])
            & (rcv_idx[..., 1][:, None] == src_idx[..., 1][None, :]),
            jnp.ones((), dtype),
            sel,
        )

        def body(carry, xs):
            q_pm, q_p, strips, gbar, p_t, p_tp1 = carry
            ring_tm1, w_t, ybar_t = xs
            lam_src = q_p[srcp] + ybar_t @ sel
            wbar_t = jnp.sum(c2dt2[srcp] * lam_src)
            gsrc_t = lam_src * w_t
            # reverse reconstruction + in-kernel source + ring imposition
            # + Lap(p_t), fused (rings win over in-ring sources: shallow
            # shots stay exact with no masking); then the transposed step
            # with receiver MXU injection and imaging. Two kernels pipeline
            # better than the merged variant (make_fused_reverse_step):
            # measured 108 vs 121 us/step — the merged kernel's ~35 MB of
            # live VMEM defeats input-DMA/compute overlap across steps.
            p_tm1, lapw = recon(
                p_tp1, p_t, c2dt2, sz, sx,
                (c2dt2[srcp] * w_t).reshape(1, nsrc), *ring_tm1
            )
            q_pm_n, q_p_n, gbar_n, pbz, psz, pbx, psx = step_T(
                q_pm, q_p, c2dt2, lapw, gbar, strips, profiles,
                rz, rx, ybar_t.reshape(nrec, 1),
            )
            return (
                (q_pm_n, q_p_n, (pbz, psz, pbx, psx), gbar_n, p_tm1, p_t),
                (wbar_t, gsrc_t),
            )

        z2 = jnp.zeros((NZ, NX), dtype)
        strips0 = (
            jnp.zeros((2, S, NX), dtype),
            jnp.zeros((2, S, NX), dtype),
            jnp.zeros((2, NZ, S), dtype),
            jnp.zeros((2, NZ, S), dtype),
        )
        carry0 = (z2, z2, strips0, jnp.zeros((NZ, NX), dtype), p_last_prev, p_last)
        xs = (tape_tm1, wavelet, seis_bar)
        (q_pm, q_p, _, gbar, _, _), (wbar, gsrc) = lax.scan(
            body, carry0, xs, reverse=True
        )
        gbar = gbar.at[
            (src_idx[..., 0], src_idx[..., 1])
        ].add(jnp.sum(gsrc, axis=0), mode="drop")
        gbar = rings.mask_valid(gbar)
        return gbar, wbar, _int_cotangent(src_idx), _int_cotangent(rcv_idx)

    simulate.defvjp(simulate_fwd, simulate_bwd)
    return simulate
