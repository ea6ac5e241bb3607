"""Boundary-saving adjoint engine on the whole-scan-resident kernels.

Same contract and math as adjoint_pallas / adjoint_pallas_kstep, but the
entire forward time loop is ONE pallas_call and the entire reverse pass is
ONE pallas_call (kernels/acoustic2d_pallas_scanres.py): the wavefield
state never leaves VMEM, per-step HBM traffic is the boundary-ring tape
only, and the forward kernel emits the tape already time-shifted for the
reverse recursion. Receiver-row-window contract identical to the K-step
engine. fp32, 2D.

Two tape modes:

- ``tape_mode="rings"`` (default): O(nt * perimeter * radius) boundary
  tape; the reverse pass re-runs the forward recursion backwards to
  reconstruct the source wavefield (3 propagation sweeps total).
- ``tape_mode="snap"``: the forward streams its interior leapfrog
  laplacian out as bf16 every sub-step (nt * NZ * NX * 2 bytes of HBM —
  6.6 GB at the official bench config) and the reverse needs NO
  reconstruction: 2 propagation sweeps total. Gradient identity holds up
  to the bf16 tape rounding (measured at the 1e-4..1e-3 level;
  tests/test_scanres.py pins it against the rings gradient).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid
from .kernels.acoustic2d_pallas import from_ext, strip_profiles, to_ext
from .kernels.acoustic2d_pallas_scanres import (
    CH,
    make_scanres_forward,
    make_scanres_reverse,
    make_scanres_reverse_snap,
)
from .propagators.boundary import RingSpec


def _int_cotangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def make_simulator_pallas_scanres(
    grid: Grid, dt: float, f0: float, c_max: float,
    rcv_rows: int = 16, interpret: bool = False,
    tape_mode: str = "rings",
):
    """simulate(c2dt2, wavelet, src_idx, rcv_idx) -> seis with the
    whole-scan custom VJP. Drop-in for make_simulator_pallas (fp32, 2D);
    indices are grid-padded. Kernels are cached per (nt, nsrc, nrec).
    ``tape_mode``: see module docstring."""
    if tape_mode not in ("rings", "snap"):
        raise ValueError(f"unknown tape_mode {tape_mode!r}")
    snap = tape_mode == "snap"
    profiles = strip_profiles(grid, dt, c_max, f0)
    rings = RingSpec.build(grid)
    NZ, NX = grid.padded_shape
    RH = rcv_rows
    _fwd_cache = {}
    _rev_cache = {}

    def _fwd_for(ntp, nsrc, nrec, with_tape):
        key = (ntp, nsrc, nrec, with_tape)
        if key not in _fwd_cache:
            _fwd_cache[key] = make_scanres_forward(
                grid, nt=ntp, nsrc=nsrc, nrec=nrec, rcv_rows=RH,
                with_tape=with_tape and not snap,
                snap_tape=with_tape and snap, interpret=interpret,
            )
        return _fwd_cache[key]

    def _rev_for(ntp, nsrc, nrec):
        key = (ntp, nsrc, nrec)
        if key not in _rev_cache:
            mk = make_scanres_reverse_snap if snap else make_scanres_reverse
            _rev_cache[key] = mk(
                grid, nt=ntp, nsrc=nsrc, nrec=nrec, rcv_rows=RH,
                interpret=interpret,
            )
        return _rev_cache[key]

    def _geom(c2dt2, src_idx, rcv_idx):
        nsrc = src_idx.shape[-2]
        nrec = rcv_idx.shape[-2]
        sz = src_idx[..., 0].reshape(nsrc).astype(jnp.int32)
        sx = src_idx[..., 1].reshape(nsrc).astype(jnp.int32)
        c2src = c2dt2[(src_idx[..., 0], src_idx[..., 1])].reshape(nsrc)
        rz = rcv_idx[..., 0].astype(jnp.int32)
        rx = rcv_idx[..., 1].astype(jnp.int32)
        try:  # eager check when the geometry is concrete at trace time
            lo = (int(jnp.min(rz)) // 8) * 8
            spread = int(jnp.max(rz)) - lo + 1
        except jax.errors.ConcretizationTypeError:
            spread = None  # traced geometry: NaN poisoning covers misuse
        if spread is not None and spread > RH:
            raise ValueError(
                f"receiver rows span {spread} from the 8-aligned slab "
                f"start > rcv_rows={RH}; raise rcv_rows or use the "
                "single-step pallas engine"
            )
        r0 = jnp.clip(
            (jnp.min(rz) // 8) * 8, 0, ((NZ - RH) // 8) * 8
        ).astype(jnp.int32)
        rzr = rz - r0
        valid = (rzr >= 0) & (rzr < RH)
        return (
            nsrc, nrec, sz, sx, c2src,
            rx.reshape(1, nrec),
            jnp.clip(rzr, 0, RH - 1).reshape(1, nrec),
            r0.reshape(1), valid,
        )

    def _run_fwd(c2dt2, wavelet, src_idx, rcv_idx, with_tape):
        nt = wavelet.shape[0]
        ntp = -(-nt // CH) * CH
        w_pad = jnp.pad(wavelet, (0, ntp - nt))
        (nsrc, nrec, sz, sx, c2src, rxr, rzr, r0, valid) = _geom(
            c2dt2, src_idx, rcv_idx
        )
        fwd = _fwd_for(ntp, nsrc, nrec, with_tape)
        az, bz, ax, bx = profiles
        outs = fwd(
            to_ext(c2dt2, "edge"), az, bz, ax, bx,
            w_pad, c2src, sz, sx, rxr, rzr, r0,
        )
        seis3 = outs[0]  # (nC, CH, nrec): chunk-streamed
        tape = outs[1:-2] if with_tape else None
        ppen, plast = outs[-2], outs[-1]
        seis = seis3.reshape(ntp, nrec)[:nt]
        # out-of-window receivers poison their traces (see kstep docstring)
        seis = jnp.where(valid[None, :], seis, jnp.float32(jnp.nan))
        return seis, tape, ppen, plast, w_pad, c2src, ntp

    @jax.custom_vjp
    def simulate(c2dt2, wavelet, src_idx, rcv_idx):
        seis, _, _, _, _, _, _ = _run_fwd(c2dt2, wavelet, src_idx, rcv_idx, False)
        return seis

    def simulate_fwd(c2dt2, wavelet, src_idx, rcv_idx):
        seis, tape, ppen, plast, _, _, _ = _run_fwd(
            c2dt2, wavelet, src_idx, rcv_idx, True
        )
        if snap:  # full-field lap tape: no rings / final fields needed
            return seis, (c2dt2, wavelet, src_idx, rcv_idx, tape[0])
        return seis, (c2dt2, wavelet, src_idx, rcv_idx, tape, ppen, plast)

    def _finish_bwd(gbar, lam_src3, c2src, w_pad, src_idx, nt, nsrc):
        lam_src = lam_src3.reshape(-1, nsrc)
        wbar = (lam_src * c2src[None, :]).sum(-1)[:nt]
        gsrc = (lam_src * w_pad[:, None]).sum(0)
        srcp = (src_idx[..., 0], src_idx[..., 1])
        gbar = gbar.at[srcp].add(gsrc, mode="drop")
        gbar = rings.mask_valid(gbar)
        return gbar, wbar

    def simulate_bwd(res, seis_bar):
        if snap:
            c2dt2, wavelet, src_idx, rcv_idx, snap_tape = res
        else:
            c2dt2, wavelet, src_idx, rcv_idx, tape, ppen, plast = res
        nt = wavelet.shape[0]
        ntp = -(-nt // CH) * CH
        w_pad = jnp.pad(wavelet, (0, ntp - nt))
        (nsrc, nrec, sz, sx, c2src, rxr, rzr, r0, _valid) = _geom(
            c2dt2, src_idx, rcv_idx
        )
        rev = _rev_for(ntp, nsrc, nrec)
        az, bz, ax, bx = profiles
        nC = ntp // CH
        ybar3 = jnp.pad(seis_bar, ((0, ntp - nt), (0, 0))).reshape(nC, CH, nrec)
        if snap:
            gbar, lam_src3 = rev(
                c2dt2, az, bz, ax, bx, sz, sx, rxr, rzr, r0, ybar3,
                snap_tape,
            )
        else:
            gbar, lam_src3 = rev(
                c2dt2, az, bz, ax, bx, w_pad, c2src, sz, sx,
                rxr, rzr, r0, ybar3, *tape, ppen, plast,
            )
        gbar, wbar = _finish_bwd(
            gbar, lam_src3, c2src, w_pad, src_idx, nt, nsrc
        )
        return gbar, wbar, _int_cotangent(src_idx), _int_cotangent(rcv_idx)

    simulate.defvjp(simulate_fwd, simulate_bwd)
    return simulate
