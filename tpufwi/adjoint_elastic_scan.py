"""Boundary-saving elastic adjoint on the whole-scan kernels.

Same contract and math as propagators/elastic2d.make_elastic_simulator
(-> make_elastic_simulator_fused), but the entire forward time loop is
ONE pallas_call and the entire reverse pass is ONE pallas_call
(kernels/elastic2d_pallas_scan.py): the 5-field state, cotangents,
gradient accumulators and CPML strip memories never leave VMEM; per-step
HBM traffic is the 5-field boundary-ring tape plus the seismogram and
wavelet rows. Receiver-row-window contract identical to the acoustic
scanres engine. fp32, 2D; free surface supported (in-kernel images).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid
from .kernels.acoustic2d_pallas import strip_profiles
from .kernels.elastic2d_pallas_scan import (
    CH,
    make_elastic_scan_forward,
    make_elastic_scan_reverse,
)
from .propagators.boundary import RingSpec


def _int_cotangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def make_elastic_simulator_scan(
    grid: Grid, dt: float, f0: float, c_max: float,
    source_type: str = "pressure", record: str = "v",
    rcv_rows: int = 16, interpret: bool = False,
):
    """simulate(lam, lam2mu, mu_xz, buoy_x, buoy_z, wavelet, src_idx,
    rcv_idx) -> seis with the whole-scan custom VJP. Drop-in for
    make_elastic_simulator / make_elastic_simulator_fused (fp32, 2D);
    indices are grid-padded. Kernels cached per
    (nt, nsrc, nrec)."""
    if grid.ndim != 2:
        raise ValueError("elastic scan engine is 2D")
    profiles = strip_profiles(grid, dt, c_max, f0)
    rings = RingSpec.build(grid)
    NZ, NX = grid.padded_shape
    RH = rcv_rows
    dtf = float(dt)
    _fwd_cache: dict = {}
    _rev_cache: dict = {}

    def _fwd_for(ntp, nsrc, nrec, with_tape):
        key = (ntp, nsrc, nrec, with_tape)
        if key not in _fwd_cache:
            _fwd_cache[key] = make_elastic_scan_forward(
                grid, dt, nt=ntp, nsrc=nsrc, nrec=nrec, rcv_rows=RH,
                source_type=source_type, record=record,
                with_tape=with_tape, interpret=interpret,
            )
        return _fwd_cache[key]

    def _rev_for(ntp, nsrc, nrec):
        key = (ntp, nsrc, nrec)
        if key not in _rev_cache:
            _rev_cache[key] = make_elastic_scan_reverse(
                grid, dt, nt=ntp, nsrc=nsrc, nrec=nrec, rcv_rows=RH,
                source_type=source_type, record=record,
                interpret=interpret,
            )
        return _rev_cache[key]

    def _geom(buoy_z, src_idx, rcv_idx):
        nsrc = src_idx.shape[-2]
        nrec = rcv_idx.shape[-2]
        sz = src_idx[..., 0].reshape(nsrc).astype(jnp.int32)
        sx = src_idx[..., 1].reshape(nsrc).astype(jnp.int32)
        bsrc = buoy_z[(src_idx[..., 0], src_idx[..., 1])].reshape(nsrc)
        rz = rcv_idx[..., 0].astype(jnp.int32)
        rx = rcv_idx[..., 1].astype(jnp.int32)
        try:
            lo = (int(jnp.min(rz)) // 8) * 8
            spread = int(jnp.max(rz)) - lo + 1
        except jax.errors.ConcretizationTypeError:
            spread = None  # traced geometry: NaN poisoning covers misuse
        if spread is not None and spread > RH:
            raise ValueError(
                f"receiver rows span {spread} from the 8-aligned slab "
                f"start > rcv_rows={RH}; raise rcv_rows or use the "
                "per-step elastic engines"
            )
        r0 = jnp.clip(
            (jnp.min(rz) // 8) * 8, 0, ((NZ - RH) // 8) * 8
        ).astype(jnp.int32)
        rzr = rz - r0
        valid = (rzr >= 0) & (rzr < RH)
        return (
            nsrc, nrec, sz, sx, bsrc,
            rx.reshape(1, nrec),
            jnp.clip(rzr, 0, RH - 1).reshape(1, nrec),
            r0.reshape(1), valid,
        )

    def _reshape_seis(seis3, ntp, nt, nrec):
        if record == "v":
            # lanes [0:nrec)=vz, [nrec:2nrec)=vx -> (nt, nrec, 2)
            s = seis3.reshape(ntp, 2, nrec)[:nt]
            return jnp.moveaxis(s, 1, 2)
        return seis3.reshape(ntp, nrec)[:nt]

    def _run_fwd(mats, wavelet, src_idx, rcv_idx, with_tape):
        lam, l2m, muxz, bxm, bzm = mats
        nt = wavelet.shape[0]
        ntp = -(-nt // CH) * CH
        w_pad = jnp.pad(wavelet, (0, ntp - nt)).astype(jnp.float32)
        (nsrc, nrec, sz, sx, bsrc, rxr, rzr, r0, valid) = _geom(
            bzm, src_idx, rcv_idx
        )
        fwd = _fwd_for(ntp, nsrc, nrec, with_tape)
        az, bz, ax, bx = profiles
        outs = fwd(
            lam, l2m, muxz, bxm, bzm, az, bz, ax, bx,
            w_pad, bsrc, sz, sx, rxr, rzr, r0,
        )
        seis3 = outs[0]
        tape = outs[1:-5] if with_tape else None
        finals = outs[-5:]
        seis = _reshape_seis(seis3, ntp, nt, nrec)
        mask = valid[None, :, None] if record == "v" else valid[None, :]
        seis = jnp.where(mask, seis, jnp.float32(jnp.nan))
        return seis, tape, finals, w_pad, bsrc, ntp

    @jax.custom_vjp
    def simulate(lam, l2m, muxz, bxm, bzm, wavelet, src_idx, rcv_idx):
        seis, _, _, _, _, _ = _run_fwd(
            (lam, l2m, muxz, bxm, bzm), wavelet, src_idx, rcv_idx, False
        )
        return seis

    def simulate_fwd(lam, l2m, muxz, bxm, bzm, wavelet, src_idx, rcv_idx):
        mats = (lam, l2m, muxz, bxm, bzm)
        seis, tape, finals, _, _, _ = _run_fwd(
            mats, wavelet, src_idx, rcv_idx, True
        )
        return seis, (mats, wavelet, src_idx, rcv_idx, tape, finals)

    def simulate_bwd(res, seis_bar):
        mats, wavelet, src_idx, rcv_idx, tape, finals = res
        lam, l2m, muxz, bxm, bzm = mats
        nt = wavelet.shape[0]
        ntp = -(-nt // CH) * CH
        w_pad = jnp.pad(wavelet, (0, ntp - nt)).astype(jnp.float32)
        (nsrc, nrec, sz, sx, bsrc, rxr, rzr, r0, _valid) = _geom(
            bzm, src_idx, rcv_idx
        )
        rev = _rev_for(ntp, nsrc, nrec)
        az, bz, ax, bx = profiles
        nC = ntp // CH
        # The reverse kernel's HBM final-field/gradient DMA slices must
        # be (8,128) tile-aligned (Mosaic compile contract; VERDICT r4
        # weak #1): zero-pad the finals up to (NZ8, NXP) here and crop
        # the gradients back down below.
        NZ8 = -(-NZ // 8) * 8
        NXP = -(-NX // 128) * 128
        finals = tuple(
            jnp.pad(f, ((0, NZ8 - NZ), (0, NXP - NX))) for f in finals
        )
        yb = seis_bar.astype(jnp.float32)
        if record == "v":
            # one (nC, CH, nrec) stream per component (vz, vx): lane
            # slices of a packed 2*nrec row have lane offset nrec, which
            # Mosaic cannot relayout inside the reverse kernel's
            # inject_rows broadcast (runs/tpu_queue10 hardware log)
            ybars = tuple(
                jnp.pad(yb[..., i], ((0, ntp - nt), (0, 0))).reshape(
                    nC, CH, nrec
                )
                for i in range(2)
            )
        else:
            ybars = (
                jnp.pad(yb, ((0, ntp - nt), (0, 0))).reshape(nC, CH, nrec),
            )
        glam, gl2m, gmuxz, gbx, gbz, srcrow3 = rev(
            lam, l2m, muxz, bxm, bzm, az, bz, ax, bx,
            w_pad, bsrc, sz, sx, rxr, rzr, r0, *ybars, *tape, *finals,
        )
        # crop the tile-aligned (NZ8, NXP) gradient buffers; rows/cols
        # past NZ/NX are stale staging-scratch padding
        glam, gl2m, gmuxz, gbx, gbz = (
            g[:NZ, :NX] for g in (glam, gl2m, gmuxz, gbx, gbz)
        )
        srcrow = srcrow3.reshape(ntp, nsrc)
        if source_type == "pressure":
            wbar = dtf * jnp.sum(srcrow, axis=1)[:nt]
        else:
            wbar = dtf * jnp.sum(srcrow * bsrc[None, :], axis=1)[:nt]
            # buoy_z source chain of the injection dt*buoy_z[src]*w_t
            vsrc_acc = jnp.sum(srcrow * w_pad[:, None], axis=0)
            srcp = (src_idx[..., 0], src_idx[..., 1])
            gbz = gbz.at[srcp].add(
                dtf * vsrc_acc.reshape(src_idx.shape[:-1]), mode="drop"
            )
        mbar = tuple(
            rings.mask_valid(m) for m in (glam, gl2m, gmuxz, gbx, gbz)
        )
        return (*mbar, wbar, _int_cotangent(src_idx),
                _int_cotangent(rcv_idx))

    simulate.defvjp(simulate_fwd, simulate_bwd)
    return simulate
