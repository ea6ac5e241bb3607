"""3D fused-adjoint simulator: custom_vjp over the fused v2 forward step
with the fused backward kernels (kernels/acoustic3d_bwd_pallas.py).

simulate(c2dt2, wavelet, src_idx, rcv_idx) -> seis (nt, nrec)
  - c2dt2: (c*dt)^2 on the PADDED grid (not extended); float32.
  - gradient: exact discrete adjoint with boundary-saving reconstruction,
    masked to the valid region (rings.mask_valid), matching
    adjoint.make_simulator's jnp engine (tests/test_acoustic3d_bwd.py).

Index conventions mirror adjoint.py's jnp engine exactly:
  forward step t: p_{t+1} = 2 p_t - p_{t-1} + c2 lap_cpml(p_t) +
                  c2[src] w_t;  rec_t = p_{t+1}[rcv];
                  tape_t = rings(p_{t+1})
  reverse step t: impose rings(p_{t-1}) = tape_{t-2};
                  inject ybar_t into lam; image gacc += lam lap(p_t);
                  lam' = transposed step (T kernel + tcorr face kernels)

The c2 cotangent = gacc + sum_t w_t lam_t at the source positions (the
src-term chain), cropped and masked. The wavelet cotangent =
c2[src] * lam_t[src] summed over sources.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .cpml import CpmlProfile
from .grid import Grid
from .kernels.acoustic3d_pallas import crop_yz, extend_yz, y_extended, z_extended
from .kernels.acoustic3d_fused2 import make_acoustic3d_fused_step2
from .kernels.acoustic3d_bwd_pallas import (
    extract_tape3d,
    tape_slab_shapes,
    make_recon3d_kernel,
    make_tcorr3d_y,
    make_tcorr3d_z,
    make_transpose3d_kernel,
)
from .propagators.boundary import RingSpec


def _int_cotangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def make_simulator3d_fused(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    by: int = 16,
    bz: int = 64,
    bz_y: int = 16,
    interpret: bool = False,
    tape_dtype=None,
):
    """Build the fused-3D simulate() with boundary-saving custom VJP.

    ``tape_dtype`` (e.g. jnp.bfloat16) stores the per-step ring-slab
    tape compressed — halves tape HBM, which is the memory binder at
    full Overthrust scale (the 143M-extended-cell gradient fits one
    v5e chip only with the bf16 tape — scripts/bench_3d_fullscale.py).
    Reconstruction then re-imposes rings at ~bf16 eps; the measured
    gradient error this induces is at the 1e-3 level (same mechanism as
    the 2D option, tests/test_adjoint.py::test_bf16_tape_gradient)."""
    if grid.ndim != 3:
        raise ValueError("make_simulator3d_fused needs a 3D grid")
    r = grid.radius
    S = grid.pml + r
    W = S + 2 * r
    NY, NZ, NX = grid.padded_shape
    NYe = y_extended(grid, by)
    NZe = z_extended(grid, bz)
    dtype = jnp.float32
    rings = RingSpec.build(grid)

    step2, zero_state = make_acoustic3d_fused_step2(
        grid, dt, f0, c_max, by=by, bz=bz, bz_y=bz_y, interpret=interpret
    )
    recon = make_recon3d_kernel(grid, by=by, bz=bz, interpret=interpret)
    transp = make_transpose3d_kernel(grid, by=by, bz=bz, interpret=interpret)
    tcy = {s: make_tcorr3d_y(grid, s, bz_y, NZe, by, interpret) for s in (0, 1)}
    tcz = {s: make_tcorr3d_z(grid, s, by, NYe, interpret) for s in (0, 1)}

    profs = []
    for ax in range(3):
        prof = CpmlProfile.build(
            n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
            h=grid.h[ax], dt=dt, c_max=c_max, f0=f0,
            free_lo=(grid.free_surface and ax == 1),
        )
        n_pad = grid.padded_shape[ax]
        shp = [(S, 1, 1), (1, S, 1), (1, 1, S)][ax]
        lo = (np.asarray(prof.a[:S], dtype).reshape(shp),
              np.asarray(prof.b[:S], dtype).reshape(shp))
        hi = (np.asarray(prof.a[n_pad - S:], dtype).reshape(shp),
              np.asarray(prof.b[n_pad - S:], dtype).reshape(shp))
        profs.append((lo, hi))

    offs = {0: (0, NY - W), 1: (0, NZ - W)}

    def _slice(f, ax, side):
        return lax.slice_in_dim(f, offs[ax][side], offs[ax][side] + W,
                                axis=ax)

    def _coords(idx):
        return tuple(idx[..., d] for d in range(3))

    def _fs_mask(idx):
        """1.0 per point, except points ON the free-surface z-row -> 0.

        The merged kernel pins the surface row BEFORE the XLA-side source
        scatter, while the jnp engine pins after injection; dropping
        surface-row sources (and, transposed, surface-row receiver
        residuals) restores exact parity — the pinned row annihilates
        them in the jnp engine anyway.
        """
        if not grid.free_surface:
            return 1.0
        return (idx[..., 1] != grid.pad).astype(dtype)

    # Tape layout (round 3, sized by the full-scale OOM dump in
    # runs/tpu_queue5/fullscale3d.log):
    #  - the x-face slabs are stored transposed, (r, NYe, NZe): stacked
    #    over nt with minor dim r=4 they tile as T(8,128) with a 32x
    #    lane-padding expansion (250 MB of slabs became 7.8 GB of HBM);
    #    NZe-minor tiles cleanly.
    #  - the forward emits the tape ALREADY time-shifted (row t holds
    #    rings(p_{t-1}), realized with a 2-deep delay line in the scan
    #    carry) — the reverse previously rebuilt that shift with a
    #    concat, i.e. a full second copy of the tape in HBM.
    # round-4: slabs are stored FLATTENED to 1D (kernels.
    # acoustic3d_bwd_pallas.tape_slab_shapes has the full story — the
    # round-3 x-slab moveaxis was not layout-safe; XLA re-chose the
    # r-as-lanes layout at the 20.7M-cell Overthrust shape, a 32x HBM
    # expansion that crashed the chip)
    _slab_shapes = tape_slab_shapes(grid, (NYe, NZe, NX))

    def _pack_tape(tape_t):
        out = tuple(x.reshape(-1) for x in tape_t)
        if tape_dtype is not None:
            out = jax.tree.map(lambda x: x.astype(tape_dtype), out)
        return out

    def _unpack_tape(tape_t):
        if tape_dtype is not None:
            tape_t = jax.tree.map(lambda x: x.astype(dtype), tape_t)
        return tuple(
            x.reshape(s) for x, s in zip(tape_t, _slab_shapes)
        )

    def _fwd_scan(c2e, wavelet, src_idx, rcv_idx, with_tape):
        src = _coords(src_idx)
        rcv = _coords(rcv_idx)
        smask = _fs_mask(src_idx)

        def body(carry, w_t):
            if with_tape:
                s, d0, d1 = carry
            else:
                s = carry
            s = step2(s, c2e)
            p_prev, p_next, strips = s
            p_next = p_next.at[src].add(smask * c2e[src] * w_t, mode="drop")
            rec = p_next[rcv]
            s = (p_prev, p_next, strips)
            if with_tape:
                tp = _pack_tape(extract_tape3d(grid, p_next))
                # emit rings(p_{t-1}) = the slabs extracted two steps ago
                return (s, d1, tp), (rec, d0)
            return s, rec

        if with_tape:
            zt = jax.eval_shape(
                lambda p: _pack_tape(extract_tape3d(grid, p)),
                jax.ShapeDtypeStruct(zero_state()[1].shape, dtype),
            )
            zero_tape = jax.tree.map(
                lambda a: jnp.zeros(a.shape, a.dtype), zt
            )
            (final, _, _), ys = lax.scan(
                body, (zero_state(), zero_tape, zero_tape), wavelet
            )
            return final, ys
        final, ys = lax.scan(body, zero_state(), wavelet)
        return final, ys

    def simulate_plain(c2dt2, wavelet, src_idx, rcv_idx):
        c2e = extend_yz(c2dt2, grid, by=by, bz=bz)
        _, seis = _fwd_scan(c2e, wavelet, src_idx, rcv_idx, with_tape=False)
        return seis

    simulate = jax.custom_vjp(simulate_plain)

    def simulate_fwd(c2dt2, wavelet, src_idx, rcv_idx):
        c2e = extend_yz(c2dt2, grid, by=by, bz=bz)
        final, (seis, tape) = _fwd_scan(
            c2e, wavelet, src_idx, rcv_idx, with_tape=True
        )
        p_pen, p_last = final[0], final[1]
        residuals = (c2dt2, wavelet, src_idx, rcv_idx, tape, p_pen, p_last)
        return seis, residuals

    def simulate_bwd(residuals, seis_bar):
        c2dt2, wavelet, src_idx, rcv_idx, tape, p_pen, p_last = residuals
        c2e = extend_yz(c2dt2, grid, by=by, bz=bz)
        src = _coords(src_idx)
        rcv = _coords(rcv_idx)
        smask = _fs_mask(src_idx)
        rmask = _fs_mask(rcv_idx)

        # tape row t already holds rings(p_{t-1}) (forward delay line)

        zf = jnp.zeros((NYe, NZe, NX), dtype)
        zS_y = jnp.zeros((S, NZe, NX), dtype)
        zS_z = jnp.zeros((NYe, S, NX), dtype)
        zS_x = jnp.zeros((NYe, NZe, S), dtype)

        def bwd_body(carry, xs):
            (p_t, p_tp1, lam, lam_prev, gacc,
             dy, dz, dx, wsrc_acc) = carry
            ring_tm1, w_t, ybar_t = xs
            ring_tm1 = _unpack_tape(ring_tm1)
            # cotangent injection (this step's lam becomes lam_t); the
            # free-surface mask keeps lam == M lam (see T-kernel comment)
            lam = lam.at[rcv].add(rmask * ybar_t, mode="drop")
            # source-term cotangents
            lam_at_src = smask * lam[src]
            w_inc = jnp.sum(c2e[src] * lam_at_src)  # wavelet chain
            wsrc_acc = wsrc_acc + w_t * lam_at_src  # c2[src] chain
            # recon + imaging (R kernel), then the source term
            p_tm1, gacc = recon(p_tp1, p_t, c2e, lam, gacc, ring_tm1)
            p_tm1 = p_tm1.at[src].add(smask * c2e[src] * w_t, mode="drop")
            # transposed step
            u = c2e * lam
            upds_y, upds_z = [], []
            dy2, dz2 = [], []
            for ax, (duals, tc, ul, nl) in (
                (0, (dy, tcy, upds_y, dy2)), (1, (dz, tcz, upds_z, dz2))
            ):
                duals_st, tck, ulist, nlist = duals, tc, ul, nl
                for side in (0, 1):
                    pb, ps = duals_st[2 * side], duals_st[2 * side + 1]
                    a, b = profs[ax][side]
                    upd, pb2, ps2 = tck[side](
                        _slice(u, ax, side), pb, ps, a, b
                    )
                    ulist.append(upd)
                    nlist += [pb2, ps2]
            pbxl, psxl, pbxh, psxh = dx
            (axp, bxp), (axh, bxh) = profs[2]
            lam_next, pbxl2, psxl2, pbxh2, psxh2 = transp(
                lam_prev, lam, u, pbxl, psxl, pbxh, psxh,
                axp, bxp, axh, bxh,
                upds_y[0], upds_y[1], upds_z[0], upds_z[1],
            )
            new_carry = (
                p_tm1, p_t, lam_next, lam, gacc,
                tuple(dy2), tuple(dz2), (pbxl2, psxl2, pbxh2, psxh2),
                wsrc_acc,
            )
            return new_carry, w_inc

        carry0 = (
            p_pen, p_last, zf, zf, zf,
            (zS_y, zS_y, zS_y, zS_y), (zS_z, zS_z, zS_z, zS_z),
            (zS_x, zS_x, zS_x, zS_x),
            jnp.zeros(src_idx.shape[:-1], dtype),
        )
        xs = (tape, wavelet, seis_bar)
        carry_f, wbar = lax.scan(bwd_body, carry0, xs, reverse=True)
        gacc = carry_f[4]
        wsrc_acc = carry_f[8]

        c2bar_e = gacc.at[src].add(wsrc_acc, mode="drop")
        c2bar = rings.mask_valid(crop_yz(c2bar_e, grid))
        return (c2bar, wbar, _int_cotangent(src_idx),
                _int_cotangent(rcv_idx))

    simulate.defvjp(simulate_fwd, simulate_bwd)

    def illumination(c2dt2, wavelet, src_idx):
        """sum_t p_t^2 on the PHYSICAL grid via the fused forward step —
        the propagator's generic illumination path runs the jnp
        single-step engine, which is unproven at Overthrust fullscale
        shapes (the fused kernels are the proven path there; VERDICT r3
        item 1 runs)."""
        c2e = extend_yz(c2dt2, grid, by=by, bz=bz)
        src = _coords(src_idx)
        smask = _fs_mask(src_idx)

        def body(carry, w_t):
            s, acc = carry
            s = step2(s, c2e)
            p_prev, p_next, strips = s
            p_next = p_next.at[src].add(smask * c2e[src] * w_t, mode="drop")
            return ((p_prev, p_next, strips), acc + p_next * p_next), None

        acc0 = jnp.zeros((NYe, NZe, NX), dtype)
        (_, acc), _ = lax.scan(body, (zero_state(), acc0), wavelet)
        pad = grid.pad
        full = crop_yz(acc, grid)
        return full[pad:NY - pad, pad:NZ - pad, pad:NX - pad]

    simulate.illumination = illumination
    return simulate
