"""Fused 3D simulator, shot- AND domain-sharded (spec C5, BASELINE.json:11;
SURVEY.md:164 "halo-aware so blocks compose with domain sharding", §3.5).

Round-2 verdict item 2: the fast 3D engine (adjoint3d_pallas) was single-
device; the multi-chip 3D path ran only on the jnp/GSPMD engine. This
module puts the SAME fused v2 kernels inside `jax.shard_map` over a
("shot", "y") mesh:

  - The domain is decomposed along y — the merged kernel's untiled
    leading axis — and OPTIONALLY along z (round-4: pass ``z_axis`` for
    a ("shot", "y", "z") mesh; x stays the 128-lane minor dim every
    block spans by design). Device row k owns the y-slab [k*L, (k+1)*L)
    (and z-column j the z-slab [j*Lz, (j+1)*Lz)) of the padded grid.
  - Per time step, each device ppermute-exchanges its radius-r edge rows
    of the wavefield (forward and reconstruction) or of u = c2*lam (the
    transposed stencil is itself a stencil over u), and the kernels run
    with ``y_halo=True`` (and ``z_halo=True``): the halo slabs replace
    the zero extension at the slab's interior cuts, while real global
    edges keep zeros (ppermute fills uncovered destinations with zeros —
    exactly the unsharded kernel's edge semantics).
  - The y-face (and, when z-sharded, z-face) CPML kernels run on EVERY
    device (SPMD-uniform program) with per-device (a, b) profile data:
    real values on the edge devices, zeros elsewhere — every term of the
    corr/tcorr algebra is proportional to a or b, so interior devices
    compute exact structural no-ops. The x faces span all slabs and use
    the global profiles.
  - The boundary-ring tape, final snapshots, and imaging accumulator are
    sharded with the domain (each device tapes only its slab), so tape
    HBM scales 1/(py*pz) — the full-scale-3D memory binder
    (docs/ROADMAP.md known constraints).

Per-step collectives: two ppermutes of (r, NZe, NX) slabs over "y" (and
two of (L, r, NX) over "z") — ICI neighbors on a real mesh. Per-shot:
one psum of the (nt, nrec) seismogram; the wavelet cotangent and
gradient psum once at the end.

Exactness: per-block kernel computations are IDENTICAL to the unsharded
engine given identical inputs, and the halo exchange feeds each block
exactly the rows the unsharded kernel reads — parity is fp-exact up to
collective reduction order (tests/test_sharding3d.py fused cases).

Constraints (checked): padded NY % py == 0; L = NY // py divisible by
``by``; the y CPML face (pml + 3*radius rows) contained in one slab;
nshot % mesh.shape[shot_axis] == 0. With z sharding additionally:
padded NZ % pz == 0 with Lz = NZ // pz divisible by ``bz`` (no dead
z-extension rows may sit at interior cuts), the z CPML face inside one
z-slab, and no free surface (the surface pin would run at a local row
on every z-device; unsupported until needed).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .cpml import CpmlProfile
from .grid import Grid
from .kernels.acoustic3d_pallas import crop_yz, extend_yz, z_extended
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

H = 8  # kernel halo-slab row count (8-sublane aligned; radius rows used)


def _int_cotangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def make_simulator3d_fused_sharded(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    mesh: Mesh,
    shot_axis: str = "shot",
    y_axis: str = "y",
    z_axis: str | None = None,
    by: int = 8,
    bz: int = 64,
    bz_y: int = 16,
    interpret: bool = False,
    tape_dtype=None,
):
    """simulate(c2dt2, wavelet, src_idx, rcv_idx) -> seis (nshot, nt, nrec)
    with the boundary-saving custom VJP, shot+domain sharded over ``mesh``.

    c2dt2: (c*dt)^2 on the PADDED grid, fp32 (replicated in; its cotangent
    comes back domain-sharded). wavelet: (nt,), shared across shots.
    src_idx / rcv_idx: (nshot, nsrc|nrec, 3) padded-grid indices.
    Seismogram rows of receivers are exact for every receiver (each
    device gathers the rows it owns; psum over the domain axes assembles
    the trace). ``z_axis``: name of a second spatial mesh axis for a
    ("shot", "y", "z") 2-axis domain decomposition (SURVEY.md §3.5's
    mesh ("shot","x","y") modulo this repo's (y, z, x) layout).
    """
    if grid.ndim != 3:
        raise ValueError("needs a 3D grid")
    py = mesh.shape[y_axis]
    pz = mesh.shape[z_axis] if z_axis is not None else 1
    r = grid.radius
    S = grid.pml + r
    W = S + 2 * r
    NY, NZ, NX = grid.padded_shape
    pad = grid.pad
    dtype = jnp.float32
    if NY % py != 0:
        raise ValueError(f"padded NY={NY} not divisible by mesh y={py}")
    L = NY // py
    if L % by != 0:
        raise ValueError(f"slab height {L} not divisible by by={by}")
    if W > L:
        raise ValueError(
            f"y CPML face ({W} rows) does not fit one slab of {L} rows; "
            "use fewer y devices or a thinner pml"
        )
    z_halo = pz > 1
    if z_halo:
        if NZ % pz != 0:
            raise ValueError(f"padded NZ={NZ} not divisible by mesh "
                             f"z={pz}")
        Lz = NZ // pz
        if Lz % bz != 0:
            raise ValueError(
                f"z slab {Lz} not divisible by bz={bz} (dead z-extension "
                "rows at an interior cut would corrupt the stencil)"
            )
        if W > Lz:
            raise ValueError(
                f"z CPML face ({W} rows) does not fit one z slab of "
                f"{Lz} rows; use fewer z devices or a thinner pml"
            )
        if grid.free_surface:
            raise ValueError("free surface with a sharded z axis is "
                             "unsupported (the surface pin is per-slab)")
    else:
        Lz = NZ
    # Local grid view: same pml/order/h, y (and z) extent = one slab.
    # Every piece of kernel geometry then lands at the correct LOCAL
    # position: device 0's y-lo face is global rows [0, W) = local
    # [0, W); device py-1's y-hi face is global [NY-W, NY) = local
    # [L-W, L); the local ring windows are global-correct on the edge
    # devices and impose saved TRUE interior values on the others
    # (harmless by definition). Same per axis for z.
    lgrid = dataclasses.replace(
        grid, shape=(L - 2 * pad, Lz - 2 * pad if z_halo else grid.shape[1],
                     grid.shape[2])
    )
    assert lgrid.padded_shape == (L, Lz, NX)
    NZe = z_extended(lgrid, bz)
    assert not z_halo or NZe == Lz
    rings = RingSpec.build(grid)  # GLOBAL gradient mask

    # ---- profile data ----
    def _prof(ax):
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
        return lo, hi

    ylo_ab, yhi_ab = _prof(0)
    (azl, bzl), (azh, bzh) = _prof(1)
    (axl, bxl), (axh, bxh) = _prof(2)

    # ---- local kernels (host-side factories, built once) ----
    _zp = (jnp.zeros((S, 1, 1), dtype), jnp.zeros((S, 1, 1), dtype))
    _zpz = (jnp.zeros((1, S, 1), dtype), jnp.zeros((1, S, 1), dtype))
    step2, zero_state = make_acoustic3d_fused_step2(
        lgrid, dt, f0, c_max, by=by, bz=bz, bz_y=bz_y,
        interpret=interpret, y_halo=True, y_profiles=(_zp, _zp),
        z_halo=z_halo,
        z_profiles=(_zpz, _zpz) if z_halo else None,
    )
    recon = make_recon3d_kernel(lgrid, by=by, bz=bz, interpret=interpret,
                                y_halo=True, z_halo=z_halo)
    transp = make_transpose3d_kernel(lgrid, by=by, bz=bz,
                                     interpret=interpret, y_halo=True,
                                     z_halo=z_halo)
    tcy = {s: make_tcorr3d_y(lgrid, s, bz_y, NZe, by, interpret)
           for s in (0, 1)}
    tcz = {s: make_tcorr3d_z(lgrid, s, by, L, interpret) for s in (0, 1)}

    perm_dn = [(k, k + 1) for k in range(py - 1)]
    perm_up = [(k + 1, k) for k in range(py - 1)]
    perm_dn_z = [(k, k + 1) for k in range(pz - 1)]
    perm_up_z = [(k + 1, k) for k in range(pz - 1)]

    def _halos(f):
        """Neighbor-edge halo slabs of local f: (hylo, hyhi) (H, NZe, NX)
        over the y axis, plus (hzlo, hzhi) (L, H, NX) over z when
        z-sharded — the flat tuple the kernels' halos= argument takes."""
        bot = lax.slice_in_dim(f, L - r, L, axis=0)
        top = lax.slice_in_dim(f, 0, r, axis=0)
        hlo = lax.ppermute(bot, y_axis, perm_dn)
        hhi = lax.ppermute(top, y_axis, perm_up)
        zp = jnp.zeros((H - r,) + f.shape[1:], f.dtype)
        out = (jnp.concatenate([zp, hlo], 0),
               jnp.concatenate([hhi, zp], 0))
        if not z_halo:
            return out
        zbot = lax.slice_in_dim(f, NZe - r, NZe, axis=1)
        ztop = lax.slice_in_dim(f, 0, r, axis=1)
        hzlo = lax.ppermute(zbot, z_axis, perm_dn_z)
        hzhi = lax.ppermute(ztop, z_axis, perm_up_z)
        zpz = jnp.zeros((f.shape[0], H - r, f.shape[2]), f.dtype)
        return out + (jnp.concatenate([zpz, hzlo], 1),
                      jnp.concatenate([hzhi, zpz], 1))

    def _axprofs(axis_name, p_n, lo_ab, hi_ab):
        """Per-device face (a, b): real on the edge devices, zeros
        inside (exact structural no-op of the face kernels)."""
        ia = lax.axis_index(axis_name)
        s_lo = (ia == 0).astype(dtype)
        s_hi = (ia == p_n - 1).astype(dtype)
        return ((lo_ab[0] * s_lo, lo_ab[1] * s_lo),
                (hi_ab[0] * s_hi, hi_ab[1] * s_hi))

    def _yprofs():
        return _axprofs(y_axis, py, ylo_ab, yhi_ab)

    def _zprofs():
        if not z_halo:
            return None
        return _axprofs(z_axis, pz, (azl, bzl), (azh, bzh))

    def _local_coords(idx):
        """Global padded (n, 3) indices -> local coords + ownership."""
        iy = lax.axis_index(y_axis)
        yl = idx[..., 0].astype(jnp.int32) - iy * jnp.int32(L)
        own = (yl >= 0) & (yl < L)
        yl = jnp.clip(yl, 0, L - 1)
        zl = idx[..., 1].astype(jnp.int32)
        if z_halo:
            iz = lax.axis_index(z_axis)
            zl = zl - iz * jnp.int32(Lz)
            own = own & (zl >= 0) & (zl < Lz)
            zl = jnp.clip(zl, 0, Lz - 1)
        return (yl, zl, idx[..., 2].astype(jnp.int32)), own.astype(dtype)

    def _fs_mask(idx):
        if not grid.free_surface:
            return 1.0
        return (idx[..., 1] != grid.pad).astype(dtype)

    # ------------- per-device, per-shot forward -------------

    # tape layout: round-4 1D-flattened slabs (see kernels.
    # acoustic3d_bwd_pallas.tape_slab_shapes — the round-3 x-slab
    # moveaxis was not layout-safe against XLA layout assignment), and
    # the tape emitted ALREADY time-shifted via a 2-deep delay line (the
    # reverse's concat-shift kept a full second copy of the tape in HBM).
    _slab_shapes = tape_slab_shapes(lgrid, (L, NZe, NX))

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

    dom_axes = (y_axis,) + ((z_axis,) if z_halo else ())

    def _fwd_one(c2e, wavelet, src_idx, rcv_idx, with_tape):
        yprofs = _yprofs()
        zprofs = _zprofs()
        src, s_own = _local_coords(src_idx)
        rcv, r_own = _local_coords(rcv_idx)
        smask = _fs_mask(src_idx) * s_own

        def body(carry, w_t):
            if with_tape:
                s, d0, d1 = carry
            else:
                s = carry
            halos = _halos(s[1])
            s = step2(s, c2e, halos=halos, y_profiles_override=yprofs,
                      z_profiles_override=zprofs)
            p_prev, p_next, strips = s
            p_next = p_next.at[src].add(smask * c2e[src] * w_t,
                                        mode="drop")
            rec = p_next[rcv] * r_own
            s = (p_prev, p_next, strips)
            if with_tape:
                tp = _pack_tape(extract_tape3d(lgrid, p_next))
                return (s, d1, tp), (rec, d0)
            return s, rec

        if with_tape:
            zt = jax.eval_shape(
                lambda p: _pack_tape(extract_tape3d(lgrid, p)),
                jax.ShapeDtypeStruct((L, NZe, NX), dtype),
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

    # ------------- per-device, per-shot backward -------------

    def _bwd_one(c2e, wavelet, src_idx, rcv_idx, tape, p_pen, p_last,
                 seis_bar):
        yprofs = _yprofs()
        (ayl, byl), (ayh, byh) = yprofs
        if z_halo:
            (azl_d, bzl_d), (azh_d, bzh_d) = _zprofs()
        else:
            (azl_d, bzl_d), (azh_d, bzh_d) = (azl, bzl), (azh, bzh)
        src, s_own = _local_coords(src_idx)
        rcv, r_own = _local_coords(rcv_idx)
        smask = _fs_mask(src_idx) * s_own
        rmask = _fs_mask(rcv_idx) * r_own

        # tape row t already holds rings(p_{t-1}) (forward delay line)
        zf = jnp.zeros((L, NZe, NX), dtype)
        zS_y = jnp.zeros((S, NZe, NX), dtype)
        zS_z = jnp.zeros((L, S, NX), dtype)
        zS_x = jnp.zeros((L, NZe, S), dtype)
        offs = {0: (0, L - W), 1: (0, Lz - W)}

        def _slice(f, ax, side):
            return lax.slice_in_dim(f, offs[ax][side],
                                    offs[ax][side] + W, axis=ax)

        def bwd_body(carry, xs):
            (p_t, p_tp1, lam, lam_prev, gacc,
             dy, dz, dx, wsrc_acc) = carry
            ring_tm1, w_t, ybar_t = xs
            ring_tm1 = _unpack_tape(ring_tm1)
            lam = lam.at[rcv].add(rmask * ybar_t, mode="drop")
            lam_at_src = smask * lam[src]
            w_inc = jnp.sum(c2e[src] * lam_at_src)
            wsrc_acc = wsrc_acc + w_t * lam_at_src
            # recon + imaging, with halos of p_t
            p_tm1, gacc = recon(p_tp1, p_t, c2e, lam, gacc, ring_tm1,
                                halos=_halos(p_t))
            p_tm1 = p_tm1.at[src].add(smask * c2e[src] * w_t,
                                      mode="drop")
            # transposed step on u = c2 * lam, with halos of u
            u = c2e * lam
            upds_y, upds_z = [], []
            dy2, dz2 = [], []
            prof_y = {0: (ayl, byl), 1: (ayh, byh)}
            prof_z = {0: (azl_d, bzl_d), 1: (azh_d, bzh_d)}
            for ax, tc, duals, ulist, nlist, prof in (
                (0, tcy, dy, upds_y, dy2, prof_y),
                (1, tcz, dz, upds_z, dz2, prof_z),
            ):
                for side in (0, 1):
                    pb, psd = duals[2 * side], duals[2 * side + 1]
                    a, b = prof[side]
                    upd, pb2, ps2 = tc[side](
                        _slice(u, ax, side), pb, psd, a, b
                    )
                    ulist.append(upd)
                    nlist += [pb2, ps2]
            pbxl, psxl, pbxh, psxh = dx
            lam_next, pbxl2, psxl2, pbxh2, psxh2 = transp(
                lam_prev, lam, u, pbxl, psxl, pbxh, psxh,
                axl, bxl, axh, bxh,
                upds_y[0], upds_y[1], upds_z[0], upds_z[1],
                halos=_halos(u),
            )
            new_carry = (
                p_tm1, p_t, lam_next, lam, gacc,
                tuple(dy2), tuple(dz2),
                (pbxl2, psxl2, pbxh2, psxh2), wsrc_acc,
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
        gacc, wsrc_acc = carry_f[4], carry_f[8]
        c2bar_e = gacc.at[src].add(wsrc_acc * s_own, mode="drop")
        return c2bar_e, wbar

    # ------------- shard_map wrappers -------------

    zs = z_axis if z_halo else None  # z placement (None = replicated)
    spec_c2 = P(y_axis, zs, None)
    spec_shot = P(shot_axis, None, None)
    spec_seis = P(shot_axis, None, None)

    def _fwd_dev(c2_l, wavelet, si_l, ri_l, with_tape):
        c2e = extend_yz(c2_l, lgrid, by=by, bz=bz)
        n = si_l.shape[0]
        outs = []
        for i in range(n):  # local shot loop (static)
            final, ys = _fwd_one(c2e, wavelet, si_l[i], ri_l[i],
                                 with_tape)
            if with_tape:
                rec, tape = ys
            else:
                rec, tape = ys, None
            rec = lax.psum(rec, dom_axes)  # assemble full traces
            outs.append((rec, tape, final[0], final[1]))
        seis = jnp.stack([o[0] for o in outs])
        if not with_tape:
            return seis
        tape = jax.tree.map(lambda *x: jnp.stack(x),
                            *[o[1] for o in outs])
        p_pen = jnp.stack([o[2] for o in outs])
        p_last = jnp.stack([o[3] for o in outs])
        return seis, tape, p_pen, p_last

    def _bwd_dev(c2_l, wavelet, si_l, ri_l, tape, p_pen, p_last,
                 seis_bar):
        c2e = extend_yz(c2_l, lgrid, by=by, bz=bz)
        n = si_l.shape[0]
        gacc = None
        wbar = None
        for i in range(n):
            t_i = jax.tree.map(lambda x: x[i], tape)
            g_i, w_i = _bwd_one(c2e, wavelet, si_l[i], ri_l[i], t_i,
                                p_pen[i], p_last[i], seis_bar[i])
            gacc = g_i if gacc is None else gacc + g_i
            wbar = w_i if wbar is None else wbar + w_i
        gbar = crop_yz(lax.psum(gacc, shot_axis), lgrid)
        wbar = lax.psum(wbar, (shot_axis,) + dom_axes)
        return gbar, wbar

    # tape slab out-specs: rows are 1D-FLATTENED slabs (round-4, see
    # kernels.acoustic3d_bwd_pallas.tape_slab_shapes), so each tape
    # element is (nt, Lflat) per device, (shot, nt, Lflat) stacked. The
    # per-device flats concatenate along the flat axis over the domain
    # axes — the "global" tape array has no spatial meaning, but it is
    # only ever round-tripped through IDENTICAL fwd/rev specs, so every
    # device receives exactly its own slab rows back in the reverse.
    def _tape_specs():
        flat = P(shot_axis, None,
                 (y_axis,) + ((z_axis,) if z_halo else ()))
        return (flat,) * 6

    fwd_plain = jax.shard_map(
        lambda c2, w, si, ri: _fwd_dev(c2, w, si, ri, False),
        mesh=mesh,
        in_specs=(spec_c2, P(), spec_shot, spec_shot),
        out_specs=spec_seis,
        check_vma=False,
    )
    spec_p = P(shot_axis, y_axis, zs, None)
    fwd_tape = jax.shard_map(
        lambda c2, w, si, ri: _fwd_dev(c2, w, si, ri, True),
        mesh=mesh,
        in_specs=(spec_c2, P(), spec_shot, spec_shot),
        out_specs=(spec_seis, _tape_specs(), spec_p, spec_p),
        check_vma=False,
    )
    bwd_sharded = jax.shard_map(
        _bwd_dev,
        mesh=mesh,
        in_specs=(spec_c2, P(), spec_shot, spec_shot, _tape_specs(),
                  spec_p, spec_p, spec_seis),
        out_specs=(spec_c2, P()),
        check_vma=False,
    )

    @jax.custom_vjp
    def simulate(c2dt2, wavelet, src_idx, rcv_idx):
        return fwd_plain(c2dt2, wavelet, src_idx, rcv_idx)

    def simulate_fwd(c2dt2, wavelet, src_idx, rcv_idx):
        seis, tape, p_pen, p_last = fwd_tape(
            c2dt2, wavelet, src_idx, rcv_idx
        )
        return seis, (c2dt2, wavelet, src_idx, rcv_idx, tape, p_pen,
                      p_last)

    def simulate_bwd(res, seis_bar):
        c2dt2, wavelet, src_idx, rcv_idx, tape, p_pen, p_last = res
        gbar, wbar = bwd_sharded(
            c2dt2, wavelet, src_idx, rcv_idx, tape, p_pen, p_last,
            seis_bar.astype(dtype),
        )
        gbar = rings.mask_valid(gbar)
        nt = wavelet.shape[0]
        return (gbar, wbar[:nt], _int_cotangent(src_idx),
                _int_cotangent(rcv_idx))

    simulate.defvjp(simulate_fwd, simulate_bwd)
    return simulate
