"""Adjoint-state gradient engine: exact discrete adjoint with
boundary-saving wavefield reconstruction (spec C2, BASELINE.json:5,8).

Design (SURVEY.md §3.2), and why it is *exact*:

The acoustic step is **affine in the wavefield state** (p, phi, psi) for a
fixed model — the wave equation is linear. Therefore the state-to-state
Jacobian of one step does not depend on the primal state at all, and
``jax.vjp`` of the step evaluated at *any* state gives the exact transposed
operator M^T (this is the adjoint field propagation, with the CPML recursion
transposed automatically — absorbing for the adjoint field too). The only
place the primal wavefield enters the backward pass is the model cotangent
dJ/d(c^2 dt^2)[i] = lambda_next[i] * Lap_cpml(p_t)[i] — the cross-correlation
imaging condition. The primal p_t is recovered by *reverse time-stepping*
(the lossless interior leapfrog is time-reversible) while re-imposing the
saved boundary rings each step, so no O(nt * nx * nz) storage is needed —
memory is O(nt * perimeter * radius) for the tape.

Exactness domain: the gradient is the exact discrete transpose on the
interior shrunk by one stencil radius, and is defined as zero on the
outermost radius-wide frame of the physical model (propagators/boundary.py).
The adjoint dot-product test (tests/test_adjoint.py) verifies this to
float-roundoff when the probe perturbation is supported in the valid region.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .cpml import CpmlProfile, build_profiles
from .grid import Grid
from .kernels.acoustic2d_jnp import (
    AcousticParams,
    AcousticState,
    make_acoustic_step,
    make_reverse_reconstruct_step,
    zero_state,
)
from .propagators.boundary import RingSpec


def _int_cotangent(x):
    """float0 zero cotangent for integer-valued primal inputs."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def make_simulator(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    dtype=jnp.float32,
    use_custom_vjp: bool = True,
    wavefield_sharding=None,
    wavefield_sharding_batched=None,
    gradient: str = None,
    chunk: int = 0,
    tape_dtype=None,
):
    """Build ``simulate(c2dt2, wavelet, src_idx, rcv_idx) -> seis`` with a
    custom VJP implementing the boundary-saving adjoint.

    Args:
      grid: padded-geometry descriptor.
      dt: timestep (s). Caller is responsible for CFL (grid.check_dt).
      f0: dominant frequency used for the CPML alpha profile.
      c_max: velocity bound used for the CPML d0 profile (a tuning constant,
        NOT differentiated — use the model-box upper bound).
      dtype: computation dtype.

    ``simulate`` is differentiable in c2dt2 (the padded (c*dt)^2 field) and
    wavelet; src/rcv integer index arrays get float0 cotangents. It composes
    with jit/vmap/shard_map.

    ``gradient`` selects the reverse-pass strategy explicitly:
      - "rings" (default): boundary-saving custom VJP — tape of boundary
        rings, O(nt * perimeter * radius) memory, zero recompute. The
        production 2D path.
      - "remat": plain AD over a checkpointed scan (propagators/remat.py)
        — O(sqrt(nt) * grid) memory, ~one extra forward of recompute, NO
        per-step tape. The memory escape hatch for full-scale 3D on one
        chip, where the ring tape (O(nt * surface * radius), ~36 MB/step
        at Overthrust scale) exceeds HBM but sqrt(nt) full grids fit
        (docs/COMPONENTS.md "known constraints").
      - "full": plain jax AD through the scan (O(nt * grid) memory).
        Only usable on tiny problems — it is the ground truth the other
        two are tested against (tests/test_adjoint.py).
    ``use_custom_vjp=False`` is the legacy spelling of gradient="full".
    ``chunk`` sets the remat segment length (0 = ~sqrt(nt)).
    ``tape_dtype`` (rings mode only; e.g. jnp.bfloat16) stores the ring
    tape compressed — halves tape HBM, the other lever (besides "remat")
    for 3D runs where the tape binds memory. Gradient error it induces is
    measured at ~1e-3 relative (test_adjoint.py::test_bf16_tape_gradient).

    ``wavefield_sharding``: optional NamedSharding for the wavefield state
    (3D spatial domain decomposition, spec C5). The constraint is applied to
    the scan carry; XLA's SPMD partitioner then keeps every full-grid op
    block-local and inserts collective-permute halo exchanges for the
    stencil's shifted slices over ICI (SURVEY.md §2 "or let XLA SPMD
    partition the convolution ... automatic halo exchange"). The explicit
    shard_map/ppermute variant lives in propagators/acoustic3d.py.
    """
    profs = build_profiles(grid, dt, c_max, f0, dtype=np.float64)
    a_ax = tuple(np.asarray(p[0], dtype) for p in profs)
    b_ax = tuple(np.asarray(p[1], dtype) for p in profs)
    step = make_acoustic_step(grid)
    recon = make_reverse_reconstruct_step(grid)
    rings = RingSpec.build(grid, tape_dtype=tape_dtype)
    ndim = grid.ndim
    shape = grid.padded_shape

    def _constrain(tree):
        if wavefield_sharding is None:
            return tree

        def c(x):
            if x.ndim == ndim:
                return jax.lax.with_sharding_constraint(x, wavefield_sharding)
            if x.ndim == ndim + 1 and wavefield_sharding_batched is not None:
                # under vmap over shots: leading batch dim (shot DP axis)
                return jax.lax.with_sharding_constraint(
                    x, wavefield_sharding_batched
                )
            return x

        return jax.tree.map(c, tree)

    def _params(c2dt2, src_idx, rcv_idx):
        return AcousticParams(c2dt2=c2dt2, a=a_ax, b=b_ax, src_idx=src_idx, rcv_idx=rcv_idx)

    def simulate_plain(c2dt2, wavelet, src_idx, rcv_idx):
        params = _params(_constrain(c2dt2), src_idx, rcv_idx)

        def body(s, w_t):
            s, rec = step(s, params, w_t)
            return s, rec

        _, seis = lax.scan(
            body, _constrain(zero_state(shape, ndim, c2dt2.dtype)), wavelet
        )
        return seis

    mode = gradient if gradient is not None else (
        "rings" if use_custom_vjp else "full")
    if mode == "full":
        return simulate_plain
    if mode == "remat":
        from .propagators.remat import checkpointed_scan

        def simulate_remat(c2dt2, wavelet, src_idx, rcv_idx):
            params = _params(_constrain(c2dt2), src_idx, rcv_idx)

            def body(s, w_t):
                s, rec = step(s, params, w_t)
                return _constrain(s), rec

            nt = int(wavelet.shape[0])
            ck = chunk if chunk > 0 else max(8, int(np.sqrt(nt) + 0.5))
            _, seis = checkpointed_scan(
                body, _constrain(zero_state(shape, ndim, c2dt2.dtype)),
                wavelet, ck,
            )
            return seis

        return simulate_remat
    if mode != "rings":
        raise ValueError(f"unknown gradient mode {mode!r}")

    simulate = jax.custom_vjp(simulate_plain)

    def simulate_fwd(c2dt2, wavelet, src_idx, rcv_idx):
        params = _params(_constrain(c2dt2), src_idx, rcv_idx)

        def body(s, w_t):
            s, rec = step(s, params, w_t)
            return s, (rec, rings.extract(s.p))

        final, (seis, tape) = lax.scan(
            body, _constrain(zero_state(shape, ndim, c2dt2.dtype)), wavelet
        )
        residuals = (c2dt2, wavelet, src_idx, rcv_idx, tape, final.p_prev, final.p)
        return seis, residuals

    def simulate_bwd(residuals, seis_bar):
        c2dt2, wavelet, src_idx, rcv_idx, tape, p_last_prev, p_last = residuals

        # tape[k] holds rings(p_{k+1}); the reverse step at forward index t
        # re-imposes rings(p_{t-1}) = tape[t-2] (zeros for t < 2).
        def shift2(T):
            z = jnp.zeros((2,) + T.shape[1:], T.dtype)
            return jnp.concatenate([z, T[:-2]], axis=0)

        tape_tm1 = jax.tree.map(shift2, tape)

        def step_sc(s, c2, w_t):
            return step(s, _params(c2, src_idx, rcv_idx), w_t)

        def bwd_body(carry, xs):
            sbar, p_t, p_tp1, c2bar = carry
            ring_tm1, w_t, ybar_t = xs
            # 1. reconstruct p_{t-1} by reverse leapfrog + ring re-imposition
            p_tm1 = recon(p_t, p_tp1, c2dt2, src_idx, w_t)
            p_tm1 = rings.impose(p_tm1, ring_tm1)
            # 2. exact transposed step: vjp of the affine forward step
            z = jnp.zeros(shape, c2dt2.dtype)
            s_primal = AcousticState(
                p_prev=p_tm1,
                p=p_t,
                phi=tuple(z for _ in range(ndim)),
                psi=tuple(z for _ in range(ndim)),
            )
            _, pullback = jax.vjp(step_sc, s_primal, c2dt2, w_t)
            sbar_new, c2_inc, w_inc = pullback((sbar, ybar_t))
            return (sbar_new, p_tm1, p_t, c2bar + c2_inc), w_inc

        sbar0 = _constrain(zero_state(shape, ndim, c2dt2.dtype))
        carry0 = _constrain(
            (sbar0, p_last_prev, p_last, jnp.zeros(shape, c2dt2.dtype))
        )
        xs = (tape_tm1, wavelet, seis_bar)
        (_, _, _, c2bar), wbar = lax.scan(bwd_body, carry0, xs, reverse=True)

        # gradient is exact (and defined) only on the interior minus the ring
        c2bar = rings.mask_valid(c2bar)
        return c2bar, wbar, _int_cotangent(src_idx), _int_cotangent(rcv_idx)

    simulate.defvjp(simulate_fwd, simulate_bwd)
    simulate.rings = rings
    return simulate


def make_simulator_vd(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    dtype=jnp.float32,
    use_custom_vjp: bool = True,
):
    """Variable-density acoustic simulator with boundary-saving adjoint.

    ``simulate(kdt2, buoy_half, wavelet, src_idx, rcv_idx) -> seis`` where
    kdt2 = rho c^2 dt^2 on the padded grid and buoy_half is the per-axis
    tuple of half-point buoyancies (kernels.acoustic_vd_jnp.buoy_to_half).
    Differentiable in kdt2, buoy_half and wavelet — the exact-transpose
    argument of make_simulator applies verbatim (the vd step is affine in
    its state), so the reverse pass reconstructs the source field by
    reverse time-stepping with ring re-imposition and pulls BOTH model
    cotangents through jax.vjp of the affine step. Gradients chain to
    (vp, rho) in the caller (see tests/test_variable_density.py).
    """
    from .kernels.acoustic_vd_jnp import (
        VdParams,
        VdState,
        make_vd_recon,
        make_vd_step,
        zero_vd_state,
    )

    z_axis = 0 if grid.ndim == 2 else 1
    prof_n, prof_h = [], []
    for ax in range(grid.ndim):
        kw = dict(n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
                  h=grid.h[ax], dt=dt, c_max=c_max, f0=f0,
                  free_lo=(grid.free_surface and ax == z_axis))
        pn = CpmlProfile.build(**kw)
        ph = CpmlProfile.build(stagger=0.5, **kw)
        shape = [1] * grid.ndim
        shape[ax] = pn.a.shape[0]
        prof_n.append((np.asarray(pn.a.reshape(shape), dtype),
                       np.asarray(pn.b.reshape(shape), dtype)))
        prof_h.append((np.asarray(ph.a.reshape(shape), dtype),
                       np.asarray(ph.b.reshape(shape), dtype)))
    an = tuple(pr[0] for pr in prof_n)
    bn = tuple(pr[1] for pr in prof_n)
    ah = tuple(pr[0] for pr in prof_h)
    bh = tuple(pr[1] for pr in prof_h)

    step = make_vd_step(grid)
    recon = make_vd_recon(grid)
    # composite staggered reach: D+ spans [-(R-1), R], D- spans [-R, R-1]
    # (R = len(staggered taps) = order/2) => 2R-1 cells each side
    rings = RingSpec.build(grid, width=2 * (grid.order // 2) - 1)
    ndim = grid.ndim
    shape = grid.padded_shape

    def _params(kdt2, buoy_half, src_idx, rcv_idx):
        return VdParams(kdt2=kdt2, buoy_half=tuple(buoy_half), an=an, bn=bn,
                        ah=ah, bh=bh, src_idx=src_idx, rcv_idx=rcv_idx)

    def simulate_plain(kdt2, buoy_half, wavelet, src_idx, rcv_idx):
        params = _params(kdt2, buoy_half, src_idx, rcv_idx)

        def body(s, w_t):
            return step(s, params, w_t)

        _, seis = lax.scan(body, zero_vd_state(shape, ndim, kdt2.dtype), wavelet)
        return seis

    if not use_custom_vjp:
        simulate_plain.rings = rings
        return simulate_plain

    simulate = jax.custom_vjp(simulate_plain)

    def simulate_fwd(kdt2, buoy_half, wavelet, src_idx, rcv_idx):
        params = _params(kdt2, buoy_half, src_idx, rcv_idx)

        def body(s, w_t):
            s, rec = step(s, params, w_t)
            return s, (rec, rings.extract(s.p))

        final, (seis, tape) = lax.scan(
            body, zero_vd_state(shape, ndim, kdt2.dtype), wavelet
        )
        residuals = (kdt2, tuple(buoy_half), wavelet, src_idx, rcv_idx,
                     tape, final.p_prev, final.p)
        return seis, residuals

    def simulate_bwd(residuals, seis_bar):
        (kdt2, buoy_half, wavelet, src_idx, rcv_idx, tape,
         p_last_prev, p_last) = residuals

        def shift2(T):
            z = jnp.zeros((2,) + T.shape[1:], T.dtype)
            return jnp.concatenate([z, T[:-2]], axis=0)

        tape_tm1 = jax.tree.map(shift2, tape)

        def step_m(s, kdt2_, buoy_, w_t):
            return step(s, _params(kdt2_, buoy_, src_idx, rcv_idx), w_t)

        def bwd_body(carry, xs):
            sbar, p_t, p_tp1, kbar, bbar = carry
            ring_tm1, w_t, ybar_t = xs
            p_tm1 = recon(p_t, p_tp1, kdt2, buoy_half, src_idx, w_t)
            p_tm1 = rings.impose(p_tm1, ring_tm1)
            z = jnp.zeros(shape, kdt2.dtype)
            s_primal = VdState(
                p_prev=p_tm1, p=p_t,
                phi=tuple(z for _ in range(ndim)),
                psi=tuple(z for _ in range(ndim)),
            )
            _, pullback = jax.vjp(step_m, s_primal, kdt2, buoy_half, w_t)
            sbar_new, k_inc, b_inc, w_inc = pullback((sbar, ybar_t))
            kbar = kbar + k_inc
            bbar = jax.tree.map(jnp.add, bbar, b_inc)
            return (sbar_new, p_tm1, p_t, kbar, bbar), w_inc

        sbar0 = zero_vd_state(shape, ndim, kdt2.dtype)
        carry0 = (
            sbar0, p_last_prev, p_last, jnp.zeros(shape, kdt2.dtype),
            tuple(jnp.zeros(shape, kdt2.dtype) for _ in range(ndim)),
        )
        xs = (tape_tm1, wavelet, seis_bar)
        (_, _, _, kbar, bbar), wbar = lax.scan(bwd_body, carry0, xs, reverse=True)
        kbar = rings.mask_valid(kbar)
        bbar = tuple(rings.mask_valid(b_) for b_ in bbar)
        return (kbar, bbar, wbar, _int_cotangent(src_idx),
                _int_cotangent(rcv_idx))

    simulate.defvjp(simulate_fwd, simulate_bwd)
    simulate.rings = rings
    return simulate


def make_simulator_visco(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    dtype=jnp.float32,
    chunk: int = 0,
):
    """Viscoacoustic (constant-Q single-SLS) simulator.

    ``simulate(kdt2, tau, buoy_half, wavelet, src_idx, rcv_idx) -> seis``
    with kdt2 = rho c^2 dt^2 (padded), tau the per-cell SLS strength
    (kernels.viscoacoustic_jnp.tau_of_q), buoy_half per-axis half-point
    buoyancies. Differentiable in kdt2, tau, buoy_half and wavelet.

    No boundary-saving custom VJP: attenuation dissipates in the INTERIOR,
    so reverse reconstruction is not available (kernels docstring). The
    reverse pass instead uses plain AD over a two-level checkpointed scan
    (propagators.remat.checkpointed_scan) — O(sqrt(nt) * grid) stored
    states, one extra forward recompute. ``chunk=0`` picks ~sqrt(nt)."""
    from .kernels.viscoacoustic_jnp import (
        ViscoParams,
        make_visco_step,
        zero_visco_state,
    )
    from .propagators.remat import checkpointed_scan

    z_axis = 0 if grid.ndim == 2 else 1
    prof_n, prof_h = [], []
    for ax in range(grid.ndim):
        kw = dict(n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
                  h=grid.h[ax], dt=dt, c_max=c_max, f0=f0,
                  free_lo=(grid.free_surface and ax == z_axis))
        pn = CpmlProfile.build(**kw)
        ph = CpmlProfile.build(stagger=0.5, **kw)
        shape_ = [1] * grid.ndim
        shape_[ax] = pn.a.shape[0]
        prof_n.append((np.asarray(pn.a.reshape(shape_), dtype),
                       np.asarray(pn.b.reshape(shape_), dtype)))
        prof_h.append((np.asarray(ph.a.reshape(shape_), dtype),
                       np.asarray(ph.b.reshape(shape_), dtype)))
    an = tuple(pr[0] for pr in prof_n)
    bn = tuple(pr[1] for pr in prof_n)
    ah = tuple(pr[0] for pr in prof_h)
    bh = tuple(pr[1] for pr in prof_h)

    step = make_visco_step(grid, dt, f0)
    ndim = grid.ndim
    shape = grid.padded_shape

    def simulate(kdt2, tau, buoy_half, wavelet, src_idx, rcv_idx):
        params = ViscoParams(
            kdt2=kdt2, tau=tau, buoy_half=tuple(buoy_half),
            an=an, bn=bn, ah=ah, bh=bh,
            src_idx=src_idx, rcv_idx=rcv_idx,
        )

        def body(s, w_t):
            return step(s, params, w_t)

        nt = int(wavelet.shape[0])
        ck = chunk if chunk > 0 else max(8, int(np.sqrt(nt) + 0.5))
        _, seis = checkpointed_scan(
            body, zero_visco_state(shape, ndim, kdt2.dtype), wavelet, ck
        )
        return seis

    return simulate


def make_simulator_offgrid(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    dtype=jnp.float32,
    chunk: int = 0,
):
    """Acoustic simulator with CONTINUOUS-coordinate sources/receivers
    (Kaiser-sinc stencils, Hicks 2002 — acquisition.PointSet).

    ``simulate(c2dt2, wavelet, src_ps, rcv_ps) -> seis`` with src_ps /
    rcv_ps PointSets (or an acquisition.OffGridGeometry's fields). The
    source scatters w_t through the sinc stencil scaled by the LOCAL
    c2dt2 (node-aligned stencils reproduce the on-grid engine exactly);
    recording is the transposed weighted gather, so reciprocity holds to
    discretization accuracy. Differentiable in c2dt2, the wavelet AND the
    stencil weights via the checkpointed scan (promoting to the
    boundary-saving VJP is mechanical — the step stays affine — but
    off-grid runs are accuracy studies, not the throughput path)."""
    from .kernels.acoustic2d_jnp import (
        AcousticParams,
        AcousticState,
        make_acoustic_step,
        zero_state,
    )
    from .propagators.remat import checkpointed_scan

    profs = build_profiles(grid, dt, c_max, f0, dtype=np.float64)
    a = tuple(np.asarray(p[0], dtype) for p in profs)
    b = tuple(np.asarray(p[1], dtype) for p in profs)
    base_step = make_acoustic_step(grid)
    ndim = grid.ndim
    shape = grid.padded_shape
    # dummy on-grid indices far inside the pad (zero-amplitude injection)
    z_idx = jnp.zeros((1, ndim), jnp.int32)

    def simulate(c2dt2, wavelet, src_ps, rcv_ps):
        params = AcousticParams(
            c2dt2=c2dt2, a=a, b=b, src_idx=z_idx, rcv_idx=z_idx
        )
        sc = tuple(src_ps.idx[..., d] for d in range(ndim))

        fs_row = grid.pad if grid.free_surface else None
        z_axis = 0 if ndim == 2 else 1

        def body(s, w_t):
            s, _ = base_step(s, params, 0.0)
            vals = (src_ps.w * c2dt2[sc]) * w_t
            p = s.p.at[sc].add(vals.astype(s.p.dtype), mode="drop")
            if fs_row is not None:  # re-pin: source stencils may touch it
                idx = [slice(None)] * ndim
                idx[z_axis] = slice(fs_row, fs_row + 1)
                p = p.at[tuple(idx)].set(0.0)
            s = AcousticState(p_prev=s.p_prev, p=p, phi=s.phi, psi=s.psi)
            return s, rcv_ps.record(p)

        nt = int(wavelet.shape[0])
        ck = chunk if chunk > 0 else max(8, int(np.sqrt(nt) + 0.5))
        _, seis = checkpointed_scan(
            body, zero_state(shape, ndim, c2dt2.dtype), wavelet, ck
        )
        return seis

    return simulate


def make_simulator_vti(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    dtype=jnp.float32,
    chunk: int = 0,
    use_custom_vjp: bool = True,
):
    """VTI pseudo-acoustic simulator (kernels.vti_jnp).

    ``simulate(vpz2dt2, f_eps, f_del, wavelet, src_idx, rcv_idx) -> seis``
    with vpz2dt2 = vp^2 dt^2 (vertical velocity, padded grid), f_eps =
    1 + 2 epsilon, f_del = 1 + 2 delta (padded; REQUIRE eps >= delta for
    stability — kernels docstring). Differentiable in all three model
    fields and the wavelet. ``c_max`` should be the max HORIZONTAL
    velocity vp*sqrt(1+2 eps) for both the CFL margin and the CPML
    profile design.

    Gradient strategy: the coupled system is lossless and affine in its
    state, so the default is the SAME boundary-saving adjoint as the
    acoustic/vd engines — reverse reconstruction of BOTH fields with
    per-step ring re-imposition and jax.vjp of the affine step (memory
    O(nt * perimeter), not O(nt * grid)). ``use_custom_vjp=False`` falls
    back to the checkpointed-scan AD (chunk=0 ~ sqrt(nt)) — the ground
    truth the custom path is tested against (tests/test_vti.py)."""
    from .kernels.vti_jnp import (
        VtiParams,
        VtiState,
        make_vti_recon,
        make_vti_step,
        zero_vti_state,
    )
    from .propagators.remat import checkpointed_scan

    profs = build_profiles(grid, dt, c_max, f0, dtype=np.float64)
    a = tuple(np.asarray(p[0], dtype) for p in profs)
    b = tuple(np.asarray(p[1], dtype) for p in profs)
    step = make_vti_step(grid)
    recon = make_vti_recon(grid)
    rings = RingSpec.build(grid)
    ndim = grid.ndim
    shape = grid.padded_shape

    def _params(vz2, fe, fd, src_idx, rcv_idx):
        return VtiParams(vpz2dt2=vz2, f_eps=fe, f_del=fd,
                         a=a, b=b, src_idx=src_idx, rcv_idx=rcv_idx)

    def simulate_plain(vpz2dt2, f_eps, f_del, wavelet, src_idx, rcv_idx):
        params = _params(vpz2dt2, f_eps, f_del, src_idx, rcv_idx)

        def body(s, w_t):
            return step(s, params, w_t)

        nt = int(wavelet.shape[0])
        ck = chunk if chunk > 0 else max(8, int(np.sqrt(nt) + 0.5))
        _, seis = checkpointed_scan(
            body, zero_vti_state(shape, ndim, vpz2dt2.dtype), wavelet, ck
        )
        return seis

    if not use_custom_vjp:
        return simulate_plain

    simulate = jax.custom_vjp(simulate_plain)

    def simulate_fwd(vpz2dt2, f_eps, f_del, wavelet, src_idx, rcv_idx):
        params = _params(vpz2dt2, f_eps, f_del, src_idx, rcv_idx)

        def body(s, w_t):
            s, rec = step(s, params, w_t)
            return s, (rec, (rings.extract(s.p), rings.extract(s.q)))

        final, (seis, tape) = lax.scan(
            body, zero_vti_state(shape, ndim, vpz2dt2.dtype), wavelet
        )
        res = (vpz2dt2, f_eps, f_del, wavelet, src_idx, rcv_idx, tape,
               (final.p_prev, final.p, final.q_prev, final.q))
        return seis, res

    def simulate_bwd(res, seis_bar):
        (vz2, fe, fd, wavelet, src_idx, rcv_idx, tape, fin) = res
        p_last_prev, p_last, q_last_prev, q_last = fin

        def shift2(T):
            z = jnp.zeros((2,) + T.shape[1:], T.dtype)
            return jnp.concatenate([z, T[:-2]], axis=0)

        tape_tm1 = jax.tree.map(shift2, tape)

        def step_m(s, vz2_, fe_, fd_, w_t):
            return step(s, _params(vz2_, fe_, fd_, src_idx, rcv_idx), w_t)

        def bwd_body(carry, xs):
            sbar, p_t, p_tp1, q_t, q_tp1, vbar, ebar, dbar = carry
            (ring_p, ring_q), w_t, ybar_t = xs
            p_tm1, q_tm1 = recon(p_t, q_t, p_tp1, q_tp1, vz2, fe, fd,
                                 src_idx, w_t)
            p_tm1 = rings.impose(p_tm1, ring_p)
            q_tm1 = rings.impose(q_tm1, ring_q)
            z = jnp.zeros(shape, vz2.dtype)
            s_primal = VtiState(
                p_prev=p_tm1, p=p_t, q_prev=q_tm1, q=q_t,
                phi=tuple(z for _ in range(ndim)),
                psi=tuple(z for _ in range(ndim)),
            )
            _, pullback = jax.vjp(step_m, s_primal, vz2, fe, fd, w_t)
            sbar_new, v_inc, e_inc, d_inc, w_inc = pullback((sbar, ybar_t))
            return (
                (sbar_new, p_tm1, p_t, q_tm1, q_t,
                 vbar + v_inc, ebar + e_inc, dbar + d_inc),
                w_inc,
            )

        z = jnp.zeros(shape, vz2.dtype)
        sbar0 = zero_vti_state(shape, ndim, vz2.dtype)
        carry0 = (sbar0, p_last_prev, p_last, q_last_prev, q_last, z, z, z)
        xs = (tape_tm1, wavelet, seis_bar)
        (_, _, _, _, _, vbar, ebar, dbar), wbar = lax.scan(
            bwd_body, carry0, xs, reverse=True
        )
        return (rings.mask_valid(vbar), rings.mask_valid(ebar),
                rings.mask_valid(dbar), wbar,
                _int_cotangent(src_idx), _int_cotangent(rcv_idx))

    simulate.defvjp(simulate_fwd, simulate_bwd)
    return simulate


def make_simulator_tti(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    dtype=jnp.float32,
    chunk: int = 0,
    use_custom_vjp: bool = True,
):
    """TTI pseudo-acoustic simulator (kernels.tti_jnp).

    ``simulate(vpz2dt2, f_eps, f_del, cos2t, sin2t, s2t, wavelet,
    src_idx, rcv_idx) -> seis`` with vpz2dt2 = vp^2 dt^2 (symmetry-axis
    velocity, padded grid), f_eps = 1 + 2 eps, f_del = 1 + 2 delta, and
    the padded tilt trig fields cos^2(theta) / sin^2(theta) /
    sin(2 theta) (compute them differentiably from theta upstream —
    TtiFwiProblem does). Differentiable in every model field and the
    wavelet. ``c_max`` should be the max phase velocity
    vp*sqrt(1+2 max(eps,0)) for the CFL margin and CPML design.

    Gradient strategy: the coupled system is lossless and affine in its
    state, so the default is the SAME boundary-saving adjoint as the
    VTI engine — reverse reconstruction of BOTH fields (the interior
    update is the pure rotated-operator leapfrog, kernels.tti_jnp.
    make_tti_recon) with per-step ring re-imposition and jax.vjp of the
    affine step. Rings at width = radius cover the composed mixed
    derivative's corner reach because the frame is a full rectangle.
    ``use_custom_vjp=False`` falls back to plain AD over the
    checkpointed scan (O(sqrt(nt) * grid) states, chunk=0 ~ sqrt(nt)) —
    the ground truth the custom path is tested against
    (tests/test_tti.py)."""
    from .kernels.tti_jnp import (
        TtiParams,
        TtiState,
        make_tti_recon,
        make_tti_step,
        zero_tti_state,
    )
    from .propagators.remat import checkpointed_scan

    profs = build_profiles(grid, dt, c_max, f0, dtype=np.float64)
    a = tuple(np.asarray(p[0], dtype) for p in profs)
    b = tuple(np.asarray(p[1], dtype) for p in profs)
    step = make_tti_step(grid)
    recon = make_tti_recon(grid)
    rings = RingSpec.build(grid)
    ndim = grid.ndim
    shape = grid.padded_shape

    def _params(vz2, fe, fd, c2, s2, st, src_idx, rcv_idx):
        return TtiParams(vpz2dt2=vz2, f_eps=fe, f_del=fd,
                         cos2t=c2, sin2t=s2, s2t=st,
                         a=a, b=b, src_idx=src_idx, rcv_idx=rcv_idx)

    def simulate_plain(vpz2dt2, f_eps, f_del, cos2t, sin2t, s2t,
                       wavelet, src_idx, rcv_idx):
        params = _params(vpz2dt2, f_eps, f_del, cos2t, sin2t, s2t,
                         src_idx, rcv_idx)

        def body(s, w_t):
            return step(s, params, w_t)

        nt = int(wavelet.shape[0])
        ck = chunk if chunk > 0 else max(8, int(np.sqrt(nt) + 0.5))
        _, seis = checkpointed_scan(
            body, zero_tti_state(shape, ndim, vpz2dt2.dtype), wavelet, ck
        )
        return seis

    if not use_custom_vjp:
        return simulate_plain

    simulate = jax.custom_vjp(simulate_plain)

    def simulate_fwd(vpz2dt2, f_eps, f_del, cos2t, sin2t, s2t,
                     wavelet, src_idx, rcv_idx):
        params = _params(vpz2dt2, f_eps, f_del, cos2t, sin2t, s2t,
                         src_idx, rcv_idx)

        def body(s, w_t):
            s, rec = step(s, params, w_t)
            return s, (rec, (rings.extract(s.p), rings.extract(s.q)))

        final, (seis, tape) = lax.scan(
            body, zero_tti_state(shape, ndim, vpz2dt2.dtype), wavelet
        )
        res = (vpz2dt2, f_eps, f_del, cos2t, sin2t, s2t, wavelet,
               src_idx, rcv_idx, tape,
               (final.p_prev, final.p, final.q_prev, final.q))
        return seis, res

    def simulate_bwd(res, seis_bar):
        (vz2, fe, fd, c2, s2, st, wavelet, src_idx, rcv_idx, tape,
         fin) = res
        p_last_prev, p_last, q_last_prev, q_last = fin

        def shift2(T):
            z = jnp.zeros((2,) + T.shape[1:], T.dtype)
            return jnp.concatenate([z, T[:-2]], axis=0)

        tape_tm1 = jax.tree.map(shift2, tape)

        def step_m(s, vz2_, fe_, fd_, c2_, s2_, st_, w_t):
            return step(
                s, _params(vz2_, fe_, fd_, c2_, s2_, st_, src_idx, rcv_idx),
                w_t,
            )

        nmod = 6  # vz2, fe, fd, c2, s2, st

        def bwd_body(carry, xs):
            sbar, p_t, p_tp1, q_t, q_tp1, mbars = carry
            (ring_p, ring_q), w_t, ybar_t = xs
            p_tm1, q_tm1 = recon(p_t, q_t, p_tp1, q_tp1, vz2, fe, fd,
                                 c2, s2, st, src_idx, w_t)
            p_tm1 = rings.impose(p_tm1, ring_p)
            q_tm1 = rings.impose(q_tm1, ring_q)
            z = jnp.zeros(shape, vz2.dtype)
            zs = tuple(z for _ in range(ndim))
            s_primal = TtiState(
                p_prev=p_tm1, p=p_t, q_prev=q_tm1, q=q_t,
                phi_p=zs, psi_p=zs, phi_q=zs, psi_q=zs,
                mix_p=z, mix_q=z,
            )
            _, pullback = jax.vjp(step_m, s_primal, vz2, fe, fd, c2, s2, st,
                                  w_t)
            pulled = pullback((sbar, ybar_t))
            sbar_new, m_incs, w_inc = pulled[0], pulled[1:-1], pulled[-1]
            mbars_new = tuple(mb + mi for mb, mi in zip(mbars, m_incs))
            return (
                (sbar_new, p_tm1, p_t, q_tm1, q_t, mbars_new),
                w_inc,
            )

        z = jnp.zeros(shape, vz2.dtype)
        sbar0 = zero_tti_state(shape, ndim, vz2.dtype)
        carry0 = (sbar0, p_last_prev, p_last, q_last_prev, q_last,
                  tuple(z for _ in range(nmod)))
        xs = (tape_tm1, wavelet, seis_bar)
        (_, _, _, _, _, mbars), wbar = lax.scan(
            bwd_body, carry0, xs, reverse=True
        )
        return tuple(rings.mask_valid(mb) for mb in mbars) + (
            wbar, _int_cotangent(src_idx), _int_cotangent(rcv_idx)
        )

    simulate.defvjp(simulate_fwd, simulate_bwd)
    return simulate
