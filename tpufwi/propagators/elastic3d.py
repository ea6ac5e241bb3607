"""3D elastic propagator: (vp, vs, rho) -> seismograms, differentiable.

Driver layer over kernels/elastic3d_jnp.py. Material staggering follows
the 2D elastic engine (propagators/elastic2d.py): mu averaged to the
three edge families with 4-point arithmetic means, buoyancy to the three
face families with 2-point means — all differentiable, so (vp, vs, rho)
gradients chain through automatically.

Gradients default to the boundary-saving rings path (the 2D elastic
staged reconstruction of propagators/elastic2d.py generalized to the
9-field 3D system); ``gradient="remat"`` selects plain AD through the
checkpointed scan (propagators/remat.py, O(sqrt(nt)) stored 27-array
states) — the ground truth the rings path is tested against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cpml import CpmlProfile
from ..grid import Grid
from ..kernels.elastic3d_jnp import (
    Elastic3dParams,
    Elastic3dState,
    make_elastic3d_step,
    zero_elastic3d_state,
)
from .elastic2d import _shift_edge, elastic_cfl_dt
from .remat import checkpointed_scan


def elastic3d_material_fields(grid: Grid, vp, vs, rho, dtype=jnp.float32):
    """Differentiable map to the padded, staggered 3D material fields:
    (lam, lam2mu, mu_xy, mu_xz, mu_yz, buoy_x, buoy_y, buoy_z)."""
    pad = grid.pad
    pd = lambda f: jnp.pad(f.astype(dtype), pad, mode="edge")
    vp_, vs_, rho_ = pd(vp), pd(vs), pd(rho)
    mu = rho_ * vs_**2
    lam = rho_ * vp_**2 - 2.0 * mu
    lam2mu = lam + 2.0 * mu
    # edge-centred shear moduli: 4-point average over the two axes the
    # edge is offset in ((y,z,x) layout: axis 0=y, 1=z, 2=x)
    mu_y = _shift_edge(mu, 0)
    mu_z = _shift_edge(mu, 1)
    mu_x = _shift_edge(mu, 2)
    mu_xy = 0.25 * (mu + mu_x + mu_y + _shift_edge(mu_x, 0))
    mu_xz = 0.25 * (mu + mu_x + mu_z + _shift_edge(mu_x, 1))
    mu_yz = 0.25 * (mu + mu_y + mu_z + _shift_edge(mu_y, 1))
    buoy = 1.0 / rho_
    buoy_x = 0.5 * (buoy + _shift_edge(buoy, 2))
    buoy_y = 0.5 * (buoy + _shift_edge(buoy, 0))
    buoy_z = 0.5 * (buoy + _shift_edge(buoy, 1))
    return lam, lam2mu, mu_xy, mu_xz, mu_yz, buoy_x, buoy_y, buoy_z


def _elastic3d_profiles(grid: Grid, dt: float, c_max: float, f0: float,
                        dtype):
    """Per-axis node/half CPML (a, b) broadcast tuples; z-lo disabled
    under grid.free_surface."""
    prof_n, prof_h = [], []
    for ax in range(3):
        kw = dict(n=grid.shape[ax], pml=grid.pml, radius=grid.radius,
                  h=grid.h[ax], dt=dt, c_max=c_max, f0=f0,
                  free_lo=(grid.free_surface and ax == 1))
        pn = CpmlProfile.build(**kw)
        ph = CpmlProfile.build(stagger=0.5, **kw)
        shape_ = [1, 1, 1]
        shape_[ax] = pn.a.shape[0]
        prof_n.append((np.asarray(pn.a.reshape(shape_), dtype),
                       np.asarray(pn.b.reshape(shape_), dtype)))
        prof_h.append((np.asarray(ph.a.reshape(shape_), dtype),
                       np.asarray(ph.b.reshape(shape_), dtype)))
    return (tuple(p[0] for p in prof_n), tuple(p[1] for p in prof_n),
            tuple(p[0] for p in prof_h), tuple(p[1] for p in prof_h))


def make_elastic3d_simulator(
    grid: Grid,
    dt: float,
    f0: float,
    c_max: float,
    dtype=jnp.float32,
    source_type: str = "pressure",
    record: str = "v",
    chunk: int = 0,
    gradient: str = "rings",
):
    """``simulate(*mats, wavelet, src_idx, rcv_idx) -> seis`` with mats
    as produced by elastic3d_material_fields; differentiable in all
    eight material fields and the wavelet.

    ``gradient`` selects the reverse-pass strategy:
      - "rings" (default): boundary-saving custom VJP — the 2D elastic
        staged reconstruction (propagators/elastic2d.py) generalized to
        the 9-field 3D system: reverse stage-S/stage-V reconstruction
        with per-step ring re-imposition of all nine fields and exact
        staged transposes via jax.vjp. Memory O(nt * surface * radius)
        instead of O(sqrt(nt)) full 27-array states, zero recompute.
      - "remat": plain AD over the checkpointed scan — the ground truth
        the rings path is tested against (tests/test_elastic3d.py).
    """
    import jax as _jax
    from jax import lax

    from ..kernels.elastic3d_jnp import (
        make_elastic3d_reverse_reconstruct,
        make_free_surface_image_3d,
    )
    from .boundary import RingSpec
    from .elastic2d import _int_cotangent

    a_n, b_n, a_h, b_h = _elastic3d_profiles(grid, dt, c_max, f0, dtype)
    step = make_elastic3d_step(grid, dt, source_type, record)
    shape = grid.padded_shape

    def _params(mats, src_idx, rcv_idx):
        lam, lam2mu, mu_xy, mu_xz, mu_yz, bx, by, bz = mats
        return Elastic3dParams(
            lam=lam, lam2mu=lam2mu, mu_xy=mu_xy, mu_xz=mu_xz, mu_yz=mu_yz,
            buoy_x=bx, buoy_y=by, buoy_z=bz,
            a_n=a_n, b_n=b_n, a_h=a_h, b_h=b_h,
            src_idx=src_idx, rcv_idx=rcv_idx,
        )

    def simulate_remat(lam, lam2mu, mu_xy, mu_xz, mu_yz, bx, by, bz,
                       wavelet, src_idx, rcv_idx):
        params = _params((lam, lam2mu, mu_xy, mu_xz, mu_yz, bx, by, bz),
                         src_idx, rcv_idx)

        def body(s, w_t):
            return step(s, params, w_t)

        nt = int(wavelet.shape[0])
        ck = chunk if chunk > 0 else max(8, int(np.sqrt(nt) + 0.5))
        _, seis = checkpointed_scan(
            body, zero_elastic3d_state(shape, lam.dtype), wavelet, ck
        )
        return seis

    if gradient == "remat":
        return simulate_remat
    if gradient != "rings":
        raise ValueError(f"unknown gradient strategy {gradient!r}")

    recon_stress, recon_velocity = make_elastic3d_reverse_reconstruct(
        grid, dt, source_type
    )
    image = make_free_surface_image_3d(grid)
    rings = RingSpec.build(grid)

    simulate = _jax.custom_vjp(simulate_remat)

    def fwd(lam, lam2mu, mu_xy, mu_xz, mu_yz, bx, by, bz,
            wavelet, src_idx, rcv_idx):
        mats = (lam, lam2mu, mu_xy, mu_xz, mu_yz, bx, by, bz)
        params = _params(mats, src_idx, rcv_idx)

        def body(s, w_t):
            s, rec = step(s, params, w_t)
            ring = tuple(rings.extract(f) for f in s.v + s.s)
            return s, (rec, ring)

        final, (seis, tape) = lax.scan(
            body, zero_elastic3d_state(shape, lam.dtype), wavelet
        )
        return seis, (mats, wavelet, src_idx, rcv_idx, tape, final)

    def bwd(res, seis_bar):
        mats, wavelet, src_idx, rcv_idx, tape, final = res
        dtype_ = mats[0].dtype
        params = _params(mats, src_idx, rcv_idx)

        # tape[k] = rings(state after step k); reverse step t re-imposes
        # tape[t-1] (zeros for t = 0: quiescent initial state).
        def shift1(T):
            z = jnp.zeros((1,) + T.shape[1:], T.dtype)
            return jnp.concatenate([z, T[:-1]], axis=0)

        tape_tm1 = jax.tree.map(shift1, tape)

        z = jnp.zeros(shape, dtype_)
        zmem9 = (z,) * 9

        def stage_v_m(v3, s6, memV, m, w_t):
            return step.stage_v(v3, s6, memV, _params(m, src_idx, rcv_idx),
                                w_t)

        def stage_s_m(v3, s6, memS, m, w_t):
            return step.stage_s(v3, s6, memS, _params(m, src_idx, rcv_idx),
                                w_t)

        def body(carry, xs):
            sbar, fields, mbar = carry
            ring_tm1, w_t, ybar_t = xs
            v3, s6 = fields  # (v^{t+1/2}, sigma^{t+1}), exact
            ring_v, ring_s = ring_tm1[:3], ring_tm1[3:]
            # reconstruct sigma_t, re-imposing stress rings before anything
            # reads sigma_t near the ring; re-apply the stress image so the
            # carried fields keep exact ghost rows
            v3p, s6_t = recon_stress(v3, s6, params, w_t)
            s6_t = tuple(rings.impose(f, rg) for f, rg in zip(s6_t, ring_s))
            if image is not None:
                szz_i, sxz_i, syz_i = image[1](s6_t[2], s6_t[4], s6_t[5])
                s6_t = (s6_t[0], s6_t[1], szz_i, s6_t[3], sxz_i, syz_i)

            # stage-S transpose with the carried exact v^{t+1/2} as primal
            _, pullS = _jax.vjp(stage_s_m, v3p, s6_t, zmem9, mats, w_t)
            v3b_S, s6b_S, memSb, mb_S, wb_S = pullS(
                (sbar.v, sbar.s, sbar.memS, ybar_t)
            )

            # reconstruct v^{t-1/2} from the ring-imposed sigma_t
            v3_t = recon_velocity(v3p, s6_t, params)
            v3_t = tuple(rings.impose(f, rg) for f, rg in zip(v3_t, ring_v))
            if image is not None:
                v3_t = image[0](*v3_t)

            # stage-V transpose (sigma_t primal feeds the buoyancy cotangent)
            _, pullV = _jax.vjp(stage_v_m, v3_t, s6_t, zmem9, mats, w_t)
            v3b, s6b_V, memVb, mb_V, wb_V = pullV((v3b_S, sbar.memV))

            sbar_n = Elastic3dState(
                v=v3b,
                s=tuple(a + b for a, b in zip(s6b_S, s6b_V)),
                memV=memVb, memS=memSb,
            )
            m_inc = jax.tree.map(jnp.add, mb_S, mb_V)
            mbar_n = jax.tree.map(jnp.add, mbar, m_inc)
            return (sbar_n, (v3_t, s6_t), mbar_n), wb_S + wb_V

        sbar0 = jax.tree.map(jnp.zeros_like,
                             zero_elastic3d_state(shape, dtype_))
        mbar0 = jax.tree.map(jnp.zeros_like, mats)
        fields0 = (final.v, final.s)
        xs = (tape_tm1, wavelet, seis_bar)
        (_, _, mbar), wbar = lax.scan(body, (sbar0, fields0, mbar0), xs,
                                      reverse=True)
        mbar = tuple(rings.mask_valid(m) for m in mbar)
        return (*mbar, wbar, _int_cotangent(src_idx),
                _int_cotangent(rcv_idx))

    simulate.defvjp(fwd, bwd)
    return simulate


class Elastic3dPropagator:
    """User-facing 3D elastic propagator (pattern of ElasticPropagator)."""

    def __init__(self, grid: Grid, dt: float, f0: float, vp_max: float,
                 dtype=jnp.float32, source_type: str = "pressure",
                 record: str = "v", chunk: int = 0,
                 gradient: str = "rings"):
        limit = elastic_cfl_dt(grid.h, vp_max, grid.order, safety=1.0)
        if dt > limit:
            raise ValueError(
                f"dt={dt:.6g} exceeds elastic CFL limit {limit:.6g}"
            )
        self.grid = grid
        self.dt = float(dt)
        self.dtype = dtype
        self._f0 = float(f0)
        self._vp_max = float(vp_max)
        self._source_type = source_type
        self._record = record
        self._simulate = make_elastic3d_simulator(
            grid, dt, f0, vp_max, dtype, source_type, record, chunk,
            gradient
        )

    def material_fields(self, vp, vs, rho):
        return elastic3d_material_fields(self.grid, vp, vs, rho, self.dtype)

    def __call__(self, vp, vs, rho, geom, wavelet):
        mats = self.material_fields(vp, vs, rho)
        return self._simulate(
            *mats, wavelet.astype(self.dtype), geom.src_idx, geom.rcv_idx
        )

    def forward_snapshots(self, vp, vs, rho, geom, wavelet,
                          stride: int = 1, field: str = "vz"):
        """Non-differentiable forward that also returns interior snapshots
        of one component every ``stride`` steps (QC/movies). ``field``:
        vx, vy, vz, sxx, syy, szz, sxy, sxz, syz, or "p"
        (= -(sxx+syy+szz)/3)."""
        a_n, b_n, a_h, b_h = _elastic3d_profiles(
            self.grid, self.dt, self._vp_max, self._f0, self.dtype)
        step = make_elastic3d_step(self.grid, self.dt, self._source_type,
                                   self._record)
        mats = self.material_fields(vp, vs, rho)
        params = Elastic3dParams(
            lam=mats[0], lam2mu=mats[1], mu_xy=mats[2], mu_xz=mats[3],
            mu_yz=mats[4], buoy_x=mats[5], buoy_y=mats[6], buoy_z=mats[7],
            a_n=a_n, b_n=b_n, a_h=a_h, b_h=b_h,
            src_idx=geom.src_idx, rcv_idx=geom.rcv_idx,
        )
        interior = self.grid.interior
        v_names = ("vx", "vy", "vz")
        s_names = ("sxx", "syy", "szz", "sxy", "sxz", "syz")

        def grab(s):
            if field == "p":
                return (-(s.s[0] + s.s[1] + s.s[2]) / 3.0)[interior]
            if field in v_names:
                return s.v[v_names.index(field)][interior]
            return s.s[s_names.index(field)][interior]

        def body(s, w_t):
            s, rec = step(s, params, w_t)
            return s, (rec, grab(s))

        state0 = zero_elastic3d_state(self.grid.padded_shape, self.dtype)
        _, (seis, snaps) = jax.lax.scan(
            body, state0, wavelet.astype(self.dtype))
        return seis, snaps[::stride] if stride > 1 else snaps
