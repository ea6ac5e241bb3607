"""User-facing acoustic propagator (2D and 3D share this implementation).

Realises SURVEY.md §3.1: the whole time loop is one `lax.scan` inside one
XLA program — control crosses host→device exactly once per shot batch.

The propagator is a host-side factory: it freezes the static configuration
(grid geometry, dt, CPML profiles, FD taps) and exposes pure, jit/vmap/
shard_map-composable functions of the traced inputs (vp, wavelet, geometry).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..acquisition import Geometry
from ..adjoint import make_simulator
from ..cpml import build_profiles
from ..grid import Grid
from ..kernels.acoustic2d_jnp import AcousticParams, make_acoustic_step, zero_state
from ..propagators.boundary import RingSpec


class AcousticPropagator:
    """Acoustic constant-density propagator with CPML, for grid.ndim in {2, 3}.

    Usage:
        prop = AcousticPropagator(grid, dt, f0, c_max)
        seis = prop(vp, geom, wavelet)              # differentiable in vp
        seis = jax.vmap(lambda g: prop(vp, g, w))(batched_geom)   # multishot
    """

    def __init__(
        self,
        grid: Grid,
        dt: float,
        f0: float,
        c_max: float,
        dtype=jnp.float32,
        impl: str = "auto",
        tape_dtype=None,
    ):
        """impl: 'pallas' (fused single-step TPU kernels),
        'pallas_scanres' (whole-scan-resident kernels — boundary-ring
        tape; requires all receivers of a shot within a 16-row slab,
        e.g. surface acquisition), 'pallas_scansnap' (whole-scan with a
        bf16 full-field lap tape: the reverse pass skips reconstruction
        — 2 propagation sweeps per gradient instead of 3 — at
        nt*NZ*NX*2 bytes of tape HBM and a ~1e-4..1e-3 bf16-rounding
        gradient error; same receiver-slab contract), 'jnp' (XLA twin —
        CPU, fp64, 3D), or 'auto'.

        For 3D grids: 'pallas3d' (the fused v2 forward+backward engine,
        adjoint3d_pallas.make_simulator3d_fused — 2.2x end-to-end over
        the XLA engine at Overthrust-demo scale), 'pallas3d_bf16' (same
        with the ring tape stored bf16 — halves tape HBM at a measured
        ~4e-3 relative gradient error), or 'jnp'.

        'auto' resolves to 'jnp' off-TPU (or for fp64); on a TPU
        backend with a 2D fp32 grid the choice between the whole-scan-
        resident engine (the benched fastest path) and the single-step
        engine is geometry-dependent (the scanres receiver-slab
        contract), so it is deferred: each __call__ with a CONCRETE
        geometry picks scanres when every shot's receivers fit one
        8-aligned 16-row slab, else falls back to 'pallas' with a logged
        reason. On a TPU backend with a 3D fp32 grid, 'auto' picks the
        fused engine whenever its boundary-ring tape fits the HBM
        budget (fp32 tape first, bf16 when fp32 would not fit), falling
        back to 'jnp' with a logged reason. FwiProblem resolves it once
        up front against the survey (fix_impl_for), so the driver path
        gets the benched engine too.

        tape_dtype (jnp engine only, e.g. jnp.bfloat16): store the
        boundary-ring tape compressed — halves tape memory at a measured
        ~1e-3 relative gradient error (adjoint.make_simulator)."""
        grid.check_dt(dt, c_max)
        self.grid = grid
        self.dt = float(dt)
        self.f0 = float(f0)
        self.c_max = float(c_max)
        self.dtype = dtype
        demoted = None
        if impl == "auto":
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
            if not (grid.ndim in (2, 3) and dtype == jnp.float32 and on_tpu):
                impl = "jnp"
                demoted = (
                    "auto: off the TPU/fp32 tier -> jnp"
                    if on_tpu else "auto: non-TPU backend -> jnp"
                )
        self.impl = impl
        # human-readable account of the last impl='auto' resolution
        # (logged into the driver JSONL so every run names its engine)
        self.resolve_note = (
            demoted or ("explicit" if impl != "auto" else "unresolved")
        )
        self._sims: dict = {}
        self._tape_dtype = tape_dtype
        if tape_dtype is not None and impl != "jnp":
            raise ValueError("tape_dtype is a jnp-engine option")
        if impl != "auto":
            self._sim(impl)  # build eagerly: surface config errors here
        profs = build_profiles(grid, dt, c_max, f0, dtype=np.float64)
        self._a = tuple(np.asarray(p[0], dtype) for p in profs)
        self._b = tuple(np.asarray(p[1], dtype) for p in profs)
        self._step = make_acoustic_step(grid)
        self.rings = RingSpec.build(grid)

    # -- engine selection ----------------------------------------------------

    def _sim(self, impl: str):
        """Build (once) and return the simulate() of one engine.

        Deferred 'auto' resolution means this can run INSIDE a jit
        trace; the engines' constant arrays (CPML strip profiles, FD
        band matrices) must not become tracers captured in the cached
        closure (a leaked-tracer error on the next jit), so the
        construction is forced to compile-time eval."""
        if impl not in self._sims:
            with jax.ensure_compile_time_eval():
                self._build_sim(impl)
        return self._sims[impl]

    def _build_sim(self, impl: str):
        if impl == "pallas":
            from ..adjoint_pallas import make_simulator_pallas

            if self.dtype != jnp.float32:
                raise ValueError("pallas path is fp32 only")
            self._sims[impl] = make_simulator_pallas(
                self.grid, self.dt, self.f0, self.c_max
            )
        elif impl in ("pallas_scanres", "pallas_scansnap"):
            from ..adjoint_pallas_scanres import (
                make_simulator_pallas_scanres,
            )

            if self.dtype != jnp.float32:
                raise ValueError("pallas path is fp32 only")
            self._sims[impl] = make_simulator_pallas_scanres(
                self.grid, self.dt, self.f0, self.c_max,
                tape_mode="snap" if impl == "pallas_scansnap" else "rings",
            )
        elif impl in ("pallas3d", "pallas3d_bf16"):
            from ..adjoint3d_pallas import make_simulator3d_fused

            if self.dtype != jnp.float32:
                raise ValueError("pallas path is fp32 only")
            self._sims[impl] = make_simulator3d_fused(
                self.grid, self.dt, self.f0, self.c_max,
                tape_dtype=jnp.bfloat16 if impl == "pallas3d_bf16" else None,
            )
        else:
            self._sims[impl] = make_simulator(
                self.grid, self.dt, self.f0, self.c_max, self.dtype,
                tape_dtype=self._tape_dtype,
            )

    # Snapshot-engine eligibility bounds (measured, BASELINE.md round-3):
    # the bf16 lap tape costs nt*NZ*NX*2 bytes of HBM per in-flight shot
    # (6.6 GB at the official bench config fits the 15.75 GB v5e chip
    # with room for data/model/workspace) and its double-buffered
    # out-stream costs 2*CH*NZ*NX*2 bytes of VMEM (42 MB at bench scale
    # against the kernel's 120 MB budget).
    SNAP_TAPE_BUDGET_BYTES = 8 * 1024**3
    SNAP_VMEM_BUDGET_BYTES = 60 * 1024**2

    # 3D fused-engine ring-tape budgets (v5e: 15.75 GB HBM; the full-scale
    # probe runs/fullscale3d holds an 11.5 GB bf16 tape plus fields). The
    # fp32 threshold is where auto switches the tape to bf16 (measured
    # gradient error ~4e-3 relative, runs/fullscale3d summary) instead of
    # falling back to the slow engine.
    TAPE3D_FP32_BUDGET_BYTES = 6 * 1024**3
    TAPE3D_BF16_BUDGET_BYTES = 12 * 1024**3

    def _tape3d_cells_per_step(self) -> int:
        """Ring-tape cells per time step of the fused 3D engine: the six
        8-aligned face slabs of kernels/acoustic3d_bwd_pallas.ring_windows,
        sliced from the block-extended field (adjoint3d_pallas._fwd_scan)."""
        from ..kernels.acoustic3d_bwd_pallas import ring_windows
        from ..kernels.acoustic3d_pallas import y_extended, z_extended

        wins = ring_windows(self.grid)
        NYe = y_extended(self.grid, 16)
        NZe = z_extended(self.grid, 64)
        NX = self.grid.padded_shape[2]
        return (
            sum(w for _, w in wins[0]) * NZe * NX
            + NYe * sum(w for _, w in wins[1]) * NX
            + NYe * NZe * sum(w for _, w in wins[2])
        )

    def _resolve_impl_3d(self, nt: int | None) -> str:
        """impl='auto' on the TPU/3D/fp32 tier: the fused v2 engine
        (adjoint3d_pallas, 2.2x end-to-end over the XLA engine at
        Overthrust-demo scale) whenever its boundary-ring tape fits the
        HBM budgets above — fp32 tape first, bf16 when fp32 would not
        fit — with a logged fallback to the XLA twin otherwise."""
        log = logging.getLogger(__name__)
        cells = self._tape3d_cells_per_step()
        if nt is None:
            reason = "wavelet length unknown (ring tape cannot be sized)"
        elif nt * cells * 4 <= self.TAPE3D_FP32_BUDGET_BYTES:
            self.resolve_note = "fused engine, fp32 ring tape"
            return "pallas3d"
        elif nt * cells * 2 <= self.TAPE3D_BF16_BUDGET_BYTES:
            self.resolve_note = (
                f"fused engine, bf16 ring tape ({nt * cells * 2 / 2**30:.1f}"
                " GiB; fp32 tape over budget)"
            )
            return "pallas3d_bf16"
        else:
            reason = (
                f"ring tape {nt * cells * 2 / 2**30:.1f} GiB (bf16) exceeds "
                f"the {self.TAPE3D_BF16_BUDGET_BYTES / 2**30:.0f} GiB budget"
            )
        self.resolve_note = f"jnp fallback: {reason}"
        log.info("impl='auto' (3D): falling back to the jnp engine: %s",
                 reason)
        return "jnp"

    def resolve_impl(self, geom: Geometry | None = None,
                     rcv_rows: int = 16, nt: int | None = None) -> str:
        """The engine a call with ``geom`` (and a length-``nt`` wavelet)
        will use. For impl='auto' on the TPU/2D/fp32 tier this is the
        whole-scan receiver-slab check (every shot's receiver rows within
        ``rcv_rows`` of their 8-aligned slab start); when it holds, the
        SNAPSHOT engine (2 propagation sweeps per gradient — the rings
        engine is measured at its 3-sweep floor) is picked whenever its
        bf16 lap tape fits the budgets above, the rings whole-scan engine
        otherwise. Traced geometry (inside jit/vmap with geometry
        arguments) cannot be checked and falls back to the single-step
        engine."""
        if self.impl != "auto":
            return self.impl
        if self.grid.ndim == 3:
            return self._resolve_impl_3d(nt)
        reason = None
        if geom is None:
            reason = "no geometry to check the scanres receiver slab against"
        else:
            try:
                rz = np.asarray(geom.rcv_idx[..., 0]).reshape(
                    -1, geom.rcv_idx.shape[-2]
                )
                spread = int((rz.max(1) - (rz.min(1) // 8) * 8 + 1).max())
                if spread > rcv_rows:
                    reason = (
                        f"receiver rows span {spread} > {rcv_rows} from the "
                        "8-aligned slab start (scanres contract)"
                    )
            except (jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError):
                reason = "geometry is traced (jit/vmap argument)"
        log = logging.getLogger(__name__)
        if reason is not None:
            log.info(
                "impl='auto': falling back to the single-step pallas "
                "engine: %s", reason,
            )
            self.resolve_note = f"single-step fallback: {reason}"
            return "pallas"
        NZ, NX = self.grid.padded_shape
        from ..kernels.acoustic2d_pallas_scanres import CH

        if nt is None:
            snap_reason = "wavelet length unknown (tape cannot be sized)"
        elif nt * NZ * NX * 2 > self.SNAP_TAPE_BUDGET_BYTES:
            snap_reason = (
                f"bf16 lap tape {nt * NZ * NX * 2 / 2**30:.1f} GiB exceeds "
                f"the {self.SNAP_TAPE_BUDGET_BYTES / 2**30:.0f} GiB budget"
            )
        elif 2 * CH * NZ * NX * 2 > self.SNAP_VMEM_BUDGET_BYTES:
            snap_reason = "snapshot out-stream exceeds the VMEM budget"
        else:
            self.resolve_note = "whole-scan snapshot engine"
            return "pallas_scansnap"
        log.info(
            "impl='auto': whole-scan rings engine (snapshot ineligible: "
            "%s)", snap_reason,
        )
        self.resolve_note = f"rings engine (snapshot ineligible: {snap_reason})"
        return "pallas_scanres"

    def fix_impl_for(self, geom: Geometry, nt: int | None = None) -> str:
        """Resolve impl='auto' ONCE against a concrete (possibly stacked)
        survey geometry and wavelet length, and pin it — used by
        FwiProblem so the jitted objectives (whose geometry arguments are
        traced) still get the whole-scan engine when the survey satisfies
        its contract."""
        self.impl = self.resolve_impl(geom, nt=nt)
        return self.impl

    # -- model prep ---------------------------------------------------------

    def c2dt2(self, vp: jax.Array) -> jax.Array:
        """Differentiable map: physical vp -> padded (c*dt)^2."""
        pad = self.grid.pad
        vpad = jnp.pad(vp.astype(self.dtype), [(pad, pad)] * self.grid.ndim, mode="edge")
        return (vpad * self.dt) ** 2

    # -- public entry points ------------------------------------------------

    def __call__(self, vp: jax.Array, geom: Geometry, wavelet: jax.Array) -> jax.Array:
        """Seismogram (nt, nrec); differentiable in vp and wavelet via the
        boundary-saving custom VJP (tpufwi/adjoint.py)."""
        simulate = self._sim(
            self.resolve_impl(geom, nt=int(wavelet.shape[0]))
        )
        return simulate(
            self.c2dt2(vp), wavelet.astype(self.dtype), geom.src_idx, geom.rcv_idx
        )

    def forward_snapshots(
        self, vp: jax.Array, geom: Geometry, wavelet: jax.Array, stride: int = 1
    ):
        """Non-differentiable forward that also returns interior wavefield
        snapshots every `stride` steps (oracle comparison, QC plots)."""
        params = AcousticParams(
            c2dt2=self.c2dt2(vp),
            a=self._a,
            b=self._b,
            src_idx=geom.src_idx,
            rcv_idx=geom.rcv_idx,
        )
        interior = self.grid.interior

        def body(s, w_t):
            s, rec = self._step(s, params, w_t)
            return s, (rec, s.p[interior])

        state0 = zero_state(self.grid.padded_shape, self.grid.ndim, self.dtype)
        _, (seis, snaps) = lax.scan(body, state0, wavelet.astype(self.dtype))
        return seis, snaps[::stride] if stride > 1 else snaps

    def illumination(self, vp, geom, wavelet):
        """Source illumination sum_t p_t^2 on the physical grid (the
        pseudo-Hessian diagonal for preconditioning [GENRE: Shin 2001]).

        On the fused 3D engines this runs the fused forward step (the
        engine exposes an ``illumination`` attribute): the generic
        single-step path below is unproven at Overthrust-fullscale
        shapes, where only the fused kernels are the validated path."""
        sim = self._sim(self.resolve_impl(geom, nt=int(wavelet.shape[0])))
        fused_il = getattr(sim, "illumination", None)
        if fused_il is not None:
            return fused_il(
                self.c2dt2(vp), wavelet.astype(self.dtype), geom.src_idx
            )
        params = AcousticParams(
            c2dt2=self.c2dt2(vp), a=self._a, b=self._b,
            src_idx=geom.src_idx, rcv_idx=geom.rcv_idx,
        )
        interior = self.grid.interior

        def body(carry, w_t):
            s, acc = carry
            s, _ = self._step(s, params, w_t)
            return (s, acc + s.p[interior] ** 2), None

        state0 = zero_state(self.grid.padded_shape, self.grid.ndim, self.dtype)
        acc0 = jnp.zeros(self.grid.shape, self.dtype)
        (_, illum), _ = lax.scan(body, (state0, acc0), wavelet.astype(self.dtype))
        return illum

    def wavefield_energy(self, vp, geom, wavelet):
        """Interior energy per step (CPML efficacy diagnostics)."""
        params = AcousticParams(
            c2dt2=self.c2dt2(vp), a=self._a, b=self._b,
            src_idx=geom.src_idx, rcv_idx=geom.rcv_idx,
        )
        interior = self.grid.interior

        def body(s, w_t):
            s, _ = self._step(s, params, w_t)
            return s, jnp.sum(s.p[interior] ** 2)

        state0 = zero_state(self.grid.padded_shape, self.grid.ndim, self.dtype)
        _, e = lax.scan(body, state0, wavelet.astype(self.dtype))
        return e
