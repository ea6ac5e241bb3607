"""Tracing/profiling utilities (SURVEY.md §5 'Tracing/profiling').

`trace()` wraps jax.profiler.trace and writes a Perfetto/TensorBoard trace
under the run directory; `roofline_report()` runs the bench harness and
prints the achieved fraction of HBM speed-of-light (the P2 number).
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(run_dir: str, label: str = "trace"):
    """Profile a code block: with profiling.trace(run_dir): run_step(...)

    View with TensorBoard (`tensorboard --logdir <run_dir>/profile`) or
    Perfetto. Remember to block_until_ready inside the block.
    """
    import jax

    out = os.path.join(run_dir, "profile", label)
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        yield
    print(f"[tpufwi] trace written to {out}")


def roofline_report(impl: str = "pallas", **kw) -> dict:
    """Measure the fused stencil against the 16 B/cell HBM speed-of-light
    model and print a one-line report. Returns the bench dict."""
    from .bench import bench_stencil

    res = bench_stencil(impl=impl, **kw)
    print(
        f"[tpufwi] {impl} stencil: {res['us_per_step']:.1f} us/step, "
        f"{res['gcell_per_s']:.1f} Gcell/s = {res['pct_of_16B_sol']:.0f}% of "
        "HBM speed-of-light (16 B/cell model)"
    )
    return res
