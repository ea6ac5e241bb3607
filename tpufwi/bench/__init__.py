"""Roofline + throughput harness (SURVEY.md §2 `bench/`, spec P1/P2)."""

from .bench_stencil import bench_stencil, speed_of_light_cu_per_s  # noqa: F401
from .bench_fwi import bench_fwd_adjoint  # noqa: F401
