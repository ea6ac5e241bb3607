"""Time-loop propagators: lax.scan over fused step kernels (SURVEY.md §3)."""

from .boundary import RingSpec  # noqa: F401
from .acoustic2d import AcousticPropagator  # noqa: F401
