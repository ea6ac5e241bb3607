"""Time-loop propagators: lax.scan over fused step kernels (SURVEY.md §3)."""

from .boundary import RingSpec  # noqa: F401
from .acoustic2d import AcousticPropagator  # noqa: F401
from .elastic2d import ElasticPropagator, elastic_cfl_dt  # noqa: F401
from .acoustic3d import ShardedAcoustic3D, domain_sharding  # noqa: F401
