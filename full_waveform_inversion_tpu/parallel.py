"""Parallelism: meshes, shot DP, domain decomposition (alias of tpufwi)."""

from tpufwi.sharding import (  # noqa: F401
    halo_exchange,
    make_mesh,
    replicate,
    shard_shots,
    shot_parallel_loss,
)
from tpufwi.propagators.acoustic3d import domain_sharding, ShardedAcoustic3D  # noqa: F401
