"""Multi-device / multi-host parallel layer (mesh sharding over sites)."""

from .mesh import (  # noqa: F401
    AXIS,
    bootstrap_replicates,
    distributed_init,
    make_mesh,
    resum_blocks,
    shard_sites,
    sharded_suffstats,
)
