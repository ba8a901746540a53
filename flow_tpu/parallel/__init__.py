from .domain import ShardedProjection, partition_cells  # noqa: F401
from .halo import HaloPoisson  # noqa: F401
from .halo_step import HaloSpace, HaloProjection  # noqa: F401
from .packed_shard import ShardedPackedStepper  # noqa: F401
