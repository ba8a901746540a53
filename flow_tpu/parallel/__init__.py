from .domain import ShardedProjection, partition_cells  # noqa: F401
