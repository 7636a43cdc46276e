"""Multi-device execution: mesh helpers, data-parallel batch sharding,
spatially-sharded (halo-exchange) ops."""

from .mesh import batch_sharding, make_mesh, replicated, shard_batch  # noqa: F401
from .spatial import resize_sharded  # noqa: F401
from .pipeline_stages import pipeline_apply  # noqa: F401
