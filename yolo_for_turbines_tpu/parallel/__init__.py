from .mesh import create_mesh, batch_sharding, replicated_sharding, shard_batch
from .spatial import (
    create_spatial_mesh,
    shard_spatial_batch,
    spatial_image_sharding,
    spatial_target_sharding,
)
