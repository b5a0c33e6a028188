"""Mesh + sharding utilities (data-parallel over ICI, multi-host ready)."""

from denseclip_vit_multimodal_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    mesh_from_config,
    replicate,
    shard_batch,
)
