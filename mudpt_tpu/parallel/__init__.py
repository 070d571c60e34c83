from mudpt_tpu.parallel.mesh import (
    MeshContext,
    build_mesh,
    shard_batch,
    shard_class_tree,
    replicate,
)

__all__ = [
    "MeshContext",
    "build_mesh",
    "shard_batch",
    "shard_class_tree",
    "replicate",
]
