from mudpt_tpu.parallel.mesh import (
    MeshContext,
    build_mesh,
    host_rows_slice,
    shard_batch,
    shard_class_tree,
    replicate,
)

__all__ = [
    "MeshContext",
    "build_mesh",
    "host_rows_slice",
    "shard_batch",
    "shard_class_tree",
    "replicate",
]
