"""Multi-host (pod) support.

Single-controller JAX: every host runs the same program;
``jax.distributed.initialize()`` wires the DCN coordination plane, the mesh
spans all pods' chips, and each host feeds its shard of the global batch via
``jax.make_array_from_process_local_data`` (SURVEY.md §2.2 TPU-native
equivalent of a distributed backend — there are no hand-written collectives
anywhere; XLA emits them from shardings).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def maybe_initialize_distributed() -> bool:
    """Initialize the JAX distributed runtime when launched as one process
    of a multi-host job (env-driven: COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID, or a standard multi-host TPU pod environment).
    Returns True if a multi-process runtime is active.

    ORDERING MATTERS: ``jax.distributed.initialize`` must run before
    anything that initializes the XLA backend — even ``jax.process_count()``
    does — so the already-initialized check uses
    ``jax.distributed.is_initialized()`` and the env probes come first."""
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coord = os.environ.get("COORDINATOR_ADDRESS")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["NUM_PROCESSES"]),
            process_id=int(os.environ["PROCESS_ID"]),
        )
        return jax.process_count() > 1
    # multi-host TPU pod: several workers listed, or any MEGASCALE_* config
    # (the launcher env carries prefixed variables, never a bare MEGASCALE)
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    megascale = any(k.startswith("MEGASCALE") for k in os.environ)
    if ("," in hostnames) or megascale:
        jax.distributed.initialize()
        return jax.process_count() > 1
    return False


def host_local_batch_to_global(mesh_ctx, batch: dict) -> dict:
    """Assemble a global device array from each host's local batch shard."""
    out = {}
    for k, v in batch.items():
        out[k] = jax.make_array_from_process_local_data(
            mesh_ctx.batch_sharding, np.asarray(v)
        )
    return out


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0


def broadcast_from_primary(tree):
    """Broadcast a host-side pytree (numpy arrays / python scalars) from
    process 0 to all processes.  Single-process: identity.  Used so
    filesystem-dependent decisions (which checkpoint exists, its weights)
    are made ONCE — per-host disks may disagree, and feeding divergent
    values into a replicated global array is undefined behavior."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
