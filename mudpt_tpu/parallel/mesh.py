"""Device mesh + sharding layout.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference trainers/mudpt.py:230-233).  The TPU-native layout here is a 2-D
``Mesh(('data', 'model'))``:

  * ``data``  — batch dimension of the image tower (pure DP; XLA inserts the
    ICI gradient all-reduce);
  * ``model`` — the CLASS dimension of the text tower.  Prompt tuning
    re-encodes all n_cls class prompts every step (SURVEY.md §7 "text tower
    recompute"), so for large class counts (ImageNet: 1000) the text
    transformer is the dominant cost; sharding classes across chips is the
    honest "tensor parallel" axis of this workload.  Logits end up sharded
    (data, model); the softmax/logsumexp reduction over the model axis is
    inserted by XLA from the sharding annotations.

Everything is expressed with ``jax.sharding`` annotations on global arrays —
no explicit collectives; multi-host setups call
``jax.distributed.initialize`` first and feed per-host batches via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MeshContext:
    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    @property
    def n_model(self) -> int:
        return self.mesh.shape["model"]

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def batch_sharding(self) -> NamedSharding:
        return self.sharding("data")

    @property
    def class_sharding(self) -> NamedSharding:
        return self.sharding("model")

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()


def build_mesh(cfg=None, devices=None) -> MeshContext:
    import warnings

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_model = (cfg.PARALLEL.MODEL if cfg is not None else 1) or 1
    if n_model > n:
        raise ValueError(
            f"PARALLEL.MODEL={n_model} exceeds the {n} available devices"
        )
    n_data = (cfg.PARALLEL.DATA if cfg is not None else 0) or (n // n_model)
    if n_data * n_model > n:
        raise ValueError(
            f"PARALLEL.DATA x PARALLEL.MODEL = {n_data}x{n_model} exceeds "
            f"the {n} available devices"
        )
    if n_data * n_model < n:
        warnings.warn(
            f"mesh uses {n_data * n_model} of {n} devices "
            f"(data={n_data}, model={n_model}); set PARALLEL.DATA/MODEL to "
            "cover every chip",
            stacklevel=2,
        )
    used = devices[: n_data * n_model]
    arr = np.asarray(used).reshape(n_data, n_model)
    return MeshContext(Mesh(arr, ("data", "model")))


def _shard_rows_nd(ctx: Optional[MeshContext], axis_names, fn, x, *replicated):
    """Run ``fn(x, *replicated)`` with x's N leading axes sharded over
    ``axis_names`` via ``shard_map`` — the ONE implementation behind
    :func:`shard_rows` (N=1) and :func:`shard_rows_2d` (N=2), so the
    fallback ladder and the shard_map plumbing cannot diverge.

    Pallas custom calls are not SPMD-partitionable: under plain ``jit`` the
    partitioner ALL-GATHERS their operands onto every device and
    replicates the output (measured: a batch-sharded pallas_call compiles
    to 4 all-gathers on an 8-device mesh — tests/test_shard_rows.py pins
    both directions), so the fused-block towers would stop scaling past
    one chip.  ``shard_map`` runs the tower body once per shard: the row
    axes (image batch / class rows / instance x class blocks) are
    embarrassingly parallel, and the replicated operands (frozen block
    params, deep prompts, masks) ride in as ``P()`` — shard_map's
    transpose inserts the psum of their cotangents, which is exactly the
    cross-shard prompt-gradient reduction data parallelism needs.

    Falls back to a plain call whenever the wrap is pointless or invalid:
    no mesh, the axes span one device, the block doesn't divide, or the
    XLA block impl is active (XLA partitions its own HLO natively)."""
    if ctx is None:
        return fn(x, *replicated)
    sizes = [ctx.mesh.shape.get(a, 1) for a in axis_names]
    total = 1
    for s in sizes:
        total *= s
    if total <= 1 or any(x.shape[i] % s for i, s in enumerate(sizes)):
        return fn(x, *replicated)
    from mudpt_tpu.models.layers import resolve_block_impl

    if resolve_block_impl() != "pallas":
        return fn(x, *replicated)
    from jax import shard_map

    spec = P(*axis_names)
    in_specs = (spec,) + tuple(P() for _ in replicated)
    return shard_map(
        fn,
        mesh=ctx.mesh,
        in_specs=in_specs,
        out_specs=spec,
        check_vma=False,
    )(x, *replicated)


def shard_rows(ctx: Optional[MeshContext], axis_name: str, fn, x, *replicated):
    """x's leading axis sharded over ``axis_name`` (see _shard_rows_nd)."""
    return _shard_rows_nd(ctx, (axis_name,), fn, x, *replicated)


def shard_rows_2d(ctx: Optional[MeshContext], axis_names, fn, x, *replicated):
    """x's leading TWO axes sharded over ``axis_names = (a0, a1)`` — the
    CoCoOp layout: (instances, classes, seq, D) with instances on ``data``
    and classes on ``model``; each shard holds its local block and the
    whole device grid works the O(B·n_cls) text encode with no resharding
    (see _shard_rows_nd)."""
    return _shard_rows_nd(ctx, tuple(axis_names), fn, x, *replicated)


def shard_batch(ctx: MeshContext, batch: dict, host_local: bool = False) -> dict:
    """Pad the batch to a multiple of n_data and shard it on the data axis.

    Multi-process (pod) mode: every host's input pipeline produces the SAME
    global batch (loaders are seed-deterministic), and each of this host's
    devices pulls exactly its shard from that host copy via
    ``jax.make_array_from_callback`` — correct for ANY batch size and any
    data-axis/process-count split, including data axes narrower than the
    process count (where shards replicate across hosts).  (v1 strategy:
    each host decodes the full global batch — correct and simple; per-host
    item sharding is the scale-up path.)"""
    n_proc = jax.process_count()
    out = {}
    if host_local and n_proc > 1:
        # DATALOADER.HOST_SHARD: ``batch`` is THIS host's rows of the global
        # batch.  The hosts' row blocks are contiguous along the data axis
        # (build_mesh lays devices out in id order), so each local shard
        # must tile the per-host slice of the data axis evenly.
        if ctx.n_data % n_proc:
            raise ValueError(
                f"host-sharded batches need the data axis ({ctx.n_data}) "
                f"to divide by the process count ({n_proc}); use "
                "DATALOADER.HOST_SHARD False for this mesh"
            )
        rows_unit = ctx.n_data // n_proc
        for k, v in batch.items():
            v = np.asarray(v)
            rem = v.shape[0] % rows_unit
            if rem:
                pad = rows_unit - rem
                widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
                v = np.pad(v, widths)
                if k == "valid":
                    v[-pad:] = False
            out[k] = jax.make_array_from_process_local_data(
                ctx.batch_sharding, v,
                global_shape=(v.shape[0] * n_proc,) + v.shape[1:],
            )
        return out
    for k, v in batch.items():
        v = np.asarray(v)
        rem = v.shape[0] % ctx.n_data
        if rem:
            pad = ctx.n_data - rem
            widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
            v = np.pad(v, widths)
            if k == "valid":
                v[-pad:] = False
        if n_proc > 1:
            out[k] = jax.make_array_from_callback(
                v.shape, ctx.batch_sharding, lambda idx, v=v: v[idx]
            )
        else:
            out[k] = jax.device_put(v, ctx.batch_sharding)
    return out


def host_rows_slice(ctx: MeshContext, n_local: int) -> slice:
    """Where THIS host's ``n_local`` (unpadded) items sit inside the global
    array assembled by ``shard_batch(host_local=True)``: each host
    contributes ``ceil(n_local / rows_unit) * rows_unit`` padded rows, laid
    out contiguously in process order.  Kept here, next to the padding it
    mirrors, so consumers (pod-sharded eval) cannot drift from the layout."""
    rows_unit = ctx.n_data // jax.process_count()
    host_rows = -(-n_local // rows_unit) * rows_unit
    start = jax.process_index() * host_rows
    return slice(start, start + n_local)


def shard_class_tree(ctx: MeshContext, tree, pad_to: Optional[int] = None):
    """Shard leading (class) axis on the model axis, padding as needed."""

    def place(x):
        x = np.asarray(x)
        n = x.shape[0]
        target = pad_to or (-(-n // ctx.n_model) * ctx.n_model)
        if target != n:
            widths = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
            x = np.pad(x, widths)
        return jax.device_put(x, ctx.class_sharding)

    return jax.tree_util.tree_map(place, tree)


def replicate(ctx: MeshContext, tree):
    return jax.device_put(tree, ctx.replicated)
