"""Multi-chip scaling of the Pallas tier: pallas custom calls are NOT
SPMD-partitionable — under plain jit the partitioner ALL-GATHERS their
operands onto every device and replicates the output — so the fused-block
towers run per-shard via shard_map (parallel/mesh.shard_rows).  These tests
pin (a) the motivating failure mode and its fix on a toy kernel, and (b)
numerical equivalence of the REAL sharded MuDPT step with the pallas
(interpret) blocks active on the 4x2 device mesh."""

import pytest

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mudpt_tpu.models import layers as L
from mudpt_tpu.parallel.mesh import MeshContext, shard_rows, shard_rows_2d


def _toy_pallas(x):
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    return pl.pallas_call(
        kern,
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=True,
    )(x)


def test_plain_jit_all_gathers_pallas_operands(monkeypatch):
    """The failure mode this subsystem exists for: a batch-sharded
    pallas_call under plain jit compiles to all-gathers (full operand on
    every device) and a replicated output — no scaling past one chip."""
    devices = jax.devices()
    mesh = Mesh(np.array(devices[:8]).reshape(8), ("data",))
    x = jax.device_put(
        jnp.ones((16, 8, 128), jnp.float32), NamedSharding(mesh, P("data"))
    )
    comp = jax.jit(_toy_pallas).lower(x).compile()
    assert comp.as_text().count("all-gather") > 0
    out = jax.jit(_toy_pallas)(x)
    assert out.sharding.spec == P()  # replicated — the scaling loss


def test_shard_rows_runs_per_shard(monkeypatch):
    """shard_rows wraps the same kernel in shard_map: zero all-gathers,
    sharded output, identical values."""
    monkeypatch.setattr(L, "_BLOCK_IMPL", "pallas")
    devices = jax.devices()
    ctx = MeshContext(Mesh(np.array(devices[:8]).reshape(8, 1), ("data", "model")))
    x_host = np.random.RandomState(0).randn(16, 8, 128).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_host), ctx.batch_sharding)

    fn = functools.partial(shard_rows, ctx, "data", _toy_pallas)
    comp = jax.jit(fn).lower(x).compile()
    assert comp.as_text().count("all-gather") == 0
    out = jax.jit(fn)(x)
    assert out.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(out), x_host * 2.0)

    # fallbacks: no mesh / 1-wide axis / indivisible rows / xla impl
    np.testing.assert_array_equal(
        np.asarray(shard_rows(None, "data", _toy_pallas, jnp.asarray(x_host))),
        x_host * 2.0,
    )
    np.testing.assert_array_equal(
        np.asarray(shard_rows(ctx, "model", _toy_pallas, jnp.asarray(x_host))),
        x_host * 2.0,
    )
    odd = jnp.asarray(x_host[:15])
    np.testing.assert_array_equal(
        np.asarray(shard_rows(ctx, "data", _toy_pallas, odd)), x_host[:15] * 2.0
    )
    monkeypatch.setattr(L, "_BLOCK_IMPL", "xla")
    np.testing.assert_array_equal(
        np.asarray(shard_rows(ctx, "data", _toy_pallas, jnp.asarray(x_host))),
        x_host * 2.0,
    )


def test_shard_rows_2d_runs_per_block(monkeypatch):
    """shard_rows_2d (the CoCoOp instances-x-classes layout): both leading
    axes sharded, zero all-gathers, (data, model)-sharded output, identical
    values; fallbacks mirror shard_rows."""
    monkeypatch.setattr(L, "_BLOCK_IMPL", "pallas")
    devices = jax.devices()
    ctx = MeshContext(Mesh(np.array(devices[:8]).reshape(4, 2), ("data", "model")))
    x_host = np.random.RandomState(0).randn(8, 4, 8, 128).astype(np.float32)
    x = jax.device_put(
        jnp.asarray(x_host), NamedSharding(ctx.mesh, P("data", "model"))
    )

    def block_fn(xx):
        b, n, s, d = xx.shape
        return _toy_pallas(xx.reshape(b * n, s, d)).reshape(b, n, s, d)

    fn = functools.partial(shard_rows_2d, ctx, ("data", "model"), block_fn)
    comp = jax.jit(fn).lower(x).compile()
    assert comp.as_text().count("all-gather") == 0
    out = jax.jit(fn)(x)
    assert out.sharding.spec == P("data", "model")
    np.testing.assert_array_equal(np.asarray(out), x_host * 2.0)

    # fallbacks: no mesh / indivisible block / xla impl
    np.testing.assert_array_equal(
        np.asarray(shard_rows_2d(None, ("data", "model"), block_fn, jnp.asarray(x_host))),
        x_host * 2.0,
    )
    odd = jnp.asarray(x_host[:, :3])
    np.testing.assert_array_equal(
        np.asarray(shard_rows_2d(ctx, ("data", "model"), block_fn, odd)),
        x_host[:, :3] * 2.0,
    )
    monkeypatch.setattr(L, "_BLOCK_IMPL", "xla")
    np.testing.assert_array_equal(
        np.asarray(shard_rows_2d(ctx, ("data", "model"), block_fn, jnp.asarray(x_host))),
        x_host * 2.0,
    )


@pytest.mark.slow  # >30s measured (round-4 durations)
def test_sharded_pallas_cocoop_matches_single_device(monkeypatch, tmp_path):
    """CoCoOp's instance-conditioned text tower on the 4x2 mesh with the
    pallas (interpret) blocks: the 4-D text_forward path shards instances
    on 'data' AND classes on 'model' (shard_rows_2d) and must match the
    1-device pallas run — forward logits, loss, and updated leaves (the
    meta-net gradient rides shard_map's transpose psum)."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.trainers.cocoop import CoCoOp

    monkeypatch.setattr(L, "_BLOCK_IMPL", "pallas")

    devices = jax.devices()
    assert len(devices) >= 8
    tr1 = CoCoOp(tiny_cfg("CoCoOp", tmp_path / "a"), devices=devices[:1])

    cfg8 = tiny_cfg("CoCoOp", tmp_path / "b")
    cfg8.PARALLEL.MODEL = 2
    tr8 = CoCoOp(cfg8, devices=devices[:8])
    assert dict(tr8.mesh.mesh.shape) == {"data": 4, "model": 2}

    batch = next(iter(tr1.dm.test_loader))
    logits1 = np.asarray(
        tr1.forward(
            tr1.trainable, tr1.frozen, tr1.aux, shard_batch(tr1.mesh, batch)["image"]
        ),
        np.float32,
    )[:, : tr1.num_classes]
    logits8 = np.asarray(
        tr8.forward(
            tr8.trainable, tr8.frozen, tr8.aux, shard_batch(tr8.mesh, batch)["image"]
        ),
        np.float32,
    )[:, : tr8.num_classes]
    np.testing.assert_allclose(logits1, logits8, rtol=1e-5, atol=1e-5)

    old = {
        path: np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tr1.trainable)
    }
    new1, _, loss1, _ = tr1._train_step(
        tr1.trainable, tr1.opt_state, tr1.frozen, tr1.aux, shard_batch(tr1.mesh, batch)
    )
    new8, _, loss8, _ = tr8._train_step(
        tr8.trainable, tr8.opt_state, tr8.frozen, tr8.aux, shard_batch(tr8.mesh, batch)
    )
    assert abs(float(loss1) - float(loss8)) < 1e-5
    flat8 = dict(jax.tree_util.tree_leaves_with_path(new8))
    for path, leaf in jax.tree_util.tree_leaves_with_path(new1):
        d1 = np.asarray(leaf) - np.asarray(old[path])
        d8 = np.asarray(flat8[path]) - np.asarray(old[path])
        assert np.abs(d1).max() > 0, f"no update at {jax.tree_util.keystr(path)}"
        np.testing.assert_allclose(
            d8, d1, rtol=5e-3, atol=1e-5,
            err_msg=f"update for {jax.tree_util.keystr(path)} diverged",
        )


@pytest.mark.slow  # >30s measured (round-4 durations)
def test_sharded_pallas_step_matches_single_device(monkeypatch, tmp_path):
    """The REAL MuDPT step with the pallas (interpret) blocks on the 4x2
    mesh — towers under shard_map — must match the 1-device pallas run:
    forward logits, train-step loss, and the UPDATED trainable leaves
    (certifies the psum'd prompt-gradient path through shard_map's
    transpose)."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.trainers.mudpt import MuDPT

    monkeypatch.setattr(L, "_BLOCK_IMPL", "pallas")

    devices = jax.devices()
    assert len(devices) >= 8
    tr1 = MuDPT(tiny_cfg("MuDPT", tmp_path / "a"), devices=devices[:1])

    cfg8 = tiny_cfg("MuDPT", tmp_path / "b")
    cfg8.PARALLEL.MODEL = 2
    tr8 = MuDPT(cfg8, devices=devices[:8])
    assert dict(tr8.mesh.mesh.shape) == {"data": 4, "model": 2}

    batch = next(iter(tr1.dm.test_loader))

    logits1 = np.asarray(
        tr1.forward(
            tr1.trainable, tr1.frozen, tr1.aux, shard_batch(tr1.mesh, batch)["image"]
        ),
        np.float32,
    )[:, : tr1.num_classes]
    logits8 = np.asarray(
        tr8.forward(
            tr8.trainable, tr8.frozen, tr8.aux, shard_batch(tr8.mesh, batch)["image"]
        ),
        np.float32,
    )[:, : tr8.num_classes]
    np.testing.assert_allclose(logits1, logits8, rtol=1e-5, atol=1e-5)

    # snapshot BEFORE stepping: the jitted step donates the trainable buffers
    old = {
        path: np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tr1.trainable)
    }
    new1, _, loss1, _ = tr1._train_step(
        tr1.trainable, tr1.opt_state, tr1.frozen, tr1.aux, shard_batch(tr1.mesh, batch)
    )
    new8, _, loss8, _ = tr8._train_step(
        tr8.trainable, tr8.opt_state, tr8.frozen, tr8.aux, shard_batch(tr8.mesh, batch)
    )
    assert abs(float(loss1) - float(loss8)) < 1e-5
    # compare the UPDATES (new - old): init-dominated weights would hide a
    # wrong gradient.  fp32 reassociation only — the sharded grad is
    # per-shard sums + psum vs one flat batch reduction (the towers
    # themselves match bitwise; observed update diffs ~2e-6 at LR 0.5).
    # A missing/duplicated psum would scale whole leaves by the shard
    # count and fail loudly here.
    flat8 = dict(jax.tree_util.tree_leaves_with_path(new8))
    for path, leaf in jax.tree_util.tree_leaves_with_path(new1):
        d1 = np.asarray(leaf) - np.asarray(old[path])
        d8 = np.asarray(flat8[path]) - np.asarray(old[path])
        assert np.abs(d1).max() > 0, f"no update at {jax.tree_util.keystr(path)}"
        np.testing.assert_allclose(
            d8, d1, rtol=5e-3, atol=1e-5,
            err_msg=f"update for {jax.tree_util.keystr(path)} diverged",
        )
