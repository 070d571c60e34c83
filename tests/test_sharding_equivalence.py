"""Numerical equivalence of the sharded paths: the same MuDPT model
evaluated on a 1-device mesh vs a 4x2 (data x model) 8-device mesh must
produce identical logits and losses — the sharding layout (batch on data,
padded class axis on model) is purely an execution detail."""

import numpy as np

import jax

from mudpt_tpu.parallel.mesh import shard_batch
from tests.test_trainers import tiny_cfg


def test_single_vs_mesh_equivalence(tmp_path):
    from mudpt_tpu.trainers.mudpt import MuDPT

    devices = jax.devices()
    assert len(devices) >= 8

    cfg1 = tiny_cfg("MuDPT", tmp_path / "a")
    tr1 = MuDPT(cfg1, devices=devices[:1])

    cfg8 = tiny_cfg("MuDPT", tmp_path / "b")
    cfg8.PARALLEL.MODEL = 2
    tr8 = MuDPT(cfg8, devices=devices[:8])
    assert dict(tr8.mesh.mesh.shape) == {"data": 4, "model": 2}

    # identical data (same seed -> same synthetic set); take one test batch.
    # Compare FULL logits (the class axis is padded to the model-axis size;
    # slice back) — _eval_step returns argmax preds, which would hide real
    # numeric divergence between the layouts.
    batch = next(iter(tr1.dm.test_loader))

    def full_logits(tr):
        images = shard_batch(tr.mesh, batch)["image"]
        logits = tr.forward(tr.trainable, tr.frozen, tr.aux, images)
        return np.asarray(logits[:, : tr.num_classes], np.float32)

    logits1, logits8 = full_logits(tr1), full_logits(tr8)
    np.testing.assert_allclose(logits1, logits8, rtol=1e-5, atol=1e-5)

    # and the production eval path (on-device argmax) agrees bit-for-bit
    preds1 = tr1._eval_step(
        tr1.trainable, tr1.frozen, tr1.aux, shard_batch(tr1.mesh, batch)["image"]
    )
    preds8 = tr8._eval_step(
        tr8.trainable, tr8.frozen, tr8.aux, shard_batch(tr8.mesh, batch)["image"]
    )
    assert (np.asarray(preds1) == np.asarray(preds8)).all()
    assert (np.asarray(preds1) == logits1.argmax(-1)).all()

    # one train step each: losses match
    sb1 = shard_batch(tr1.mesh, batch)
    sb8 = shard_batch(tr8.mesh, batch)
    _, _, loss1, acc1 = tr1._train_step(
        tr1.trainable, tr1.opt_state, tr1.frozen, tr1.aux, sb1
    )
    _, _, loss8, acc8 = tr8._train_step(
        tr8.trainable, tr8.opt_state, tr8.frozen, tr8.aux, sb8
    )
    assert abs(float(loss1) - float(loss8)) < 1e-5
    assert abs(float(acc1) - float(acc8)) < 1e-6


def test_cocoop_single_vs_mesh_equivalence(tmp_path):
    """CoCoOp's divergent forward (instance-conditioned text encode,
    reference cocoop.py:187-193) on the 4x2 mesh vs 1 device: the 4-D
    (instances, classes) row sharding is purely an execution detail."""
    from mudpt_tpu.trainers.cocoop import CoCoOp

    devices = jax.devices()
    assert len(devices) >= 8

    tr1 = CoCoOp(tiny_cfg("CoCoOp", tmp_path / "a"), devices=devices[:1])
    cfg8 = tiny_cfg("CoCoOp", tmp_path / "b")
    cfg8.PARALLEL.MODEL = 2
    tr8 = CoCoOp(cfg8, devices=devices[:8])
    assert dict(tr8.mesh.mesh.shape) == {"data": 4, "model": 2}

    batch = next(iter(tr1.dm.test_loader))

    def full_logits(tr):
        images = shard_batch(tr.mesh, batch)["image"]
        logits = tr.forward(tr.trainable, tr.frozen, tr.aux, images)
        return np.asarray(logits[:, : tr.num_classes], np.float32)

    np.testing.assert_allclose(
        full_logits(tr1), full_logits(tr8), rtol=1e-5, atol=1e-5
    )

    sb1, sb8 = shard_batch(tr1.mesh, batch), shard_batch(tr8.mesh, batch)
    _, _, loss1, acc1 = tr1._train_step(
        tr1.trainable, tr1.opt_state, tr1.frozen, tr1.aux, sb1
    )
    _, _, loss8, acc8 = tr8._train_step(
        tr8.trainable, tr8.opt_state, tr8.frozen, tr8.aux, sb8
    )
    assert abs(float(loss1) - float(loss8)) < 1e-5
    assert abs(float(acc1) - float(acc8)) < 1e-6


def test_mesh_shape_sweep(tmp_path):
    """Every mesh factorization of 8 devices — pure-data (8,1), mixed (2,4),
    and pure-model (1,8) — matches the 1-device loss.  (1,8) additionally
    exercises padded class shards: 4 synthetic classes over a model axis of
    8 pads the class dimension past the real count, so the loss/accuracy
    masking of padded-class rows is load-bearing there."""
    from mudpt_tpu.trainers.mudpt import MuDPT

    devices = jax.devices()
    assert len(devices) >= 8

    tr1 = MuDPT(tiny_cfg("MuDPT", tmp_path / "ref"), devices=devices[:1])
    batch = next(iter(tr1.dm.test_loader))
    sb1 = shard_batch(tr1.mesh, batch)
    _, _, loss1, acc1 = tr1._train_step(
        tr1.trainable, tr1.opt_state, tr1.frozen, tr1.aux, sb1
    )

    for n_model in (1, 4, 8):
        cfg = tiny_cfg("MuDPT", tmp_path / f"m{n_model}")
        cfg.PARALLEL.MODEL = n_model
        tr = MuDPT(cfg, devices=devices[:8])
        assert dict(tr.mesh.mesh.shape) == {"data": 8 // n_model, "model": n_model}
        sb = shard_batch(tr.mesh, batch)
        _, _, loss, acc = tr._train_step(
            tr.trainable, tr.opt_state, tr.frozen, tr.aux, sb
        )
        assert abs(float(loss1) - float(loss)) < 1e-5, f"model={n_model}"
        assert abs(float(acc1) - float(acc)) < 1e-6, f"model={n_model}"
