"""Aux subsystems: resume, tf.data pipeline, profiling timer, download
registry (offline parts only)."""

import os

import numpy as np
import pytest
from PIL import Image

from mudpt_tpu.config import default_config
from mudpt_tpu.trainers import build_trainer
from mudpt_tpu.utils.profiling import StepTimer

from tests.test_trainers import tiny_cfg


def test_resume_continues_from_checkpoint(tmp_path):
    cfg = tiny_cfg("CoOp", tmp_path)
    cfg.OPTIM.MAX_EPOCH = 2
    cfg.TRAIN.CHECKPOINT_FREQ = 1
    tr = build_trainer(cfg)
    tr.train()
    assert os.path.exists(f"{cfg.OUTPUT_DIR}/prompt_learner/model.pth.tar-2")

    cfg2 = tiny_cfg("CoOp", tmp_path)
    cfg2.OPTIM.MAX_EPOCH = 4
    cfg2.RESUME = cfg.OUTPUT_DIR
    cfg2.OUTPUT_DIR = str(tmp_path / "resumed")
    tr2 = build_trainer(cfg2)
    start = tr2.resume_if_requested()
    assert start == 2
    ctx_resumed = np.asarray(tr2.trainable["ctx"])
    ctx_trained = np.asarray(tr.trainable["ctx"])
    assert np.allclose(ctx_resumed, ctx_trained)


def test_resume_is_exact(tmp_path):
    """Train 4 epochs straight vs 2 epochs + preemption + resume + 2 epochs:
    final prompt weights must match.  This only holds if resume restores the
    optimizer state (SGD momentum + schedule step — reference: Dassl
    register_model(model, optim, sched), trainers/mudpt.py:227) AND the data
    order is a pure function of (seed, epoch)."""

    def make(outdir, max_epoch):
        cfg = tiny_cfg("CoOp", tmp_path)
        cfg.OPTIM.MAX_EPOCH = max_epoch
        cfg.TRAIN.CHECKPOINT_FREQ = 1
        cfg.TEST.NO_TEST = True
        cfg.TEST.FINAL_MODEL = "last_step"
        cfg.OUTPUT_DIR = str(tmp_path / outdir)
        return cfg

    # straight: 4 epochs, no interruption
    tr_straight = build_trainer(make("straight", 4))
    tr_straight.train()
    ctx_straight = np.asarray(tr_straight.trainable["ctx"])

    # preempted: same schedule horizon (4 epochs) but killed after epoch 2
    cfg1 = make("preempted", 4)
    tr1 = build_trainer(cfg1)
    for tr1.epoch in range(2):
        tr1.run_epoch()
        tr1.after_epoch()

    # momentum must be in the checkpoint (nonzero after 2 epochs of SGD)
    from mudpt_tpu.utils.checkpoint import load_checkpoint

    _, opt_leaves, _ = load_checkpoint(cfg1.OUTPUT_DIR, "prompt_learner", 2)
    assert opt_leaves is not None
    assert any(np.abs(l).max() > 0 for l in opt_leaves if l.size > 1)

    # resume in a fresh trainer and finish epochs 3-4
    cfg2 = make("resumed", 4)
    cfg2.RESUME = cfg1.OUTPUT_DIR
    tr2 = build_trainer(cfg2)
    tr2.train()
    ctx_resumed = np.asarray(tr2.trainable["ctx"])

    np.testing.assert_allclose(ctx_resumed, ctx_straight, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("pipeline", ["threads", "grain"])
def test_preemption_checkpoint_resume_exact(tmp_path, pipeline):
    """SIGTERM mid-epoch: the trainer finishes the in-flight step, writes
    model-preempt.pth.tar (weights + momentum + exact batch position), and
    a RESUME'd run fast-forwards the deterministic loader to that batch —
    final weights match the uninterrupted run bit-for-bit (in every
    pipeline whose order is a pure function of (seed, epoch, position)).
    Also pins the supersede rule: the next epoch-boundary checkpoint
    deletes the preempt file so a later RESUME never rewinds to stale
    mid-epoch state."""
    if pipeline == "grain":
        pytest.importorskip("grain")

    def make(outdir, max_epoch=3):
        cfg = tiny_cfg("CoOp", tmp_path)
        cfg.OPTIM.MAX_EPOCH = max_epoch
        cfg.TRAIN.CHECKPOINT_FREQ = 1
        cfg.TEST.NO_TEST = True
        cfg.TEST.FINAL_MODEL = "last_step"
        cfg.DATALOADER.PIPELINE = pipeline
        cfg.OUTPUT_DIR = str(tmp_path / outdir)
        return cfg

    tr_straight = build_trainer(make("straight"))
    tr_straight.train()
    ctx_straight = np.asarray(tr_straight.trainable["ctx"])

    # preempted: the "signal" fires while step (num_batches + 2) computes —
    # i.e. epoch 2, batch 2 of num_batches — and the loop must stop at that
    # step's boundary (the handler only sets the flag; run_epoch checks it)
    cfg1 = make("preempted")
    tr1 = build_trainer(cfg1)
    num_batches = len(tr1.dm.train_loader)
    assert num_batches >= 3  # the stop must be strictly mid-epoch
    real_step = tr1._train_step
    calls = {"n": 0}

    def step_then_signal(*a):
        out = real_step(*a)
        calls["n"] += 1
        if calls["n"] == num_batches + 2:
            tr1._preempt = True
        return out

    tr1._train_step = step_then_signal
    tr1.train()
    pre = os.path.join(cfg1.OUTPUT_DIR, "prompt_learner", "model-preempt.pth.tar")
    assert os.path.exists(pre) and os.path.exists(pre + ".json")
    import json

    with open(pre + ".json") as f:
        meta = json.load(f)
    assert meta["epoch"] == 1 and meta["batches_done"] == 2
    assert meta["global_step"] == num_batches + 2

    # resume INTO THE SAME output dir (the SLURM-requeue shape)
    cfg2 = make("preempted")
    cfg2.RESUME = cfg1.OUTPUT_DIR
    tr2 = build_trainer(cfg2)
    start = tr2.resume_if_requested()
    assert start == 1 and tr2._skip_batches == 2
    assert tr2.global_step == num_batches + 2
    tr2.train()  # resume_if_requested is idempotent (re-reads the same file)
    np.testing.assert_allclose(
        np.asarray(tr2.trainable["ctx"]), ctx_straight, rtol=1e-6, atol=1e-7
    )
    # epoch-2 checkpoint superseded the preemption file
    assert os.path.exists(
        os.path.join(cfg1.OUTPUT_DIR, "prompt_learner", "model.pth.tar-2")
    )
    assert not os.path.exists(pre)


def test_preemption_on_last_batch_and_boundary(tmp_path):
    """A signal landing on an epoch's LAST batch must let the epoch
    complete (after_epoch's val + boundary checkpoint still run) and then
    stop at the loop top with a boundary preemption record (batches_done=0)
    — so CHECKPOINT_FREQ=0 runs lose nothing.  Resume re-enters the next
    epoch from its first batch and bit-matches the uninterrupted run."""

    def make(outdir, max_epoch=3):
        cfg = tiny_cfg("CoOp", tmp_path)
        cfg.OPTIM.MAX_EPOCH = max_epoch
        cfg.TRAIN.CHECKPOINT_FREQ = 0  # the boundary record is the only one
        cfg.TEST.NO_TEST = True
        cfg.TEST.FINAL_MODEL = "last_step"
        cfg.OUTPUT_DIR = str(tmp_path / outdir)
        return cfg

    tr_straight = build_trainer(make("straight"))
    tr_straight.train()
    ctx_straight = np.asarray(tr_straight.trainable["ctx"])

    cfg1 = make("preempted")
    tr1 = build_trainer(cfg1)
    num_batches = len(tr1.dm.train_loader)
    real_step = tr1._train_step
    calls = {"n": 0}

    def step_then_signal(*a):
        out = real_step(*a)
        calls["n"] += 1
        if calls["n"] == num_batches:  # epoch 1's last batch
            tr1._preempt = True
        return out

    tr1._train_step = step_then_signal
    tr1.train()
    assert calls["n"] == num_batches  # no extra steps ran
    import json

    pre = os.path.join(cfg1.OUTPUT_DIR, "prompt_learner", "model-preempt.pth.tar")
    with open(pre + ".json") as f:
        meta = json.load(f)
    assert meta["epoch"] == 1 and meta["batches_done"] == 0
    assert meta["global_step"] == num_batches

    cfg2 = make("preempted")
    cfg2.RESUME = cfg1.OUTPUT_DIR
    tr2 = build_trainer(cfg2)
    start = tr2.resume_if_requested()
    assert start == 1 and tr2._skip_batches == 0
    tr2.train()
    np.testing.assert_allclose(
        np.asarray(tr2.trainable["ctx"]), ctx_straight, rtol=1e-6, atol=1e-7
    )


def test_resume_survives_corrupt_preempt_file(tmp_path):
    """A torn/corrupt model-preempt.pth.tar (SIGKILL artifacts) must be
    CONTAINED: resume warns and falls back to the last epoch checkpoint
    instead of crashing — and the npz-embedded meta is authoritative, so a
    missing json sidecar doesn't matter."""
    cfg = tiny_cfg("CoOp", tmp_path)
    cfg.OPTIM.MAX_EPOCH = 2
    cfg.TRAIN.CHECKPOINT_FREQ = 1
    cfg.TEST.NO_TEST = True
    cfg.TEST.FINAL_MODEL = "last_step"
    tr = build_trainer(cfg)
    tr.train()
    sub = os.path.join(cfg.OUTPUT_DIR, "prompt_learner")

    # corrupt preempt npz + stale sidecar claiming to be furthest along
    import json

    with open(os.path.join(sub, "model-preempt.pth.tar"), "wb") as f:
        f.write(b"not an npz")
    with open(os.path.join(sub, "model-preempt.pth.tar.json"), "w") as f:
        json.dump({"epoch": 1, "batches_done": 1, "global_step": 10**6}, f)

    cfg2 = tiny_cfg("CoOp", tmp_path)
    cfg2.OPTIM.MAX_EPOCH = 4
    cfg2.RESUME = cfg.OUTPUT_DIR
    cfg2.OUTPUT_DIR = str(tmp_path / "resumed")
    tr2 = build_trainer(cfg2)
    start = tr2.resume_if_requested()  # must not raise
    assert start == 2  # fell back to the epoch-2 checkpoint

    # npz meta is the source of truth: drop the sidecar of a VALID preempt
    # checkpoint and resume must still fast-forward from the npz meta
    tr2._save_preempt(1)
    os.remove(os.path.join(cfg2.OUTPUT_DIR, "prompt_learner",
                           "model-preempt.pth.tar.json"))
    cfg3 = tiny_cfg("CoOp", tmp_path)
    cfg3.OPTIM.MAX_EPOCH = 4
    cfg3.RESUME = cfg2.OUTPUT_DIR
    cfg3.OUTPUT_DIR = str(tmp_path / "resumed2")
    tr3 = build_trainer(cfg3)
    start = tr3.resume_if_requested()
    assert start == tr2.epoch and tr3._skip_batches == 1


def test_tfdata_pipeline(tmp_path):
    pytest.importorskip("tensorflow")
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    from mudpt_tpu.data.datum import Datum
    from mudpt_tpu.data.tfdata import TFDataLoader

    items = []
    for i in range(10):
        p = img_dir / f"{i}.jpg"
        Image.new("RGB", (40, 30), color=(i * 20, 10, 10)).save(p)
        items.append(Datum(impath=str(p), label=i % 2, classname=f"c{i % 2}"))

    loader = TFDataLoader(items, 4, size=16, is_train=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    assert batches[-1]["valid"].sum() == 2

    train = TFDataLoader(items, 4, size=16, is_train=True, shuffle=True, drop_last=True)
    assert len(list(train)) == 2


def test_tfdata_eval_matches_pil(tmp_path):
    """Numerical cross-check: tf.data eval preprocessing vs the PIL
    transform on the same image (bicubic differs slightly between
    libraries; tolerance is loose but catches layout/normalization bugs)."""
    pytest.importorskip("tensorflow")
    from mudpt_tpu.data.datum import Datum
    from mudpt_tpu.data.tfdata import TFDataLoader
    from mudpt_tpu.data.transforms import EvalTransform, load_image

    p = str(tmp_path / "x.jpg")
    # smooth gradient: high-frequency noise would amplify legitimate
    # PIL-vs-TF bicubic differences far beyond layout-bug magnitudes
    yy, xx = np.mgrid[0:64, 0:48]
    img = np.stack([yy * 4, xx * 5, (yy + xx) * 2], axis=-1).astype(np.uint8)
    Image.fromarray(img).save(p, quality=95)

    pil_out = EvalTransform(size=32)(load_image(p))
    loader = TFDataLoader([Datum(impath=p, label=0, classname="x")], 1, size=32)
    tf_out = next(iter(loader))["image"][0]
    assert np.mean(np.abs(pil_out - tf_out)) < 0.12


def test_step_timer():
    t = StepTimer()
    t.start()
    dt = t.stop()
    assert dt >= 0 and t.avg > 0
    assert t.throughput(10) > 0


def test_grain_pipeline(tmp_path):
    pytest.importorskip("grain")
    from mudpt_tpu.config import default_config
    from mudpt_tpu.data import DataManager

    cfg = default_config()
    cfg.DATASET.NAME = "Synthetic"
    cfg.INPUT.SIZE = (16, 16)
    cfg.DATALOADER.PIPELINE = "grain"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    dm = DataManager(cfg)
    batch = next(iter(dm.train_loader))
    assert batch["image"].shape == (4, 16, 16, 3)
    assert batch["label"].dtype == np.int32
    batches = list(dm.test_loader)
    assert sum(b["valid"].sum() for b in batches) == len(dm.dataset.test)
    # deterministic: same loader config yields the same first batch
    dm2 = DataManager(cfg)
    b2 = next(iter(dm2.train_loader))
    np.testing.assert_array_equal(batch["label"], b2["label"])


def test_checkpoint_sequence_subtrees_roundtrip(tmp_path):
    """list/tuple pytree nodes survive save -> load -> restore_into exactly
    (their '[i]' flat keys unflatten to dicts and must be grafted back
    positionally — they were silently dropped before the round-2 review)."""
    import numpy as np

    from mudpt_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_into,
        save_checkpoint,
    )

    tree = {
        "pair": (np.arange(3, dtype=np.float32), np.ones(3, np.float32)),
        "stack": [np.full(2, 7.0, np.float32)],
        "w": np.zeros(4, np.float32),
    }
    save_checkpoint(str(tmp_path), "m", 1, tree)
    loaded, _, _ = load_checkpoint(str(tmp_path), "m", 1)
    template = {
        "pair": (np.zeros(3, np.float32), np.zeros(3, np.float32)),
        "stack": [np.zeros(2, np.float32)],
        "w": np.ones(4, np.float32),
    }
    out = restore_into(template, loaded)
    assert isinstance(out["pair"], tuple) and isinstance(out["stack"], list)
    np.testing.assert_array_equal(np.asarray(out["pair"][0]), tree["pair"][0])
    np.testing.assert_array_equal(np.asarray(out["pair"][1]), tree["pair"][1])
    np.testing.assert_array_equal(np.asarray(out["stack"][0]), tree["stack"][0])
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])


def _epoch_orders(loader, n_epochs):
    """Concatenated label order per epoch (valid rows only)."""
    orders = []
    for _ in range(n_epochs):
        labels = []
        for b in loader:
            labels.extend(np.asarray(b["label"])[np.asarray(b["valid"])].tolist())
        orders.append(labels)
    return orders


def test_grain_set_epoch_replays_order(tmp_path):
    """Exact resume for PIPELINE=grain: set_epoch(k) makes the next
    iteration replay epoch k's shuffle order exactly (a resumed run must
    not restart the grain epoch counter at 0)."""
    pytest.importorskip("grain")
    from mudpt_tpu.data.datum import Datum
    from mudpt_tpu.data.grain_pipeline import GrainLoader

    items = [
        Datum(label=i, classname=f"c{i}", array=np.zeros((8, 8, 3), np.float32))
        for i in range(16)
    ]
    full = GrainLoader(items, None, 4, shuffle=True, seed=3)
    e0, e1, e2 = _epoch_orders(full, 3)
    assert e1 != e2  # shuffle order actually changes per epoch

    resumed = GrainLoader(items, None, 4, shuffle=True, seed=3)
    resumed.set_epoch(1)
    r1, r2 = _epoch_orders(resumed, 2)
    assert r1 == e1 and r2 == e2


def test_tfdata_set_epoch_replays_order(tmp_path):
    """Exact resume for PIPELINE=tfdata: shuffle order AND augmentation
    draws are pure functions of (seed, epoch, position) — fresh iterators
    must NOT replay the same seed-derived order every epoch, two loaders of
    the same config must be bit-identical (stateless augmentation ops, so
    AUTOTUNE parallelism cannot leak in), and set_epoch(k) fast-forwards."""
    pytest.importorskip("tensorflow")
    from mudpt_tpu.data.datum import Datum
    from mudpt_tpu.data.tfdata import TFDataLoader

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    items = []
    for i in range(12):
        p = img_dir / f"{i}.jpg"
        Image.new("RGB", (20, 20), color=(i * 15, 5, 5)).save(p)
        items.append(Datum(impath=str(p), label=i, classname=f"c{i}"))

    mk = lambda: TFDataLoader(
        items, 4, size=8, is_train=True, shuffle=True, seed=7
    )

    def epochs(loader, n):
        return [[(b["label"].copy(), b["image"].copy()) for b in loader]
                for _ in range(n)]

    e0, e1, e2 = epochs(mk(), 3)
    orders = [[tuple(lb) for lb, _ in ep] for ep in (e0, e1, e2)]
    assert orders[0] != orders[1] or orders[1] != orders[2]

    # run-to-run determinism, images included (stateless augmentation)
    f0, f1, f2 = epochs(mk(), 3)
    for a, b in zip(e0 + e1 + e2, f0 + f1 + f2):
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    # resume: set_epoch(1) replays epochs 1..2 exactly
    resumed = mk()
    resumed.set_epoch(1)
    r1, r2 = epochs(resumed, 2)
    for a, b in zip(e1 + e2, r1 + r2):
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


def test_tfdata_rejects_array_items():
    """tfdata reads from disk; array-backed items (Synthetic) must fail at
    construction with a message naming the alternative pipelines, not with
    a tf ReadFile NotFoundError mid-epoch."""
    pytest.importorskip("tensorflow")
    from mudpt_tpu.data.datum import Datum
    from mudpt_tpu.data.tfdata import TFDataLoader

    items = [Datum(label=0, classname="c", array=np.zeros((8, 8, 3), np.float32))]
    with pytest.raises(ValueError, match="threads or grain"):
        TFDataLoader(items, 1, size=8)


def _tfdata_fused_vs_slice(tmp_path, subsampling):
    """Fused decode_and_crop_jpeg train path vs the pre-fusion full-decode
    -> slice path on the same stateless box/flip draws.  Returns (got,
    reference) normalized batches.  Noise JPEGs of varied sizes maximize
    sensitivity to decoder divergence."""
    import tensorflow as tf

    from mudpt_tpu.data.datum import Datum
    from mudpt_tpu.data.tfdata import TFDataLoader
    from mudpt_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    rng = np.random.RandomState(3)
    tmp_path.mkdir(parents=True, exist_ok=True)
    items = []
    for i, (h, w) in enumerate([(57, 83), (128, 96), (64, 64), (200, 150)]):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8)).save(
            p, quality=90, subsampling=subsampling
        )
        items.append(Datum(impath=str(p), label=i, classname="c"))

    loader = TFDataLoader(
        items, 4, size=32, is_train=True, shuffle=False, seed=5
    )
    got = next(iter(loader))["image"]

    base = tf.constant(5, tf.int32)  # seed + epoch 0
    mean = tf.constant(CLIP_MEAN, tf.float32)
    std = tf.constant(CLIP_STD, tf.float32)
    outs = []
    for pos, it in enumerate(items):
        raw = tf.io.read_file(it.impath)
        img = tf.io.decode_image(raw, channels=3, expand_animations=False)
        crop_seed = tf.stack([base, 2 * pos])
        flip_seed = tf.stack([base, 2 * pos + 1])
        bbox = tf.image.stateless_sample_distorted_bounding_box(
            tf.shape(img),
            bounding_boxes=tf.zeros((1, 0, 4)),
            seed=crop_seed,
            area_range=(0.08, 1.0),
            aspect_ratio_range=(0.75, 1.3333),
            use_image_if_no_bounding_boxes=True,
        )
        begin, sz, _ = bbox
        ref = tf.slice(img, begin, sz)
        ref = tf.image.resize(ref, (32, 32), method="bicubic")
        ref = tf.image.stateless_random_flip_left_right(ref, seed=flip_seed)
        ref = (ref / 255.0 - mean) / std
        outs.append(ref.numpy())
    return got, np.stack(outs).astype(np.float32)


def test_tfdata_fused_crop_matches_slice(tmp_path):
    pytest.importorskip("tensorflow")
    # 4:4:4 JPEGs: the fused path is BIT-IDENTICAL to decode-then-slice
    got, ref = _tfdata_fused_vs_slice(tmp_path / "s0", subsampling=0)
    np.testing.assert_array_equal(got, ref)


def test_tfdata_fused_crop_bounded_on_420(tmp_path):
    """Chroma-subsampled (4:2:0) JPEGs: libjpeg's skip-scanlines partial
    decode can shift the chroma upsample context at the crop's top rows —
    bounded here (worst-case noise inputs) so a real decoder divergence
    (wrong window, channel swap, geometry drift) cannot hide under the
    tolerance."""
    pytest.importorskip("tensorflow")
    got, ref = _tfdata_fused_vs_slice(tmp_path / "s2", subsampling=2)
    d = np.abs(got - ref)
    assert (d > 1e-6).mean() < 0.05, "fused 4:2:0 decode diverged broadly"
    assert d.max() < 0.6, f"fused 4:2:0 decode max diff {d.max():.3f}"
