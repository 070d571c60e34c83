"""Data-layer tests: few-shot sampling, base/new subsampling, loader
batching/padding, synthetic dataset, and a real folder-per-class loader run
over a generated directory tree."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from mudpt_tpu.config import default_config
from mudpt_tpu.data import DataManager, Datum, subsample_classes
from mudpt_tpu.data.datum import generate_fewshot
from mudpt_tpu.data.loader import DataLoader
from mudpt_tpu.data.transforms import EvalTransform, build_transform


def _items(n_classes=5, per_class=10):
    out = []
    for c in range(n_classes):
        for i in range(per_class):
            out.append(Datum(impath=f"{c}/{i}.jpg", label=c, classname=f"class{c}"))
    return out


def test_generate_fewshot_counts():
    random.seed(0)
    few = generate_fewshot(_items(), num_shots=4)
    assert len(few) == 5 * 4
    labels = [it.label for it in few]
    for c in range(5):
        assert labels.count(c) == 4
    # Dassl default repeat=False: a class with too few items keeps all of
    # them (no replacement, no RNG draw)
    few = generate_fewshot(_items(per_class=2), num_shots=4)
    assert len(few) == 5 * 2
    # explicit repeat=True restores with-replacement sampling
    few = generate_fewshot(_items(per_class=2), num_shots=4, repeat=True)
    assert len(few) == 5 * 4


def _dassl_generate_fewshot_spec(data_source, num_shots, repeat=False):
    """Executable spec of Dassl's ``DatasetBase.generate_fewshot_dataset``
    + ``split_dataset_by_label`` (the functions the reference calls at
    datasets/oxford_pets.py:48-49), transcribed from its published
    algorithm: group by label in first-appearance order (defaultdict),
    then one ``random.sample(items, num_shots)`` per label — or the whole
    group (repeat=False) / ``random.choices`` (repeat=True) when the
    group is smaller.  Used as the RNG-stream oracle because dassl itself
    is not installed here."""
    from collections import defaultdict

    tracker = defaultdict(list)
    for item in data_source:
        tracker[item.label].append(item)
    dataset = []
    for label, items in tracker.items():
        if len(items) >= num_shots:
            sampled_items = random.sample(items, num_shots)
        else:
            if repeat:
                sampled_items = random.choices(items, k=num_shots)
            else:
                sampled_items = items
        dataset.extend(sampled_items)
    return dataset


def test_fewshot_rng_stream_matches_dassl():
    """A fresh few-shot split (no caches) under the same seed draws the
    SAME impaths, in the same order, as Dassl's sampler — including the
    train-then-val call sequence of the reference protocol
    (oxford_pets.py:48-49) and classes too small to sample.  Guards the
    ±0.3% accuracy-parity budget from loader-side divergence for
    migrating users without caches."""

    def imbalanced(n_classes, base_per_class, interleave=False):
        # a small class (2 items) + unequal sizes + optional interleaved
        # label order exercise grouping order and the no-draw branch
        out = []
        sizes = [2 if c == 1 else base_per_class + c for c in range(n_classes)]
        if interleave:
            for i in range(max(sizes)):
                for c in range(n_classes):
                    if i < sizes[c]:
                        out.append(
                            Datum(impath=f"i{c}/{i}.jpg", label=c,
                                  classname=f"c{c}")
                        )
        else:
            for c in range(n_classes):
                for i in range(sizes[c]):
                    out.append(
                        Datum(impath=f"d{c}/{i}.jpg", label=c,
                              classname=f"c{c}")
                    )
        return out

    datasets = [
        (imbalanced(6, 20), imbalanced(6, 6)),           # train, val
        (imbalanced(11, 9, interleave=True),
         imbalanced(11, 5, interleave=True)),
    ]
    for seed in (1, 2):
        for train_items, val_items in datasets:
            num_shots = 4
            random.seed(seed)
            ours_train = generate_fewshot(train_items, num_shots)
            ours_val = generate_fewshot(val_items, min(num_shots, 4))
            random.seed(seed)
            ref_train = _dassl_generate_fewshot_spec(train_items, num_shots)
            ref_val = _dassl_generate_fewshot_spec(val_items, min(num_shots, 4))
            assert [d.impath for d in ours_train] == [d.impath for d in ref_train]
            assert [d.impath for d in ours_val] == [d.impath for d in ref_val]


def test_read_split_cache_without_dassl(tmp_path):
    """Reference-produced split caches pickle dassl-classed ``Datum``
    objects (reference datasets/oxford_pets.py:21-35; Dassl's Datum keeps
    ``_impath``/``_label``/``_classname`` behind properties).  On a host
    where dassl is NOT importable, ``read_split_cache`` must still load
    them — via the custom Unpickler mapping unresolvable ``Datum``
    classes to a stand-in ``_revive`` can normalize."""
    import pickle
    import sys
    import types

    from mudpt_tpu.data.datum import _revive, read_split_cache

    # Synthesize the pickle with a fake dassl module tree, exactly the
    # shape the reference writes.
    mod_name = "dassl.data.datasets.base_dataset"
    created = []
    for name in ("dassl", "dassl.data", "dassl.data.datasets", mod_name):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            created.append(name)

    class FakeDasslDatum:
        def __init__(self, impath, label, classname):
            self._impath = impath
            self._label = label
            self._domain = 0
            self._classname = classname

    FakeDasslDatum.__module__ = mod_name
    FakeDasslDatum.__qualname__ = "Datum"
    sys.modules[mod_name].Datum = FakeDasslDatum

    items = [FakeDasslDatum(f"img/{i}.jpg", i % 3, f"cls{i % 3}")
             for i in range(7)]
    cache = tmp_path / "preprocessed.pkl"
    with open(cache, "wb") as f:
        pickle.dump({"train": items, "val": [], "test": items[:2]}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)

    # Make dassl UNIMPORTABLE: drop every dassl module (ours and any
    # oracle stub installed by other tests) for the duration of the load.
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "dassl" or k.startswith("dassl.")}
    try:
        loaded = read_split_cache(str(cache))
        revived = _revive(loaded["train"])
    finally:
        sys.modules.update(
            {k: v for k, v in saved.items() if k not in created}
        )
    assert [d.impath for d in revived] == [f"img/{i}.jpg" for i in range(7)]
    assert [d.label for d in revived] == [i % 3 for i in range(7)]
    assert [d.classname for d in revived] == [f"cls{i % 3}" for i in range(7)]
    assert all(isinstance(d, Datum) for d in revived)


def test_subsample_classes_base_new():
    """Base = first ceil(n/2) sorted labels, new = rest, relabeled from 0
    (reference datasets/oxford_pets.py:107-153)."""
    items = _items(n_classes=5)
    (base,) = subsample_classes(items, subsample="base")
    (new,) = subsample_classes(items, subsample="new")
    assert sorted({it.label for it in base}) == [0, 1, 2]
    assert sorted({it.label for it in new}) == [0, 1]
    assert {it.classname for it in base} == {"class0", "class1", "class2"}
    assert {it.classname for it in new} == {"class3", "class4"}


def test_loader_batching_and_padding():
    items = [
        Datum(label=i % 3, classname=f"c{i % 3}", array=np.full((8, 8, 3), 0.5, np.float32))
        for i in range(10)
    ]
    tf = EvalTransform(size=8)
    loader = DataLoader(items, tf, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    last = batches[-1]
    assert last["image"].shape == (4, 8, 8, 3)
    assert last["valid"].sum() == 2
    assert not last["valid"][2:].any()

    train = DataLoader(items, tf, batch_size=4, shuffle=True, drop_last=True, seed=1)
    assert len(list(train)) == 2


def test_synthetic_datamanager():
    cfg = default_config()
    cfg.DATASET.NAME = "Synthetic"
    cfg.INPUT.SIZE = (16, 16)
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    dm = DataManager(cfg)
    assert dm.num_classes == 4
    assert len(dm.classnames) == 4
    batch = next(iter(dm.train_loader))
    assert batch["image"].shape == (4, 16, 16, 3)
    assert batch["label"].dtype == np.int32


def test_synthetic_size_overrides():
    """DATASET.SYNTHETIC_* scale the in-memory dataset (for CLI smoke and
    end-to-end on-chip runs); classnames stay unique past the name table."""
    cfg = default_config()
    cfg.DATASET.NAME = "Synthetic"
    cfg.INPUT.SIZE = (16, 16)
    cfg.DATASET.SYNTHETIC_NUM_CLASSES = 20
    cfg.DATASET.SYNTHETIC_PER_CLASS = 3
    dm = DataManager(cfg)
    assert dm.num_classes == 20
    assert len(set(dm.classnames)) == 20
    assert len(dm.dataset.train_x) == 60


def test_folder_per_class_dataset(tmp_path):
    """Caltech-style folder-per-class tree exercised end to end, including
    the preprocessed.pkl cache round trip."""
    img_root = tmp_path / "caltech101" / "caltech-101" / "101_ObjectCategories"
    for cls in ["airplanes", "ant", "BACKGROUND_Google"]:
        d = img_root / cls
        d.mkdir(parents=True)
        for i in range(10):
            Image.new("RGB", (32, 28), color=(i * 20, 100, 50)).save(d / f"{i}.jpg")

    cfg = default_config()
    cfg.DATASET.NAME = "Caltech101"
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NUM_SHOTS = 2
    cfg.INPUT.SIZE = (16, 16)
    random.seed(0)
    dm = DataManager(cfg)
    # BACKGROUND_Google ignored; airplanes renamed
    assert dm.num_classes == 2
    assert "airplane" in dm.classnames and "ant" in dm.classnames
    assert len(dm.dataset.train_x) == 2 * 2  # 2 shots x 2 classes
    assert os.path.exists(tmp_path / "caltech101" / "preprocessed.pkl")
    batch = next(iter(dm.test_loader))
    assert batch["image"].shape[1:] == (16, 16, 3)

    # cache round trip: building again must reuse the pickles
    random.seed(123)  # different seed would produce a different split if re-read
    dm2 = DataManager(cfg)
    assert [d.impath for d in dm2.dataset.test] == [d.impath for d in dm.dataset.test]


def test_eval_transform_torchvision_geometry():
    """EvalTransform must replicate torchvision's exact resize/crop
    arithmetic (the reference preprocesses with torchvision's PIL backend,
    clip/clip.py:80-87): Resize(int) truncates the long side
    (int(size*long/short), NOT round), skips resampling when the short side
    already equals size, and CenterCrop's origin is int(round(delta/2))
    (Python half-to-even), NOT delta//2.  Pinned bit-for-bit against an
    explicit PIL composition using torchvision's published formulas."""
    size = 32
    tf = EvalTransform(size=size)

    def torchvision_reference(img):
        w, h = img.size
        # F.resize(size:int), PIL path
        if min(w, h) != size:
            if w < h:
                ow, oh = size, int(size * h / w)
            else:
                ow, oh = int(size * w / h), size
            img = img.resize((ow, oh), Image.BICUBIC)
        # F.center_crop
        w, h = img.size
        top = int(round((h - size) / 2.0))
        left = int(round((w - size) / 2.0))
        img = img.crop((left, top, left + size, top + size))
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - np.asarray(tf.mean, np.float32)) / np.asarray(
            tf.std, np.float32
        )

    rng = np.random.default_rng(0)
    # (149, 100): long side 32*149/100 = 47.68 -> 47 by truncation (48 by
    # rounding) and crop delta 15 -> left 8 by round-half (7 by floor-div);
    # (100, 149): same, transposed; (32, 77): short side == size, resize
    # must be SKIPPED entirely (torchvision early-return); (90, 90): square
    for w, h in [(149, 100), (100, 149), (32, 77), (90, 90), (501, 375)]:
        img = Image.fromarray(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "RGB"
        )
        ours = tf(img)
        ref = torchvision_reference(img)
        assert ours.shape == (size, size, 3) == ref.shape
        np.testing.assert_array_equal(ours, ref, err_msg=f"size ({w},{h})")


def test_train_transform_shapes():
    cfg = default_config()
    tf = build_transform(cfg, is_train=True)
    img = Image.new("RGB", (300, 200))
    out = tf(img)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.float32


def test_host_shard_auto_mode(monkeypatch):
    """DATALOADER.HOST_SHARD='auto' (the default): single-process runs never
    shard; a (simulated) 2-process run shards train+eval when the batch and
    mesh data axis divide evenly, and falls back to replicated decode when
    they don't."""
    import jax

    from mudpt_tpu.data.manager import _host_shard_mode

    # normalization accepts booleans and their string spellings
    assert _host_shard_mode(True) == "on"
    assert _host_shard_mode(False) == "off"
    assert _host_shard_mode("True") == "on"
    assert _host_shard_mode("false") == "off"
    assert _host_shard_mode("auto") == "auto"

    cfg = default_config()
    cfg.DATASET.NAME = "Synthetic"
    cfg.INPUT.SIZE = (16, 16)
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    assert cfg.DATALOADER.HOST_SHARD == "auto"

    dm = DataManager(cfg, n_data=8)  # single process: no sharding
    assert not dm.host_sharded and not dm.eval_host_sharded
    dataset = dm.dataset

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    dm2 = DataManager(cfg, dataset=dataset, n_data=8)
    assert dm2.host_sharded and dm2.eval_host_sharded
    assert len(dm2._train_items) == len(dataset.train_x) // 2
    assert dm2._train_bs == 2

    # data axis indivisible by process count -> auto falls back
    dm3 = DataManager(cfg, dataset=dataset, n_data=3)
    assert not dm3.host_sharded and not dm3.eval_host_sharded

    # indivisible train batch -> train falls back, eval still shards
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 5
    dm4 = DataManager(cfg, dataset=dataset, n_data=8)
    assert not dm4.host_sharded and dm4.eval_host_sharded

    # explicit "on" requires a divisible train batch
    cfg.DATALOADER.HOST_SHARD = True
    with pytest.raises(ValueError):
        DataManager(cfg, dataset=dataset, n_data=8)


def test_host_shard_on_eval_indivisible_raises(monkeypatch):
    """HOST_SHARD='on' means REQUIRE sharding: an eval batch size that does
    not divide by the process count must raise (mirroring the train-side
    contract), not silently fall back to n_hosts-times the decode work."""
    import jax

    cfg = default_config()
    cfg.DATASET.NAME = "Synthetic"
    cfg.INPUT.SIZE = (16, 16)
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 7  # indivisible by 2 processes
    cfg.DATALOADER.HOST_SHARD = True
    dataset = DataManager(cfg, n_data=8).dataset

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="eval batch"):
        DataManager(cfg, dataset=dataset, n_data=8)


def test_coerce_bool_only_for_tristate_strings():
    """YAML booleans are accepted ONLY by tri-state string fields
    (DATALOADER.HOST_SHARD); a bool landing in any other string field is a
    typo and must fail at merge time, not propagate as the string 'True'."""
    from mudpt_tpu.config.config import _merge_dict

    cfg = default_config()
    _merge_dict(cfg, {"DATALOADER": {"HOST_SHARD": True}})
    assert cfg.DATALOADER.HOST_SHARD == "True"

    with pytest.raises(TypeError, match="PIPELINE"):
        _merge_dict(default_config(), {"DATALOADER": {"PIPELINE": True}})
    with pytest.raises(TypeError, match="NAME"):
        _merge_dict(default_config(), {"DATASET": {"NAME": False}})


def test_empty_item_shard_pads_batches():
    """A pod host whose eval item shard is empty still produces its
    pad_to_batches all-invalid batches (lockstep collectives), even when the
    transform exposes no .size to infer the image shape from."""
    loader = DataLoader([], None, batch_size=3, pad_to_batches=2)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (3, 224, 224, 3)
        assert not b["valid"].any()

@pytest.mark.parametrize("pipeline", ["threads", "grain", "tfdata"])
def test_host_shard_eval_all_pipelines(tmp_path, monkeypatch, pipeline):
    """Pod eval sharding is pipeline-uniform: under HOST_SHARD='on' with 2
    (simulated) processes, every pipeline's test loader decodes only its
    block of each global batch, is tagged host_sharded_eval for evaluate(),
    pads short shards to the lockstep batch count, and the union of valid
    rows over hosts covers every item exactly once."""
    if pipeline == "grain":
        pytest.importorskip("grain")
    if pipeline == "tfdata":
        pytest.importorskip("tensorflow")
    import types

    import jax

    items = []
    for i in range(10):
        p = tmp_path / f"img{i}.jpg"
        Image.new("RGB", (20, 20), color=(i * 20, 3, 3)).save(p)
        items.append(Datum(impath=str(p), label=i, classname=f"c{i}"))
    ds = types.SimpleNamespace(
        train_x=items, val=None, test=items,
        num_classes=10, classnames=[f"c{i}" for i in range(10)],
    )

    cfg = default_config()
    cfg.DATALOADER.PIPELINE = pipeline
    cfg.INPUT.SIZE = (16, 16)
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 4
    cfg.DATALOADER.HOST_SHARD = True

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    n_blocks = -(-len(items) // 4)  # 3 global batches
    seen = []
    for rank in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        dm = DataManager(cfg, dataset=ds, n_data=8)
        assert dm.eval_host_sharded
        loader = dm.test_loader
        assert getattr(loader, "host_sharded_eval", False)
        assert dm.val_loader is None
        batches = list(loader)
        assert len(batches) == len(loader) == n_blocks  # lockstep padding
        for b in batches:
            assert b["image"].shape[0] == 2  # bs_h = 4 // 2
        seen.extend(
            int(l) for b in batches
            for l, v in zip(b["label"], b["valid"]) if v
        )
    assert sorted(seen) == list(range(10))  # exactly-once coverage


@pytest.mark.parametrize("pipeline", ["grain", "tfdata"])
def test_host_shard_on_eval_indivisible_raises_nonthreads(
    tmp_path, monkeypatch, pipeline
):
    """The HOST_SHARD='on' indivisible-eval-batch error fires for grain and
    tfdata too, not only the threads pipeline."""
    if pipeline == "grain":
        pytest.importorskip("grain")
    if pipeline == "tfdata":
        pytest.importorskip("tensorflow")
    import types

    import jax

    p = tmp_path / "img.jpg"
    Image.new("RGB", (20, 20)).save(p)
    items = [Datum(impath=str(p), label=0, classname="c0")]
    ds = types.SimpleNamespace(
        train_x=items, val=None, test=items, num_classes=1, classnames=["c0"]
    )
    cfg = default_config()
    cfg.DATALOADER.PIPELINE = pipeline
    cfg.INPUT.SIZE = (16, 16)
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 7  # indivisible by 2 processes
    cfg.DATALOADER.HOST_SHARD = True
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="eval batch"):
        DataManager(cfg, dataset=ds, n_data=8)
