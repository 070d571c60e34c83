"""Read-path tests for the annotation-file-driven dataset loaders
(pets/aircraft/ucf101/imagenet formats) over generated trees, plus training
determinism and nested-checkpoint round trips."""

import random

import numpy as np
from PIL import Image

from mudpt_tpu.config import default_config
from mudpt_tpu.data import DataManager


def _img(path, color=(120, 80, 60)):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.new("RGB", (24, 24), color=color).save(path)


def _cfg(tmp_path, name, shots=-1):
    cfg = default_config()
    cfg.DATASET.NAME = name
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NUM_SHOTS = shots
    cfg.INPUT.SIZE = (16, 16)
    cfg.DATALOADER.NUM_WORKERS = 2
    return cfg


def test_oxford_pets_format(tmp_path):
    root = tmp_path / "oxford_pets"
    lines = []
    for b, breed in enumerate(["Abyssinian", "beagle"]):
        for i in range(5):
            name = f"{breed}_{i + 1}"
            _img(root / "images" / f"{name}.jpg")
            lines.append(f"{name} {b + 1} {1 if b == 0 else 2} 1")
    (root / "annotations").mkdir(parents=True)
    (root / "annotations" / "trainval.txt").write_text("\n".join(lines[:8]) + "\n")
    (root / "annotations" / "test.txt").write_text("\n".join(lines[8:]) + "\n")

    random.seed(0)
    dm = DataManager(_cfg(tmp_path, "OxfordPets"))
    assert dm.num_classes == 2
    assert set(dm.classnames) == {"abyssinian", "beagle"}
    assert len(dm.dataset.train_x) + len(dm.dataset.val) == 8


def test_fgvc_aircraft_format(tmp_path):
    root = tmp_path / "fgvc_aircraft"
    root.mkdir()
    (root / "variants.txt").write_text("707-320\nA300B4\n")
    for split, rows in (
        ("train", [("0001", "707-320"), ("0002", "A300B4")]),
        ("val", [("0003", "707-320")]),
        ("test", [("0004", "A300B4"), ("0005", "707-320")]),
    ):
        (root / f"images_variant_{split}.txt").write_text(
            "\n".join(f"{i} {c}" for i, c in rows) + "\n"
        )
        for i, _ in rows:
            _img(root / "images" / f"{i}.jpg")

    dm = DataManager(_cfg(tmp_path, "FGVCAircraft"))
    assert dm.num_classes == 2
    assert dm.classnames == ["707-320", "A300B4"]
    assert len(dm.dataset.test) == 2


def test_ucf101_format(tmp_path):
    root = tmp_path / "ucf101"
    (root / "ucfTrainTestlist").mkdir(parents=True)
    (root / "ucfTrainTestlist" / "classInd.txt").write_text(
        "1 ApplyEyeMakeup\n2 Archery\n"
    )
    train_rows, test_rows = [], []
    for action, renamed in (("ApplyEyeMakeup", "Apply_Eye_Makeup"), ("Archery", "Archery")):
        for i in range(5):
            fname = f"v_{action}_g{i:02d}.avi"
            _img(root / "UCF-101-midframes" / renamed / fname.replace(".avi", ".jpg"))
            (train_rows if i < 4 else test_rows).append(f"{action}/{fname} 1")
    (root / "ucfTrainTestlist" / "trainlist01.txt").write_text("\n".join(train_rows) + "\n")
    (root / "ucfTrainTestlist" / "testlist01.txt").write_text("\n".join(test_rows) + "\n")

    random.seed(0)
    dm = DataManager(_cfg(tmp_path, "UCF101"))
    assert dm.num_classes == 2
    assert "Apply_Eye_Makeup" in dm.classnames  # CamelCase -> underscores
    assert len(dm.dataset.test) == 2


def test_imagenet_format(tmp_path):
    root = tmp_path / "imagenet"
    root.mkdir()
    (root / "classnames.txt").write_text(
        "n01440764 tench\nn01443537 goldfish\n"
    )
    for split, count in (("train", 3), ("val", 2)):
        for wnid in ("n01440764", "n01443537"):
            for i in range(count):
                _img(root / "images" / split / wnid / f"{wnid}_{i}.JPEG")

    dm = DataManager(_cfg(tmp_path, "ImageNet", shots=2))
    assert dm.num_classes == 2
    assert dm.classnames == ["tench", "goldfish"]
    assert len(dm.dataset.train_x) == 4  # 2 shots x 2 classes
    # val doubles as test (reference imagenet.py:57)
    assert len(dm.dataset.test) == 4
    assert dm.dataset.val == dm.dataset.test


def test_training_is_seed_deterministic(tmp_path):
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.trainers import build_trainer

    outs = []
    for run in range(2):
        cfg = tiny_cfg("CoOp", tmp_path / f"run{run}")
        cfg.OPTIM.MAX_EPOCH = 2
        tr = build_trainer(cfg)
        tr.train()
        outs.append(np.asarray(tr.trainable["ctx"]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_nested_trainable_checkpoint_roundtrip(tmp_path):
    """UUMuDPT's nested t2v/v2t heads must survive save->load exactly."""
    import jax

    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.trainers import build_trainer
    from mudpt_tpu.utils.checkpoint import load_checkpoint, restore_into, save_checkpoint

    cfg = tiny_cfg("UUMuDPT", tmp_path)
    tr = build_trainer(cfg)
    tree = jax.device_get(tr.trainable)
    save_checkpoint(str(tmp_path), "m", 1, tree)
    loaded, _, meta = load_checkpoint(str(tmp_path), "m", 1)
    restored = restore_into(tree, loaded, strict=True)
    flat1 = jax.tree_util.tree_leaves(tree)
    flat2 = jax.tree_util.tree_leaves(restored)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stanford_cars_format(tmp_path):
    """Devkit .mat annotations: cell-array class names, struct-array annos
    (stanford_cars.py access pattern anno['class'][0,0] / anno['fname'][0]),
    year moved to the front of the classname."""
    from scipy.io import savemat

    root = tmp_path / "stanford_cars"
    (root / "devkit").mkdir(parents=True)
    names = np.array([["Audi A4 Sedan 2012", "BMW M3 Coupe 2015"]], dtype=object)
    savemat(root / "devkit" / "cars_meta.mat", {"class_names": names})

    def annos_mat(image_dir, n_per_cls):
        n = 2 * n_per_cls
        rec = np.zeros((1, n), dtype=[("bbox_x1", "O"), ("class", "O"), ("fname", "O")])
        k = 0
        for cls in (1, 2):
            for i in range(n_per_cls):
                fname = f"{cls}_{i}.jpg"
                _img(root / image_dir / fname)
                rec[0, k]["bbox_x1"] = np.array([[1]])
                rec[0, k]["class"] = np.array([[cls]])
                rec[0, k]["fname"] = fname
                k += 1
        return {"annotations": rec}

    savemat(root / "devkit" / "cars_train_annos.mat", annos_mat("cars_train", 5))
    savemat(root / "cars_test_annos_withlabels.mat", annos_mat("cars_test", 2))

    random.seed(0)
    dm = DataManager(_cfg(tmp_path, "StanfordCars"))
    assert dm.num_classes == 2
    assert set(dm.classnames) == {"2012 Audi A4 Sedan", "2015 BMW M3 Coupe"}
    # per-class 80/20 trainval split (round(5*0.2)=1 val each)
    assert len(dm.dataset.train_x) == 8 and len(dm.dataset.val) == 2
    assert len(dm.dataset.test) == 4
    batch = next(iter(dm.test_loader))
    assert batch["image"].shape[1:] == (16, 16, 3)


def test_oxford_flowers_format(tmp_path):
    """imagelabels.mat 1-based (1,N) labels + cat_to_name.json, image_%05d
    filenames, per-class 50/20/30 split."""
    from scipy.io import savemat

    root = tmp_path / "oxford_flowers"
    n_per, labels = 5, []
    for cls in (1, 2):
        labels.extend([cls] * n_per)
    for i in range(len(labels)):
        _img(root / "jpg" / f"image_{i + 1:05d}.jpg")
    savemat(root / "imagelabels.mat", {"labels": np.array([labels])})
    (root / "cat_to_name.json").write_text('{"1": "rose", "2": "tulip"}')

    random.seed(0)
    dm = DataManager(_cfg(tmp_path, "OxfordFlowers"))
    assert dm.num_classes == 2
    assert set(dm.classnames) == {"rose", "tulip"}
    # 50/20/30 per class of 5: 2 train, 1 val, 2 test
    assert len(dm.dataset.train_x) == 4
    assert len(dm.dataset.val) == 2
    assert len(dm.dataset.test) == 4


def test_sun397_format(tmp_path):
    """ClassName.txt label table, Training_01/Testing_01 split files with
    leading '/', hierarchy words reversed in the classname."""
    root = tmp_path / "sun397"
    classes = ["/a/abbey", "/c/church/indoor"]
    (root).mkdir(parents=True)
    (root / "SUN397").mkdir()
    (root / "SUN397" / "ClassName.txt").write_text("\n".join(classes) + "\n")
    train_lines, test_lines = [], []
    for cname in classes:
        for i in range(5):
            rel = f"{cname}/sun_{i:03d}.jpg"
            _img(root / "SUN397" / rel[1:])
            (train_lines if i < 4 else test_lines).append(rel)
    (root / "Training_01.txt").write_text("\n".join(train_lines) + "\n")
    (root / "Testing_01.txt").write_text("\n".join(test_lines) + "\n")

    random.seed(0)
    dm = DataManager(_cfg(tmp_path, "SUN397"))
    assert dm.num_classes == 2
    assert set(dm.classnames) == {"abbey", "indoor church"}
    assert len(dm.dataset.train_x) + len(dm.dataset.val) == 8
    assert len(dm.dataset.test) == 2


def test_imagenet_variant_formats(tmp_path):
    """The 4 test-only domain-shift variants: ImageNetV2's stringified-label
    folders (all 1000 must exist), Sketch/A/R folder-per-wnid with README.txt
    skipped; all reuse ImageNet's classnames.txt."""
    classname_lines = "\n".join(
        f"n{i:08d} synset {i}" for i in range(1000)
    ) + "\n"

    # --- ImageNetV2: folders named by label int, 1000 of them ---
    v2 = tmp_path / "imagenetv2"
    img_root = v2 / "imagenetv2-matched-frequency-format-val"
    for label in range(1000):
        (img_root / str(label)).mkdir(parents=True)
    for label in range(3):
        for i in range(2):
            _img(img_root / str(label) / f"{i}.jpg")
    (v2 / "classnames.txt").write_text(classname_lines)
    dm = DataManager(_cfg(tmp_path, "ImageNetV2"))
    assert len(dm.dataset.test) == 6
    assert {d.classname for d in dm.dataset.test} == {
        "synset 0", "synset 1", "synset 2"
    }
    assert dm.dataset.train_x == dm.dataset.test  # test-only variant

    # --- Sketch / A / R: folder-per-wnid, README.txt ignored ---
    for name, ddir, sub in (
        ("ImageNetSketch", "imagenet-sketch", "images"),
        ("ImageNetA", "imagenet-adversarial", "imagenet-a"),
        ("ImageNetR", "imagenet-rendition", "imagenet-r"),
    ):
        root = tmp_path / ddir
        for w, wnid in enumerate(["n00000007", "n00000003"]):
            for i in range(2):
                _img(root / sub / wnid / f"{i}.jpg")
        (root / sub / "README.txt").write_text("ignore me\n")
        (root / "classnames.txt").write_text(classname_lines)
        dm = DataManager(_cfg(tmp_path, name))
        assert len(dm.dataset.test) == 4, name
        assert {d.classname for d in dm.dataset.test} == {
            "synset 3", "synset 7"
        }, name


def test_caltech101_format(tmp_path):
    """caltech-101/101_ObjectCategories folder scan: BACKGROUND_Google and
    Faces_easy IGNORED, NEW_CNAMES renames applied (caltech101.py:13-19),
    per-class 50/20/30 random split."""
    img_root = tmp_path / "caltech101" / "caltech-101" / "101_ObjectCategories"
    for folder in ("Faces", "airplanes", "BACKGROUND_Google", "Faces_easy"):
        for i in range(10):
            _img(img_root / folder / f"image_{i:04d}.jpg")

    random.seed(0)
    dm = DataManager(_cfg(tmp_path, "Caltech101"))
    assert dm.num_classes == 2  # ignored folders contribute nothing
    assert set(dm.classnames) == {"face", "airplane"}  # renames applied
    # 50/20/30 of 10 per class
    assert len(dm.dataset.train_x) == 10
    assert len(dm.dataset.val) == 4
    assert len(dm.dataset.test) == 6


def test_eurosat_format_renames_not_applied(tmp_path):
    """EuroSAT scans 2750/ and must reproduce the reference's dead-code
    behavior: NEW_CNAMES defined but NEVER applied (reference eurosat.py
    update_classname is dead — SURVEY.md §2.5), so classnames stay the raw
    folder names."""
    img_root = tmp_path / "eurosat" / "2750"
    for folder in ("AnnualCrop", "SeaLake"):
        for i in range(10):
            _img(img_root / folder / f"{folder}_{i}.jpg")

    random.seed(0)
    dm = DataManager(_cfg(tmp_path, "EuroSAT"))
    assert set(dm.classnames) == {"AnnualCrop", "SeaLake"}  # NOT renamed
    from mudpt_tpu.data.datasets.eurosat import NEW_CNAMES
    assert NEW_CNAMES["AnnualCrop"] == "Annual Crop Land"  # constant exposed


def test_dtd_and_food101_formats(tmp_path):
    """DTD under dtd/images, Food101 under food-101/images: plain
    folder-per-class with the shared 50/20/30 split and no renames."""
    for name, ddir in (("DescribableTextures", "dtd"), ("Food101", "food-101")):
        img_root = tmp_path / ddir / "images"
        for folder in ("alpha", "beta"):
            for i in range(5):
                _img(img_root / folder / f"{folder}_{i}.jpg")
        random.seed(0)
        dm = DataManager(_cfg(tmp_path, name))
        assert set(dm.classnames) == {"alpha", "beta"}, name
        # 50/20/30 of 5: 2 train (round(2.5)=2), 1 val, 2 test
        assert len(dm.dataset.train_x) == 4, name
        assert len(dm.dataset.val) == 2, name
        assert len(dm.dataset.test) == 4, name
