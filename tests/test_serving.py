"""AOT serving artifacts (mudpt_tpu/serving.py): jax.export round trips.

The exported StableHLO program + params.npz must reproduce the trainer's
own forward exactly, serve ANY batch size (symbolic batch dim), and load
through a path that touches no model code — the TPU-native counterpart of
the reference's TorchScript serving archives (reference clip/clip.py:95-140).
"""

import os

import numpy as np
import pytest

import mudpt_tpu.serving as serving


def _tiny_trainer(trainer_name, tmp_path, backbone="test-tiny", **hp_kw):
    from mudpt_tpu.config import default_config
    from mudpt_tpu.trainers import build_trainer

    cfg = default_config()
    cfg.TRAINER.NAME = trainer_name
    cfg.MODEL.BACKBONE.NAME = backbone
    cfg.MODEL.BACKBONE.PATH = "random"
    cfg.DATASET.NAME = "Synthetic"
    cfg.INPUT.SIZE = (32, 32)
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 4
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.OUTPUT_DIR = str(tmp_path / f"out_{trainer_name}")
    hp = (
        cfg.trainer_params(trainer_name)
        if trainer_name not in ("ZeroshotCLIP", "ZeroshotCLIP2")
        else None
    )
    if hp is not None:
        if hasattr(hp, "PREC"):
            hp.PREC = "fp32"
        for k, v in hp_kw.items():
            setattr(hp, k, v)
    return build_trainer(cfg)


def _images(n, res=32, seed=0):
    return np.random.RandomState(seed).randn(n, res, res, 3).astype(np.float32)


@pytest.mark.parametrize("trainer_name", ["MuDPT", "UUMuDPT", "VPT"])
def test_export_trainer_round_trip_symbolic_batch(tmp_path, trainer_name):
    """Cached-text image_fn path across the structurally distinct forwards
    (MuDPT coupling, UUMuDPT's v2t LightTransformer visual residuals, VPT's
    per-block visual_ctx): artifact == trainer forward, and one artifact
    serves multiple batch sizes."""
    kw = (
        {"VISUAL_PROMPT_DEPTH": 2, "DEEP_VISUAL_N_CTX": 2}
        if trainer_name == "VPT"
        else {}
    )
    tr = _tiny_trainer(trainer_name, tmp_path, **kw)
    art = str(tmp_path / "artifact")
    serving.export_trainer(art, tr, platforms=("cpu",))

    assert sorted(os.listdir(art)) == ["meta.json", "params.npz", "program.jaxexport"]
    clf = serving.load(art)
    assert clf.classnames == list(tr.classnames)
    assert clf.meta["trainer"] == trainer_name
    assert clf.meta["preprocess"]["resize_then_center_crop"] == 32

    for B in (1, 3, 8):  # symbolic batch: one program, any B
        imgs = _images(B, seed=B)
        got = clf.predict(imgs)
        want = np.asarray(
            tr.forward(tr.trainable, tr.frozen, tr.aux, imgs)
        )[:, : tr.num_classes]
        assert got.shape == (B, tr.num_classes)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_zsclip_model_inference_path(tmp_path):
    tr = _tiny_trainer("ZeroshotCLIP", tmp_path)
    art = str(tmp_path / "artifact")
    serving.export_trainer(art, tr, platforms=("cpu",))
    clf = serving.load(art)
    imgs = _images(2)
    got = clf.predict(imgs)
    want = np.asarray(
        tr.model_inference(tr.trainable, tr.frozen, tr.aux, imgs)
    )[:, : tr.num_classes]
    # zero-shot serves at the reference's backbone precision (bf16,
    # zsclip.prec_default): the artifact and the in-process jit are two
    # separately compiled programs, and bf16 rounding points may differ
    # between them — logits agree to bf16 resolution, predictions exactly
    # (the fp32 trainers above pin the path itself at 1e-5)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_export_rn_backbone_round_trip(tmp_path):
    """Serving export with an RN trunk (conv tower + attnpool instead of
    the ViT path the other export tests pin): CoOp on test-tiny-rn
    exports, round-trips, and matches the trainer forward."""
    tr = _tiny_trainer("CoOp", tmp_path, backbone="test-tiny-rn")
    art = str(tmp_path / "artifact")
    serving.export_trainer(art, tr, platforms=("cpu",))
    clf = serving.load(art)
    for B in (1, 4):
        imgs = _images(B, seed=B)
        got = clf.predict(imgs)
        want = np.asarray(
            tr.forward(tr.trainable, tr.frozen, tr.aux, imgs)
        )[:, : tr.num_classes]
        assert got.shape == (B, tr.num_classes)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_cocoop_requires_pinned_batch(tmp_path):
    """CoCoOp's per-instance text encode needs static shapes: symbolic
    batch must refuse loudly; a pinned batch exports, serves that batch,
    and rejects any other batch size at predict."""
    tr = _tiny_trainer("CoCoOp", tmp_path)
    art = str(tmp_path / "artifact")
    with pytest.raises(ValueError, match="batch"):
        serving.export_trainer(art, tr, platforms=("cpu",))

    serving.export_trainer(art, tr, batch=2, platforms=("cpu",))
    clf = serving.load(art)
    imgs = _images(2)
    got = clf.predict(imgs)
    want = np.asarray(
        tr.forward(tr.trainable, tr.frozen, tr.aux, imgs)
    )[:, : tr.num_classes]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="pinned to batch 2"):
        clf.predict(_images(3))


def test_export_trained_weights_are_live(tmp_path):
    """The artifact must serve the TRAINED prompts: after an optimizer step
    the re-export differs from the fresh-init export."""
    tr = _tiny_trainer("CoOp", tmp_path)
    art0 = str(tmp_path / "a0")
    serving.export_trainer(art0, tr, platforms=("cpu",))
    tr.train()
    art1 = str(tmp_path / "a1")
    serving.export_trainer(art1, tr, platforms=("cpu",))

    imgs = _images(2)
    l0 = serving.load(art0).predict(imgs)
    l1 = serving.load(art1).predict(imgs)
    assert np.abs(l0 - l1).max() > 1e-6
    want = np.asarray(
        tr.forward(tr.trainable, tr.frozen, tr.aux, imgs)
    )[:, : tr.num_classes]
    np.testing.assert_allclose(l1, want, rtol=1e-5, atol=1e-5)


def test_export_pallas_artifact_validation_and_lowering(tmp_path):
    """block_impl='pallas': TPU-only + pinned batch enforced; the exported
    program embeds real Mosaic custom calls (tpu_custom_call is in
    jax.export's guaranteed-stable target set), NOT the interpret-mode
    fallback a CPU host would otherwise lower."""
    tr = _tiny_trainer("MuDPT", tmp_path)
    art = str(tmp_path / "artifact")
    with pytest.raises(ValueError, match="TPU-only"):
        serving.export_trainer(art, tr, batch=4, block_impl="pallas",
                               platforms=("cpu",))
    with pytest.raises(ValueError, match="pinned batch"):
        serving.export_trainer(art, tr, block_impl="pallas")

    serving.export_trainer(art, tr, batch=4, block_impl="pallas")
    import json as _json

    meta = _json.load(open(os.path.join(art, "meta.json")))
    assert meta["block_impl"] == "pallas"
    assert meta["platforms"] == ["tpu"]
    blob = open(os.path.join(art, "program.jaxexport"), "rb").read()
    assert b"tpu_custom_call" in blob  # Mosaic kernels, not interpret mode

    # the CPU-pinned test process must NOT be able to run it...
    clf = serving.load(art)
    with pytest.raises(Exception, match="platform|cpu|tpu"):
        clf.predict(_images(4))
    # ...and the export must not have leaked the forced block impl/hint
    from mudpt_tpu.models import layers

    assert layers.resolve_block_impl() == "xla"


def test_export_pallas_int8_artifact(tmp_path):
    """block_impl='pallas_int8': the W8A8 serving tier exports with the
    same TPU-only/pinned-batch contract; the program embeds Mosaic custom
    calls and the quant mode does not leak out of the export."""
    tr = _tiny_trainer("MuDPT", tmp_path)
    art = str(tmp_path / "artifact_q8")
    with pytest.raises(ValueError, match="TPU-only"):
        serving.export_trainer(art, tr, batch=4, block_impl="pallas_int8",
                               platforms=("cpu",))
    serving.export_trainer(art, tr, batch=4, block_impl="pallas_int8")
    import json as _json

    meta = _json.load(open(os.path.join(art, "meta.json")))
    assert meta["block_impl"] == "pallas_int8"
    assert meta["platforms"] == ["tpu"]
    blob = open(os.path.join(art, "program.jaxexport"), "rb").read()
    assert b"tpu_custom_call" in blob

    from mudpt_tpu.models import layers

    assert layers.quant_mode() == "none"
    assert layers.resolve_block_impl() == "xla"


def test_export_zero_shot_api(tmp_path):
    """export_zero_shot == api.zero_shot_classifier scoring."""
    import jax
    import jax.numpy as jnp

    import mudpt_tpu.api as clip
    from mudpt_tpu.models.clip import init_clip_params
    from mudpt_tpu.trainers.base import TINY_TEST

    params = jax.device_get(init_clip_params(jax.random.PRNGKey(0), TINY_TEST))
    classnames = ["tabby_cat", "dog", "bird"]
    templates = ["a photo of a {}.", "a drawing of a {}."]
    art = str(tmp_path / "zs")
    serving.export_zero_shot(
        art, TINY_TEST, params, classnames, templates, platforms=("cpu",)
    )
    clf = serving.load(art)
    imgs = _images(4, res=TINY_TEST.image_resolution)
    got = clf.predict(imgs)
    classify = clip.zero_shot_classifier(
        TINY_TEST, params, classnames, templates, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(got, np.asarray(classify(imgs)), rtol=1e-5, atol=1e-5)


def test_export_cli(tmp_path):
    """tools/export_serving.py end-to-end: same config cascade as train.py,
    artifact loads and serves."""
    import subprocess
    import sys

    art = str(tmp_path / "cli_artifact")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable, "tools/export_serving.py",
            "--trainer", "CoOp",
            "--dataset_config", "configs/datasets/synthetic.yaml",
            "--backbone", "test-tiny",
            "--backbone_path", "random",
            "--export_dir", art,
            "--platforms", "cpu",
            "INPUT.SIZE", "(32, 32)",
            "TRAINER.COOP.PREC", "fp32",
        ],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr
    clf = serving.load(art)
    assert clf.meta["trainer"] == "CoOp"
    out = clf.predict(_images(2))
    assert out.shape == (2, len(clf.classnames))
    assert np.isfinite(out).all()


def test_bench_artifact_cli(tmp_path):
    """tools/bench_artifact.py: loads an artifact and reports a JSON
    throughput line (the on-chip artifact-validation harness; here on the
    CPU artifact).  Symbolic-batch artifacts require --batch."""
    import json as _json
    import subprocess
    import sys

    tr = _tiny_trainer("MuDPT", tmp_path)
    art = str(tmp_path / "bench_artifact")
    serving.export_trainer(art, tr, platforms=("cpu",))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/bench_artifact.py", "--artifact", art,
         "--steps", "2", "--warmup", "1"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode != 0  # symbolic batch, no --batch
    assert "symbolic-batch" in r.stderr
    r = subprocess.run(
        [sys.executable, "tools/bench_artifact.py", "--artifact", art,
         "--batch", "4", "--steps", "2", "--warmup", "0"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr
    line = _json.loads(r.stdout.strip().splitlines()[-1])
    assert line["unit"] == "images/sec/chip" and line["finite"] is True
    assert line["value"] > 0


def test_predict_cli(tmp_path):
    """tools/predict.py: artifact + image files -> JSONL of top-k preds,
    including the pinned-batch tail-padding path."""
    import subprocess
    import sys

    from PIL import Image

    tr = _tiny_trainer("MuDPT", tmp_path)
    art = str(tmp_path / "artifact")
    serving.export_trainer(art, tr, platforms=("cpu",))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray(
            rng.randint(0, 255, (40, 48, 3), np.uint8)
        ).save(img_dir / f"im{i}.jpg")

    out_path = str(tmp_path / "preds.jsonl")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable, "tools/predict.py", "--artifact", art,
            "--image_dir", str(img_dir), "--batch", "2", "--top_k", "3",
            "--output", out_path,
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr
    import json as _json

    recs = [_json.loads(l) for l in open(out_path)]
    assert len(recs) == 5
    n_cls = len(tr.classnames)
    for rec in recs:
        assert 0 <= rec["pred"] < n_cls
        assert len(rec["top_k"]) == 3
        assert rec["top_k"][0]["label"] == rec["pred"]
        assert rec["top_k"][0]["classname"] in tr.classnames
        probs = [t["prob"] for t in rec["top_k"]]
        assert probs == sorted(probs, reverse=True)

    # pinned-batch artifact: 5 images through batch 2 exercises tail padding
    art2 = str(tmp_path / "artifact_pinned")
    serving.export_trainer(art2, _tiny_trainer("CoCoOp", tmp_path),
                           batch=2, platforms=("cpu",))
    r = subprocess.run(
        [
            sys.executable, "tools/predict.py", "--artifact", art2,
            "--image_dir", str(img_dir), "--output", out_path,
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr
    assert len(open(out_path).readlines()) == 5
    # requesting a batch the pinned program cannot serve fails loudly
    r = subprocess.run(
        [
            sys.executable, "tools/predict.py", "--artifact", art2,
            "--image_dir", str(img_dir), "--batch", "4",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode != 0
    assert "pinned batch" in r.stderr


def test_loader_needs_no_model_code(tmp_path):
    """serving.load + predict in a subprocess must not import any
    mudpt_tpu.models/trainers module — the artifact is self-contained."""
    import subprocess
    import sys

    tr = _tiny_trainer("MuDPT", tmp_path)
    art = str(tmp_path / "artifact")
    serving.export_trainer(art, tr, platforms=("cpu",))

    code = (
        "from mudpt_tpu.utils.platform import pin_platform_from_env\n"
        "pin_platform_from_env()\n"  # the registered TPU plugin overrides
        "import sys\n"               # JAX_PLATFORMS otherwise (CLAUDE.md)
        "import numpy as np\n"
        "import mudpt_tpu.serving as serving\n"
        f"clf = serving.load({art!r})\n"
        "out = clf.predict(np.zeros((2, 32, 32, 3), np.float32))\n"
        "assert out.shape[0] == 2\n"
        "bad = [m for m in sys.modules if m.startswith('mudpt_tpu.models')\n"
        "       or m.startswith('mudpt_tpu.trainers')]\n"
        "assert not bad, f'loader imported model code: {bad}'\n"
        "print('OK', out.shape)\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_export_prunes_dead_text_tower(tmp_path):
    """Cached-text artifacts never run the text tower; its leaves (the
    vocab-size token embedding dominates) must not be stored in params.npz
    or device_put on every load."""
    import jax

    tr = _tiny_trainer("CoOp", tmp_path)
    art = str(tmp_path / "pruned")
    serving.export_trainer(art, tr, platforms=("cpu",))
    clf = serving.load(art)

    n_text = len(jax.tree_util.tree_leaves(tr.frozen["text"]))
    n_full = len(
        jax.tree_util.tree_leaves(
            {"t": tr.trainable, "f": tr.frozen, "a": tr.aux}
        )
    )
    assert clf.meta["n_leaves"] <= n_full + 1 - n_text  # +1: cached txt
    vocab = tr.clip_cfg.vocab_size
    assert all(np.shape(l)[:1] != (vocab,) for l in clf._leaves)

    # pruning must not change the scores
    imgs = _images(3)
    got = clf.predict(imgs)
    want = np.asarray(
        tr.forward(tr.trainable, tr.frozen, tr.aux, imgs)
    )[:, : tr.num_classes]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_xla_clears_ambient_quant_mode(tmp_path):
    """block_impl='xla' fully specifies an unquantized artifact: an ambient
    quant mode (env opt-in / earlier TRAIN.QUANT build in this process)
    must not make the XLA trace raise, and must be restored afterwards."""
    from mudpt_tpu.models import layers as L

    tr = _tiny_trainer("MuDPT", tmp_path)
    want = np.asarray(
        tr.forward(tr.trainable, tr.frozen, tr.aux, _images(2))
    )[:, : tr.num_classes]

    prev = L.quant_mode()
    L.set_quant_mode("int8_ste")
    try:
        art = str(tmp_path / "xla_quant_ambient")
        serving.export_trainer(art, tr, platforms=("cpu",))
        assert L.quant_mode() == "int8_ste"  # context restored the mode
    finally:
        L.set_quant_mode(prev)
    got = serving.load(art).predict(_images(2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_pallas_int8_static_artifact(tmp_path):
    """block_impl='pallas_int8_static': requires calibration images,
    bakes the calibrated (L, 4) scale leaves into the artifact params,
    and records the calibration in meta; mode globals do not leak."""
    tr = _tiny_trainer("MuDPT", tmp_path)
    art = str(tmp_path / "artifact_q8s")
    with pytest.raises(ValueError, match="calib_images"):
        serving.export_trainer(art, tr, batch=4,
                               block_impl="pallas_int8_static")
    with pytest.raises(ValueError, match="only used by"):
        serving.export_trainer(art, tr, batch=4, block_impl="pallas",
                               calib_images=_images(4))

    calib = _images(8, res=tr.clip_cfg.image_resolution)
    serving.export_trainer(art, tr, batch=4,
                           block_impl="pallas_int8_static",
                           calib_images=calib)
    import json as _json

    meta = _json.load(open(os.path.join(art, "meta.json")))
    assert meta["block_impl"] == "pallas_int8_static"
    assert meta["calibration"] == {"n_images": 8}
    blob = open(os.path.join(art, "program.jaxexport"), "rb").read()
    assert b"tpu_custom_call" in blob

    # the calibrated (L, 4) scale array ships as a params leaf
    import numpy as np

    npz = np.load(os.path.join(art, "params.npz"))
    n_layers = tr.clip_cfg.vision_layers
    assert any(
        npz[k].shape == (n_layers, 4) and npz[k].dtype == np.float32
        for k in npz.files
    )

    from mudpt_tpu.models import layers

    assert layers.quant_mode() == "none"
    assert layers.resolve_block_impl() == "xla"


def test_export_static_rejects_instance_conditional(tmp_path):
    """CoCoOp re-encodes text per instance — no image-independent tower
    to calibrate; static export refuses with remediation."""
    tr = _tiny_trainer("CoCoOp", tmp_path)
    with pytest.raises(ValueError, match="pallas_int8"):
        serving.export_trainer(
            str(tmp_path / "a"), tr, batch=4,
            block_impl="pallas_int8_static", calib_images=_images(4),
        )


def test_export_static_reuses_trainer_scales(tmp_path):
    """A trainer built under a static quant mode carries calibrated
    scales: static export WITHOUT calib_images reuses them (the artifact
    serves exactly the numerics the prompts trained against), and
    non-static exports strip the scale leaves."""
    import jax
    import numpy as np

    from mudpt_tpu.models import layers
    from mudpt_tpu.trainers.mudpt import MuDPT
    from tests.test_trainers import tiny_cfg

    prev_impl, prev_q = layers._BLOCK_IMPL, layers.quant_mode()
    try:
        layers.set_block_impl("pallas")
        cfg = tiny_cfg("MuDPT", tmp_path / "tr")
        cfg.TRAIN.QUANT = "int8_ste_static"
        tr = MuDPT(cfg, devices=jax.devices()[:1])
    finally:
        layers._BLOCK_IMPL = prev_impl
        layers.set_quant_mode(prev_q)
    n_layers = tr.clip_cfg.vision_layers
    want = np.asarray(tr.frozen["visual"]["blocks"]["q8_scales"])

    art = str(tmp_path / "reuse")
    serving.export_trainer(art, tr, batch=4, block_impl="pallas_int8_static")
    import json as _json

    meta = _json.load(open(os.path.join(art, "meta.json")))
    assert meta["calibration"] == {"reused_trainer_scales": True}
    npz = np.load(os.path.join(art, "params.npz"))
    shipped = [
        npz[k] for k in npz.files
        if npz[k].shape == (n_layers, 4) and npz[k].dtype == np.float32
    ]
    assert any((s == want).all() for s in shipped)

    # non-static export from the same trainer: scale leaves are stripped
    art2 = str(tmp_path / "plain")
    serving.export_trainer(art2, tr, batch=4, block_impl="pallas")
    npz2 = np.load(os.path.join(art2, "params.npz"))
    assert not any(
        npz2[k].shape == (n_layers, 4) and npz2[k].dtype == np.float32
        for k in npz2.files
    )
