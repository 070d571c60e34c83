"""Import helpers for using the read-only reference implementation as a
numerical oracle in parity tests.

The reference (PyTorch) lives at /root/reference and depends on packages not
installed here (ftfy, yacs, torchvision, dassl).  We install minimal stubs
for those *before* importing the reference modules; the stubs only need to
satisfy the code paths our tests exercise (CPU model math, tokenization).

Nothing from the reference is copied into the framework; these imports exist
only inside the test suite, as an executable specification.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def install_reference_stubs() -> None:
    if "ftfy" not in sys.modules:
        ftfy = _stub_module("ftfy")
        ftfy.fix_text = lambda text: text  # ASCII test inputs: identity

    if "pkg_resources" not in sys.modules:
        pr = _stub_module("pkg_resources")
        import packaging  # the real one; pkg_resources just re-exported it
        import packaging.version  # noqa: F401

        pr.packaging = packaging

    if "yacs" not in sys.modules:
        yacs = _stub_module("yacs")
        yacs_config = _stub_module("yacs.config")
        yacs.config = yacs_config

        class CfgNode(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        yacs_config.CfgNode = CfgNode

    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        transforms = _stub_module("torchvision.transforms")
        tv.transforms = transforms
        for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
            setattr(transforms, name, type(name, (), {"__init__": lambda self, *a, **k: None}))

    if "dassl" not in sys.modules:
        dassl = _stub_module("dassl")
        engine = _stub_module("dassl.engine")
        metrics = _stub_module("dassl.metrics")
        utils = _stub_module("dassl.utils")
        optim = _stub_module("dassl.optim")
        data = _stub_module("dassl.data")
        data_datasets = _stub_module("dassl.data.datasets")
        dassl.engine, dassl.metrics, dassl.utils, dassl.optim = engine, metrics, utils, optim
        dassl.data = data
        data.datasets = data_datasets

        class _Registry:
            def register(self, *a, **k):
                def deco(cls):
                    return cls
                if a and callable(a[0]):
                    return a[0]
                return deco

        class TrainerX:  # minimal base; tests never instantiate trainers
            pass

        engine.TRAINER_REGISTRY = _Registry()
        engine.TrainerX = TrainerX
        engine.build_trainer = lambda cfg: None
        metrics.compute_accuracy = lambda *a, **k: None
        utils.load_pretrained_weights = lambda *a, **k: None
        utils.load_checkpoint = lambda *a, **k: None
        utils.mkdir_if_missing = lambda *a, **k: None
        utils.read_json = lambda *a, **k: None
        utils.write_json = lambda *a, **k: None
        utils.listdir_nohidden = lambda *a, **k: []
        optim.build_optimizer = lambda *a, **k: None
        optim.build_lr_scheduler = lambda *a, **k: None

        class Datum:
            def __init__(self, impath="", label=0, classname=""):
                self.impath, self.label, self.classname = impath, label, classname

        class DatasetBase:
            def __init__(self, train_x=None, val=None, test=None):
                self.train_x, self.val, self.test = train_x, val, test

        data_datasets.DATASET_REGISTRY = _Registry()
        data_datasets.Datum = Datum
        data_datasets.DatasetBase = DatasetBase


def add_reference_path() -> None:
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def import_reference_tokenizer():
    install_reference_stubs()
    add_reference_path()
    import importlib

    mod = importlib.import_module("clip.simple_tokenizer")
    return mod.SimpleTokenizer()


def import_reference_clip():
    """Returns the reference `clip.model` module (torch)."""
    install_reference_stubs()
    add_reference_path()
    import importlib

    return importlib.import_module("clip.model")
