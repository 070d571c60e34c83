"""The reference's own YAML config files load through our cascade as-is
(the MIGRATION.md claim).  Every dataset YAML's DATASET.NAME must resolve in
our dataset registry; every trainer YAML must merge its dataloader/input/
optim keys; the stale ``TRAINER.MAPLE`` namespace (reference SURVEY.md §2.5
— yacs would reject it) must warn, not crash."""

import glob
import os
import warnings

import pytest

from mudpt_tpu.config import default_config, merge_from_file
from mudpt_tpu.utils.registry import DATASET_REGISTRY, TRAINER_REGISTRY

REF = "/root/reference/configs"

DATASET_YAMLS = sorted(glob.glob(os.path.join(REF, "datasets", "*.yaml")))
TRAINER_YAMLS = sorted(glob.glob(os.path.join(REF, "trainers", "*", "*.yaml")))


@pytest.mark.skipif(not DATASET_YAMLS, reason="reference configs not mounted")
@pytest.mark.parametrize(
    "path", DATASET_YAMLS, ids=[os.path.basename(p) for p in DATASET_YAMLS]
)
def test_reference_dataset_yaml_loads_and_resolves(path):
    import mudpt_tpu.data.datasets  # registration side effects  # noqa: F401

    cfg = default_config()
    merge_from_file(cfg, path)
    assert cfg.DATASET.NAME, f"{path} merged no DATASET.NAME"
    # the name must resolve to one of our loaders (same registry contract)
    DATASET_REGISTRY.get(cfg.DATASET.NAME)


@pytest.mark.skipif(not TRAINER_YAMLS, reason="reference configs not mounted")
@pytest.mark.parametrize(
    "path",
    TRAINER_YAMLS,
    ids=[f"{os.path.basename(os.path.dirname(p))}-{os.path.basename(p)}"
         for p in TRAINER_YAMLS],
)
def test_reference_trainer_yaml_loads(path):
    import mudpt_tpu.trainers  # registration side effects  # noqa: F401

    cfg = default_config()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        merge_from_file(cfg, path)
    # values that every reference trainer YAML sets must have landed
    assert cfg.DATALOADER.TRAIN_X.BATCH_SIZE in (1, 4, 32, 100, 128, 256)
    assert cfg.INPUT.SIZE == (224, 224)  # "(224, 224)" string form coerces
    assert 0 < cfg.OPTIM.LR < 1
    assert cfg.OPTIM.NAME == "sgd"
    assert isinstance(cfg.OPTIM.WARMUP_CONS_LR, float)  # "1e-5" coerces
    assert cfg.INPUT.PIXEL_MEAN == (0.48145466, 0.4578275, 0.40821073)
    # the trainer named by the directory exists and has an hparam namespace
    trainer = os.path.basename(os.path.dirname(path))
    TRAINER_REGISTRY.get(trainer)
    cfg.trainer_params(trainer)
    # MuDPT/UMuDPT YAMLs carry the dead TRAINER.MAPLE namespace: it must
    # warn (unknown key) instead of crashing the merge, and the effective
    # hparams stay the extend_cfg defaults — reproducing reference behavior
    unknown = [str(w.message) for w in caught if "Unknown config key" in str(w.message)]
    if trainer in ("MuDPT", "UMuDPT"):
        assert any("MAPLE" in m for m in unknown), unknown
        assert cfg.trainer_params(trainer).DEEP_PROMPT_DEPTH == 8  # default kept
