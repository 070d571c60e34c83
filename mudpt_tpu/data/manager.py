"""DataManager: dataset construction + train/val/test loaders from a Config.

The Dassl equivalent is constructed inside every trainer's ``__init__``
(reference call stack SURVEY.md §3.1): DATASET_REGISTRY lookup -> few-shot
pipeline -> DataLoaders with train/test transforms.
"""

from __future__ import annotations

from mudpt_tpu.data.loader import DataLoader
from mudpt_tpu.data.transforms import build_transform
from mudpt_tpu.utils.registry import DATASET_REGISTRY


def _import_datasets() -> None:
    # registration via import side effects (mirrors reference train.py:15-29)
    import mudpt_tpu.data.datasets  # noqa: F401


class DataManager:
    def __init__(self, cfg, dataset=None):
        self.cfg = cfg
        if dataset is None:
            _import_datasets()
            dataset_cls = DATASET_REGISTRY.get(cfg.DATASET.NAME)
            dataset = dataset_cls.build(cfg)
        self.dataset = dataset

        train_tf = build_transform(cfg, is_train=True)
        test_tf = build_transform(cfg, is_train=False)

        self.train_loader = DataLoader(
            dataset.train_x,
            train_tf,
            cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
            shuffle=True,
            drop_last=True,
            num_workers=cfg.DATALOADER.NUM_WORKERS,
            seed=cfg.SEED,
        )
        self.val_loader = (
            DataLoader(
                dataset.val,
                test_tf,
                cfg.DATALOADER.TEST.BATCH_SIZE,
                num_workers=cfg.DATALOADER.NUM_WORKERS,
            )
            if dataset.val
            else None
        )
        self.test_loader = DataLoader(
            dataset.test,
            test_tf,
            cfg.DATALOADER.TEST.BATCH_SIZE,
            num_workers=cfg.DATALOADER.NUM_WORKERS,
        )

    @property
    def num_classes(self) -> int:
        return self.dataset.num_classes

    @property
    def classnames(self):
        return self.dataset.classnames
