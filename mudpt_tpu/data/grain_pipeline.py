"""Grain-based input pipeline (deterministic, checkpointable).

Third pipeline option next to the threaded PIL loader and tf.data
(``DATALOADER.PIPELINE: grain``).  Grain gives a deterministic global
sample order from (seed, epoch) — matching the framework's exact-resume
story — and worker-process parallel decode via Grain's multiprocessing
(worker_count, left at 0 by default: the few-shot datasets are small and
this environment has one core).

Decode/augment reuse the PIL transforms, so all three pipelines are
numerically identical per item; the per-item augmentation RNG is derived
from (seed, epoch, record index).
"""

from __future__ import annotations

import random
from typing import List

import numpy as np

import grain.python as grain

from mudpt_tpu.data.datum import Datum
from mudpt_tpu.data.transforms import load_image


class _DecodeTransform(grain.MapTransform):
    def __init__(self, items: List[Datum], transform, seed: int, epoch: int):
        self._items = items
        self._transform = transform
        self._seed = seed
        self._epoch = epoch

    def map(self, item_idx: int):
        item = self._items[item_idx]
        rng = random.Random(
            hash((self._seed, self._epoch, int(item_idx))) & 0xFFFFFFFF
        )
        if item.array is not None:
            arr = np.asarray(item.array, np.float32)
            if hasattr(self._transform, "apply_array"):
                arr = self._transform.apply_array(arr, rng)
        else:
            try:
                arr = self._transform(load_image(item.impath), rng)
            except TypeError:
                arr = self._transform(load_image(item.impath))
        return {"image": arr.astype(np.float32), "label": np.int32(item.label)}


class GrainLoader:
    def __init__(
        self,
        items: List[Datum],
        transform,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        seed: int = 0,
        pad_to_batches: int = 0,
    ):
        self.items = items
        self.transform = transform
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self._drop_last = drop_last and len(items) >= batch_size
        self._epoch = 0
        # pod eval: hosts iterate in lockstep (collectives), so a host whose
        # item shard is short must still emit the same number of batches —
        # trailing batches are all-invalid zeros (same as DataLoader)
        self.pad_to_batches = pad_to_batches

    def __len__(self) -> int:
        n = len(self.items)
        if self._drop_last:
            return n // self.batch_size
        return max(
            (n + self.batch_size - 1) // self.batch_size, self.pad_to_batches
        )

    def _empty_batch(self) -> dict:
        size = getattr(self.transform, "size", None)
        if self.items:  # infer the decoded shape from a real item
            shape = _DecodeTransform(
                self.items, self.transform, self.seed, 0
            ).map(0)["image"].shape
        elif size is not None:
            shape = (size, size, 3)
        else:
            # empty item shard AND a size-less transform: fall back to the
            # CLIP default (must match the other hosts' batch shape; real
            # trainer transforms always expose .size)
            shape = (224, 224, 3)
        return {
            "image": np.zeros((self.batch_size, *shape), np.float32),
            "label": np.zeros(self.batch_size, np.int32),
            "valid": np.zeros(self.batch_size, bool),
        }

    def set_epoch(self, epoch: int):
        """Fast-forward the epoch counter so a resumed run replays the exact
        shuffle/augmentation order an uninterrupted run would see (same
        contract as DataLoader.set_epoch; next __iter__ builds ``epoch``)."""
        self._epoch = int(epoch)

    def _build(self, epoch: int) -> grain.DataLoader:
        source = grain.InMemoryDataSource(list(range(len(self.items))))
        sampler = grain.IndexSampler(
            num_records=len(self.items),
            shard_options=grain.NoSharding(),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed + epoch,  # fresh order per epoch
        )
        return grain.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[
                _DecodeTransform(self.items, self.transform, self.seed, epoch),
                grain.Batch(
                    batch_size=self.batch_size, drop_remainder=self._drop_last
                ),
            ],
            worker_count=self.num_workers,
        )

    def __iter__(self):
        emitted = 0
        if self.items:
            loader = self._build(self._epoch)
            self._epoch += 1
            for batch in loader:
                images, labels = batch["image"], batch["label"]
                n = len(labels)
                pad = self.batch_size - n
                if pad:
                    images = np.pad(
                        images, [(0, pad)] + [(0, 0)] * (images.ndim - 1)
                    )
                    labels = np.pad(labels, (0, pad))
                yield {
                    "image": np.asarray(images, np.float32),
                    "label": np.asarray(labels, np.int32),
                    "valid": np.arange(self.batch_size) < n,
                }
                emitted += 1
        if emitted < self.pad_to_batches:
            eb = self._empty_batch()  # consumers treat batches as read-only
            for _ in range(self.pad_to_batches - emitted):
                yield eb
