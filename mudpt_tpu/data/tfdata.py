"""Optional tf.data input pipeline (production path).

The default loader (data/loader.py) is PIL + threads — fine for few-shot
workloads (dozens-to-thousands of images).  For full-dataset training
(ImageNet linear-probe extraction, zero-shot sweeps) this module builds the
same preprocessing as a tf.data graph: parallel JPEG decode, bicubic resize,
center/random-resized crop, flip, CLIP normalization, prefetch.  TensorFlow
is imported lazily — nothing here loads unless requested via
``DATALOADER.PIPELINE: tfdata``.

Determinism matches the threads/Grain loaders: the shuffle order is a pure
function of (seed, epoch), and train-time augmentation uses STATELESS tf
image ops keyed by (seed, epoch, position) — so two runs of the same config
are bit-identical regardless of AUTOTUNE parallelism, and a resumed run
(``set_epoch``) replays exactly the batches an uninterrupted run would see.

Output batches use the same dict contract as DataLoader
({image f32 NHWC, label i32, valid bool}) so trainers are agnostic.
"""

from __future__ import annotations

from typing import List

import numpy as np

from mudpt_tpu.data.datum import Datum
from mudpt_tpu.data.transforms import CLIP_MEAN, CLIP_STD


class TFDataLoader:
    def __init__(
        self,
        items: List[Datum],
        batch_size: int,
        *,
        size: int = 224,
        is_train: bool = False,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        mean=CLIP_MEAN,
        std=CLIP_STD,
        pad_to_batches: int = 0,
    ):
        import tensorflow as tf

        tf.config.set_visible_devices([], "GPU")
        tf.config.set_visible_devices([], "TPU")
        self._tf = tf
        self.batch_size = batch_size
        self.items = items
        self._size = size
        self._is_train = is_train
        self._shuffle = shuffle
        self._seed = seed
        self._epoch = 0
        missing = sum(1 for it in items if not it.impath)
        if missing:
            raise ValueError(
                f"DATALOADER.PIPELINE=tfdata reads images from disk, but "
                f"{missing}/{len(items)} items have no file path (array-backed "
                f"dataset, e.g. Synthetic) — use the threads or grain pipeline"
            )
        paths = [it.impath for it in items]
        labels = [it.label for it in items]
        self._n = len(items)
        self._mean_t = tf.constant(mean, tf.float32)
        self._std_t = tf.constant(std, tf.float32)
        self._base = tf.data.Dataset.from_tensor_slices(
            (tf.constant(paths, tf.string), tf.constant(labels, tf.int32))
        )
        self._drop_last = drop_last
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

    def set_epoch(self, epoch: int):
        """Fast-forward the epoch counter so a resumed run replays the exact
        shuffle order AND augmentation draws an uninterrupted run would see
        (same contract as DataLoader.set_epoch; the next __iter__ builds
        ``epoch``)."""
        self._epoch = int(epoch)

    def _normalize(self, img):
        img = img / 255.0
        return (img - self._mean_t) / self._std_t

    def _decode_eval(self, idx, path, label):
        tf, size = self._tf, self._size
        del idx
        raw = tf.io.read_file(path)
        img = tf.io.decode_image(raw, channels=3, expand_animations=False)
        shape = tf.shape(img)
        # same geometry arithmetic as transforms.EvalTransform / torchvision:
        # short side -> size, long side int-truncated, crop origin
        # round(delta/2) half-to-even (tf.round rounds half to even too)
        short = tf.minimum(shape[0], shape[1])
        long_ = tf.maximum(shape[0], shape[1])
        new_long = tf.cast(
            tf.cast(size, tf.float64) * tf.cast(long_, tf.float64)
            / tf.cast(short, tf.float64),
            tf.int32,
        )
        nh = tf.where(shape[0] >= shape[1], new_long, size)
        nw = tf.where(shape[0] >= shape[1], size, new_long)
        img = tf.image.resize(img, (nh, nw), method="bicubic")
        top = tf.cast(tf.round(tf.cast(nh - size, tf.float32) / 2.0), tf.int32)
        left = tf.cast(tf.round(tf.cast(nw - size, tf.float32) / 2.0), tf.int32)
        img = img[top : top + size, left : left + size]
        return tf.reshape(self._normalize(img), (size, size, 3)), label

    def _make_decode_train(self, epoch: int):
        """Augmentations draw from STATELESS ops keyed by (seed+epoch,
        position): stateful tf random kernels would make results depend on
        the parallel-map execution order (and replay identically every
        epoch), breaking both run-to-run determinism and exact resume."""
        tf, size = self._tf, self._size
        base = tf.constant(self._seed + epoch, tf.int32)

        def _sample_box(shape3, crop_seed):
            # random resized crop, scale 0.08-1.0, ratio 3/4-4/3
            bbox = tf.image.stateless_sample_distorted_bounding_box(
                shape3,
                bounding_boxes=tf.zeros((1, 0, 4)),
                seed=crop_seed,
                area_range=(0.08, 1.0),
                aspect_ratio_range=(0.75, 1.3333),
                use_image_if_no_bounding_boxes=True,
            )
            begin, sz, _ = bbox
            return begin, sz

        def decode_train(idx, path, label):
            # disjoint per-op streams via position stride 2: keying flip as
            # [base+1, pos] would alias epoch E's flip key with epoch E+1's
            # crop key, correlating consecutive epochs' draws
            pos = tf.cast(idx % (2**30), tf.int32)
            crop_seed = tf.stack([base, 2 * pos])
            flip_seed = tf.stack([base, 2 * pos + 1])
            raw = tf.io.read_file(path)

            def fused_jpeg():
                # FUSED decode+crop: draw the crop window from the JPEG
                # HEADER dims, then decode only the cropped MCU region —
                # at the 0.08-1.0 area distribution this skips roughly
                # half the IDCT work on average, and the bicubic resize
                # reads the small crop instead of the full frame.  The
                # box draw is keyed on (h, w, 3) exactly as the full
                # decode's tf.shape would report, so the augmentation
                # GEOMETRY is unchanged.  Pixels are bit-identical to
                # decode-then-slice for 4:4:4 JPEGs; for chroma-subsampled
                # (4:2:0) files libjpeg's skip-scanlines path can shift
                # the chroma upsample context at the crop's top boundary
                # (measured <= 30/255 on <= ~2% of pixels, worst-case
                # noise images) — an augmentation-decode detail, bounded
                # by tests/test_aux.py::test_tfdata_fused_crop_matches_slice.
                hw = tf.image.extract_jpeg_shape(raw)
                shape3 = tf.stack([hw[0], hw[1], tf.constant(3, tf.int32)])
                begin, sz = _sample_box(shape3, crop_seed)
                window = tf.stack([begin[0], begin[1], sz[0], sz[1]])
                return tf.image.decode_and_crop_jpeg(raw, window, channels=3)

            def full_decode():  # non-JPEG items (PNG etc.)
                img = tf.io.decode_image(
                    raw, channels=3, expand_animations=False
                )
                begin, sz = _sample_box(tf.shape(img), crop_seed)
                return tf.slice(img, begin, sz)

            img = tf.cond(tf.io.is_jpeg(raw), fused_jpeg, full_decode)
            img = tf.image.resize(img, (size, size), method="bicubic")
            img = tf.image.stateless_random_flip_left_right(img, seed=flip_seed)
            return tf.reshape(self._normalize(img), (size, size, 3)), label

        return decode_train

    def _build(self, epoch: int):
        # a fresh iterator would otherwise replay the SAME seed-derived
        # shuffle every epoch (reshuffle_each_iteration only reshuffles
        # within one repeated iterator) — salt the seed per epoch instead,
        # which also makes the order a pure function of (seed, epoch) for
        # exact resume
        tf = self._tf
        ds = self._base
        if self._shuffle:
            ds = ds.shuffle(
                min(self._n, 50_000), seed=self._seed + epoch,
                reshuffle_each_iteration=False,
            )
        # enumerate AFTER shuffle: augmentation RNG is keyed by the item's
        # position in the epoch, the same convention as the threads loader
        ds = ds.enumerate()
        fn = self._make_decode_train(epoch) if self._is_train else self._decode_eval
        ds = ds.map(
            lambda i, pl: fn(i, pl[0], pl[1]),
            num_parallel_calls=tf.data.AUTOTUNE,
        )
        ds = ds.batch(self.batch_size, drop_remainder=self._drop_last)
        return ds.prefetch(tf.data.AUTOTUNE)

    def __iter__(self):
        emitted = 0
        if self.items:
            ds = self._build(self._epoch)
            self._epoch += 1
            for images, labels in ds.as_numpy_iterator():
                n = len(labels)
                pad = self.batch_size - n
                if pad:
                    images = np.pad(images, [(0, pad), (0, 0), (0, 0), (0, 0)])
                    labels = np.pad(labels, (0, pad))
                yield {
                    "image": images.astype(np.float32),
                    "label": labels.astype(np.int32),
                    "valid": np.arange(self.batch_size) < n,
                }
                emitted += 1
        if emitted < self.pad_to_batches:
            eb = {  # consumers treat batches as read-only
                "image": np.zeros(
                    (self.batch_size, self._size, self._size, 3), np.float32
                ),
                "label": np.zeros(self.batch_size, np.int32),
                "valid": np.zeros(self.batch_size, bool),
            }
            for _ in range(self.pad_to_batches - emitted):
                yield eb
