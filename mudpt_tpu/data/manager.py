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


def _train_shuffle(cfg) -> bool:
    """DATALOADER.TRAIN_X.SAMPLER -> shuffle flag, accepting both our
    vocabulary and Dassl's class names (reference configs use
    'RandomSampler'/'SequentialSampler'); anything else is an error, not a
    silent sequential run over the class-grouped few-shot item list."""
    s = cfg.DATALOADER.TRAIN_X.SAMPLER
    canon = {
        "random": True, "randomsampler": True,
        "sequential": False, "sequentialsampler": False,
    }
    key = s.lower()
    if key not in canon:
        raise ValueError(
            f"DATALOADER.TRAIN_X.SAMPLER={s!r}: expected random|sequential "
            "(or Dassl's RandomSampler/SequentialSampler)"
        )
    return canon[key]


def _host_shard_mode(v) -> str:
    """Normalize DATALOADER.HOST_SHARD to auto|on|off (accepts booleans and
    their string spellings for reference-YAML compatibility)."""
    if isinstance(v, bool):
        return "on" if v else "off"
    s = str(v).strip().lower()
    if s in ("true", "1", "yes", "on"):
        return "on"
    if s in ("false", "0", "no", "off", ""):
        return "off"
    if s == "auto":
        return "auto"
    raise ValueError(f"DATALOADER.HOST_SHARD={v!r}: expected auto|on|off")


class DataManager:
    def __init__(self, cfg, dataset=None, n_data=None):
        self.cfg = cfg
        self._n_data = n_data  # mesh data-axis width, when the caller knows it
        if dataset is None:
            _import_datasets()
            dataset_cls = DATASET_REGISTRY.get(cfg.DATASET.NAME)
            dataset = dataset_cls.build(cfg)
        self.dataset = dataset

        # multi-host input strategy (DATALOADER.HOST_SHARD): hosts decode
        # DISJOINT train-item shards and per-host batches; parallel/mesh.py
        # shard_batch(host_local=True) assembles the global batch from the
        # slices.  Items are truncated to equal per-host lengths so every
        # host runs the same number of steps (lockstep collectives).
        # "auto" (default) shards whenever the batch and the mesh data axis
        # divide by the process count, else falls back to replicated decode.
        self.host_sharded = False
        self.eval_host_sharded = False
        self._shard_mode = _host_shard_mode(cfg.DATALOADER.HOST_SHARD)
        train_items = dataset.train_x
        train_bs = cfg.DATALOADER.TRAIN_X.BATCH_SIZE
        if self._shard_mode != "off":
            import jax

            n_proc = jax.process_count()
            if n_proc > 1:
                if self._shard_mode == "on" and train_bs % n_proc:
                    raise ValueError(
                        f"DATALOADER.HOST_SHARD: global train batch "
                        f"{train_bs} must divide by process count {n_proc}"
                    )
                if train_bs % n_proc == 0 and (
                    self._shard_mode == "on"
                    or self._data_axis_divisible(n_proc)
                ):
                    n = (len(train_items) // n_proc) * n_proc
                    train_items = train_items[jax.process_index():n:n_proc]
                    train_bs = train_bs // n_proc
                    self.host_sharded = True
        self._train_items = train_items
        self._train_bs = train_bs

        if cfg.DATALOADER.PIPELINE == "grain":
            from mudpt_tpu.data.grain_pipeline import GrainLoader

            train_tf = build_transform(cfg, is_train=True)
            test_tf = build_transform(cfg, is_train=False)
            self.train_loader = GrainLoader(
                self._train_items, train_tf, self._train_bs,
                shuffle=_train_shuffle(cfg),
                drop_last=True, seed=cfg.SEED,
            )
            mk_eval = lambda items, bs, pad: GrainLoader(
                items, test_tf, bs, pad_to_batches=pad
            )
        elif cfg.DATALOADER.PIPELINE == "tfdata":
            from mudpt_tpu.data.tfdata import TFDataLoader

            size = cfg.INPUT.SIZE[0]
            mk_tf = lambda items, bs, train, pad=0: TFDataLoader(
                items, bs, size=size, is_train=train,
                shuffle=train and _train_shuffle(cfg),
                drop_last=train, seed=cfg.SEED,
                mean=cfg.INPUT.PIXEL_MEAN, std=cfg.INPUT.PIXEL_STD,
                pad_to_batches=pad,
            )
            self.train_loader = mk_tf(self._train_items, self._train_bs, True)
            mk_eval = lambda items, bs, pad: mk_tf(items, bs, False, pad)
        else:
            train_tf = build_transform(cfg, is_train=True)
            test_tf = build_transform(cfg, is_train=False)
            self.train_loader = DataLoader(
                self._train_items,
                train_tf,
                self._train_bs,
                shuffle=_train_shuffle(cfg),
                drop_last=True,
                num_workers=cfg.DATALOADER.NUM_WORKERS,
                seed=cfg.SEED,
            )
            mk_eval = lambda items, bs, pad: DataLoader(
                items, test_tf, bs,
                num_workers=cfg.DATALOADER.NUM_WORKERS,
                pad_to_batches=pad,
            )

        def eval_loader(items):
            # pod eval sharding applies uniformly across pipelines: host h
            # decodes only its block of every global batch (see _eval_shard)
            if items is None or not items:
                return None
            shard = self._eval_shard(items, cfg.DATALOADER.TEST.BATCH_SIZE)
            if shard is None:
                return mk_eval(items, cfg.DATALOADER.TEST.BATCH_SIZE, 0)
            host_items, bs_h, steps = shard
            self.eval_host_sharded = True
            loader = mk_eval(host_items, bs_h, steps)
            # evaluate() keys the host-local shard_batch + all-reduce path
            # off the LOADER, so a custom (unsharded) loader passed to the
            # public evaluate() is never mis-sliced
            loader.host_sharded_eval = True
            return loader

        self.val_loader = eval_loader(dataset.val)
        self.test_loader = eval_loader(dataset.test)

    def _data_axis_divisible(self, n_proc: int) -> bool:
        """Whether the mesh's data axis splits evenly across hosts (the
        shard_batch(host_local=True) requirement).  Uses the caller-provided
        mesh width when available, else recomputes it the way build_mesh
        would (PARALLEL.DATA override or device_count // PARALLEL.MODEL)."""
        n_data = self._n_data
        if n_data is None:
            import jax

            par = getattr(self.cfg, "PARALLEL", None)
            n_model = (getattr(par, "MODEL", 1) or 1) if par else 1
            n_data = (getattr(par, "DATA", 0) or 0) if par else 0
            n_data = n_data or jax.device_count() // n_model
        return n_data % n_proc == 0

    def _eval_shard(self, items, test_bs):
        """Pod eval sharding: split every global eval batch into contiguous
        per-host blocks — host h decodes ONLY rows [h·bs_h, (h+1)·bs_h) of
        each global batch of ``test_bs`` (matching shard_batch host_local's
        process-ordered block layout), so decode work scales 1/n_hosts and
        the union over hosts covers every item exactly once.  Returns
        (host_items, host_bs, pad_to_batches) — or None when not sharding
        (single process, HOST_SHARD off, an indivisible batch size, or a
        mesh data axis that does not split across hosts)."""
        import jax

        n_proc = jax.process_count()
        if self._shard_mode == "off" or n_proc == 1 or not items:
            return None
        if test_bs % n_proc:
            if self._shard_mode == "on":
                # mirror the train-side contract: "on" means REQUIRE
                # sharding, so an indivisible batch is an error, not a
                # silent fall-back to n_hosts-times the decode work
                raise ValueError(
                    f"DATALOADER.HOST_SHARD: global eval batch {test_bs} "
                    f"must divide by process count {n_proc}"
                )
            return None
        if self._shard_mode != "on" and not self._data_axis_divisible(n_proc):
            return None
        bs_h = test_bs // n_proc
        rank = jax.process_index()
        host_items = []
        for start in range(0, len(items), test_bs):
            block = items[start + rank * bs_h : start + (rank + 1) * bs_h]
            host_items.extend(block)
        steps = -(-len(items) // test_bs)
        return host_items, bs_h, steps

    @property
    def num_classes(self) -> int:
        return self.dataset.num_classes

    @property
    def classnames(self):
        return self.dataset.classnames
