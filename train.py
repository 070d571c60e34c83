#!/usr/bin/env python
"""Training / evaluation CLI.

Same surface as the reference ``train.py`` (reference train.py:176-196):

  python train.py --dataset_root D --output_dir O --seed S \
      --trainer MuDPT --trainer_config configs/trainers/MuDPT/x.yaml \
      --dataset_config configs/datasets/caltech101.yaml \
      [--eval_only --model_dir M --load_epoch E] [--no_train] [KEY VALUE ...]

Config cascade precedence matches reference train.py:136-150: code defaults
-> dataset yaml -> trainer yaml -> CLI flags -> trailing KEY VALUE opts.
"""

from __future__ import annotations

import argparse

from mudpt_tpu.config import default_config, merge_from_file, merge_from_list
from mudpt_tpu.utils.logging import setup_logger
from mudpt_tpu.utils.rng import set_seed


def print_args(args, cfg) -> None:
    print("***************")
    print("** Arguments **")
    print("***************")
    for key in sorted(vars(args)):
        print(f"{key}: {getattr(args, key)}")
    print("************")
    print("** Config **")
    print("************")
    print(cfg)


def setup_config(args):
    cfg = default_config()
    if args.dataset_config:
        merge_from_file(cfg, args.dataset_config)
    if args.trainer_config:
        merge_from_file(cfg, args.trainer_config)
    if args.dataset_root:
        cfg.DATASET.ROOT = args.dataset_root
    if args.output_dir:
        cfg.OUTPUT_DIR = args.output_dir
    if args.seed:
        cfg.SEED = args.seed
    if args.trainer:
        cfg.TRAINER.NAME = args.trainer
    if args.backbone:
        cfg.MODEL.BACKBONE.NAME = args.backbone
    if args.backbone_path:
        cfg.MODEL.BACKBONE.PATH = args.backbone_path
    merge_from_list(cfg, args.opts)
    return cfg


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: sweep scripts rerun the same jitted
    step graphs hundreds of times (11 datasets x 5 shots x 3 seeds); caching
    turns the minutes-long TPU compile into a disk hit after the first run."""
    import os

    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/mudpt_tpu/xla_cache"),
    )
    try:
        # XLA:CPU AOT cache entries pin the COMPILE machine's features and
        # log E-level SIGILL warnings (and risk real SIGILL) when reloaded
        # on a different host — measured + rejected for CPU in round 3
        # (CLAUDE.md).  Only the accelerator path benefits anyway.
        if jax.default_backend() == "cpu":
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"compilation cache disabled: {e}")


def main(args) -> None:
    # must run before ANYTHING that initializes the XLA backend (even
    # jax.process_count() does) — env-gated no-op on single-host runs
    from mudpt_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    cfg = setup_config(args)
    if cfg.SEED >= 0:
        print(f"Setting fixed seed: {cfg.SEED}")
        set_seed(cfg.SEED)
    setup_logger(cfg.OUTPUT_DIR)
    _enable_compilation_cache()
    print_args(args, cfg)

    from mudpt_tpu.trainers import build_trainer

    trainer = build_trainer(cfg)

    if args.eval_only:
        trainer.load_model(args.model_dir, epoch=args.load_epoch)
        trainer.test()
        return
    if not args.no_train:
        trainer.train()


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_root", type=str, default="", help="path to dataset")
    parser.add_argument("--output_dir", type=str, default="", help="output directory")
    parser.add_argument("--seed", type=int, default=1, help="fixed seed (>=0)")
    parser.add_argument("--trainer_config", type=str, default="", help="trainer yaml")
    parser.add_argument("--dataset_config", type=str, default="", help="dataset yaml")
    parser.add_argument("--trainer", type=str, default="", help="trainer name")
    parser.add_argument("--backbone", type=str, default="", help="CLIP backbone name")
    parser.add_argument("--backbone_path", type=str, default="",
                        help="local CLIP checkpoint (.pt/.npz), or 'random'")
    parser.add_argument("--eval_only", action="store_true")
    parser.add_argument("--model_dir", type=str, default="")
    parser.add_argument("--load_epoch", type=int, default=None)
    parser.add_argument("--no_train", action="store_true")
    # accepted for drop-in compatibility with reference launch scripts;
    # dead in the reference too (its reset_cfg never reads them —
    # reference train.py:57-66 vs :193-194)
    parser.add_argument("--head", type=str, default="", help=argparse.SUPPRESS)
    parser.add_argument("--transforms", type=str, nargs="+",
                        help=argparse.SUPPRESS)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="KEY VALUE config overrides")
    args = parser.parse_args(argv)
    # A leading "--" separates nargs="+" flags (e.g. --transforms) from the
    # positional KEY VALUE overrides; REMAINDER keeps it, so drop it here.
    if args.opts and args.opts[0] == "--":
        args.opts = args.opts[1:]
    return args


if __name__ == "__main__":
    from mudpt_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    main(parse_args())
