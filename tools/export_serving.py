#!/usr/bin/env python
"""Export a trained (or zero-shot) classifier as an AOT serving artifact.

Builds the trainer exactly like train.py (same config cascade), optionally
loads a trained checkpoint, then writes a ``jax.export`` StableHLO artifact
that any JAX host can serve WITHOUT mudpt_tpu model code (see
mudpt_tpu/serving.py — the TPU-native counterpart of the reference's
TorchScript serving archives, reference clip/clip.py:95-140).

  python tools/export_serving.py --trainer MuDPT \
      --dataset_config configs/datasets/caltech101.yaml \
      --dataset_root $DATA --model_dir output/... --load_epoch 10 \
      --export_dir serving/caltech_mudpt [--batch N] [--platforms cpu tpu]

Smoke-check the artifact afterwards with:

  python -c "import mudpt_tpu.serving as s, numpy as np; \
             clf = s.load('serving/caltech_mudpt'); \
             print(clf.predict(np.zeros((2, 224, 224, 3), np.float32)).shape)"
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")  # repo-root execution, like train.py

from train import setup_config  # noqa: E402  (same cascade as training)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_root", type=str, default="")
    p.add_argument("--output_dir", type=str, default="")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--trainer_config", type=str, default="")
    p.add_argument("--dataset_config", type=str, default="")
    p.add_argument("--trainer", type=str, default="")
    p.add_argument("--backbone", type=str, default="")
    p.add_argument("--backbone_path", type=str, default="")
    p.add_argument("--model_dir", type=str, default="",
                   help="trained checkpoint dir (omit for untrained/zero-shot)")
    p.add_argument("--load_epoch", type=int, default=None)
    p.add_argument("--export_dir", type=str, required=True)
    p.add_argument("--batch", type=int, default=None,
                   help="pin the serving batch (default: symbolic batch; "
                   "CoCoOp requires a pinned batch)")
    p.add_argument("--platforms", type=str, nargs="+", default=None)
    p.add_argument("--block_impl",
                   choices=["xla", "pallas", "pallas_int8",
                            "pallas_int8_static"],
                   default="xla",
                   help="pallas: embed the fused Mosaic kernels (2.3x the "
                   "XLA forward on-chip) — TPU-only artifact, needs --batch. "
                   "pallas_int8: additionally quantize the block projections "
                   "W8A8 (MXU int8 = 2x bf16 rate). pallas_int8_static: "
                   "W8A8 with CALIBRATED static activation scales (no "
                   "per-row quant chain; calibrates on --calib_images "
                   "images drawn from the training split)")
    p.add_argument("--calib_images", type=int, default=64,
                   help="pallas_int8_static: number of training-split "
                   "images to calibrate activation scales on")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = p.parse_args(argv)
    if args.opts and args.opts[0] == "--":
        args.opts = args.opts[1:]
    return args


def main(args) -> None:
    cfg = setup_config(args)
    from mudpt_tpu.serving import export_trainer
    from mudpt_tpu.trainers import build_trainer
    from mudpt_tpu.utils.rng import set_seed

    if cfg.SEED >= 0:
        set_seed(cfg.SEED)
    trainer = build_trainer(cfg)
    if args.model_dir:
        trainer.load_model(args.model_dir, epoch=args.load_epoch)
    calib = None
    if args.block_impl == "pallas_int8_static" and cfg.TRAIN.QUANT in (
        "int8_static", "int8_ste_static"
    ):
        # the build (and post-load recalibration) already attached
        # calibrated q8_scales to the frozen towers — export reuses them,
        # so the artifact serves exactly the numerics the prompts trained
        # against (serving.export_trainer records reused_trainer_scales)
        print("Reusing the trainer's calibrated static int8 scales")
    elif args.block_impl == "pallas_int8_static":
        import numpy as np

        rows, have = [], 0
        for batch in trainer.dm.train_loader:
            rows.append(np.asarray(batch["image"], np.float32))
            have += rows[-1].shape[0]
            if have >= args.calib_images:
                break
        calib = np.concatenate(rows)[: args.calib_images]
        print(f"Calibrating static int8 scales on {len(calib)} images")
    export_trainer(
        args.export_dir, trainer, batch=args.batch,
        platforms=tuple(args.platforms) if args.platforms else None,
        block_impl=args.block_impl, calib_images=calib,
    )
    print(f"Exported {cfg.TRAINER.NAME} serving artifact -> {args.export_dir}")


if __name__ == "__main__":
    from mudpt_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    main(parse_args())
