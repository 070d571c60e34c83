#!/usr/bin/env python
"""Zoo-wide train-step throughput: one JSON line per registered method.

The headline bench (bench.py) covers MuDPT and tools/bench_cocoop.py the
divergent CoCoOp forward; this tool times EVERY prompt-tuning method's
jitted train step under the production configuration (bf16 backbone,
fused Pallas towers, Synthetic in-memory data, one device-resident batch
per step) so per-method throughput is measured rather than inferred:

  python tools/bench_zoo.py                      # TPU, all methods
  python tools/bench_zoo.py --trainers CoOp VPT  # subset
  JAX_PLATFORMS=cpu python tools/bench_zoo.py --model test-tiny \
      --batch 8 --n-cls 4 --size 32 --steps 2    # CPU smoke

Differences between methods are real workload differences: VPT/MPT train
against the build-time static text cache (vision tower only per step);
CoOp/MuDPT/UMuDPT/UUMuDPT re-encode the n_cls class prompts every step;
CoCoOp encodes n_cls rows PER INSTANCE (use bench_cocoop.py for its
ImageNet-scale regimes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ZOO = (
    ("CoOp", {}),
    ("CoCoOp", {}),
    ("VPT", dict(VISUAL_PROMPT_DEPTH=9, DEEP_VISUAL_N_CTX=2)),
    (
        "MPT",
        dict(
            VISUAL_PROMPT_DEPTH=9,
            DEEP_VISUAL_N_CTX=2,
            TEXT_PROMPT_DEPTH=9,
            DEEP_TEXT_N_CTX=2,
        ),
    ),
    ("MuDPT", {}),
    ("UMuDPT", {}),
    ("UUMuDPT", {}),
)


def bench_one(name: str, extra: dict, args) -> dict:
    import jax
    import numpy as np

    from mudpt_tpu.config import default_config
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.trainers import build_trainer

    cfg = default_config()
    cfg.TRAINER.NAME = name
    cfg.MODEL.BACKBONE.NAME = args.model
    cfg.MODEL.BACKBONE.PATH = "random"
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.SYNTHETIC_NUM_CLASSES = args.n_cls
    cfg.DATASET.SYNTHETIC_PER_CLASS = max(
        1, -(-(args.batch * 2) // args.n_cls)
    )
    cfg.INPUT.SIZE = (args.size, args.size)
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = args.batch
    cfg.DATALOADER.TEST.BATCH_SIZE = args.batch
    cfg.DATALOADER.NUM_WORKERS = 4
    cfg.OUTPUT_DIR = ""
    hp = cfg.trainer_params(name)
    if hp is not None:
        from mudpt_tpu.trainers.base import _NAMED_CONFIGS

        bb = _NAMED_CONFIGS.get(args.model)
        for k, v in extra.items():
            if bb is not None and k == "VISUAL_PROMPT_DEPTH":
                v = min(v, bb.vision_layers)
            if bb is not None and k == "TEXT_PROMPT_DEPTH":
                v = min(v, bb.transformer_layers)
            setattr(hp, k, v)
        if hasattr(hp, "N_CTX") and name in ("CoOp", "CoCoOp"):
            hp.N_CTX = args.n_ctx
    if getattr(args, "opts", None):
        from mudpt_tpu.config import merge_from_list

        merge_from_list(cfg, args.opts)
    tr = build_trainer(cfg)

    batch = next(iter(tr.dm.train_loader))
    # exactly what run_epoch feeds the step: host-side bf16 image cast
    # (halves H2D + device reads) before sharding
    sb = shard_batch(tr.mesh, tr._cast_images(batch))

    if args.mode == "eval":
        # the serving path evaluate() runs: text features cached ONCE per
        # pass where the method allows (every prompt trainer but CoCoOp;
        # ZeroshotCLIP caches in aux at build), argmax on device.  Like
        # evaluate(), strip any build-time static text cache from aux so
        # the timed program matches the serving one (no duplicated
        # n_cls x D device operand for static-text trainers)
        aux = {k: v for k, v in tr.aux.items() if k != "static_text_features"}
        if getattr(tr, "_text_features", None) is not None:
            txt = tr._text_features(tr.trainable, tr.frozen, aux)
            jax.block_until_ready(txt)

            def step():
                return tr._eval_step_cached(
                    tr.trainable, tr.frozen, aux, sb["image"], txt
                )
        else:

            def step():
                return tr._eval_step(tr.trainable, tr.frozen, aux, sb["image"])

        t_compile = time.perf_counter()
        preds = np.asarray(step())  # host fetch bounds the compile
        compile_s = time.perf_counter() - t_compile
        for _ in range(max(0, args.warmup - 1)):
            preds = np.asarray(step())
        t0 = time.perf_counter()
        for _ in range(args.steps):
            preds_dev = step()
        preds = np.asarray(preds_dev)  # (B,) int32: bounds queued steps
        dt = time.perf_counter() - t0
        return {
            "trainer": name,
            "mode": "eval",
            "img_per_sec": round(args.batch * args.steps / dt, 1),
            "ms_per_step": round(dt / args.steps * 1e3, 1),
            "text_cached": getattr(tr, "_text_features", None) is not None
            or getattr(tr, "model_inference", None) is not None,
            "first_step_s": round(compile_s, 1),
        }

    def step():
        tr.trainable, tr.opt_state, loss, _ = tr._train_step(
            tr.trainable, tr.opt_state, tr.frozen, tr.aux, sb
        )
        return loss

    t_compile = time.perf_counter()
    loss = float(step())  # host fetch bounds the compile
    compile_s = time.perf_counter() - t_compile
    for _ in range(max(0, args.warmup - 1)):
        loss = float(step())
    # queue all timed steps, fetch ONCE: per-device execution is in-order,
    # so the last loss bounds every queued step (bench.py's convention) —
    # a per-step fetch would add the tunnel's ~26 ms host round-trip to
    # every step, which production training does not pay (run_epoch
    # fetches only every PRINT_FREQ batches)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss_dev = step()
    loss = float(loss_dev)
    dt = time.perf_counter() - t0
    ips = args.batch * args.steps / dt
    return {
        "trainer": name,
        "img_per_sec": round(ips, 1),
        "ms_per_step": round(dt / args.steps * 1e3, 1),
        "static_text_cache": bool(getattr(tr, "static_text", False)),
        "first_step_s": round(compile_s, 1),
        "final_loss": round(loss, 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="ViT-B/16")
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--n-cls", type=int, default=100)
    ap.add_argument("--n-ctx", type=int, default=2)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--trainers", nargs="+", default=None)
    ap.add_argument("--mode", choices=["train", "eval"], default="train",
                    help="train: jitted train-step throughput. eval: the "
                    "serving path (cached text features + on-device "
                    "argmax); ZeroshotCLIP(2) are eval-only and benched "
                    "when requested via --trainers")
    # trailing KEY VALUE config overrides (train.py semantics) — applied to
    # every benched method, e.g.: TRAINER.MUDPT.CTX_INIT "" TRAINER.MUDPT.N_CTX 2
    args, opts = ap.parse_known_args()
    if args.steps < 1:
        ap.error("--steps must be >= 1")
    bad = [o for o in opts if o.startswith("-")]
    if bad:
        ap.error(f"unknown flags {bad}; config overrides are KEY VALUE pairs")
    args.opts = opts

    zoo = list(ZOO)
    if args.mode == "eval" and args.trainers:
        # eval-only methods are benchable on request (not in the train ZOO)
        zoo += [(n, {}) for n in ("ZeroshotCLIP", "ZeroshotCLIP2")
                if n in args.trainers]

    rows = []
    for name, extra in zoo:
        if args.trainers and name not in args.trainers:
            continue
        try:
            row = bench_one(name, extra, args)
        except Exception as e:  # report and continue — one OOM must not
            row = {"trainer": name, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({
            "metric": f"{name} {args.model} {args.mode} throughput "
                      f"(batch {args.batch}, n_cls {args.n_cls})",
            **row,
        }), flush=True)
        rows.append(row)
    return 0 if all("error" not in r for r in rows) else 1


if __name__ == "__main__":
    from mudpt_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    sys.exit(main())
