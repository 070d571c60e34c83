#!/usr/bin/env python
"""CoCoOp ImageNet-scale train-step timing (the reference's hardest regime:
reference trainers/cocoop.py loops n_cls text encodes PER IMAGE in Python
and ran batch 1 on ImageNet).

Times the full jitted train step (value_and_grad + SGD update) at
n_cls=1000 with the chunked per-instance text encode, forcing a host fetch
per step (block_until_ready can return early on the tunneled chip).

Usage:
  python tools/bench_cocoop.py [--batch 8] [--n-cls 1000] [--steps 8]
  MUDPT_TPU_TEXT_TRUNC=0 python tools/bench_cocoop.py   # full-77-row A/B
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from mudpt_tpu.models.clip import VIT_B16, cast_matmul_weights, init_clip_params
from mudpt_tpu.trainers.cocoop import cocoop_forward
from mudpt_tpu.trainers.prompt_utils import embed_classnames, init_linear, random_ctx
from mudpt_tpu.utils.rng import new_rng


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-cls", type=int, default=1000)
    ap.add_argument("--n-ctx", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=0,
                    help="ENCODE_CHUNK: 0 auto, -1 never, N instances")
    ap.add_argument("--mode", choices=["train", "eval"], default="train",
                    help="eval = forward + argmax only (CoCoOp serving: "
                    "instance-conditional prompts cannot use a text cache)")
    ap.add_argument("--quant", choices=["none", "int8", "int8_ste"],
                    default="none",
                    help="int8 (eval mode): W8A8-quantize the block "
                    "projections (ops/quant_block.py) — CoCoOp serving is "
                    "all forward encode, so the int8 bandwidth win applies "
                    "to the whole step.  int8_ste (train mode): "
                    "quantization-aware prompt tuning")
    args = ap.parse_args()
    if args.quant == "int8" and args.mode != "eval":
        ap.error("--quant int8 is inference-only; use with --mode eval "
                 "(--quant int8_ste is the training variant)")
    if args.quant == "int8_ste" and args.mode != "train":
        ap.error("--quant int8_ste is the training variant; for serving "
                 "use --quant int8")
    if args.quant != "none":
        from mudpt_tpu.models.layers import set_block_impl, set_quant_mode

        set_block_impl("pallas")  # q8 exists only in the Pallas tier
        set_quant_mode(args.quant)

    cfg = VIT_B16
    params = cast_matmul_weights(init_clip_params(new_rng(0), cfg), jnp.bfloat16)
    aux = embed_classnames(
        params["text"],
        [f"object number {i}" for i in range(args.n_cls)],
        args.n_ctx,
        " ".join(["X"] * args.n_ctx),
    ).as_device_tree()
    key = new_rng(1)
    ks = jax.random.split(key, 3)
    trainable = {
        "ctx": random_ctx(ks[0], (args.n_ctx, cfg.transformer_width)),
        "meta_net": {
            "linear1": init_linear(ks[1], cfg.embed_dim, cfg.embed_dim // 16),
            "linear2": init_linear(ks[2], cfg.embed_dim // 16, cfg.transformer_width),
        },
    }
    fwd = functools.partial(
        cocoop_forward, clip_cfg=cfg, compute_dtype=jnp.bfloat16,
        encode_chunk=args.chunk,
    )
    tx = optax.sgd(2e-3, momentum=0.9)
    opt_state = tx.init(trainable)

    # frozen params/aux ride as jit OPERANDS: a closed-over array lowers as
    # an inlined HLO constant — the 86M-param backbone in the remote-compile
    # HTTP payload is a 413 on this tunnel (CLAUDE.md)
    def loss_fn(tr, frozen, aux_t, images, labels):
        logits = fwd(tr, frozen, aux_t, images)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        ).mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(tr, opt_state, frozen, aux_t, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(tr, frozen, aux_t, images, labels)
        updates, opt_state = tx.update(grads, opt_state, tr)
        return optax.apply_updates(tr, updates), opt_state, loss

    images = jax.random.normal(
        new_rng(2), (args.batch, cfg.image_resolution, cfg.image_resolution, 3),
        jnp.float32,
    )
    labels = jnp.arange(args.batch, dtype=jnp.int32) % args.n_cls

    if args.mode == "eval":
        @jax.jit
        def eval_step(tr, frozen, aux_t, images):
            return jnp.argmax(fwd(tr, frozen, aux_t, images), axis=-1)

        for _ in range(args.warmup):
            int(eval_step(trainable, params, aux, images)[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            int(eval_step(trainable, params, aux, images)[0])
        dt = time.perf_counter() - t0
        ms = dt / args.steps * 1e3
        print(
            json.dumps(
                {
                    "metric": (
                        f"CoCoOp ViT-B/16 eval step "
                        f"({'int8' if args.quant == 'int8' else 'bf16'}, "
                        f"batch {args.batch}, "
                        f"n_cls {args.n_cls}, per-instance text encode)"
                    ),
                    "value": round(ms, 1),
                    "unit": "ms/step",
                    "img_per_sec": round(args.batch / (dt / args.steps), 2),
                    "text_trunc": os.environ.get("MUDPT_TPU_TEXT_TRUNC", "auto"),
                    "encode_chunk": args.chunk,
                }
            )
        )
        return

    for _ in range(args.warmup):
        trainable, opt_state, loss = step(
            trainable, opt_state, params, aux, images, labels
        )
        float(loss)  # host fetch: block_until_ready can return early
    t0 = time.perf_counter()
    for _ in range(args.steps):
        trainable, opt_state, loss = step(
            trainable, opt_state, params, aux, images, labels
        )
        float(loss)
    dt = time.perf_counter() - t0

    ms = dt / args.steps * 1e3
    print(
        json.dumps(
            {
                "metric": (
                    f"CoCoOp ViT-B/16 train step "
                    f"({'int8-ste' if args.quant == 'int8_ste' else 'bf16'}, "
                    f"batch {args.batch}, "
                    f"n_cls {args.n_cls}, chunked text encode)"
                ),
                "value": round(ms, 1),
                "unit": "ms/step",
                "img_per_sec": round(args.batch / (dt / args.steps), 2),
                "text_trunc": os.environ.get("MUDPT_TPU_TEXT_TRUNC", "auto"),
                "encode_chunk": args.chunk,
                "final_loss": float(loss),
            }
        )
    )


if __name__ == "__main__":
    main()
