#!/usr/bin/env python
"""Benchmark: MuDPT prompt-tuning training throughput (images/sec/chip).

Measures the full jitted training step of the flagship configuration —
CLIP ViT-B/16 (random weights; throughput is weight-agnostic), bf16
backbone, n_ctx=2, deep prompt depth 9, n_cls classes re-encoded every step
— on the available accelerator, and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": R}

``vs_baseline`` is value / A100_BASELINE_IPS.  The reference publishes no
numbers (BASELINE.md), so the baseline constant is an engineering estimate
of PyTorch MuDPT on one A100-80G at a throughput-optimal batch size:
ViT-B/16 fwd+bwd (~50 GFLOP/img with the frozen-weight backward) plus the
per-step n_cls x 77-token text tower, at ~40% MFU => ~850 img/s.  The
BASELINE.json north star is >=2x that per chip.
"""

from __future__ import annotations

import argparse
import json
import os
import time

A100_BASELINE_IPS = 850.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n-cls", type=int, default=100)
    ap.add_argument("--n-ctx", type=int, default=2)
    ap.add_argument("--depth", type=int, default=9)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--remat", choices=["auto", "selective", "full", "none"],
                    default="auto")
    args = ap.parse_args()

    from mudpt_tpu.models.layers import resolve_block_impl
    from mudpt_tpu.models.transformer import set_remat_mode

    if args.remat == "auto":
        # pallas fused blocks save only x per layer => no-remat fits large
        # batches; with XLA blocks no-remat fits to ~batch 96 on 16 GB
        if resolve_block_impl() == "pallas":
            set_remat_mode("none")
        else:
            set_remat_mode("none" if args.batch <= 96 else "full")
    else:
        set_remat_mode(args.remat)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mudpt_tpu.models.clip import VIT_B16, cast_matmul_weights, init_clip_params
    from mudpt_tpu.trainers.mudpt import mudpt_forward
    from mudpt_tpu.trainers.prompt_utils import (
        embed_classnames,
        init_linear,
        random_ctx,
    )
    from mudpt_tpu.utils.rng import new_rng
    import functools

    clip_cfg = VIT_B16
    params = cast_matmul_weights(init_clip_params(new_rng(0), clip_cfg), jnp.bfloat16)

    classnames = [f"object number {i}" for i in range(args.n_cls)]
    aux = embed_classnames(
        params["text"], classnames, args.n_ctx, "a photo of a"
    ).as_device_tree()

    ks = jax.random.split(new_rng(1), 8)
    dim, vdim = clip_cfg.transformer_width, clip_cfg.vision_width
    trainable = {
        "ctx": random_ctx(ks[0], (args.n_ctx, dim)),
        "deep_prompts": random_ctx(ks[1], (args.depth - 1, args.n_ctx, dim)),
        "embed_projection": init_linear(ks[2], dim, vdim),
        "deep_projections": init_linear(ks[3], dim, vdim),
        "visual_ctx": random_ctx(ks[4], (args.n_ctx, vdim)),
        "visual_ctx_deep_prompts": random_ctx(
            ks[5], (args.depth - 1, args.n_ctx, vdim)
        ),
        "visual_ctx_deep_projections": init_linear(ks[6], vdim, dim),
    }

    tx = optax.sgd(2.5e-3, momentum=0.9)
    opt_state = tx.init(trainable)

    forward = functools.partial(
        mudpt_forward, clip_cfg=clip_cfg, compute_dtype=jnp.bfloat16
    )

    def loss_fn(tr, frozen, aux, images, labels):
        logits = forward(tr, frozen, aux, images).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(tr, opt_state, frozen, aux, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(tr, frozen, aux, images, labels)
        updates, opt_state = tx.update(grads, opt_state, tr)
        return optax.apply_updates(tr, updates), opt_state, loss

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randn(args.batch, clip_cfg.image_resolution, clip_cfg.image_resolution, 3),
        jnp.float32,
    )
    labels = jnp.asarray(rng.randint(0, args.n_cls, args.batch), jnp.int32)

    for _ in range(args.warmup):
        trainable, opt_state, loss = train_step(
            trainable, opt_state, params, aux, images, labels
        )
    float(loss)  # host fetch: the only reliable barrier on tunneled devices

    t0 = time.perf_counter()
    for _ in range(args.steps):
        trainable, opt_state, loss = train_step(
            trainable, opt_state, params, aux, images, labels
        )
    # fetch the final loss: the donated-buffer chain forces every queued
    # step to execute before this value exists (block_until_ready alone
    # returns early on remote-relay platforms)
    final_loss = float(loss)
    dt = time.perf_counter() - t0
    assert final_loss == final_loss, "NaN loss in benchmark"

    ips = args.batch * args.steps / dt

    # FLOPs per step: prefer XLA's own accounting for the compiled step
    # (captures the frozen-backbone backward exactly: no dW for the
    # backbone) — EXCEPT with Pallas fused blocks, whose custom-call FLOPs
    # XLA cannot see; there we use the analytic matmul estimate.
    from mudpt_tpu.models.layers import resolve_block_impl as _rbi

    step_flops = None
    if _rbi() != "pallas":
        try:
            compiled = train_step.lower(
                trainable, opt_state, params, aux, images, labels
            ).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            step_flops = float(ca.get("flops", 0)) or None
        except Exception:
            pass
    if step_flops is None:
        def tower_fwd_flops(n_seq, n_layers, d, rows):
            per_tok_layer = (12 * d * d + 4 * n_seq * d) * 2
            return per_tok_layer * n_seq * n_layers * rows

        img_fwd = tower_fwd_flops(199, 12, 768, args.batch)
        txt_fwd = tower_fwd_flops(77, 12, 512, args.n_cls)
        from mudpt_tpu.models import transformer as _T

        # fwd + ~1.2x dx-only backward (frozen backbone => no dW).
        # +1x recompute when blocks rematerialize: always for the pallas
        # kernels (in-kernel recompute), under full remat for XLA blocks.
        recompute = _rbi() == "pallas" or _T._REMAT_MODE != "none"
        mult = 3.2 if recompute else 2.2
        step_flops = mult * (img_fwd + txt_fwd)
    achieved = step_flops * args.steps / dt
    peak = float(os.environ.get("TPU_PEAK_FLOPS", 197e12))  # v5e bf16

    print(
        json.dumps(
            {
                "metric": (
                    "MuDPT ViT-B/16 prompt-tuning train throughput "
                    f"(bf16, batch {args.batch}, n_cls {args.n_cls}, depth {args.depth})"
                ),
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
                # executed FLOPs (incl. backward recompute) — hardware
                # utilization, not algorithmic MFU
                "exec_tflops_per_sec": round(achieved / 1e12, 2),
                "hw_utilization": round(achieved / peak, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
