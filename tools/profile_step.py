#!/usr/bin/env python
"""Profile the MuDPT train step on the TPU and print per-op time.

Runs the same step as bench.py under ``jax.profiler.trace``, converts the
raw xplane with xprof's ``framework_op_stats``, and prints the top ops by
self time — the round-2 A/B methodology (docs/BENCHMARKS.md).

  python tools/profile_step.py --batch 192 --n-cls 1000 [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B/16")
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--n-cls", type=int, default=1000)
    ap.add_argument("--n-ctx", type=int, default=2)
    ap.add_argument("--depth", type=int, default=9)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--outdir", default="/tmp/mudpt_profile")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mudpt_tpu.models.clip import (
        VIT_B16,
        VIT_L14,
        cast_matmul_weights,
        init_clip_params,
    )
    from mudpt_tpu.trainers.mudpt import mudpt_forward
    from mudpt_tpu.trainers.prompt_utils import (
        embed_classnames,
        init_linear,
        random_ctx,
    )
    from mudpt_tpu.utils.rng import new_rng

    clip_cfg = VIT_B16 if args.model == "ViT-B/16" else VIT_L14
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
        rng.randn(args.batch, clip_cfg.image_resolution,
                  clip_cfg.image_resolution, 3),
        jnp.bfloat16,
    )
    labels = jnp.asarray(rng.randint(0, args.n_cls, args.batch), jnp.int32)

    print("compiling + warmup...", flush=True)
    for _ in range(2):  # compile + warm
        trainable, opt_state, loss = train_step(
            trainable, opt_state, params, aux, images, labels
        )
    float(loss)
    print("tracing...", flush=True)

    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            trainable, opt_state, loss = train_step(
                trainable, opt_state, params, aux, images, labels
            )
        float(loss)

    # ---- convert + print framework_op_stats ------------------------------
    from xprof.convert import raw_to_tool_data as rtd

    planes = glob.glob(
        os.path.join(args.outdir, "plugins/profile/*/*.xplane.pb")
    )
    planes.sort(key=os.path.getmtime)
    assert planes, f"no xplane under {args.outdir}"
    data, _ = rtd.xspace_to_tool_data([planes[-1]], "framework_op_stats", {})
    import json as _json

    tables = _json.loads(data.decode() if isinstance(data, bytes) else data)
    table = tables[0] if isinstance(tables, list) else tables
    ids = [c["id"] for c in table["cols"]]
    rows = []
    for r in table["rows"]:
        vals = {i: (c or {}).get("v") for i, c in zip(ids, r["c"])}
        if vals.get("host_or_device") == "Host":
            continue
        rows.append(vals)
    rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
    total = sum(r.get("total_self_time") or 0 for r in rows)
    print(f"device total self-time: {total/1e3:.1f} ms over {args.steps} steps")
    print(f"{'op':64s} {'self_ms':>9s} {'%':>6s} {'occ':>6s} {'GB/s':>7s}")
    for r in rows[: args.top]:
        name = str(r.get("operation", "?"))[:64]
        t_us = r.get("total_self_time") or 0
        occ = r.get("occurrences") or 0
        bw = r.get("measured_memory_bw") or 0
        print(
            f"{name:64s} {t_us/1e3:9.2f} {100*t_us/max(total,1):6.1f} "
            f"{occ:6d} {bw:7.1f}"
        )


if __name__ == "__main__":
    main()
