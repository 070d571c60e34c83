#!/usr/bin/env python
"""Throughput sweep harness for the MuDPT train step.

Usage:
  python tools/sweep_bench.py B:REMAT:BLOCK[:SAVE] [more specs...]
e.g.
  python tools/sweep_bench.py 384:none:pallas:save 384:none:pallas:reco
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mudpt_tpu.models import layers as L
from mudpt_tpu.models import transformer as T
from mudpt_tpu.models.clip import VIT_B16, cast_matmul_weights, init_clip_params
from mudpt_tpu.trainers.mudpt import mudpt_forward
from mudpt_tpu.trainers.prompt_utils import embed_classnames, init_linear, random_ctx
from mudpt_tpu.utils.rng import new_rng

N_CLS = 100


def setup():
    cfg = VIT_B16
    params = cast_matmul_weights(init_clip_params(new_rng(0), cfg), jnp.bfloat16)
    aux = embed_classnames(
        params["text"], [f"object number {i}" for i in range(N_CLS)], 2,
        "a photo of a",
    ).as_device_tree()
    ks = jax.random.split(new_rng(1), 8)
    trainable = {
        "ctx": random_ctx(ks[0], (2, 512)),
        "deep_prompts": random_ctx(ks[1], (8, 2, 512)),
        "embed_projection": init_linear(ks[2], 512, 768),
        "deep_projections": init_linear(ks[3], 512, 768),
        "visual_ctx": random_ctx(ks[4], (2, 768)),
        "visual_ctx_deep_prompts": random_ctx(ks[5], (8, 2, 768)),
        "visual_ctx_deep_projections": init_linear(ks[6], 768, 512),
    }
    return cfg, params, aux, trainable


def run(cfg, params, aux, trainable0, B, remat, block, save):
    from mudpt_tpu.ops import fused_block as FB

    L.set_block_impl(block)
    T.set_remat_mode(remat)
    FB.set_save_acts(save == "save")
    tx = optax.sgd(2.5e-3, momentum=0.9)
    forward = functools.partial(
        mudpt_forward, clip_cfg=cfg, compute_dtype=jnp.bfloat16
    )

    def loss_fn(tr, frozen, aux, images, labels):
        lg = forward(tr, frozen, aux, images).astype(jnp.float32)
        lp = jax.nn.log_softmax(lg, -1)
        return -jnp.take_along_axis(lp, labels[:, None], 1).mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(tr, st, frozen, aux, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(tr, frozen, aux, images, labels)
        upd, st = tx.update(grads, st, tr)
        return optax.apply_updates(tr, upd), st, loss

    imgs = jnp.asarray(np.random.RandomState(0).randn(B, 224, 224, 3), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, N_CLS, B), jnp.int32)
    tr = jax.tree_util.tree_map(jnp.copy, trainable0)
    st = tx.init(tr)
    try:
        for _ in range(2):
            tr, st, loss = step(tr, st, params, aux, imgs, labels)
        lv = float(loss)
        N = 10
        t0 = time.perf_counter()
        for _ in range(N):
            tr, st, loss = step(tr, st, params, aux, imgs, labels)
        lv = float(loss)
        dt = time.perf_counter() - t0
        print(
            f"B={B} remat={remat} block={block} save={save}: "
            f"{B * N / dt:.1f} img/s ({dt / N * 1e3:.1f} ms/step, loss {lv:.3f})",
            flush=True,
        )
    except Exception as e:
        print(
            f"B={B} remat={remat} block={block} save={save}: FAILED "
            f"{type(e).__name__} {str(e)[:140]}",
            flush=True,
        )


def main():
    cfg, params, aux, trainable = setup()
    for spec in sys.argv[1:]:
        parts = spec.split(":")
        B, remat = int(parts[0]), parts[1]
        block = parts[2] if len(parts) > 2 else "xla"
        save = parts[3] if len(parts) > 3 else "save"
        run(cfg, params, aux, trainable, B, remat, block, save)


if __name__ == "__main__":
    main()
