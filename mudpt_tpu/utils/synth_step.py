"""Synthetic MuDPT train-step builder — the ONE definition of the
"flagship step" measured by ``bench.py`` and profiled by
``tools/profile_step.py``.  Both tools previously carried their own copy of
this setup and drifted once; sharing it guarantees the profiler always
profiles exactly the step the benchmark times.

Random weights (throughput is weight-agnostic), bf16 backbone, synthetic
classnames, SGD + momentum — the flagship configuration documented in
docs/BENCHMARKS.md.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

MODEL_NAMES = ("ViT-B/16", "ViT-L/14", "ViT-L/14@336px", "test-tiny")


def build_synth_mudpt_step(
    model: str, batch: int, n_cls: int, n_ctx: int, depth: int
) -> SimpleNamespace:
    """Build the jitted MuDPT train step on synthetic data.

    Returns a namespace with: ``clip_cfg, params, aux, trainable, tx,
    opt_state, train_step, images, labels``.  ``train_step`` donates
    (trainable, opt_state) and returns ``(trainable, opt_state, loss)``.
    """
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
    from mudpt_tpu.trainers.mudpt import (
        mudpt_forward,
        mudpt_image_logits,
        mudpt_text_features,
    )
    from mudpt_tpu.trainers.prompt_utils import (
        embed_classnames,
        init_linear,
        random_ctx,
    )
    from mudpt_tpu.utils.rng import new_rng

    if model not in MODEL_NAMES:
        raise ValueError(f"unknown model {model!r}; known: {MODEL_NAMES}")
    if model == "test-tiny":  # CPU smoke runs (tests/test_bench.py)
        from mudpt_tpu.trainers.base import TINY_TEST as clip_cfg
    elif model == "ViT-L/14@336px":  # S=577: the 336px fine-tune's grid
        from mudpt_tpu.trainers.base import _NAMED_CONFIGS

        clip_cfg = _NAMED_CONFIGS[model]  # the ONE preset definition
    else:
        clip_cfg = VIT_B16 if model == "ViT-B/16" else VIT_L14
    params = cast_matmul_weights(init_clip_params(new_rng(0), clip_cfg), jnp.bfloat16)

    classnames = [f"object number {i}" for i in range(n_cls)]
    aux = embed_classnames(
        params["text"], classnames, n_ctx, "a photo of a"
    ).as_device_tree()

    ks = jax.random.split(new_rng(1), 8)
    dim, vdim = clip_cfg.transformer_width, clip_cfg.vision_width
    trainable = {
        "ctx": random_ctx(ks[0], (n_ctx, dim)),
        "deep_prompts": random_ctx(ks[1], (depth - 1, n_ctx, dim)),
        "embed_projection": init_linear(ks[2], dim, vdim),
        "deep_projections": init_linear(ks[3], dim, vdim),
        "visual_ctx": random_ctx(ks[4], (n_ctx, vdim)),
        "visual_ctx_deep_prompts": random_ctx(ks[5], (depth - 1, n_ctx, vdim)),
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

    # inference surface (bench.py --mode eval): the trainer-level serving
    # path — argmax on device, text features cacheable across batches
    # (trainers/base.py _jit_steps builds the same composition)
    kw = dict(clip_cfg=clip_cfg, compute_dtype=jnp.bfloat16)
    text_features = jax.jit(functools.partial(mudpt_text_features, **kw))
    image_logits = functools.partial(mudpt_image_logits, **kw)

    @jax.jit
    def eval_step_cached(tr, frozen, aux, images, txt):
        logits = image_logits(tr, frozen, aux, images, txt)
        return jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.int32)

    @jax.jit
    def eval_step_full(tr, frozen, aux, images):
        logits = forward(tr, frozen, aux, images)
        return jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.int32)

    rng = np.random.RandomState(0)
    # the reference casts images to the compute dtype before the conv
    # (mudpt.py parse_batch -> image.type(self.dtype)); feeding bf16 also
    # halves the H2D transfer
    images = jnp.asarray(
        rng.randn(batch, clip_cfg.image_resolution, clip_cfg.image_resolution, 3),
        jnp.bfloat16,
    )
    labels = jnp.asarray(rng.randint(0, n_cls, batch), jnp.int32)

    return SimpleNamespace(
        clip_cfg=clip_cfg,
        params=params,
        aux=aux,
        trainable=trainable,
        tx=tx,
        opt_state=opt_state,
        train_step=train_step,
        text_features=text_features,
        eval_step_cached=eval_step_cached,
        eval_step_full=eval_step_full,
        images=images,
        labels=labels,
    )
