"""Multi-step TRAINING-TRAJECTORY parity vs the reference stack.

Gradient parity (test_grad_parity) certifies one backward pass; these tests
certify the full training update as ONE function iterated over steps:
grads -> weight decay -> momentum (torch first-step semantics) -> per-epoch
warmup/cosine LR -> parameter update, with optimizer state persisting
across steps and the data changing every step.

The reference side is the real torch training loop: ``CustomCLIP`` forward,
``F.cross_entropy(...).backward()``, ``torch.optim.SGD(momentum=0.9,
weight_decay=5e-4)`` stepped under a per-epoch ``CosineAnnealingLR`` with
Dassl's constant warmup (reference trainers/mudpt.py:225-251 composes
Dassl ``build_optimizer``/``build_lr_scheduler`` this way; the shipped
hyperparams are configs/trainers/MuDPT/vit_b16_bz4_ep10_nctx2_depth9.yaml:
15-22).  The per-epoch LR values come from torch's own CosineAnnealingLR
object, not from our formula, so the schedule oracle is independent.

Our side composes the SAME pieces the production train step uses
(trainers/base.py:194-201): ``jax.value_and_grad`` -> ``build_optimizer``'s
``tx.update`` -> ``optax.apply_updates``.

A wrong weight-decay placement, a dampening/first-step momentum bug, an
off-by-one epoch in the schedule, or an update-order difference all
compound over the 8 steps and fail the final-delta comparison; per-step
loss tracking localizes WHERE a divergence starts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mudpt_tpu.config.config import OptimCfg
from mudpt_tpu.trainers.coop import coop_forward
from mudpt_tpu.trainers.mudpt import mudpt_forward
from mudpt_tpu.trainers.optim import build_optimizer

from tests.test_zoo_parity import (
    CLASSNAMES,
    _aux_from_learner,
    _backbone,
    _base_cfg,
    _setup,
    _tiny_clip,
)

def tc(x):
    """Copying snapshot of a torch tensor.  ``t()`` (jnp.asarray of the
    .numpy() view) can be ZERO-COPY on the CPU backend, and torch's SGD
    updates params IN PLACE — without the copy, the torch training loop
    would silently mutate our 'initial' pytree through shared memory."""
    return jnp.asarray(np.array(x.detach().numpy(), copy=True))


def linc(module):
    return {"w": tc(module.weight).T, "b": tc(module.bias)}


MAX_EPOCH = 4
STEPS_PER_EPOCH = 2
N_STEPS = MAX_EPOCH * STEPS_PER_EPOCH
LR = 0.05
WARMUP_CONS_LR = 1e-3
MOMENTUM = 0.9
WEIGHT_DECAY = 5e-4
BATCH = 2


def _step_batches():
    """A distinct (images, labels) pair per step — trajectory parity must
    hold under CHANGING data, not a repeated batch."""
    batches = []
    for s in range(N_STEPS):
        rs = np.random.RandomState(100 + s)
        images = rs.randn(BATCH, 3, 32, 32).astype(np.float32)
        labels = rs.randint(0, len(CLASSNAMES), size=BATCH).astype(np.int64)
        batches.append((images, labels))
    return batches


def _torch_epoch_lrs(torch):
    """Per-epoch LR values from torch's own CosineAnnealingLR stepped once
    per epoch (the Dassl convention), with epoch 0 overridden by the
    constant warmup — recorded on a dummy optimizer so the recursive
    scheduler never sees an externally-modified group lr."""
    probe = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(probe, T_max=MAX_EPOCH)
    lrs = []
    for _ in range(MAX_EPOCH):
        lrs.append(sched.get_last_lr()[0])
        sched.step()
    lrs[0] = WARMUP_CONS_LR  # Dassl ConstantWarmupScheduler, WARMUP_EPOCH=1
    return lrs


def _torch_train(torch, ref_model, trainable_params, batches):
    """The reference training loop: CE backward + SGD step each batch, LR
    set per epoch (reference trainers/mudpt.py:235-259)."""
    import torch.nn.functional as F

    for p in ref_model.parameters():
        p.requires_grad_(False)
    for p in trainable_params:
        p.requires_grad_(True)
    opt = torch.optim.SGD(
        trainable_params, lr=LR, momentum=MOMENTUM,
        weight_decay=WEIGHT_DECAY,
    )
    epoch_lrs = _torch_epoch_lrs(torch)
    losses = []
    for s, (images, labels) in enumerate(batches):
        for group in opt.param_groups:
            group["lr"] = epoch_lrs[s // STEPS_PER_EPOCH]
        opt.zero_grad(set_to_none=True)
        logits = ref_model(torch.from_numpy(images))
        loss = F.cross_entropy(logits, torch.from_numpy(labels))
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def _our_optim_cfg():
    return OptimCfg(
        NAME="sgd", LR=LR, MOMENTUM=MOMENTUM, WEIGHT_DECAY=WEIGHT_DECAY,
        MAX_EPOCH=MAX_EPOCH, WARMUP_EPOCH=1, WARMUP_TYPE="constant",
        WARMUP_CONS_LR=WARMUP_CONS_LR, LR_SCHEDULER="cosine",
        SGD_DAMPNING=0.0, SGD_NESTEROV=False,
    )


def _our_train(forward, trainable, frozen, aux, clip_cfg, batches):
    """The production update composition (trainers/base.py:194-201):
    value_and_grad -> tx.update -> apply_updates, iterated."""
    tx, _ = build_optimizer(_our_optim_cfg(), STEPS_PER_EPOCH)
    opt_state = tx.init(trainable)

    def loss_fn(tr, images, labels):
        logits = forward(
            tr, frozen, aux, images, clip_cfg=clip_cfg,
            compute_dtype=jnp.float32,
        ).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    @jax.jit
    def train_step(tr, opt_state, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(tr, images, labels)
        updates, opt_state = tx.update(grads, opt_state, tr)
        tr = optax.apply_updates(tr, updates)
        return tr, opt_state, loss

    losses = []
    for images, labels in batches:
        trainable, opt_state, loss = train_step(
            trainable, opt_state,
            jnp.asarray(images.transpose(0, 2, 3, 1)),
            jnp.asarray(labels.astype(np.int32)),
        )
        losses.append(float(loss))
    return trainable, losses


def _assert_trajectory_close(initial, ours, ref_final, ref_losses,
                             our_losses):
    """Per-step losses track (localizes where a divergence starts), and the
    accumulated weight DELTAS match — deltas, not values, so a broken
    update cannot hide behind a large initial weight."""
    np.testing.assert_allclose(
        our_losses, ref_losses, rtol=2e-3, atol=2e-4,
        err_msg="per-step training losses diverged",
    )
    flat_init = jax.tree_util.tree_flatten_with_path(initial)[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_final)[0]
    assert [k for k, _ in flat_ours] == [k for k, _ in flat_ref]
    for (path, w0), (_, wa), (_, wb) in zip(flat_init, flat_ours, flat_ref):
        name = jax.tree_util.keystr(path)
        da = np.asarray(wa, np.float64) - np.asarray(w0, np.float64)
        db = np.asarray(wb, np.float64) - np.asarray(w0, np.float64)
        assert np.abs(db).max() > 1e-8, f"reference never updated {name}"
        scale = np.abs(db).max()
        np.testing.assert_allclose(
            da, db, rtol=0, atol=2e-2 * scale,
            err_msg=f"trajectory delta mismatch at {name}",
        )


def test_mudpt_training_trajectory_parity():
    cfg = _base_cfg("MuDPT", N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=2,
                    PREC="fp32")
    torch, clip_mod, tmod = _setup("mudpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.mudpt_prompt_learner
    ie = ref.image_encoder
    trainable = {
        "ctx": tc(pl.ctx),
        "deep_prompts": tc(pl.deep_prompts),
        "embed_projection": linc(pl.embed_projection),
        "deep_projections": linc(pl.deep_projections),
        "visual_ctx": tc(ie.visual_ctx),
        "visual_ctx_deep_prompts": tc(ie.visual_ctx_deep_prompts),
        "visual_ctx_deep_projections": linc(ie.visual_ctx_deep_projections),
    }
    initial = jax.tree_util.tree_map(np.asarray, trainable)
    aux = _aux_from_learner(pl)
    batches = _step_batches()

    torch_params = [
        pl.ctx, pl.deep_prompts,
        pl.embed_projection.weight, pl.embed_projection.bias,
        pl.deep_projections.weight, pl.deep_projections.bias,
        ie.visual_ctx, ie.visual_ctx_deep_prompts,
        ie.visual_ctx_deep_projections.weight,
        ie.visual_ctx_deep_projections.bias,
    ]
    ref_losses = _torch_train(torch, ref, torch_params, batches)
    ours, our_losses = _our_train(
        mudpt_forward, trainable, frozen, aux, clip_cfg, batches
    )

    ref_final = {
        "ctx": tc(pl.ctx),
        "deep_prompts": tc(pl.deep_prompts),
        "embed_projection": linc(pl.embed_projection),
        "deep_projections": linc(pl.deep_projections),
        "visual_ctx": tc(ie.visual_ctx),
        "visual_ctx_deep_prompts": tc(ie.visual_ctx_deep_prompts),
        "visual_ctx_deep_projections": linc(ie.visual_ctx_deep_projections),
    }
    _assert_trajectory_close(initial, ours, ref_final, ref_losses,
                             our_losses)


def test_coop_training_trajectory_parity():
    cfg = _base_cfg("CoOp", N_CTX=4, CTX_INIT="", PREC="fp32", CSC=False,
                    CLASS_TOKEN_POSITION="end")
    torch, clip_mod, tmod = _setup("coop", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=None)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.prompt_learner
    aux = _aux_from_learner(pl)
    trainable = {"ctx": tc(pl.ctx)}
    initial = jax.tree_util.tree_map(np.asarray, trainable)
    batches = _step_batches()

    ref_losses = _torch_train(torch, ref, [pl.ctx], batches)
    ours, our_losses = _our_train(
        coop_forward, trainable, frozen, aux, clip_cfg, batches
    )
    _assert_trajectory_close(initial, ours, {"ctx": tc(pl.ctx)}, ref_losses,
                             our_losses)
