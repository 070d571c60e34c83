"""Optimizer + LR schedule factory (optax).

Reproduces Dassl's ``build_optimizer`` / ``build_lr_scheduler`` behavior for
the configurations the reference ships (SGD momentum 0.9, weight decay 5e-4,
cosine annealing stepped per epoch, constant-LR warmup — e.g.
configs/trainers/MuDPT/vit_b16_bz4_ep10_nctx2_depth9.yaml:15-22):

  lr(epoch) = WARMUP_CONS_LR                      for epoch < WARMUP_EPOCH
            = LR * 0.5 * (1 + cos(pi*epoch/MAX))  otherwise

The schedule is expressed per-step but quantized to epoch boundaries to
match torch's per-epoch ``scheduler.step()`` exactly.
"""

from __future__ import annotations

from typing import Tuple

import optax


def make_lr_schedule(optim_cfg, steps_per_epoch: int):
    max_epoch = optim_cfg.MAX_EPOCH
    warmup_epoch = optim_cfg.WARMUP_EPOCH
    base_lr = optim_cfg.LR
    warmup_lr = optim_cfg.WARMUP_CONS_LR
    scheduler = optim_cfg.LR_SCHEDULER
    warmup_type = optim_cfg.WARMUP_TYPE
    spe = max(1, steps_per_epoch)

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // spe
        if scheduler == "cosine":
            main_lr = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / max_epoch))
        elif scheduler == "single_step":
            main_lr = base_lr
        else:
            raise NotImplementedError(f"LR_SCHEDULER={scheduler!r}")
        if warmup_epoch <= 0:
            return main_lr
        if warmup_type == "constant":
            wlr = jnp.asarray(warmup_lr, jnp.float32)
        elif warmup_type == "linear":
            frac = (step + 1) / (warmup_epoch * spe)
            wlr = warmup_lr + frac * (base_lr - warmup_lr)
        else:
            raise NotImplementedError(f"WARMUP_TYPE={warmup_type!r}")
        return jnp.where(epoch < warmup_epoch, wlr, main_lr)

    return schedule


def _sgd_momentum_with_dampening(momentum: float, dampening: float):
    """torch.optim.SGD momentum buffer with dampening:
    buf_0 = g_0; buf_t = momentum*buf_{t-1} + (1-dampening)*g_t."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return {
            "buf": jax.tree_util.tree_map(jnp.zeros_like, params),
            "step": jnp.zeros([], jnp.int32),
        }

    def update(grads, state, params=None):
        first = state["step"] == 0
        buf = jax.tree_util.tree_map(
            lambda b, g: jnp.where(
                first, g, momentum * b + (1.0 - dampening) * g
            ),
            state["buf"],
            grads,
        )
        return buf, {"buf": buf, "step": state["step"] + 1}

    import optax as _optax

    return _optax.GradientTransformation(init, update)


def build_optimizer(optim_cfg, steps_per_epoch: int) -> Tuple[optax.GradientTransformation, object]:
    schedule = make_lr_schedule(optim_cfg, steps_per_epoch)
    name = optim_cfg.NAME.lower()
    if name == "sgd":
        dampening = getattr(optim_cfg, "SGD_DAMPNING", 0.0)  # ref typo kept
        # torch only consults dampening when momentum != 0
        if dampening and optim_cfg.MOMENTUM:
            # torch semantics exactly: buf_0 = g_0 (dampening skipped on the
            # first update), then buf = momentum*buf + (1-dampening)*g.
            # torch also rejects nesterov with nonzero dampening.
            if optim_cfg.SGD_NESTEROV:
                raise ValueError(
                    "Nesterov momentum requires zero SGD_DAMPNING "
                    "(torch.optim.SGD semantics)"
                )
            tx = optax.chain(
                optax.add_decayed_weights(optim_cfg.WEIGHT_DECAY),
                _sgd_momentum_with_dampening(optim_cfg.MOMENTUM, dampening),
                optax.scale_by_learning_rate(schedule),
            )
        else:
            tx = optax.chain(
                optax.add_decayed_weights(optim_cfg.WEIGHT_DECAY),
                optax.sgd(
                    learning_rate=schedule,
                    momentum=optim_cfg.MOMENTUM,
                    nesterov=optim_cfg.SGD_NESTEROV,
                ),
            )
    elif name == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(optim_cfg.WEIGHT_DECAY),
            optax.adam(learning_rate=schedule),
        )
    elif name == "adamw":
        tx = optax.adamw(
            learning_rate=schedule, weight_decay=optim_cfg.WEIGHT_DECAY
        )
    else:
        raise NotImplementedError(f"OPTIM.NAME={optim_cfg.NAME!r}")
    return tx, schedule
