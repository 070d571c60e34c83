"""CoCoOp: instance-conditional prompts via a meta-network.

Reference trainers/cocoop.py: a two-layer meta-net maps each (normalized)
image feature to a bias added to the shared context (cocoop.py:99-103,
148-163); each image then gets its own n_cls text encodes.  The reference
loops over the batch in Python (cocoop.py:187-193) — here the per-instance
text encode is ONE batched (B, n_cls, seq, D) ``text_forward`` call, which
XLA streams through the MXU as a single matmul program and which shards
over the whole device mesh (instances on 'data', classes on 'model' —
models/text.py 4-D path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mudpt_tpu.models.clip import encode_image
from mudpt_tpu.models.text import text_forward
from mudpt_tpu.trainers.base import TrainerBase
from mudpt_tpu.trainers.prompt_utils import (
    compose_prompts,
    ctx_vectors_from_init,
    embed_classnames,
    init_linear,
    linear,
    random_ctx,
)
from mudpt_tpu.utils.registry import TRAINER_REGISTRY
from mudpt_tpu.utils.rng import new_rng


def _resolve_chunk(chunk: int, batch: int, n_cls: int, padded_seq: int = 80,
                   n_shards: int = 1, shard_quantum: int = 1) -> int:
    """Micro-batch size for the per-instance text encode.

    0 = auto: cap one micro-batch's live set by ROW-TOKENS (n_cls × chunk ×
    padded_seq) — unchunked whenever the whole batch fits, because the
    lax.map serialization + checkpoint recompute cost ~20-40% (measured
    at n_cls=1000: B=8/S=24 chunk 4 445 ms vs unchunked 336; B=32/S=16
    chunk 8 1686 ms vs unchunked 1385.7 — docs/BENCHMARKS.md round 4).
    The 512k-row-token budget is the MEASURED HBM boundary on the 16 GB
    chip: B=32 x n_cls=1000 x S=16 (512k row-tokens, recompute-mode
    backward) fits with ~2 GB to spare, while B=40 (640k) compiles to a
    17.18 G program — OOM by 1.43 G.  EOT-truncated rows (models/text.py)
    shrink the per-sequence footprint proportionally, so the same budget
    admits proportionally more instances per chunk.
    ``n_shards``: the budget bounds the PER-DEVICE live set — on a mesh
    where the (instances, classes) rows shard over n devices (the 4-D
    text path), each device holds 1/n of the rows, so the global budget
    scales by the shard count and chunking engages n times later.  The
    scaled budget is only valid while the rows actually shard: a CHUNKED
    call shards its instance axis only when the chunk size divides the
    mesh's data axis (``shard_quantum``), so chunk candidates must be
    multiples of it — and when no such divisor of the batch exists, the
    budget falls back to the single-device bound (an unsharded chunk must
    fit one chip, or the round-3 all-gather/OOM class returns).
    -1 = never chunk."""
    if chunk == -1:
        return batch
    if chunk == 0:
        base_budget = 6553 * 80
        row_tokens = max(1, n_cls * padded_seq)
        cap = max(1, base_budget * max(1, n_shards) // row_tokens)
        if cap >= batch:
            return batch  # unchunked: cocoop_forward verified sharding holds
        # prefer a batch divisor: a non-dividing chunk pads the final
        # micro-batch with duplicate instances, wasting a whole chunk of
        # encode work (measured +14% at n_cls=1000, B=8, chunk 3 vs 2 —
        # docs/BENCHMARKS.md)
        quantum = max(1, shard_quantum)
        for d in range(cap, 0, -1):
            if batch % d == 0 and d % quantum == 0:
                return d
        # no shardable chunk: the per-chunk rows live on ONE device, so
        # only the unscaled budget applies
        cap1 = max(1, base_budget // row_tokens)
        for d in range(min(cap1, batch), 0, -1):
            if batch % d == 0:
                return d
        return 1
    return max(1, min(chunk, batch))


def cocoop_forward(trainable, frozen, aux, images, *, clip_cfg, compute_dtype,
                   encode_chunk: int = -1, mesh_ctx=None):
    # the image tower shards its batch rows on 'data'; the per-instance
    # text encode runs as ONE 4-D (instances, classes, seq, D) text_forward
    # call whose rows shard over BOTH mesh axes (instances on 'data',
    # classes on 'model') — the fused Pallas tower, row packing, and the
    # save/recompute policy all see the true B*n_cls row count
    # (models/text.py 4-D path + parallel/mesh.shard_rows_2d)
    img = encode_image(
        frozen, images, clip_cfg, compute_dtype=compute_dtype, mesh_ctx=mesh_ctx
    )
    img = img.astype(jnp.float32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)  # (B, D)

    # meta-net bias (cocoop.py:99-103,148-155): Linear -> ReLU -> Linear
    h = jax.nn.relu(linear(trainable["meta_net"]["linear1"], img))
    bias = linear(trainable["meta_net"]["linear2"], h)          # (B, ctx_dim)
    ctx_shifted = trainable["ctx"][None] + bias[:, None]        # (B, n_ctx, D)

    scale = jnp.exp(frozen["logit_scale"])

    def encode_instances(ctx_c, img_c):
        # (C, n_ctx, D), (C, D) -> (C, n_cls) cosine logits
        prompts = jax.vmap(
            lambda c: compose_prompts(
                c, aux["token_prefix"], aux["token_suffix"], aux.get("index_map")
            )
        )(ctx_c)                                    # (C, n_cls, S, D)
        txt = text_forward(
            frozen["text"],
            prompts.astype(compute_dtype),
            aux["eot_idx"],
            n_head=clip_cfg.transformer_heads,
            mesh_ctx=mesh_ctx,
        ).astype(jnp.float32)                       # (C, n_cls, E)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return scale * jnp.einsum("cnd,cd->cn", txt, img_c)

    B = img.shape[0]
    n_cls = aux["token_prefix"].shape[0]
    # composed row length (possibly EOT-truncated): SOT + ctx + suffix bank
    seq = (
        aux["token_prefix"].shape[1]
        + trainable["ctx"].shape[-2]
        + aux["token_suffix"].shape[1]
    )
    padded_seq = -(-seq // 8) * 8
    # rows shard over the whole mesh when the (B, n_cls) block divides it
    # (shard_rows_2d / XLA propagation) — the auto-chunk HBM budget is
    # per-device, so it scales with the shard count
    n_shards, shard_quantum = 1, 1
    if mesh_ctx is not None:
        nd = mesh_ctx.mesh.shape.get("data", 1)
        nm = mesh_ctx.mesh.shape.get("model", 1)
        if B % nd == 0 and n_cls % nm == 0:
            n_shards, shard_quantum = nd * nm, nd
    chunk = _resolve_chunk(
        encode_chunk, B, n_cls, padded_seq, n_shards, shard_quantum
    )
    if chunk >= B:
        return encode_instances(ctx_shifted, img)  # (B, n_cls)

    # chunked: lax.map over micro-batches of instances — the batched text
    # encode's live set scales with chunk·n_cls instead of B·n_cls.  The
    # chunk body is jax.checkpoint'ed: without it every micro-batch's
    # per-layer tower residuals (chunk·n_cls 77-token sequences × 24
    # half-blocks) stay live for the backward — measured 67 GB at
    # n_cls=1000, B=8 — while with it only one micro-batch's forward is
    # ever materialized and the backward recomputes each chunk's encode.
    # Micro-batches run the IDENTICAL vmap'd computation, so the chunked
    # and unchunked FORWARD logits match bit-for-bit (tests/test_trainers.py,
    # same-kernel-mode comparison).  Gradients may differ in the last bits
    # when the unchunked path runs save-acts kernels: their MLP backward
    # derives the QuickGELU gradient from the bf16-rounded saved
    # pre-activation, while this path (saved_acts(False)) recomputes in fp32.
    pad = (-B) % chunk
    if pad:
        ctx_shifted = jnp.concatenate(
            [ctx_shifted, jnp.broadcast_to(ctx_shifted[-1:], (pad,) + ctx_shifted.shape[1:])]
        )
        img_p = jnp.concatenate(
            [img, jnp.broadcast_to(img[-1:], (pad, img.shape[1]))]
        )
    else:
        img_p = img
    n_chunks = (B + pad) // chunk
    ctx_c = ctx_shifted.reshape((n_chunks, chunk) + ctx_shifted.shape[1:])
    img_c = img_p.reshape((n_chunks, chunk, img.shape[1]))
    from mudpt_tpu.ops.fused_block import saved_acts

    with saved_acts(False):  # qkv/h saves for chunk·n_cls sequences would
        logits = jax.lax.map(  # dwarf the recompute they avoid
            jax.checkpoint(lambda args: encode_instances(*args)),
            (ctx_c, img_c),
        )
    return logits.reshape(n_chunks * chunk, -1)[:B]


@TRAINER_REGISTRY.register()
class CoCoOp(TrainerBase):
    model_name = "prompt_learner"  # reference cocoop.py:241
    hparams_key = "COCOOP"

    def build_model(self):
        cfg = self.cfg
        hp = getattr(cfg.TRAINER, self.hparams_key)
        clip_cfg, params = self.load_clip()
        self.clip_cfg = clip_cfg
        dim = clip_cfg.transformer_width
        vis_dim = clip_cfg.embed_dim
        n_ctx = hp.N_CTX
        key = new_rng(cfg.SEED)
        ks = jax.random.split(key, 3)

        if hp.CTX_INIT:
            ctx_init = hp.CTX_INIT.replace("_", " ")
            n_ctx = len(ctx_init.split(" "))
            ctx = ctx_vectors_from_init(params["text"], ctx_init, n_ctx)
            prompt_prefix = ctx_init
        else:
            ctx = random_ctx(ks[0], (n_ctx, dim))
            prompt_prefix = " ".join(["X"] * n_ctx)
        print(f'Initial context: "{prompt_prefix}" (n_ctx={n_ctx})')

        trainable = {
            "ctx": ctx,
            "meta_net": {
                "linear1": init_linear(ks[1], vis_dim, vis_dim // 16),
                "linear2": init_linear(ks[2], vis_dim // 16, dim),
            },
        }
        aux_cls = embed_classnames(
            params["text"], self.classnames, n_ctx, prompt_prefix
        )
        self.place(
            frozen=params,
            aux_class_tree=aux_cls.as_device_tree(),
            aux_repl=None,
            trainable=trainable,
        )
        self.forward = functools.partial(
            cocoop_forward,
            clip_cfg=clip_cfg,
            compute_dtype=self.compute_dtype,
            encode_chunk=getattr(hp, "ENCODE_CHUNK", 0),
            mesh_ctx=self.mesh,
        )
