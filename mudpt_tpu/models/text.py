"""Text transformer tower with generic prompt hooks.

One pure function replaces the reference's per-trainer ``TextEncoder``
replicas (reference trainers/coop.py:178-199, trainers/mudpt.py:133-156,
clip/model.py:825-838), all of which repeat the same recipe:
embeddings + positional -> causal transformer -> ln_final -> take the EOT
position -> @ text_projection.

Static-shape notes:
  * the EOT gather uses precomputed indices (EOT is the max token id, so
    ``tokens.argmax(-1)`` — computed once at trace time, clip/model.py:836)
    via ``take_along_axis`` — no dynamic shapes;
  * deep text prompts splice positions 1..1+n_ctx in layers 1..d-1
    (clip/model.py:283-289) through the shared injection schedule.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from mudpt_tpu.models.layers import layer_norm
from mudpt_tpu.models.transformer import make_injection_schedule, transformer_forward


def causal_mask(context_length: int) -> jax.Array:
    """Additive causal mask (reference clip/model.py:810-816)."""
    mask = jnp.full((context_length, context_length), -jnp.inf, jnp.float32)
    return jnp.triu(mask, k=1)


# Text-row packing factor: pack G independent class sequences into one
# kernel row of G*P tokens (P = the row length rounded to the 8-sublane
# grid).  The per-token projections (12·D² of the layer's ~13·D²-units of
# matmul) then run at M = G·P rows per Pallas program, and the grid
# shrinks ×G — the lever for the large-n_cls text tower (ImageNet sweeps
# re-encode n_cls rows every step).  The Pallas kernels run PER-SEQUENCE
# block attention (ops/fused_block._attn_block_spec), so score/softmax
# cost does not inflate.
# 0 = auto (below); 1 = off; explicit G forces.
_TEXT_PACK = int(os.environ.get("MUDPT_TPU_TEXT_PACK", "0"))
# auto G targets ~256 tokens per packed kernel row, capped at 8 — the
# measured optima (docs/BENCHMARKS.md round 3; n_cls=1000):
#   P=80 (full rows, B=192):       G=1 812, G=2 861.6, G=4 870.2*, G=8 842.5
#   P=16 (EOT-truncated, B=384):   G=4 1513.9, G=8 1552.6*, G=16 1543.0
# and at n_cls=100/P=16 the headline measures 1830.0 with G=8 vs 1791.7
# unpacked.  G=16 lost at both row lengths, hence the cap.
_AUTO_PACK_TOKENS = 256
_AUTO_PACK_MAX_G = 8
# engage auto packing only while the row-pad waste stays small: packing N
# rows in groups of G pads to ceil(N/G)*G, so requiring N >= 8*G bounds
# the waste at 12.5% — G shrinks to fit smaller class counts.
_AUTO_PACK_MIN_GROUPS = 8


def set_text_pack(g: int) -> None:
    global _TEXT_PACK
    _TEXT_PACK = max(0, int(g))


def _auto_pack_g(padded_seq: int, n_rows: int = 1 << 30) -> int:
    # nearest power of two to _AUTO_PACK_TOKENS / P (pow2 keeps the padded
    # row count a clean divisor of the class-row padding), shrunk until the
    # pad-waste gate (n_rows >= 8*G) admits it
    import math

    ratio = max(1.0, _AUTO_PACK_TOKENS / max(1, padded_seq))
    g = 2 ** int(round(math.log2(ratio)))
    g = max(1, min(_AUTO_PACK_MAX_G, g))
    while g > 1 and n_rows < _AUTO_PACK_MIN_GROUPS * g:
        g //= 2
    return g


def _resolve_pack(n_rows: int, num_layers: int, padded_seq: int = 80) -> int:
    if _TEXT_PACK != 0:
        return _TEXT_PACK
    from mudpt_tpu.models.layers import resolve_block_impl
    from mudpt_tpu.models.transformer import _resolve_unroll

    # packed rows require the fully-unrolled static path (transformer.py
    # raises on the rolled scan) — auto must not engage under a rolled-scan
    # A/B (MUDPT_TPU_SCAN_UNROLL below the tower depth); an explicit G
    # still forces (and gets the loud error).
    if (
        resolve_block_impl() == "pallas"
        and _resolve_unroll() >= num_layers
    ):
        return _auto_pack_g(padded_seq, n_rows)
    return 1


# EOT-truncated text rows: the text transformer is CAUSAL and the only
# position ever read out is the EOT gather (reference clip/model.py:836), so
# computing positions beyond max(eot)+1 is provably dead work — position i
# only attends to positions <= i, LayerNorm is per-position, and nothing
# after the EOT row feeds the output.  Class prompts ("a photo of a <cls>.")
# occupy ~8-20 of the 77 context positions, so truncating the class-suffix
# bank at build time (ClassPromptAux.effective_length) cuts the per-step
# text-tower FLOPs several-fold with BIT-IDENTICAL results for the retained
# positions — the reference computes all 77 positions and throws 60+ away.
# "auto" (default) = on; "0" = off (full 77 rows, the reference's shapes).
_TEXT_TRUNC = os.environ.get("MUDPT_TPU_TEXT_TRUNC", "auto")
# floor the truncated length: very short rows (S=8) sit in untested Mosaic
# layout territory and save nothing measurable beyond S=16
_TRUNC_MIN = 16


def text_truncate_enabled() -> bool:
    return _TEXT_TRUNC != "0"


def set_text_truncate(on: bool) -> None:
    global _TEXT_TRUNC
    _TEXT_TRUNC = "auto" if on else "0"


def effective_text_length(max_eot: int, full_length: int) -> int:
    """Static truncated sequence length: max(eot)+1 rounded up to the
    8-sublane grid, floored at _TRUNC_MIN, never above the full length."""
    if not text_truncate_enabled():
        return full_length
    L = max(_TRUNC_MIN, -(-(int(max_eot) + 1) // 8) * 8)
    return min(full_length, L)


# Text-tower backward strategy: at large n_cls the save-acts qkv/h writes
# for n_cls*77-token rows cost ~9 GB HBM (n_cls=1000) — memory that is
# better spent on a LARGER IMAGE BATCH, because the per-step text cost is
# fixed in n_cls while vision throughput improves with batch.  "auto" (default)
# switches the text tower to recompute-backward when the TOTAL row-token
# count is large (the save footprint is n_rows x padded_seq x 8D bf16, so
# EOT-truncated rows raise the n_cls where recompute starts paying: at
# S=24, saves beat recompute at n_cls=1000/B=384 — 1544.2 vs 1513.9 img/s,
# docs/BENCHMARKS.md); 0/1 force.  The vision tower is unaffected.  The
# threshold is the round-3 measured crossover in row-token units
# (512 rows x 80 padded tokens).
_TEXT_RECOMPUTE = os.environ.get("MUDPT_TPU_TEXT_RECOMPUTE", "auto")
_AUTO_RECOMPUTE_MIN_ROW_TOKENS = 512 * 80


def set_text_recompute(mode) -> None:
    """'auto' (row-token crossover above) | '1' (always recompute) | '0'
    (always save).  Config: PERF.TEXT_RECOMPUTE; env overrides."""
    v = str(mode)
    assert v in ("auto", "0", "1"), mode
    global _TEXT_RECOMPUTE
    _TEXT_RECOMPUTE = v


def _text_saves_off(n_rows: int, padded_seq: int = 80) -> bool:
    if _TEXT_RECOMPUTE == "auto":
        return n_rows * padded_seq >= _AUTO_RECOMPUTE_MIN_ROW_TOKENS
    return _TEXT_RECOMPUTE == "1"


def packed_causal_mask(total: int, period: int, valid: int) -> jax.Array:
    """Block-causal mask for packed rows (XLA fallback path) — the ONE
    packed-mask formula lives in ops/fused_block._causal_mask (the Pallas
    kernels rebuild it in-kernel from the same (period, valid) spec), so
    the two paths cannot drift."""
    from mudpt_tpu.ops.fused_block import _causal_mask

    return _causal_mask(total, (period, valid))


def embed_tokens(p, tokens: jax.Array, compute_dtype) -> jax.Array:
    """Token embedding lookup: (N, S) int32 -> (N, S, width)."""
    return p["token_embedding"][tokens].astype(compute_dtype)


def text_forward(
    p,
    prompt_embeddings: jax.Array,
    eot_idx: jax.Array,
    *,
    n_head: int,
    deep_prompts: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    mesh_ctx=None,
):
    """Encode pre-embedded prompts: (N, S, width) -> (N, embed_dim).

    ``prompt_embeddings`` are token embeddings with any learnable context
    already placed (the prompt-learner's job); ``eot_idx`` (N,) are the EOT
    positions of the corresponding token rows.

    A 4-D input (B, N, S, width) means B independent instance-conditioned
    copies of the N class rows (CoCoOp: each image biases the shared ctx,
    reference cocoop.py:148-163) -> (B, N, embed_dim).  The rows are sharded
    over BOTH mesh axes — instances on ``data``, classes on ``model`` — and
    each shard flattens its local block through the same tower body, so the
    fused Pallas kernels, row packing, and the save/recompute policy apply
    at the true B*N row count.
    """
    # slice the positional table to the row length: EOT-truncated class
    # prompts (see _TEXT_TRUNC above) arrive with S < context_length
    seq_len = prompt_embeddings.shape[-2]
    x = prompt_embeddings + p["pos_embedding"][:seq_len].astype(
        prompt_embeddings.dtype
    )[None]
    is_causal = mask is None  # the default mask is the standard causal one

    n_ctx = deep_prompts.shape[-2] if deep_prompts is not None else 0
    if 1 + n_ctx > seq_len:
        # a splice window wider than the (possibly EOT-truncated) row would
        # silently clamp its update-slice start — refuse loudly instead
        raise ValueError(
            f"deep-prompt splice window 1+{n_ctx} exceeds the text row "
            f"length {seq_len}; set MUDPT_TPU_TEXT_TRUNC=0 or shrink N_CTX"
        )
    num_layers = jax.tree_util.tree_leaves(p["blocks"])[0].shape[0]
    prompts, pmask = make_injection_schedule(num_layers, deep_prompts)

    import contextlib

    from mudpt_tpu.ops.fused_block import saved_acts

    padded_seq = -(-seq_len // 8) * 8
    # total independent rows: instance-batched 4-D inputs count B*N — the
    # save/recompute and packing policies must see the true row count
    n_rows = x.shape[0] * x.shape[1] if x.ndim == 4 else x.shape[0]
    ctx_saves = (
        saved_acts(False)
        if x.ndim in (3, 4) and _text_saves_off(n_rows, padded_seq)
        else contextlib.nullcontext()
    )

    G = (
        _resolve_pack(n_rows, num_layers, padded_seq)
        if (is_causal and x.ndim in (3, 4))
        else 1
    )

    # the tower body below may run per-shard under shard_map (class rows
    # sharded on the mesh's 'model' axis — parallel/mesh.shard_rows), so
    # everything row-local lives inside it: packing pads/reshapes the
    # LOCAL rows (a global pack would break shard divisibility: 1000
    # classes / G=8 = 125 packed rows, indivisible by an even model axis),
    # and masks rebuild from static shapes.
    def tower(xx, blocks, prompts_op, mask_op):
        if G > 1:
            # pack G class rows per kernel row: (N, S, D) -> (N/G, G*P, D),
            # P = S rounded to the sublane grid, sequences at offsets g*P
            N, S, D = xx.shape
            P = -(-S // 8) * 8
            Npad = -(-N // G) * G
            xx = jnp.pad(xx, ((0, Npad - N), (0, P - S), (0, 0)))
            xx = xx.reshape(Npad // G, G * P, D)
            xx = transformer_forward(
                blocks, xx, n_head=n_head,
                mask=packed_causal_mask(G * P, P, S),  # XLA fallback path
                prompts=prompts_op, prompt_mask=pmask, n_ctx=n_ctx,
                is_text=True, causal=(P, S), splice_period=P,
            )
            return xx.reshape(Npad, P, D)[:N, :S]
        m = causal_mask(xx.shape[1]) if is_causal else mask_op
        return transformer_forward(
            blocks,
            xx,
            n_head=n_head,
            mask=m,
            prompts=prompts_op,
            prompt_mask=pmask,
            n_ctx=n_ctx,
            is_text=True,
            causal=is_causal,
        )

    with ctx_saves:
        if x.ndim == 4:
            # instance-conditioned class rows: shard instances on 'data'
            # AND classes on 'model'; each shard flattens its local
            # (B/n_data, N/n_model) block through the same tower body
            from mudpt_tpu.parallel.mesh import shard_rows_2d

            def tower4(xx, blocks, prompts_op, mask_op):
                b, n, s, d = xx.shape
                out = tower(xx.reshape(b * n, s, d), blocks, prompts_op, mask_op)
                return out.reshape(b, n, s, d)

            x = shard_rows_2d(
                mesh_ctx, ("data", "model"), tower4, x, p["blocks"], prompts, mask
            )
        elif x.ndim == 3:
            from mudpt_tpu.parallel.mesh import shard_rows

            x = shard_rows(mesh_ctx, "model", tower, x, p["blocks"], prompts, mask)
        else:
            x = tower(x, p["blocks"], prompts, mask)
    x = layer_norm(p["ln_final"], x)
    if x.ndim == 4:
        pooled = jnp.take_along_axis(
            x, eot_idx[None, :, None, None], axis=2
        )[:, :, 0]
    else:
        pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return jnp.dot(pooled, p["projection"].astype(pooled.dtype))
