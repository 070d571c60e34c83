"""Prompt-injectable transformer as a single ``lax.scan`` over stacked
per-layer weights.

This replaces the reference's four byte-identical Python block classes that
thread a ``[x, prompts, nth_layer]`` list through ``nn.Sequential``
(reference clip/model.py:202-401) with one generic mechanism:

  * block weights are stacked on a leading layer axis, so the whole tower
    compiles to one fused scan body instead of 12 unrolled blocks;
  * prompt injection is data-driven: a padded ``(L, n_ctx, D)`` prompt array
    plus an ``(L,)`` boolean mask say which layers splice which rows.

Splicing semantics pinned by the reference:
  * text layers replace positions ``1 .. 1+n_ctx`` — keep the SOS prefix and
    the class-name suffix (clip/model.py:283-289);
  * visual layers replace the LAST ``n_ctx`` positions (clip/model.py:291-297);
  * layer 0 never splices (the layer-0 prompt is placed by the tower before
    the transformer); prompted layers are 1..depth-1, and deeper layers keep
    the last spliced tokens in the sequence (they are replaced, not removed).

Sequence length is constant across all layers, which is what makes the scan
legal — and is also why this maps well onto the TPU: one compiled body,
static shapes, no retracing.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mudpt_tpu.models.layers import residual_block

# Rematerialization strategy for the scan body (measured on TPU v5e-lite,
# MuDPT train step, n_cls=100):
#   none      — save everything; fastest when it fits
#               (626 img/s @ B=80; OOM from ~B=112)
#   full      — save only the scan carry, recompute whole blocks in backward;
#               enables B>=512 at a flat ~565 img/s
#   selective — save all but the named fp32 attention score/prob tensors;
#               measured strictly worse than both (activation HBM writes
#               cost more than recompute) — kept for experimentation
_REMAT_MODE = os.environ.get("MUDPT_TPU_REMAT", "none")

# scan unroll factor.  "auto" = full unroll for BOTH block impls: it removes
# the while-loop overhead and — decisively for the save-activations Pallas
# backward — the scan's residual-stacking dynamic-update-slice copies
# (round 2: rolled scan + saved qkv/h regressed to 1242 img/s because every
# saved activation was copied again into the stacked (L, ...) residual
# buffer; unrolled, the kernels' outputs ARE the residuals: 1680 img/s).
# Round 1's ">24 pallas custom calls crash the remote compile helper" no
# longer reproduces (a 96-call program compiles fine).
_SCAN_UNROLL = os.environ.get("MUDPT_TPU_SCAN_UNROLL", "auto")


def _resolve_unroll() -> int:
    if _SCAN_UNROLL == "auto":
        # large enough to fully unroll every CLIP tower (ViT-L vision: 24)
        return 64
    return int(_SCAN_UNROLL)


def _remat_policy():
    if _REMAT_MODE == "selective":
        return jax.checkpoint_policies.save_anything_except_these_names(
            "attn_scores", "attn_probs"
        )
    return None


def set_remat_mode(name: str) -> None:
    assert name in ("selective", "full", "none"), name
    global _REMAT_MODE
    _REMAT_MODE = name


def set_scan_unroll(value) -> None:
    """'auto' (full unroll — see the measurement note above) or an explicit
    unroll factor.  Config: PERF.SCAN_UNROLL; env MUDPT_TPU_SCAN_UNROLL
    overrides."""
    v = str(value)
    assert v == "auto" or v.lstrip("-").isdigit(), value
    global _SCAN_UNROLL
    _SCAN_UNROLL = v


def make_injection_schedule(
    num_layers: int,
    deep_prompts: Optional[jax.Array],
    *,
    first_layer: int = 1,
):
    """Build the padded per-layer prompt array + mask.

    ``deep_prompts``: (depth-1, n_ctx, D) rows for layers
    ``first_layer .. first_layer+depth-2`` (reference semantics: block i
    splices ``prompts[i-1]``, clip/model.py:283-297), or None.

    Returns (prompts_padded (L, n_ctx, D) | None, mask (L,) bool | None).
    """
    if deep_prompts is None or deep_prompts.shape[0] == 0:
        return None, None
    depth_m1, n_ctx, dim = deep_prompts.shape
    # Shift rows down by `first_layer`, then truncate/zero-pad to num_layers.
    # (dynamic_update_slice would clamp when depth-1 exceeds the remaining
    # layers — prompts deeper than the tower are simply never consumed.)
    zeros_head = jnp.zeros((first_layer, n_ctx, dim), deep_prompts.dtype)
    prompts = jnp.concatenate([zeros_head, deep_prompts], axis=0)[:num_layers]
    if prompts.shape[0] < num_layers:
        tail = jnp.zeros(
            (num_layers - prompts.shape[0], n_ctx, dim), deep_prompts.dtype
        )
        prompts = jnp.concatenate([prompts, tail], axis=0)
    # STATIC (numpy) mask: which layers splice is shape information, known
    # at trace time — the unrolled path turns it into plain Python branches
    # (no select_n on the full activation tensor; 10 ms/step at batch 384)
    layer_ids = np.arange(num_layers)
    mask = (layer_ids >= first_layer) & (layer_ids < first_layer + depth_m1)
    return prompts, mask


def splice_text(x: jax.Array, prompt: jax.Array, n_ctx: int) -> jax.Array:
    """Replace positions 1..1+n_ctx of (B, S, D) x with the prompt tokens."""
    B = x.shape[0]
    p = jnp.broadcast_to(prompt.astype(x.dtype)[None], (B, n_ctx, x.shape[-1]))
    return jnp.concatenate([x[:, :1], p, x[:, 1 + n_ctx :]], axis=1)


def splice_visual(x: jax.Array, prompt: jax.Array, n_ctx: int) -> jax.Array:
    """Replace the last n_ctx positions of (B, S, D) x with the prompt."""
    B, S, D = x.shape
    p = jnp.broadcast_to(prompt.astype(x.dtype)[None], (B, n_ctx, D))
    return jnp.concatenate([x[:, : S - n_ctx], p], axis=1)


def transformer_forward(
    stacked_params,
    x: jax.Array,
    *,
    n_head: int,
    mask: Optional[jax.Array] = None,
    prompts: Optional[jax.Array] = None,
    prompt_mask: Optional[jax.Array] = None,
    n_ctx: int = 0,
    is_text: bool = False,
    causal=False,
    remat: bool = True,
    splice_period: int = 0,
) -> jax.Array:
    """Run the full tower.  x: (B, S, D) -> (B, S, D).

    ``stacked_params``: block param pytree with leading layer axis.
    ``prompts``/``prompt_mask``: from :func:`make_injection_schedule`.

    ``remat``: selective rematerialization — everything in a block may be
    saved for backward EXCEPT the named (B,H,S,S) fp32 attention score/prob
    tensors (B*H*S^2*4 bytes per layer per tower — the reason a batch-128
    step doesn't fit 16 GB HBM un-rematted).  Backward recomputes just the
    score einsum + softmax (~2% of forward FLOPs) instead of whole blocks.
    """
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    unroll = _resolve_unroll()

    if unroll >= num_layers and (
        prompts is None or isinstance(prompt_mask, np.ndarray)
    ):
        # Fully-unrolled static path: the per-layer splice decision is a
        # Python branch (no full-tensor select_n), the splice writes only
        # the n_ctx prompt rows, and the Pallas kernels' saved activations
        # are the backward residuals directly (no scan-stacking copies).
        def one_layer(h, l):
            if prompts is not None and bool(prompt_mask[l]):
                p = prompts[l].astype(h.dtype)
                B = h.shape[0]
                rows = jnp.broadcast_to(p[None], (B, n_ctx, h.shape[-1]))
                if is_text:
                    if splice_period:
                        # packed rows (models/text.py pack_rows): each
                        # logical sequence starts at a multiple of the
                        # period and gets the same prompt rows at 1..1+n_ctx
                        for off in range(0, h.shape[1], splice_period):
                            h = jax.lax.dynamic_update_slice_in_dim(
                                h, rows, off + 1, axis=1
                            )
                    else:
                        h = jax.lax.dynamic_update_slice_in_dim(h, rows, 1, axis=1)
                else:
                    h = jax.lax.dynamic_update_slice_in_dim(
                        h, rows, h.shape[1] - n_ctx, axis=1
                    )
            lp = jax.tree_util.tree_map(lambda a: a[l], stacked_params)
            return residual_block(lp, h, n_head, mask, causal)

        if remat and _REMAT_MODE != "none":
            one_layer = jax.checkpoint(
                one_layer, policy=_remat_policy(), static_argnums=(1,)
            )
        for l in range(num_layers):
            x = one_layer(x, l)
        return x

    if splice_period:
        raise NotImplementedError(
            "packed text rows require the fully-unrolled static path "
            "(MUDPT_TPU_SCAN_UNROLL must cover the tower)"
        )
    if prompts is None:
        def body(h, layer_params):
            h = residual_block(layer_params, h, n_head, mask, causal)
            return h, None
    else:
        splice = splice_text if is_text else splice_visual
        prompt_mask = jnp.asarray(prompt_mask)

        def body(h, scanned):
            layer_params, prompt, use = scanned
            spliced = splice(h, prompt, n_ctx)
            h = jnp.where(use, spliced, h)
            h = residual_block(layer_params, h, n_head, mask, causal)
            return h, None

    if remat and _REMAT_MODE != "none":
        body = jax.checkpoint(body, policy=_remat_policy())
    xs = (
        stacked_params
        if prompts is None
        else (stacked_params, prompts, prompt_mask)
    )
    x, _ = jax.lax.scan(body, x, xs, unroll=min(unroll, num_layers))
    return x
