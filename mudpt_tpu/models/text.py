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

from typing import Optional

import jax
import jax.numpy as jnp

from mudpt_tpu.models.layers import layer_norm
from mudpt_tpu.models.transformer import make_injection_schedule, transformer_forward


def causal_mask(context_length: int) -> jax.Array:
    """Additive causal mask (reference clip/model.py:810-816)."""
    mask = jnp.full((context_length, context_length), -jnp.inf, jnp.float32)
    return jnp.triu(mask, k=1)


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
):
    """Encode pre-embedded prompts: (N, S, width) -> (N, embed_dim).

    ``prompt_embeddings`` are token embeddings with any learnable context
    already placed (the prompt-learner's job); ``eot_idx`` (N,) are the EOT
    positions of the corresponding token rows.
    """
    x = prompt_embeddings + p["pos_embedding"].astype(prompt_embeddings.dtype)[None]
    causal = mask is None  # the default mask is the standard causal one
    if causal:
        mask = causal_mask(x.shape[1])

    n_ctx = deep_prompts.shape[-2] if deep_prompts is not None else 0
    num_layers = jax.tree_util.tree_leaves(p["blocks"])[0].shape[0]
    prompts, pmask = make_injection_schedule(num_layers, deep_prompts)
    x = transformer_forward(
        p["blocks"],
        x,
        n_head=n_head,
        mask=mask,
        prompts=prompts,
        prompt_mask=pmask,
        n_ctx=n_ctx,
        is_text=True,
        causal=causal,
    )
    x = layer_norm(p["ln_final"], x)
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return jnp.dot(pooled, p["projection"].astype(pooled.dtype))
