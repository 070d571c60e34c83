"""Vision transformer tower with generic prompt hooks.

Replaces the reference's four ViT classes (``VisionTransformer`` and its
``_MuDPT`` / ``_UMuDPT`` / ``_UUMuDPT`` variants, reference
clip/model.py:443-664) with ONE pure function: prompt tokens (if any) are
supplied by the caller as explicit arrays —

  * ``layer0_prompt`` (n_ctx, width): appended after the 197 patch+CLS
    tokens before ``ln_pre`` (matches clip/model.py:481-483 and :534-536);
  * ``deep_prompts`` ((depth-1), n_ctx, width): spliced into layers 1..d-1
    over the LAST n_ctx positions (clip/model.py:291-297).

Any per-method coupling math (t2v projections, visual_ctx addition, v2t
emission) happens in the trainer's prompt learner — the tower stays frozen
and generic, inverting the reference's model-depends-on-trainer quirk
(SURVEY.md §1).

Patchify is a reshape + single MXU matmul rather than a conv: the stride
equals the kernel so the convolution is exactly a blocked matmul, and this
form lets XLA tile it directly onto the systolic array.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mudpt_tpu.models.layers import layer_norm
from mudpt_tpu.models.transformer import make_injection_schedule, transformer_forward


def patchify(p, images: jax.Array, patch_size: int, compute_dtype) -> jax.Array:
    """(B, H, W, 3) images -> (B, n_patches, width) tokens.

    ``p['patch_w']`` has shape (patch*patch*3, width) (converted from the
    reference's conv1 weight, clip/model.py:449).  No bias (conv1 bias=False).
    """
    B, H, W, C = images.shape
    gh, gw = H // patch_size, W // patch_size
    x = images.reshape(B, gh, patch_size, gw, patch_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, patch_size * patch_size * C)
    x = x.astype(compute_dtype)
    return jnp.dot(x, p["patch_w"].astype(compute_dtype))


def vit_forward(
    p,
    images: jax.Array,
    *,
    patch_size: int,
    n_head: int,
    compute_dtype=jnp.float32,
    layer0_prompt: Optional[jax.Array] = None,
    deep_prompts: Optional[jax.Array] = None,
    return_tokens: bool = False,
    mesh_ctx=None,
):
    """Full vision tower: images (B, H, W, 3) -> features (B, embed_dim).

    Step order matches reference clip/model.py:475-496 / :526-553:
    patchify -> prepend CLS -> +pos -> [append layer-0 prompt] -> ln_pre ->
    transformer (with deep-prompt splicing) -> ln_post on CLS -> proj.
    """
    x = patchify(p, images, patch_size, compute_dtype)
    B = x.shape[0]
    width = x.shape[-1]

    cls = jnp.broadcast_to(
        p["class_embedding"].astype(compute_dtype)[None, None], (B, 1, width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embedding"].astype(compute_dtype)[None]

    if layer0_prompt is not None:
        n0 = layer0_prompt.shape[-2]
        prompt0 = jnp.broadcast_to(
            layer0_prompt.astype(compute_dtype).reshape(-1, n0, width)[:1],
            (B, n0, width),
        )
        x = jnp.concatenate([x, prompt0], axis=1)

    x = layer_norm(p["ln_pre"], x)

    num_layers = jax.tree_util.tree_leaves(p["blocks"])[0].shape[0]
    n_ctx = deep_prompts.shape[-2] if deep_prompts is not None else 0
    prompts, mask = make_injection_schedule(num_layers, deep_prompts)

    # may run per-shard over the mesh's 'data' (batch) axis — pallas custom
    # calls are not SPMD-partitionable, so without shard_map a multi-chip
    # mesh ALL-GATHERS the full batch onto every device
    # (parallel/mesh.shard_rows)
    def tower(xx, blocks, prompts_op):
        return transformer_forward(
            blocks,
            xx,
            n_head=n_head,
            prompts=prompts_op,
            prompt_mask=mask,
            n_ctx=n_ctx,
            is_text=False,
        )

    from mudpt_tpu.parallel.mesh import shard_rows

    x = shard_rows(mesh_ctx, "data", tower, x, p["blocks"], prompts)

    pooled = layer_norm(p["ln_post"], x[:, 0])
    feats = jnp.dot(pooled, p["proj"].astype(pooled.dtype))
    if return_tokens:
        return feats, x
    return feats
