"""UUMuDPT: bidirectional unified multi-modal deep prompt tuning.

Reference trainers/uumudpt.py + ``VisionTransformer_UUMuDPT``
(clip/model.py:600-664): UMuDPT's t2v LightTransformer pipeline, PLUS
ViT-side visual prompt residuals and a v2t LightTransformer head mapping the
visual deep prompts back to text space:

  layer-0 visual  = t2v(ctx row) + visual_ctx                (model.py:638-640)
  visual deep     = t2v(deep rows) + visual_ctx_deep_prompts (model.py:643)
  textual prompts = v2t(visual_ctx_deep_prompts)             (model.py:645-652)
  text deep       = deep_prompts + textual prompts           (uumudpt.py:224)
"""

from __future__ import annotations

import jax.numpy as jnp

from mudpt_tpu.models.clip import cosine_logits, encode_image
from mudpt_tpu.models.text import text_forward
from mudpt_tpu.trainers.prompt_utils import (
    compose_prompts,
    init_prompt_transform_head,
    prompt_transform_head,
    random_ctx,
)
from mudpt_tpu.trainers.umudpt import UMuDPT
from mudpt_tpu.utils.registry import TRAINER_REGISTRY


def uumudpt_text_features(trainable, frozen, aux, *, clip_cfg, compute_dtype, mesh_ctx=None):
    ctx = trainable["ctx"]
    deep = trainable["deep_prompts"]
    v_deep = trainable["visual_ctx_deep_prompts"]      # (d-1, n_ctx, 768)

    v2t = prompt_transform_head(
        trainable["v2t"], v_deep, v_deep.shape[-1] // 64 or 1
    )  # (d-1, n_ctx, 512)
    text_deep = deep + v2t

    prompts = compose_prompts(ctx, aux["token_prefix"], aux["token_suffix"])
    return text_forward(
        frozen["text"],
        prompts.astype(compute_dtype),
        aux["eot_idx"],
        n_head=clip_cfg.transformer_heads,
        mesh_ctx=mesh_ctx,
        deep_prompts=text_deep,
    )


def uumudpt_image_logits(
    trainable, frozen, aux, images, txt, *, clip_cfg, compute_dtype, mesh_ctx=None
):
    ctx = trainable["ctx"]
    deep = trainable["deep_prompts"]
    v_ctx = trainable["visual_ctx"]                    # (n_ctx, 768)
    v_deep = trainable["visual_ctx_deep_prompts"]

    all_rows = jnp.concatenate([ctx[None], deep], axis=0)
    t2v = prompt_transform_head(
        trainable["t2v"], all_rows, ctx.shape[-1] // 64 or 1
    )  # (d, n_ctx, 768)
    layer0_visual = t2v[0] + v_ctx
    visual_deep = t2v[1:] + v_deep

    img = encode_image(
        frozen,
        images,
        clip_cfg,
        compute_dtype=compute_dtype,
        mesh_ctx=mesh_ctx,
        layer0_prompt=layer0_visual,
        deep_prompts=visual_deep,
    )
    return cosine_logits(
        img.astype(jnp.float32), txt.astype(jnp.float32), frozen["logit_scale"]
    )


def uumudpt_forward(trainable, frozen, aux, images, *, clip_cfg, compute_dtype, mesh_ctx=None):
    kw = dict(clip_cfg=clip_cfg, compute_dtype=compute_dtype, mesh_ctx=mesh_ctx)
    txt = uumudpt_text_features(trainable, frozen, aux, **kw)
    return uumudpt_image_logits(trainable, frozen, aux, images, txt, **kw)


@TRAINER_REGISTRY.register()
class UUMuDPT(UMuDPT):
    model_name = "UnifiedMultimodalDeepPromptTuning"  # reference uumudpt.py:276
    hparams_key = "UUMUDPT"
    forward_fn = staticmethod(uumudpt_forward)
    text_fn = staticmethod(uumudpt_text_features)
    image_fn = staticmethod(uumudpt_image_logits)

    def build_prompt_params(self, ks, dim, vdim, n_ctx, depth):
        return {
            "deep_prompts": random_ctx(ks[1], (depth - 1, n_ctx, dim)),
            "t2v": init_prompt_transform_head(ks[2], dim, vdim),
            "visual_ctx": random_ctx(ks[3], (n_ctx, vdim)),
            "visual_ctx_deep_prompts": random_ctx(ks[4], (depth - 1, n_ctx, vdim)),
            "v2t": init_prompt_transform_head(ks[5], vdim, dim),
        }
