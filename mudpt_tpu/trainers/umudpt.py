"""UMuDPT: unified multi-modal deep prompt tuning.

Reference trainers/umudpt.py: ONE text-side prompt set; the visual prompts
are synthesized from it by a LightTransformer pipeline + 512->768 projection
(umudpt.py:121-124,161-178): LN -> self-attention over the n_ctx tokens of
each depth row -> LN -> Linear.  Row 0 becomes the layer-0 visual prompt,
rows 1..d-1 the visual deep prompts (umudpt.py:217-230).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mudpt_tpu.models.clip import cosine_logits, encode_image
from mudpt_tpu.models.text import text_forward
from mudpt_tpu.trainers.base import TrainerBase
from mudpt_tpu.trainers.prompt_utils import (
    compose_prompts,
    ctx_vectors_from_init,
    embed_classnames,
    init_prompt_transform_head,
    prompt_transform_head,
    random_ctx,
)
from mudpt_tpu.utils.registry import TRAINER_REGISTRY
from mudpt_tpu.utils.rng import new_rng


def umudpt_text_features(trainable, frozen, aux, *, clip_cfg, compute_dtype, mesh_ctx=None):
    ctx = trainable["ctx"]                      # (n_ctx, 512)
    deep = trainable["deep_prompts"]            # (d-1, n_ctx, 512)
    prompts = compose_prompts(ctx, aux["token_prefix"], aux["token_suffix"])
    return text_forward(
        frozen["text"],
        prompts.astype(compute_dtype),
        aux["eot_idx"],
        n_head=clip_cfg.transformer_heads,
        mesh_ctx=mesh_ctx,
        deep_prompts=deep,
    )


def umudpt_image_logits(
    trainable, frozen, aux, images, txt, *, clip_cfg, compute_dtype, mesh_ctx=None
):
    ctx = trainable["ctx"]
    deep = trainable["deep_prompts"]

    # t2v synthesis: rows = depth, tokens = n_ctx (umudpt.py:161-178)
    all_rows = jnp.concatenate([ctx[None], deep], axis=0)      # (d, n_ctx, 512)
    n_head = ctx.shape[-1] // 64 or 1
    visual_prompts = prompt_transform_head(trainable["t2v"], all_rows, n_head)

    img = encode_image(
        frozen,
        images,
        clip_cfg,
        compute_dtype=compute_dtype,
        mesh_ctx=mesh_ctx,
        layer0_prompt=visual_prompts[0],
        deep_prompts=visual_prompts[1:],
    )
    return cosine_logits(
        img.astype(jnp.float32), txt.astype(jnp.float32), frozen["logit_scale"]
    )


def umudpt_forward(trainable, frozen, aux, images, *, clip_cfg, compute_dtype, mesh_ctx=None):
    kw = dict(clip_cfg=clip_cfg, compute_dtype=compute_dtype, mesh_ctx=mesh_ctx)
    txt = umudpt_text_features(trainable, frozen, aux, **kw)
    return umudpt_image_logits(trainable, frozen, aux, images, txt, **kw)


@TRAINER_REGISTRY.register()
class UMuDPT(TrainerBase):
    model_name = "UnifiedMultimodalDeepPromptTuning"  # reference umudpt.py:270
    hparams_key = "UMUDPT"
    requires_vit = True
    forward_fn = staticmethod(umudpt_forward)
    text_fn = staticmethod(umudpt_text_features)
    image_fn = staticmethod(umudpt_image_logits)

    def build_model(self):
        cfg = self.cfg
        hp = getattr(cfg.TRAINER, self.hparams_key)
        clip_cfg, params = self.load_clip()
        self.clip_cfg = clip_cfg
        dim, vdim = clip_cfg.transformer_width, clip_cfg.vision_width
        n_ctx, depth = hp.N_CTX, hp.DEEP_PROMPT_DEPTH
        assert depth > 0, "DEEP_PROMPT_DEPTH should be > 0"
        key = new_rng(cfg.SEED)
        ks = jax.random.split(key, 8)

        if hp.CTX_INIT:
            ctx = ctx_vectors_from_init(params["text"], hp.CTX_INIT, n_ctx)
            prompt_prefix = " ".join(hp.CTX_INIT.replace("_", " ").split()[:n_ctx])
        else:
            ctx = random_ctx(ks[0], (n_ctx, dim))
            prompt_prefix = " ".join(["X"] * n_ctx)
        print(
            f'Initial context: "{prompt_prefix}" '
            f"(n_ctx={n_ctx}, deep prompt depth={depth})"
        )

        trainable = self.build_prompt_params(ks, dim, vdim, n_ctx, depth)
        aux_cls = embed_classnames(
            params["text"], self.classnames, n_ctx, prompt_prefix
        )
        self.place(
            frozen=params,
            aux_class_tree=aux_cls.as_device_tree(),
            aux_repl=None,
            trainable={**trainable, "ctx": ctx},
        )
        self._set_forward(
            self.forward_fn, self.text_fn, self.image_fn,
            clip_cfg=clip_cfg, compute_dtype=self.compute_dtype,
        )

    def build_prompt_params(self, ks, dim, vdim, n_ctx, depth):
        return {
            "deep_prompts": random_ctx(ks[1], (depth - 1, n_ctx, dim)),
            "t2v": init_prompt_transform_head(ks[2], dim, vdim),
        }
