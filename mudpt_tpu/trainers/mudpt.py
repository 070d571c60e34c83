"""MuDPT: multi-modal deep prompt tuning with bidirectional cross-modal
projections — the paper's method (reference trainers/mudpt.py + the
``VisionTransformer_MuDPT`` coupling, clip/model.py:499-553).

Coupling math reproduced exactly (SURVEY.md §2.3):

  layer-0 visual prompt        = visual_ctx + embed_projection(ctx)
  visual deep prompts (1..d-1) = deep_projections(deep_prompts)
                                 + visual_ctx_deep_prompts
  text deep prompts (1..d-1)   = deep_prompts
                                 + visual_ctx_deep_projections(visual_ctx_deep_prompts)
  text layer-0 prompt          = [SOS, ctx, CLS-tokens...]

Trainable pytree = everything above (prompt vectors + the three linear
projections); this matches the reference's requires_grad rule
("prompt_learner" names OR "visual_ctx" names, mudpt.py:205-212).  The
towers themselves stay frozen and generic.
"""

from __future__ import annotations

import jax.numpy as jnp

from mudpt_tpu.models.clip import cosine_logits, encode_image
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

import jax


def mudpt_text_features(trainable, frozen, aux, *, clip_cfg, compute_dtype, mesh_ctx=None):
    # v2t direction of the cross-modal synthesis (reference mudpt.py:175)
    ctx = trainable["ctx"]                                # (n_ctx, 512)
    deep = trainable["deep_prompts"]                      # (d-1, n_ctx, 512)
    v_deep = trainable["visual_ctx_deep_prompts"]         # (d-1, n_ctx, 768)
    v2t = linear(trainable["visual_ctx_deep_projections"], v_deep)   # :539
    text_deep = deep + v2t                                           # mudpt.py:175
    prompts = compose_prompts(ctx, aux["token_prefix"], aux["token_suffix"])
    return text_forward(
        frozen["text"],
        prompts.astype(compute_dtype),
        aux["eot_idx"],
        n_head=clip_cfg.transformer_heads,
        mesh_ctx=mesh_ctx,
        deep_prompts=text_deep,
    )


def mudpt_image_logits(
    trainable, frozen, aux, images, txt, *, clip_cfg, compute_dtype, mesh_ctx=None
):
    # t2v direction (reference mudpt.py:117-130, model.py:534-537)
    ctx = trainable["ctx"]
    deep = trainable["deep_prompts"]
    v_ctx = trainable["visual_ctx"]                       # (n_ctx, 768)
    v_deep = trainable["visual_ctx_deep_prompts"]
    shared_ctx = linear(trainable["embed_projection"], ctx)          # t2v 512->768
    layer0_visual = v_ctx + shared_ctx                               # model.py:534
    visual_deep = linear(trainable["deep_projections"], deep) + v_deep  # :537
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


def mudpt_forward(trainable, frozen, aux, images, *, clip_cfg, compute_dtype, mesh_ctx=None):
    kw = dict(clip_cfg=clip_cfg, compute_dtype=compute_dtype, mesh_ctx=mesh_ctx)
    txt = mudpt_text_features(trainable, frozen, aux, **kw)
    return mudpt_image_logits(trainable, frozen, aux, images, txt, **kw)


@TRAINER_REGISTRY.register()
class MuDPT(TrainerBase):
    model_name = "MultimodalDeepPromptTuning"  # reference mudpt.py:227
    hparams_key = "MUDPT"
    requires_vit = True
    forward_fn = staticmethod(mudpt_forward)
    text_fn = staticmethod(mudpt_text_features)
    image_fn = staticmethod(mudpt_image_logits)

    def build_model(self):
        cfg = self.cfg
        hp = getattr(cfg.TRAINER, self.hparams_key)
        clip_cfg, params = self.load_clip()
        self.clip_cfg = clip_cfg
        dim = clip_cfg.transformer_width
        vdim = clip_cfg.vision_width
        n_ctx = hp.N_CTX
        depth = hp.DEEP_PROMPT_DEPTH
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

        trainable = {
            "ctx": ctx,
            "deep_prompts": random_ctx(ks[1], (depth - 1, n_ctx, dim)),
            "embed_projection": init_linear(ks[2], dim, vdim),
            "deep_projections": init_linear(ks[3], dim, vdim),
            "visual_ctx": random_ctx(ks[4], (n_ctx, vdim)),
            "visual_ctx_deep_prompts": random_ctx(ks[5], (depth - 1, n_ctx, vdim)),
            "visual_ctx_deep_projections": init_linear(ks[6], vdim, dim),
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
        self._set_forward(
            self.forward_fn, self.text_fn, self.image_fn,
            clip_cfg=clip_cfg, compute_dtype=self.compute_dtype,
        )
