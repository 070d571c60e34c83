"""VPT / MPT: independent deep visual (and text) prompts.

Reference trainers/vpt.py + trainers/mpt.py share the same structure: fixed
hand-written text prompt ("a photo of a <cls>.", frozen embeddings —
vpt.py:43-70), learnable per-block prompt tokens spliced into the towers
(``ResidualAttentionBlock_VPT``, clip/model.py:202-251; ViT-owned layer-0
prompt, clip/model.py:456-465,481-483).  VPT configs enable only the visual
side; MPT enables both (the trainers differ purely by configuration — the
reference's freeze rules "visual_ctx"/"ctx" select exactly the prompt
parameters that exist, SURVEY.md §2.3).

Trainable pytree (whatever the config enables):
  visual_ctx           (img_n_ctx, 768)          — layer-0 append
  visual_deep_prompts  (vis_depth-1, img_n_ctx, 768)  — blocks 1..depth-1
  text_deep_prompts    (txt_depth-1, txt_n_ctx, 512)  — blocks 1..depth-1
"""

from __future__ import annotations

import jax.numpy as jnp

from mudpt_tpu.models.clip import cosine_logits, encode_image
from mudpt_tpu.models.text import text_forward
from mudpt_tpu.trainers.base import TrainerBase
from mudpt_tpu.trainers.prompt_utils import embed_classnames, random_ctx
from mudpt_tpu.utils.registry import TRAINER_REGISTRY
from mudpt_tpu.utils.rng import new_rng

import jax


def vpt_text_features(trainable, frozen, aux, *, clip_cfg, compute_dtype, mesh_ctx=None):
    # fixed full prompt embeddings (n_cls, 77, D): prefix+suffix are the
    # entire hand prompt — no learnable layer-0 text ctx (vpt.py:43-70)
    prompts = jnp.concatenate([aux["token_prefix"], aux["token_suffix"]], axis=1)
    return text_forward(
        frozen["text"],
        prompts.astype(compute_dtype),
        aux["eot_idx"],
        n_head=clip_cfg.transformer_heads,
        mesh_ctx=mesh_ctx,
        deep_prompts=trainable.get("text_deep_prompts"),
    )


def vpt_image_logits(
    trainable, frozen, aux, images, txt, *, clip_cfg, compute_dtype, mesh_ctx=None
):
    img = encode_image(
        frozen,
        images,
        clip_cfg,
        compute_dtype=compute_dtype,
        mesh_ctx=mesh_ctx,
        layer0_prompt=trainable.get("visual_ctx"),
        deep_prompts=trainable.get("visual_deep_prompts"),
    )
    return cosine_logits(
        img.astype(jnp.float32), txt.astype(jnp.float32), frozen["logit_scale"]
    )


def vpt_forward(trainable, frozen, aux, images, *, clip_cfg, compute_dtype, mesh_ctx=None):
    kw = dict(clip_cfg=clip_cfg, compute_dtype=compute_dtype, mesh_ctx=mesh_ctx)
    txt = vpt_text_features(trainable, frozen, aux, **kw)
    return vpt_image_logits(trainable, frozen, aux, images, txt, **kw)


@TRAINER_REGISTRY.register()
class VPT(TrainerBase):
    model_name = "VisualPromptLearner"  # reference vpt.py:159
    hparams_key = "VPT"
    requires_vit = True

    def build_model(self):
        cfg = self.cfg
        hp = getattr(cfg.TRAINER, self.hparams_key)
        clip_cfg, params = self.load_clip()
        self.clip_cfg = clip_cfg
        tdim, vdim = clip_cfg.transformer_width, clip_cfg.vision_width
        key = new_rng(cfg.SEED)
        ks = jax.random.split(key, 3)

        trainable = {}
        vis_depth, vis_n = hp.VISUAL_PROMPT_DEPTH, hp.DEEP_VISUAL_N_CTX
        if 0 < vis_depth <= clip_cfg.vision_layers and vis_n > 0:
            trainable["visual_ctx"] = random_ctx(ks[0], (vis_n, vdim))
            if vis_depth > 1:
                trainable["visual_deep_prompts"] = random_ctx(
                    ks[1], (vis_depth - 1, vis_n, vdim)
                )
        txt_depth, txt_n = hp.TEXT_PROMPT_DEPTH, hp.DEEP_TEXT_N_CTX
        if txt_depth > 1 and txt_n > 0:
            trainable["text_deep_prompts"] = random_ctx(
                ks[2], (txt_depth - 1, txt_n, tdim)
            )
        if not trainable:
            raise ValueError(
                f"{cfg.TRAINER.NAME}: no prompts enabled — set "
                "VISUAL_PROMPT_DEPTH/DEEP_VISUAL_N_CTX (and/or TEXT_* for MPT)"
            )
        print(f"Trainable prompts: {sorted(trainable)}")
        # no text-side trainables (every VPT config; MPT with
        # TEXT_PROMPT_DEPTH<=1) -> text features are a pure function of
        # the frozen tower: encode once at build, train on cached rows
        # (base._cache_static_text).  The reference re-encodes the frozen
        # text tower every step (vpt.py:96-101).
        self.static_text = "text_deep_prompts" not in trainable

        # embed the full fixed prompt; n_ctx=0 so prefix+suffix is everything
        aux_cls = embed_classnames(
            params["text"], self.classnames, 0, hp.TEXT_CTX_INIT.replace("_", " ")
        )
        self.place(
            frozen=params,
            aux_class_tree=aux_cls.as_device_tree(),
            aux_repl=None,
            trainable=trainable,
        )
        self._set_forward(
            vpt_forward, vpt_text_features, vpt_image_logits,
            clip_cfg=clip_cfg, compute_dtype=self.compute_dtype,
        )


@TRAINER_REGISTRY.register()
class MPT(VPT):
    """Multi-modal (text + visual) independent prompts (reference
    trainers/mpt.py:177-293) — VPT with the text side enabled by config."""

    model_name = "MultiModalPromptLearner"  # reference mpt.py:217
    hparams_key = "MPT"
