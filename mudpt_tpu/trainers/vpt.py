"""VPT / MPT: independent deep visual (and text) prompts.

Reference trainers/vpt.py + trainers/mpt.py share the per-block deep-prompt
structure (``ResidualAttentionBlock_VPT``, clip/model.py:202-251; ViT-owned
layer-0 prompt, clip/model.py:456-465,481-483).  They differ on the text
layer 0: VPT's text prompt is a FIXED hand prompt ("a photo of a <cls>.",
frozen embeddings — vpt.py:43-70), while MPT's ``TextPromptLearner`` owns a
LEARNABLE layer-0 text context (mpt.py:77 — a (n_ctx, 512) parameter,
deliberately named ``visual_ctx`` for the freeze rule) spliced CoOp-style
between SOS and the classname suffix (mpt.py:95-124).  The reference's
freeze rules "visual_ctx"/"ctx" then select exactly the prompt parameters
that exist (SURVEY.md §2.3).

Trainable pytree (whatever the config enables):
  ctx                  (txt_n_ctx, 512)          — MPT layer-0 text splice
  visual_ctx           (img_n_ctx, 768)          — layer-0 append
  visual_deep_prompts  (vis_depth-1, img_n_ctx, 768)  — blocks 1..depth-1
  text_deep_prompts    (txt_depth-1, txt_n_ctx, 512)  — blocks 1..depth-1
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
    random_ctx,
)
from mudpt_tpu.utils.registry import TRAINER_REGISTRY
from mudpt_tpu.utils.rng import new_rng

import jax


def vpt_text_features(trainable, frozen, aux, *, clip_cfg, compute_dtype, mesh_ctx=None):
    ctx = trainable.get("ctx")
    if ctx is not None:
        # MPT: learnable layer-0 text ctx between SOS and suffix
        # (mpt.py:109-124 construct_prompts)
        prompts = compose_prompts(ctx, aux["token_prefix"], aux["token_suffix"])
    else:
        # VPT: fixed full prompt embeddings (n_cls, 77, D) — prefix+suffix
        # are the entire hand prompt, no learnable layer-0 text ctx
        # (vpt.py:43-70)
        prompts = jnp.concatenate(
            [aux["token_prefix"], aux["token_suffix"]], axis=1
        )
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
    # MPT owns a learnable layer-0 text ctx (mpt.py:77); VPT's text prompt
    # is entirely frozen (vpt.py:43-70)
    text_l0_ctx = False

    def build_model(self):
        cfg = self.cfg
        hp = getattr(cfg.TRAINER, self.hparams_key)
        clip_cfg, params = self.load_clip()
        self.clip_cfg = clip_cfg
        tdim, vdim = clip_cfg.transformer_width, clip_cfg.vision_width
        key = new_rng(cfg.SEED)
        ks = jax.random.split(key, 4)

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
        ctx_init = hp.TEXT_CTX_INIT.replace("_", " ")
        n_ctx_embed = 0
        if self.text_l0_ctx and txt_n > 0:
            # MPT's learnable layer-0 text context (mpt.py:55-77): init
            # from the first txt_n BPE tokens of TEXT_CTX_INIT (the
            # tokenized classname prompts keep the FULL ctx_init string as
            # prefix — mpt.py:64,79 — so suffix starts at 1+n_ctx of it),
            # else random std 0.02
            if ctx_init:
                trainable["ctx"] = ctx_vectors_from_init(
                    params["text"], ctx_init, txt_n
                )
                prompt_prefix = ctx_init
            else:
                trainable["ctx"] = random_ctx(ks[3], (txt_n, tdim))
                prompt_prefix = " ".join(["X"] * txt_n)
            n_ctx_embed = txt_n
        else:
            prompt_prefix = ctx_init
        if not trainable:
            raise ValueError(
                f"{cfg.TRAINER.NAME}: no prompts enabled — set "
                "VISUAL_PROMPT_DEPTH/DEEP_VISUAL_N_CTX (and/or TEXT_* for MPT)"
            )
        print(f"Trainable prompts: {sorted(trainable)}")
        # no text-side trainables (every VPT config) -> text features are a
        # pure function of the frozen tower: encode once at build, train on
        # cached rows (base._cache_static_text).  The reference re-encodes
        # the frozen text tower every step (vpt.py:96-101).  MPT's layer-0
        # text ctx makes its text features always trainable-dependent.
        self.static_text = (
            "text_deep_prompts" not in trainable and "ctx" not in trainable
        )

        # embed the fixed prompt; for VPT n_ctx=0 (prefix+suffix is the
        # whole hand prompt), for MPT the ctx slice replaces positions
        # 1..1+n_ctx of it
        aux_cls = embed_classnames(
            params["text"], self.classnames, n_ctx_embed, prompt_prefix
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
    trainers/mpt.py:177-293) — VPT's deep-prompt structure plus the
    learnable layer-0 text context its TextPromptLearner owns
    (mpt.py:55-124)."""

    model_name = "MultiModalPromptLearner"  # reference mpt.py:217
    hparams_key = "MPT"
    text_l0_ctx = True
