"""Zero-shot CLIP trainers (reference trainers/zsclip.py:51-118).

``ZeroshotCLIP``: per-dataset hand template, text features encoded once at
build and cached.  ``ZeroshotCLIP2``: prompt ensembling — mean of normalized
text features over IMAGENET_TEMPLATES_SELECT (+ the dataset template when
not ImageNet), re-normalized.

This is the framework's parity oracle: any backbone-port bug shows up as a
zero-shot accuracy deviation before any training exists (SURVEY.md §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mudpt_tpu.models.clip import encode_image, encode_text
from mudpt_tpu.tokenizer import tokenize
from mudpt_tpu.trainers.base import TrainerBase
from mudpt_tpu.trainers.templates import CUSTOM_TEMPLATES, IMAGENET_TEMPLATES_SELECT
from mudpt_tpu.utils.registry import TRAINER_REGISTRY


def _encode_templates(params, clip_cfg, classnames, templates, compute_dtype):
    """Mean-of-normalized-text-features over templates (zsclip.py:105-115).

    Token rows are EOT-truncated host-side (models/text.py rationale: the
    tower is causal and only the EOT position is read out, so positions past
    max(eot)+1 are dead work) — template prompts occupy ~8-20 of the 77
    context positions, so this cuts the one-time class-tower build several-
    fold with identical features.  Lengths are rounded to the 8-sublane grid
    so the ~80 ImageNet templates share one or two compiled graphs.
    """
    from mudpt_tpu.models.text import effective_text_length

    encode = jax.jit(
        functools.partial(encode_text, cfg=clip_cfg, compute_dtype=compute_dtype)
    )
    mean = 0.0
    for temp in templates:
        prompts = [temp.format(c.replace("_", " ")) for c in classnames]
        toks = np.asarray(tokenize(prompts))
        # EOT id is the vocabulary max, so argmax locates it (clip.py:186)
        L = effective_text_length(int(toks.argmax(axis=-1).max()), toks.shape[1])
        feats = np.array(encode(params, jnp.asarray(toks[:, :L])), np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        mean = mean + feats
    mean = mean / len(templates)
    return mean / np.linalg.norm(mean, axis=-1, keepdims=True)


def _zs_inference(trainable, frozen, aux, images, *, clip_cfg, compute_dtype,
                  mesh_ctx=None):
    del trainable
    img = encode_image(
        frozen, images, clip_cfg, compute_dtype=compute_dtype, mesh_ctx=mesh_ctx
    )
    img = img.astype(jnp.float32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    scale = jnp.exp(frozen["logit_scale"])
    return scale * jnp.dot(img, aux["text_features"].T)


@TRAINER_REGISTRY.register()
class ZeroshotCLIP(TrainerBase):
    model_name = "zsclip"
    templates = None  # single dataset template
    # the reference serves zero-shot on the fp16 backbone convert_weights
    # produced (clip/model.py:917; zsclip.py never floats it) — bf16 here.
    # Measured on-chip (docs/BENCHMARKS.md round 5): the fp32 default read
    # 4920 img/s vs CoOp's 8564 on the same RN50 tower.
    prec_default = "fp16"

    def build_model(self):
        cfg = self.cfg
        clip_cfg, params = self.load_clip()
        self.clip_cfg = clip_cfg

        if self.templates is None:
            templates = [CUSTOM_TEMPLATES[cfg.DATASET.NAME]]
        else:
            templates = list(self.templates)
            if cfg.DATASET.NAME != "ImageNet":
                templates.append(CUSTOM_TEMPLATES[cfg.DATASET.NAME])
        text_features = _encode_templates(
            params, clip_cfg, self.classnames, templates, self.compute_dtype
        )

        self.place(
            frozen=params,
            aux_class_tree={"text_features": text_features},
            aux_repl=None,
            trainable=None,
        )
        fwd = functools.partial(
            _zs_inference, clip_cfg=clip_cfg, compute_dtype=self.compute_dtype,
            mesh_ctx=self.mesh,
        )
        self.forward = fwd
        self.model_inference = fwd

    def train(self):  # zero-shot has nothing to train
        self.test()


@TRAINER_REGISTRY.register()
class ZeroshotCLIP2(ZeroshotCLIP):
    """Prompt ensembling (zsclip.py:82-118)."""

    templates = IMAGENET_TEMPLATES_SELECT
