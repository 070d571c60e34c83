"""User-facing CLIP-style API (the reference's ``clip.load()`` /
``clip.tokenize()`` surface, clip/clip.py:95-239).

    import mudpt_tpu.api as clip

    clip_cfg, params, preprocess = clip.load("ViT-B/16")     # or a local path
    tokens = clip.tokenize(["a photo of a cat"])             # (1, 77) int32
    image = preprocess(PIL.Image.open("cat.jpg"))            # (224,224,3) f32

    img_feats = clip.encode_image(params, image[None], clip_cfg)
    txt_feats = clip.encode_text(params, tokens, clip_cfg)

    # serving: text tower encoded once, jitted per-image scoring
    classify = clip.zero_shot_classifier(clip_cfg, params, ["cat", "dog"])
    logits = classify(images)                                # (B, n_cls)
"""

from __future__ import annotations

import os
from typing import Tuple

from mudpt_tpu.data.transforms import EvalTransform
from mudpt_tpu.models.clip import (  # noqa: F401  (re-exports)
    CLIPConfig,
    clip_forward,
    cosine_logits,
    encode_image,
    encode_text,
)
from mudpt_tpu.models.convert import load_clip_checkpoint, load_npz_params
from mudpt_tpu.models.download import available_models, download_model  # noqa: F401
from mudpt_tpu.tokenizer import tokenize  # noqa: F401


def zero_shot_classifier(
    clip_cfg,
    params,
    classnames,
    templates=("a photo of a {}.",),
    compute_dtype=None,
):
    """Build a zero-shot classifier for serving.

    Encodes the class-prompt text tower ONCE — mean of normalized text
    features over ``templates``, re-normalized (the reference's ensembling
    recipe, zsclip.py:105-115) — and returns a jitted ``classify(images) ->
    logits`` over a normalized ``(B, H, W, 3)`` image batch.  The per-image
    cost is the vision tower plus one small matmul; the text tower is never
    re-run (the reference's ZeroshotCLIP caches the same way; its trainers
    re-encode per batch).

    ``compute_dtype`` defaults to bfloat16 on TPU and float32 elsewhere.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from mudpt_tpu.trainers.zsclip import _encode_templates, _zs_inference

    if compute_dtype is None:
        compute_dtype = (
            jnp.bfloat16
            if jax.devices()[0].platform == "tpu"
            else jnp.float32
        )
    text_features = jnp.asarray(
        _encode_templates(
            params, clip_cfg, list(classnames), list(templates), compute_dtype
        )
    )
    aux = {"text_features": text_features}

    # the scoring body is the ZeroshotCLIP trainer's inference fn — one
    # scoring path, no drift.  params/aux must be EXPLICIT jit operands:
    # closed-over (or default-arg) arrays lower as inlined HLO constants,
    # which would embed the 86M-param backbone in the compile payload
    # (HTTP 413 on the tunneled remote-compile path).
    score = jax.jit(
        functools.partial(
            _zs_inference, clip_cfg=clip_cfg, compute_dtype=compute_dtype
        )
    )

    def classify(images):
        return score(None, params, aux, images)

    return classify


def load(name_or_path: str, download_root: str = "~/.cache/clip") -> Tuple:
    """Load a CLIP model by registry name or local checkpoint path.

    Returns ``(clip_cfg, params, preprocess)`` where ``preprocess`` maps a
    PIL image to a normalized (H, W, 3) float32 array.
    """
    if os.path.exists(os.path.expanduser(name_or_path)):
        path = os.path.expanduser(name_or_path)
        if path.endswith(".npz"):
            cfg, params = load_npz_params(path)
        else:
            cfg, params = load_clip_checkpoint(path)
    else:
        path = download_model(name_or_path, download_root)
        cfg, params = load_clip_checkpoint(path)
    return cfg, params, EvalTransform(size=cfg.image_resolution)
