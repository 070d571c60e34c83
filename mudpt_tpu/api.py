"""User-facing CLIP-style API (the reference's ``clip.load()`` /
``clip.tokenize()`` surface, clip/clip.py:95-239).

    import mudpt_tpu.api as clip

    clip_cfg, params, preprocess = clip.load("ViT-B/16")     # or a local path
    tokens = clip.tokenize(["a photo of a cat"])             # (1, 77) int32
    image = preprocess(PIL.Image.open("cat.jpg"))            # (224,224,3) f32

    img_feats = clip.encode_image(params, image[None], clip_cfg)
    txt_feats = clip.encode_text(params, tokens, clip_cfg)
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
