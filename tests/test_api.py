"""CLIP-style public API surface."""

import numpy as np
from PIL import Image

import jax

import mudpt_tpu.api as clip
from mudpt_tpu.models.clip import init_clip_params
from mudpt_tpu.models.convert import save_npz_params
from mudpt_tpu.trainers.base import TINY_TEST


def test_load_tokenize_encode(tmp_path):
    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    path = str(tmp_path / "tiny.npz")
    save_npz_params(path, TINY_TEST, jax.device_get(params))

    cfg, loaded, preprocess = clip.load(path)
    assert cfg == TINY_TEST

    tokens = clip.tokenize(["a photo of a cat", "a photo of a dog"])
    assert tokens.shape == (2, 77)

    img = preprocess(Image.new("RGB", (64, 48), color=(200, 30, 30)))
    assert img.shape == (cfg.image_resolution, cfg.image_resolution, 3)

    feats = clip.encode_image(loaded, img[None], cfg)
    tfeats = clip.encode_text(loaded, tokens, cfg)
    logits = clip.cosine_logits(feats, tfeats, loaded["logit_scale"])
    assert logits.shape == (1, 2)
    assert np.isfinite(np.asarray(logits)).all()

    assert "ViT-B/16" in clip.available_models()
