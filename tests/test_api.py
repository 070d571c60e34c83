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


def test_zero_shot_classifier():
    """api.zero_shot_classifier: text encoded once (ensembled per the
    reference zsclip.py:105-115), jitted scoring matches the manual
    encode_image -> normalize -> scale * img @ txt.T composition."""
    import jax.numpy as jnp

    params = init_clip_params(jax.random.PRNGKey(1), TINY_TEST)
    classnames = ["tabby_cat", "dog"]
    templates = ["a photo of a {}.", "a drawing of a {}."]

    classify = clip.zero_shot_classifier(
        TINY_TEST, params, classnames, templates, compute_dtype=jnp.float32
    )
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(3, TINY_TEST.image_resolution, TINY_TEST.image_resolution, 3),
        jnp.float32,
    )
    logits = np.asarray(classify(images))
    assert logits.shape == (3, 2)
    assert np.isfinite(logits).all()

    # manual composition: ensembled text features ("_" -> " " in classnames)
    feats = []
    for temp in templates:
        t = clip.tokenize([temp.format(c.replace("_", " ")) for c in classnames])
        f = np.asarray(clip.encode_text(params, jnp.asarray(t), TINY_TEST),
                       np.float32)
        feats.append(f / np.linalg.norm(f, axis=-1, keepdims=True))
    txt = np.mean(feats, axis=0)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)

    img = np.array(clip.encode_image(params, images, TINY_TEST), np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    want = np.exp(float(params["logit_scale"])) * img @ txt.T
    np.testing.assert_allclose(logits, want, rtol=2e-5, atol=2e-5)
