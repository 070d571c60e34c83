"""RN50-at-TRUE-scale oracle parity (VERDICT r3 missing #3 / item 5).

The tiny RN tests (test_resnet_parity.py, test_convert_rn.py) verify the
math; this file runs the REAL RN50 dims — stem width 64, stages (3,4,6,3),
AttentionPool2d 2048->1024, 224px input, 32 attnpool heads, 1024-d embed
with the 512-wide/8-head/12-layer text tower (reference
clip/model.py:17-161 + 892-898 shape inference) — torch-initialized
weights transplanted through the converter, mirroring
test_fullscale_parity.py for the ViT path.  What only breaks at scale:
the 4-stage stride/downsample layout, avgpool-anti-aliasing at real
spatial dims (7x7 attnpool grid), the 32-head pooling reshapes, and the
converter's stage/block enumeration at depth (3,4,6,3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mudpt_tpu.models.clip import clip_forward, encode_image
from mudpt_tpu.models.convert import torch_state_dict_to_jax
from mudpt_tpu.tokenizer import tokenize

from tests.reference_oracle import import_reference_clip

CLASSNAMES = ["cat", "dog", "german shepherd", "airliner", "stop sign"]

RN50 = dict(
    embed_dim=1024,
    image_resolution=224,
    vision_layers=(3, 4, 6, 3),  # tuple => ModifiedResNet
    vision_width=64,
    vision_patch_size=None,
    context_length=77,
    vocab_size=49408,
    transformer_width=512,
    transformer_heads=8,
    transformer_layers=12,
)


@pytest.fixture(scope="module")
def rn50_fullscale():
    import torch

    mod = import_reference_clip()
    torch.manual_seed(7)
    ref = mod.CLIP(**RN50, cfg=None).float().eval()

    clip_cfg, params = torch_state_dict_to_jax(ref.state_dict())
    assert clip_cfg.vision_arch == "resnet"
    assert clip_cfg.vision_layers_per_stage == (3, 4, 6, 3)
    assert clip_cfg.vision_width == 64
    assert clip_cfg.embed_dim == 1024
    # RN attnpool head count is embed-width based: 2048 // 64 = 32
    # (reference clip/model.py:895-898 vision_heads = vision_width * 32 // 64)
    assert clip_cfg.vision_heads == 32

    images = np.random.RandomState(11).randn(2, 3, 224, 224).astype(np.float32)
    tokens = tokenize([f"a photo of a {c}." for c in CLASSNAMES])
    with torch.no_grad():
        ref_feats = ref.visual(torch.from_numpy(images)).numpy()
        ref_logits, _ = ref(
            torch.from_numpy(images), torch.from_numpy(tokens.astype(np.int64))
        )
        ref_logits = ref_logits.numpy()
    return clip_cfg, params, images, tokens, ref_feats, ref_logits


def test_rn50_visual_trunk_parity(rn50_fullscale):
    """The stem + 4 stages + AttentionPool2d at true RN50 shapes: 1e-3
    against the reference ModifiedResNet forward."""
    clip_cfg, params, images, _, ref_feats, _ = rn50_fullscale
    ours = np.asarray(
        encode_image(
            params,
            jnp.asarray(images.transpose(0, 2, 3, 1)),
            clip_cfg,
            compute_dtype=jnp.float32,
        )
    )
    assert ours.shape == ref_feats.shape == (2, 1024)
    np.testing.assert_allclose(ours, ref_feats, rtol=1e-3, atol=1e-3)


def test_rn50_zeroshot_logits_parity(rn50_fullscale):
    """Full zero-shot path (visual trunk + text tower + cosine head) at
    true RN50 scale through the converter."""
    clip_cfg, params, images, tokens, _, ref_logits = rn50_fullscale
    ours, _ = clip_forward(
        params,
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(tokens),
        clip_cfg,
        compute_dtype=jnp.float32,
    )
    ours = np.asarray(ours)
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-3, atol=1e-3)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()
