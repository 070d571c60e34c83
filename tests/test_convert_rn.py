"""Full RN-family CLIP conversion + zero-shot forward + npz cache round trip."""

import numpy as np

import jax.numpy as jnp

from mudpt_tpu.models.clip import clip_forward
from mudpt_tpu.models.convert import (
    load_npz_params,
    save_npz_params,
    torch_state_dict_to_jax,
)

from tests.reference_oracle import import_reference_clip


def test_rn_clip_conversion_and_forward(tmp_path):
    import torch

    mod = import_reference_clip()
    torch.manual_seed(5)
    ref = mod.CLIP(
        embed_dim=48,
        image_resolution=64,
        vision_layers=(1, 1, 1, 1),  # tuple => ModifiedResNet
        vision_width=32,
        vision_patch_size=None,
        context_length=16,
        vocab_size=500,
        transformer_width=64,
        transformer_heads=1,
        transformer_layers=2,
        cfg=None,
    ).float().eval()

    cfg, params = torch_state_dict_to_jax(ref.state_dict())
    assert cfg.vision_arch == "resnet"
    assert cfg.vision_layers_per_stage == (1, 1, 1, 1)
    assert cfg.image_resolution == 64

    rng = np.random.RandomState(0)
    images = rng.randn(2, 3, 64, 64).astype(np.float32)
    tokens = np.zeros((3, 16), np.int64)
    for i in range(3):
        tokens[i, 0] = 499
        tokens[i, 1:4] = rng.randint(1, 400, 3)
        tokens[i, 4] = 499

    with torch.no_grad():
        ref_li, _ = ref(torch.from_numpy(images), torch.from_numpy(tokens))

    li, _ = clip_forward(
        params,
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(tokens, jnp.int32),
        cfg,
    )
    np.testing.assert_allclose(np.asarray(li), ref_li.numpy(), rtol=2e-3, atol=2e-3)

    # npz cache round trip preserves config + params
    cache = str(tmp_path / "rn.npz")
    save_npz_params(cache, cfg, params)
    cfg2, params2 = load_npz_params(cache)
    assert cfg2 == cfg
    li2, _ = clip_forward(
        params2,
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(tokens, jnp.int32),
        cfg2,
    )
    np.testing.assert_allclose(np.asarray(li2), np.asarray(li), rtol=1e-6)
