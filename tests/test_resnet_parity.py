"""ModifiedResNet parity vs the reference torch implementation (random
weights, RN50-like but tiny: width 32, layers (1,1,1,1), res 64)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mudpt_tpu.models.resnet import convert_resnet_visual, resnet_forward

from tests.reference_oracle import import_reference_clip


def test_resnet_forward_parity():
    import torch

    mod = import_reference_clip()
    torch.manual_seed(11)
    width, res, layers = 32, 64, (1, 1, 1, 1)
    heads = width * 32 // 64
    ref = mod.ModifiedResNet(
        layers=layers, output_dim=48, heads=heads,
        input_resolution=res, width=width,
    ).float().eval()

    sd = {f"visual.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params, inferred_layers = convert_resnet_visual(sd)
    assert inferred_layers == layers

    rng = np.random.RandomState(0)
    images = rng.randn(2, 3, res, res).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(images)).numpy()

    ours = resnet_forward(
        params,
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        layers=layers,
        heads=heads,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=3e-4, atol=3e-4)


@pytest.mark.slow  # >30s measured (round-4 durations)
def test_rn_random_init_and_cast():
    """PATH='random' RN presets: init_clip_params builds the converter's
    layout, encode_image runs, and cast_matmul_weights applies the RN cast
    rules (convs + attnpool linears reduced; BN statistics and positional
    embedding stay fp32 — a KeyError here was the latent pre-round-4 bug:
    the ViT cast paths did not exist in RN trees)."""
    import jax.numpy as jnp

    from mudpt_tpu.models.clip import (
        cast_matmul_weights, encode_image, init_clip_params,
    )
    from mudpt_tpu.trainers.base import _NAMED_CONFIGS
    from mudpt_tpu.utils.rng import new_rng

    cfg = _NAMED_CONFIGS["test-tiny-rn"]
    params = init_clip_params(new_rng(0), cfg)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    feats = encode_image(params, imgs, cfg)
    assert feats.shape == (2, cfg.embed_dim)

    p16 = cast_matmul_weights(params, jnp.bfloat16)
    v = p16["visual"]
    assert v["conv1"].dtype == jnp.bfloat16
    assert v["layer1"]["0"]["conv2"].dtype == jnp.bfloat16
    assert v["layer1"]["0"]["downsample"]["conv"].dtype == jnp.bfloat16
    assert v["bn1"]["var"].dtype == jnp.float32
    assert v["layer1"]["0"]["bn1"]["mean"].dtype == jnp.float32
    assert v["attnpool"]["q"]["w"].dtype == jnp.bfloat16
    assert v["attnpool"]["pos_embedding"].dtype == jnp.float32
    assert p16["text"]["blocks"]["attn"]["qkv_w"].dtype == jnp.bfloat16
    f16 = encode_image(p16, imgs, cfg, compute_dtype=jnp.bfloat16)
    assert f16.shape == (2, cfg.embed_dim)

    # the real preset dims exist and are consistent (no full-size init here)
    from mudpt_tpu.models.clip import RN50, RN101

    assert RN50.vision_heads == 32 and RN50.vision_layers_per_stage == (3, 4, 6, 3)
    assert RN101.vision_layers_per_stage == (3, 4, 23, 3)


def test_coop_trains_on_rn_backbone(tmp_path):
    """A text-prompt trainer over a random RN backbone end to end (build,
    one epoch, eval) — the RN tower is a first-class citizen of the
    trainer engine, not just the converter."""
    from mudpt_tpu.trainers import build_trainer
    from tests.test_trainers import tiny_cfg

    cfg = tiny_cfg("CoOp", tmp_path, n_ctx=2)
    cfg.MODEL.BACKBONE.NAME = "test-tiny-rn"
    cfg.OPTIM.MAX_EPOCH = 1
    tr = build_trainer(cfg)
    tr.train()
    res = tr.evaluate(tr.dm.test_loader)
    assert res["total"] == len(tr.dm.dataset.test)


def test_vpt_refuses_rn_backbone(tmp_path):
    """Visual-prompt trainers need a ViT (prompt injection is
    transformer-only, as in the reference) — the refusal must name the
    constraint rather than fail deep in the tower."""
    import pytest as _pytest

    from mudpt_tpu.trainers import build_trainer
    from tests.test_trainers import tiny_cfg

    cfg = tiny_cfg("VPT", tmp_path, VISUAL_PROMPT_DEPTH=2, DEEP_VISUAL_N_CTX=2)
    cfg.MODEL.BACKBONE.NAME = "test-tiny-rn"
    with _pytest.raises(ValueError, match="ViT"):
        build_trainer(cfg)
