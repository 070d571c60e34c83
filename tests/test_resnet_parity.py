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
