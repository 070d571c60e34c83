"""End-to-end MuDPT forward parity: our functional mudpt_forward vs the
reference's CustomCLIP (trainers/mudpt.py + VisionTransformer_MuDPT),
with the reference's randomly-initialized weights transplanted into our
pytrees.  This pins the full bidirectional cross-modal coupling math."""

import numpy as np
import pytest

import jax.numpy as jnp

from mudpt_tpu.models.clip import CLIPConfig
from mudpt_tpu.models.convert import torch_state_dict_to_jax
from mudpt_tpu.trainers.mudpt import mudpt_forward

from tests.reference_oracle import (
    add_reference_path,
    install_reference_stubs,
)

TOL = dict(rtol=5e-4, atol=5e-4)


def _make_cfg(n_ctx=2, depth=4):
    from yacs.config import CfgNode  # stub

    cfg = CfgNode()
    cfg.TRAINER = CfgNode()
    cfg.TRAINER.NAME = "MuDPT"
    cfg.TRAINER.MUDPT = CfgNode()
    cfg.TRAINER.MUDPT.N_CTX = n_ctx
    cfg.TRAINER.MUDPT.CTX_INIT = ""
    cfg.TRAINER.MUDPT.DEEP_PROMPT_DEPTH = depth
    cfg.TRAINER.MUDPT.PREC = "fp32"
    cfg.INPUT = CfgNode()
    cfg.INPUT.SIZE = (32, 32)
    return cfg


@pytest.fixture(scope="module")
def ref_setup():
    install_reference_stubs()
    add_reference_path()
    import torch
    import importlib

    clip_model_mod = importlib.import_module("clip.model")
    mudpt_mod = importlib.import_module("trainers.mudpt")

    torch.manual_seed(7)
    cfg = _make_cfg()
    clip_model = clip_model_mod.CLIP(
        embed_dim=64,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=64,
        transformer_heads=1,
        transformer_layers=2,
        cfg=cfg,
    ).float().eval()

    classnames = ["cat", "dog", "german shepherd"]
    model = mudpt_mod.CustomCLIP(cfg, classnames, clip_model).float().eval()
    return torch, cfg, clip_model, model


def test_mudpt_forward_parity(ref_setup):
    torch, cfg, clip_model, ref = ref_setup
    n_ctx = cfg.TRAINER.MUDPT.N_CTX

    # --- backbone: convert the reference CLIP state dict ------------------
    sd = clip_model.state_dict()
    backbone_keys = {
        k: v
        for k, v in sd.items()
        if not any(s in k for s in ("visual_ctx",))
    }
    clip_cfg, frozen = torch_state_dict_to_jax(backbone_keys)
    assert clip_cfg.vision_width == 64

    # --- trainable: transplant the reference prompt-learner weights -------
    pl = ref.mudpt_prompt_learner
    ie = ref.image_encoder
    t = lambda x: jnp.asarray(x.detach().numpy())
    trainable = {
        "ctx": t(pl.ctx),
        "deep_prompts": t(pl.deep_prompts),
        "embed_projection": {
            "w": t(pl.embed_projection.weight).T,
            "b": t(pl.embed_projection.bias),
        },
        "deep_projections": {
            "w": t(pl.deep_projections.weight).T,
            "b": t(pl.deep_projections.bias),
        },
        "visual_ctx": t(ie.visual_ctx),
        "visual_ctx_deep_prompts": t(ie.visual_ctx_deep_prompts),
        "visual_ctx_deep_projections": {
            "w": t(ie.visual_ctx_deep_projections.weight).T,
            "b": t(ie.visual_ctx_deep_projections.bias),
        },
    }
    aux = {
        "token_prefix": t(pl.token_prefix),
        "token_suffix": t(pl.token_suffix),
        "eot_idx": jnp.asarray(
            pl.tokenized_prompts.argmax(dim=-1).numpy().astype(np.int32)
        ),
    }

    rng = np.random.RandomState(3)
    images = rng.randn(2, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(images)).numpy()

    ours = mudpt_forward(
        trainable,
        frozen,
        aux,
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        clip_cfg=clip_cfg,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_logits, **TOL)
