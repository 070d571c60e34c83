"""Full-scale oracle parity: REAL ViT-B/16 architecture (12 layers, width
768, 224px patches, 49,408-token vocab, 8-head/512-wide text tower —
reference clip/model.py:667-779 dims), torch-initialized weights
transplanted through the converter.

The tiny-model oracle tests verify the math; these verify what breaks at
scale: the 12-head attention reshapes, the 197+n_ctx visual sequences, the
converter's layout transposes at real shapes, and fp32 LayerNorm at
realistic magnitudes.  This is the closest environment-feasible stand-in
for real-pretrained-weights validation (no network in this environment).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mudpt_tpu.models.clip import clip_forward
from mudpt_tpu.models.convert import torch_state_dict_to_jax
from mudpt_tpu.tokenizer import tokenize
from mudpt_tpu.trainers.mudpt import mudpt_forward

from tests.reference_oracle import add_reference_path, install_reference_stubs

CLASSNAMES = ["cat", "dog", "german shepherd", "airliner", "stop sign"]

B16 = dict(
    embed_dim=512, image_resolution=224, vision_layers=12, vision_width=768,
    vision_patch_size=16, context_length=77, vocab_size=49408,
    transformer_width=512, transformer_heads=8, transformer_layers=12,
)


def _images(b=2, res=224):
    return np.random.RandomState(11).randn(b, 3, res, res).astype(np.float32)


@pytest.fixture(scope="module")
def torch_mods():
    install_reference_stubs()
    add_reference_path()
    import importlib

    import torch

    return torch, importlib.import_module("clip.model"), importlib


def test_fullscale_zeroshot_parity(torch_mods):
    """Zero-shot logits at full scale: encode_image + encode_text + cosine
    head vs the reference CLIP.forward (clip/model.py:840-854)."""
    torch, clip_mod, _ = torch_mods
    torch.manual_seed(5)
    ref = clip_mod.CLIP(**B16, cfg=None).float().eval()

    clip_cfg, params = torch_state_dict_to_jax(ref.state_dict())
    assert clip_cfg.vision_width == 768 and clip_cfg.transformer_heads == 8

    prompts = [f"a photo of a {c}." for c in CLASSNAMES]
    tokens = tokenize(prompts)
    images = _images()

    with torch.no_grad():
        ref_logits, _ = ref(
            torch.from_numpy(images), torch.from_numpy(tokens.astype(np.int64))
        )
        ref_logits = ref_logits.numpy()

    ours, _ = clip_forward(
        params, jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(tokens), clip_cfg, compute_dtype=jnp.float32,
    )
    ours = np.asarray(ours)
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-3, atol=1e-3)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()


def test_fullscale_mudpt_parity(torch_mods):
    """MuDPT CustomCLIP at full scale (depth 9, n_ctx 2): bidirectional
    coupling + deep splices over 199-token visual / 77-token text sequences
    with 12-head reshapes (reference trainers/mudpt.py:117-184)."""
    torch, clip_mod, importlib = torch_mods
    from yacs.config import CfgNode

    cfg = CfgNode()
    cfg.TRAINER = CfgNode()
    cfg.TRAINER.NAME = "MuDPT"
    cfg.TRAINER.MUDPT = CfgNode()
    cfg.TRAINER.MUDPT.N_CTX = 2
    cfg.TRAINER.MUDPT.CTX_INIT = ""
    cfg.TRAINER.MUDPT.DEEP_PROMPT_DEPTH = 9
    cfg.TRAINER.MUDPT.PREC = "fp32"
    cfg.INPUT = CfgNode()
    cfg.INPUT.SIZE = (224, 224)

    torch.manual_seed(6)
    mudpt_mod = importlib.import_module("trainers.mudpt")
    clip_model = clip_mod.CLIP(**B16, cfg=cfg).float().eval()
    ref = mudpt_mod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    sd = {k: v for k, v in clip_model.state_dict().items()
          if "visual_ctx" not in k}
    clip_cfg, frozen = torch_state_dict_to_jax(sd)

    pl = ref.mudpt_prompt_learner
    ie = ref.image_encoder
    t = lambda x: jnp.asarray(x.detach().numpy())
    lin = lambda m: {"w": t(m.weight).T, "b": t(m.bias)}
    trainable = {
        "ctx": t(pl.ctx),
        "deep_prompts": t(pl.deep_prompts),
        "embed_projection": lin(pl.embed_projection),
        "deep_projections": lin(pl.deep_projections),
        "visual_ctx": t(ie.visual_ctx),
        "visual_ctx_deep_prompts": t(ie.visual_ctx_deep_prompts),
        "visual_ctx_deep_projections": lin(ie.visual_ctx_deep_projections),
    }
    aux = {
        "token_prefix": t(pl.token_prefix),
        "token_suffix": t(pl.token_suffix),
        "eot_idx": jnp.asarray(
            pl.tokenized_prompts.argmax(dim=-1).numpy().astype(np.int32)
        ),
    }

    images = _images()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(images)).numpy()

    ours = np.asarray(
        mudpt_forward(
            trainable, frozen, aux,
            jnp.asarray(images.transpose(0, 2, 3, 1)),
            clip_cfg=clip_cfg, compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-3, atol=1e-3)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()
