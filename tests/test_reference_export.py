"""Exporting our trained prompts as reference-format checkpoints (the
inverse of test_reference_import): the exported torch pickle must load into
a FRESH reference CustomCLIP through the reference's own load path
(delete class buffers, ``load_state_dict(strict=False)`` — reference
mudpt.py:286-303) and reproduce the original model's logits."""

import os

import numpy as np
import pytest

from mudpt_tpu.models.export_reference import (
    save_reference_checkpoint,
    trainable_to_reference_state_dict,
)
from mudpt_tpu.models.import_reference import reference_state_dict_to_trainable
from mudpt_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

from tests.test_reference_import import ZOO, _save_dassl_checkpoint
from tests.test_zoo_parity import CLASSNAMES, _base_cfg, _images, _setup, _tiny_clip


@pytest.mark.parametrize(
    "trainer,module,hp,pl_attr,reg_name,whole,fwd",
    ZOO, ids=[z[0] for z in ZOO],
)
def test_export_roundtrip_into_fresh_reference_model(
    tmp_path, trainer, module, hp, pl_attr, reg_name, whole, fwd
):
    """reference model A -> import to our pytree -> export -> load into a
    differently-initialized reference model B -> B's logits == A's."""
    cfg = _base_cfg(trainer, **hp)
    torch, clip_mod, tmod = _setup(module, cfg)
    needs_cfg = trainer in ("MuDPT", "UMuDPT", "UUMuDPT")

    torch.manual_seed(21)
    clip_a = _tiny_clip(clip_mod, cfg=cfg if needs_cfg else None)
    ref_a = tmod.CustomCLIP(cfg, CLASSNAMES, clip_a).float().eval()

    # B shares A's frozen backbone (a reference user loads the same CLIP
    # .pt) but starts with different prompt params — so agreement below can
    # only come from the exported checkpoint.  The backbone sync happens
    # BEFORE CustomCLIP construction (class-embedding buffers derive from
    # token_embedding) and skips the ViT-owned visual_ctx prompt params.
    torch.manual_seed(99)
    clip_b = _tiny_clip(clip_mod, cfg=cfg if needs_cfg else None)
    sd_a = {k: v for k, v in clip_a.state_dict().items()
            if "visual_ctx" not in k}
    clip_b.load_state_dict(sd_a, strict=False)
    ref_b = tmod.CustomCLIP(cfg, CLASSNAMES, clip_b).float().eval()

    images = _images()
    with torch.no_grad():
        logits_a = ref_a(torch.from_numpy(images)).numpy()
        logits_b0 = ref_b(torch.from_numpy(images)).numpy()
    assert not np.allclose(logits_a, logits_b0, atol=1e-4), "B must differ before load"

    # A's Dassl checkpoint -> our pytree (importer, already certified)
    saved = ref_a if whole else ref_a.prompt_learner
    _save_dassl_checkpoint(tmp_path, reg_name, saved, epoch=4)
    tree, _, _ = load_checkpoint(str(tmp_path), reg_name, epoch=4)

    # our pytree -> reference checkpoint -> load into B the reference way
    out = str(tmp_path / "exported.pth.tar")
    save_reference_checkpoint(out, tree, epoch=4)
    ckpt = torch.load(out, map_location="cpu", weights_only=True)
    assert ckpt["epoch"] == 4
    state_dict = ckpt["state_dict"]
    for k in list(state_dict):  # reference load_model deletes class buffers
        if "token_prefix" in k or "token_suffix" in k:
            del state_dict[k]
    target = ref_b if whole else ref_b.prompt_learner
    missing = target.load_state_dict(state_dict, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys

    with torch.no_grad():
        logits_b = ref_b(torch.from_numpy(images)).numpy()
    np.testing.assert_allclose(logits_b, logits_a, rtol=1e-5, atol=1e-5)


def test_export_state_dict_exactly_inverts_import(tmp_path):
    """export(import(sd)) == sd on the learned-prompt keys (MuDPT)."""
    cfg = _base_cfg("MuDPT", N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=3,
                    PREC="fp32")
    torch, clip_mod, tmod = _setup("mudpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    tree, _ = reference_state_dict_to_trainable(dict(sd))
    back, trainer = trainable_to_reference_state_dict(tree)
    assert trainer == "MuDPT"
    for k, v in back.items():
        np.testing.assert_array_equal(v, sd[k], err_msg=k)


def test_vpt_export_block_keys(tmp_path):
    """VPT/MPT stacks unstack back to per-resblock visual_ctx keys."""
    tree = {
        "visual_ctx": np.ones((3, 8), np.float32),
        "visual_deep_prompts": np.arange(2 * 3 * 8, dtype=np.float32).reshape(2, 3, 8),
        "text_deep_prompts": np.full((1, 2, 8), 7, np.float32),
    }
    sd, trainer = trainable_to_reference_state_dict(tree)
    assert trainer == "VPT/MPT"
    assert set(sd) == {
        "image_encoder.visual_ctx",
        "image_encoder.transformer.resblocks.1.visual_ctx",
        "image_encoder.transformer.resblocks.2.visual_ctx",
        "text_encoder.transformer.resblocks.1.visual_ctx",
    }
    np.testing.assert_array_equal(
        sd["image_encoder.transformer.resblocks.2.visual_ctx"],
        tree["visual_deep_prompts"][1],
    )


def test_export_cli_tool(tmp_path):
    """The CLI exports an output tree of our .npz checkpoints to torch."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import export_reference_checkpoint as tool
    import torch

    tree = {"ctx": np.random.RandomState(0).randn(4, 16).astype(np.float32)}
    src = tmp_path / "run"
    save_checkpoint(str(src), "prompt_learner", 3, tree, is_best=True)

    dst = tmp_path / "exported"
    rc = tool.main(["--src", str(src), "--dst", str(dst)])
    assert rc == 0
    for fname in ("model.pth.tar-3", "model-best.pth.tar"):
        ckpt = torch.load(str(dst / "prompt_learner" / fname),
                          map_location="cpu", weights_only=True)
        np.testing.assert_array_equal(
            ckpt["state_dict"]["ctx"].numpy(), tree["ctx"]
        )
        assert ckpt["epoch"] == 3


def test_mpt_shallow_tree_exports_as_vpt_mpt():
    """An MPT tree WITHOUT deep prompts ({ctx, visual_ctx} — depth-1
    configs) must still export as VPT/MPT with the learner's key names,
    not fall through to the CoOp branch (which would silently drop
    visual_ctx and mis-key ctx — caught by the round-5 self-review)."""
    import numpy as np

    from mudpt_tpu.models.export_reference import (
        trainable_to_reference_state_dict,
    )

    tree = {
        "ctx": np.zeros((2, 64), np.float32),
        "visual_ctx": np.ones((3, 8), np.float32),
    }
    sd, kind = trainable_to_reference_state_dict(tree)
    assert kind == "VPT/MPT"
    assert set(sd) == {
        "text_prompt_learner.visual_ctx", "image_encoder.visual_ctx"
    }
    np.testing.assert_array_equal(
        sd["text_prompt_learner.visual_ctx"], tree["ctx"]
    )
