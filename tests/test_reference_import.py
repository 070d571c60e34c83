"""Importing reference-trained (PyTorch/Dassl) checkpoints.

The reference saves ``torch.save({"state_dict", "epoch"})`` under
``<output>/<registered name>/model.pth.tar-<E>``.  These tests pin that:

  * every zoo member's saved state dict maps onto our trainable pytree and
    the imported weights reproduce the reference model's logits through OUR
    forward (the real migration guarantee);
  * the trainer's ``load_model`` consumes a reference output directory
    directly (transparent torch-pickle detection in ``load_checkpoint``);
  * the offline conversion CLI produces an equivalent .npz.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mudpt_tpu.models.import_reference import (
    is_torch_checkpoint,
    reference_state_dict_to_trainable,
)
from mudpt_tpu.trainers.cocoop import cocoop_forward
from mudpt_tpu.trainers.coop import coop_forward
from mudpt_tpu.trainers.mudpt import mudpt_forward
from mudpt_tpu.trainers.umudpt import umudpt_forward
from mudpt_tpu.trainers.uumudpt import uumudpt_forward
from mudpt_tpu.utils.checkpoint import load_checkpoint

from tests.test_zoo_parity import (
    CLASSNAMES,
    TOL,
    _aux_from_learner,
    _backbone,
    _base_cfg,
    _images,
    _setup,
    _tiny_clip,
    t,
)


def _save_dassl_checkpoint(tmp_path, name, module, epoch=7):
    """Save the way Dassl's save_checkpoint does: a torch pickle of
    {"state_dict", "epoch"} at <dir>/<name>/model.pth.tar-<epoch>."""
    import torch

    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    path = str(d / f"model.pth.tar-{epoch}")
    torch.save({"state_dict": module.state_dict(), "epoch": epoch}, path)
    return path


ZOO = [
    # (trainer, module, hparams, learner attr, registered dir, save whole model?, forward)
    ("MuDPT", "mudpt", dict(N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=3, PREC="fp32"),
     "mudpt_prompt_learner", "MultimodalDeepPromptTuning", True, mudpt_forward),
    ("UMuDPT", "umudpt", dict(N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=3, PREC="fp32"),
     "umudpt_prompt_learner", "UnifiedMultimodalDeepPromptTuning", True, umudpt_forward),
    ("UUMuDPT", "uumudpt", dict(N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=3, PREC="fp32"),
     "uumudpt_prompt_learner", "UnifiedMultimodalDeepPromptTuning", True, uumudpt_forward),
    ("CoOp", "coop", dict(N_CTX=4, CTX_INIT="", PREC="fp32", CSC=False,
                          CLASS_TOKEN_POSITION="end"),
     "prompt_learner", "prompt_learner", False, coop_forward),
    ("CoCoOp", "cocoop", dict(N_CTX=4, CTX_INIT="", PREC="fp32", CSC=False,
                              CLASS_TOKEN_POSITION="end"),
     "prompt_learner", "prompt_learner", False, cocoop_forward),
]


@pytest.mark.parametrize(
    "trainer,module,hp,pl_attr,reg_name,whole,fwd",
    ZOO, ids=[z[0] for z in ZOO],
)
def test_imported_checkpoint_forward_parity(
    tmp_path, trainer, module, hp, pl_attr, reg_name, whole, fwd
):
    """Save a reference checkpoint the Dassl way, import it, and check OUR
    forward with the imported trainable matches the reference's logits."""
    cfg = _base_cfg(trainer, **hp)
    torch, clip_mod, tmod = _setup(module, cfg)
    needs_cfg = trainer in ("MuDPT", "UMuDPT", "UUMuDPT")
    clip_model = _tiny_clip(clip_mod, cfg=cfg if needs_cfg else None)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    saved = ref if whole else ref.prompt_learner
    _save_dassl_checkpoint(tmp_path, reg_name, saved, epoch=7)

    trainable, opt, meta = load_checkpoint(str(tmp_path), reg_name, epoch=7)
    assert opt is None  # torch optimizer state is not translated
    assert meta["epoch"] == 7
    assert meta["trainer"].startswith(trainer[:4])

    clip_cfg, frozen = _backbone(clip_model)
    aux = _aux_from_learner(getattr(ref, pl_attr))
    images = _images()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(images)).numpy()
    ours = fwd(
        trainable, frozen, aux, jnp.asarray(images.transpose(0, 2, 3, 1)),
        clip_cfg=clip_cfg, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_logits, **TOL)


def test_vpt_mpt_import_exact_tree(tmp_path):
    """VPT/MPT whole-model checkpoints: the per-block visual_ctx params
    (on BOTH towers — the text blocks' prompts are also named visual_ctx)
    stack into our {visual_ctx, visual_deep_prompts, text_deep_prompts}."""
    cfg = _base_cfg(
        "VPT", DEEP_TEXT_N_CTX=2, DEEP_VISUAL_N_CTX=3, TEXT_PROMPT_DEPTH=2,
        VISUAL_PROMPT_DEPTH=2, TEXT_CTX_INIT="a photo of a", PREC="fp32",
    )
    torch, clip_mod, tmod = _setup("vpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()
    _save_dassl_checkpoint(tmp_path, "VisualPromptLearner", ref, epoch=3)

    tree, _, meta = load_checkpoint(str(tmp_path), "VisualPromptLearner", epoch=3)
    assert meta["trainer"] == "VPT/MPT"
    vis = clip_model.visual
    np.testing.assert_array_equal(tree["visual_ctx"], t(vis.visual_ctx))
    np.testing.assert_array_equal(
        tree["visual_deep_prompts"],
        np.stack([t(vis.transformer.resblocks[1].visual_ctx)]),
    )
    np.testing.assert_array_equal(
        tree["text_deep_prompts"],
        np.stack([t(clip_model.transformer.resblocks[1].visual_ctx)]),
    )


def test_mpt_import_maps_text_learner_ctx(tmp_path):
    """A TRUE MPT checkpoint (reference trainers/mpt.py CustomCLIP)
    additionally carries the learnable layer-0 text context on its
    TextPromptLearner — a parameter named ``visual_ctx`` (mpt.py:77) —
    which must land in our ``ctx`` leaf alongside the per-block stacks."""
    cfg = _base_cfg(
        "MPT", DEEP_TEXT_N_CTX=2, DEEP_VISUAL_N_CTX=3, TEXT_PROMPT_DEPTH=2,
        VISUAL_PROMPT_DEPTH=2, TEXT_CTX_INIT="a photo of a", PREC="fp32",
    )
    torch, clip_mod, tmod = _setup("mpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()
    _save_dassl_checkpoint(tmp_path, "MultiModalPromptLearner", ref, epoch=3)

    tree, _, meta = load_checkpoint(
        str(tmp_path), "MultiModalPromptLearner", epoch=3
    )
    assert meta["trainer"] == "VPT/MPT"
    np.testing.assert_array_equal(
        tree["ctx"], t(ref.text_prompt_learner.visual_ctx)
    )
    vis = clip_model.visual
    np.testing.assert_array_equal(tree["visual_ctx"], t(vis.visual_ctx))

    # reverse direction: our MPT tree exports the ctx leaf back onto the
    # reference learner name
    from mudpt_tpu.models.export_reference import (
        trainable_to_reference_state_dict,
    )

    sd, kind = trainable_to_reference_state_dict(
        {k: np.asarray(v) for k, v in tree.items()}
    )
    assert kind == "VPT/MPT"
    np.testing.assert_array_equal(
        sd["text_prompt_learner.visual_ctx"], np.asarray(tree["ctx"])
    )


def test_trainer_load_model_from_reference_dir(tmp_path):
    """End to end at the trainer level: point load_model at a reference
    output directory (torch pickles, reference layout) and the trained
    prompts land in the live trainer."""
    from mudpt_tpu.trainers import build_trainer
    from tests.test_trainers import tiny_cfg

    # a reference MuDPT checkpoint at test-tiny dims (64-wide, 2 layers)
    rcfg = _base_cfg("MuDPT", N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=2,
                     PREC="fp32")
    torch, clip_mod, tmod = _setup("mudpt", rcfg)
    clip_model = _tiny_clip(clip_mod, cfg=rcfg)
    ref = tmod.CustomCLIP(rcfg, CLASSNAMES, clip_model).float().eval()
    ref_dir = tmp_path / "reference_run"
    _save_dassl_checkpoint(ref_dir, "MultimodalDeepPromptTuning", ref, epoch=5)

    cfg = tiny_cfg("MuDPT", tmp_path, DEEP_PROMPT_DEPTH=2)
    trainer = build_trainer(cfg)
    before = np.asarray(trainer.trainable["ctx"])
    trainer.load_model(str(ref_dir), epoch=5)
    got = trainer.trainable
    np.testing.assert_array_equal(
        np.asarray(got["ctx"]), t(ref.mudpt_prompt_learner.ctx)
    )
    np.testing.assert_array_equal(
        np.asarray(got["embed_projection"]["w"]),
        np.asarray(t(ref.mudpt_prompt_learner.embed_projection.weight).T),
    )
    assert not np.array_equal(np.asarray(got["ctx"]), before)


def test_cli_conversion_tool(tmp_path):
    """tools/import_reference_checkpoint.py converts a reference output tree
    into loadable .npz checkpoints with identical weights."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import import_reference_checkpoint as tool

    cfg = _base_cfg("CoOp", N_CTX=4, CTX_INIT="", PREC="fp32", CSC=True,
                    CLASS_TOKEN_POSITION="end")
    torch, clip_mod, tmod = _setup("coop", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=None)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()
    src = tmp_path / "run"
    _save_dassl_checkpoint(src, "prompt_learner", ref.prompt_learner, epoch=9)

    dst = tmp_path / "converted"
    rc = tool.main(["--src", str(src), "--dst", str(dst)])
    assert rc == 0
    out = dst / "prompt_learner" / "model.pth.tar-9"
    assert out.exists() and not is_torch_checkpoint(str(out))
    tree, _, meta = load_checkpoint(str(dst), "prompt_learner", epoch=9)
    np.testing.assert_array_equal(tree["ctx"], t(ref.prompt_learner.ctx))
    assert meta["epoch"] == 9
    # CSC checkpoints carry per-class rows
    assert np.asarray(tree["ctx"]).shape[0] == len(CLASSNAMES)


def test_is_torch_checkpoint_detection(tmp_path):
    import torch

    npz = tmp_path / "a.npz"
    np.savez(npz, x=np.zeros(3))
    assert not is_torch_checkpoint(str(npz))

    zipfmt = tmp_path / "b.pth.tar"
    torch.save({"state_dict": {"ctx": torch.zeros(2, 4)}}, str(zipfmt))
    assert is_torch_checkpoint(str(zipfmt))

    legacy = tmp_path / "c.pth.tar"
    torch.save({"state_dict": {"ctx": torch.zeros(2, 4)}}, str(legacy),
               _use_new_zipfile_serialization=False)
    assert is_torch_checkpoint(str(legacy))


def test_unrecognized_state_dict_raises():
    with pytest.raises(ValueError, match="Unrecognized reference checkpoint"):
        reference_state_dict_to_trainable({"something.weight": np.zeros(3)})
