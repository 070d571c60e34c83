"""Full-forward numerical parity for the whole trainer zoo vs the reference
PyTorch implementations (CustomCLIP of coop/cocoop/vpt/umudpt/uumudpt with
transplanted random weights).  Together with test_mudpt_parity this pins
every method's math end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mudpt_tpu.models.convert import torch_state_dict_to_jax
from mudpt_tpu.trainers.cocoop import cocoop_forward
from mudpt_tpu.trainers.coop import coop_forward
from mudpt_tpu.trainers.prompt_utils import build_position_index_map
from mudpt_tpu.trainers.umudpt import umudpt_forward
from mudpt_tpu.trainers.uumudpt import uumudpt_forward
from mudpt_tpu.trainers.vpt import vpt_forward

from tests.reference_oracle import install_reference_stubs, add_reference_path

TOL = dict(rtol=6e-4, atol=6e-4)
CLASSNAMES = ["cat", "dog", "german shepherd"]


def _base_cfg(trainer, **hp):
    install_reference_stubs()
    from yacs.config import CfgNode

    cfg = CfgNode()
    cfg.TRAINER = CfgNode()
    cfg.TRAINER.NAME = trainer
    ns = CfgNode()
    for k, v in hp.items():
        setattr(ns, k, v)
    setattr(cfg.TRAINER, trainer.upper(), ns)
    cfg.INPUT = CfgNode()
    cfg.INPUT.SIZE = (32, 32)
    return cfg


def _tiny_clip(mod, cfg=None):
    import torch

    return mod.CLIP(
        embed_dim=64, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=16, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
        cfg=cfg,
    ).float().eval()


def t(x):
    return jnp.asarray(x.detach().numpy())


def lin(module):
    return {"w": t(module.weight).T, "b": t(module.bias)}


def _setup(trainer_module_name, cfg):
    install_reference_stubs()
    add_reference_path()
    import importlib
    import torch

    torch.manual_seed(21)
    clip_model_mod = importlib.import_module("clip.model")
    tmod = importlib.import_module(f"trainers.{trainer_module_name}")
    return torch, clip_model_mod, tmod


def _images(b=2):
    return np.random.RandomState(4).randn(b, 3, 32, 32).astype(np.float32)


def _backbone(ref_clip, drop=("visual_ctx",)):
    sd = {
        k: v for k, v in ref_clip.state_dict().items()
        if not any(s in k for s in drop)
    }
    return torch_state_dict_to_jax(sd)


def _aux_from_learner(pl):
    return {
        "token_prefix": t(pl.token_prefix),
        "token_suffix": t(pl.token_suffix),
        "eot_idx": jnp.asarray(
            pl.tokenized_prompts.argmax(dim=-1).numpy().astype(np.int32)
        )
        if hasattr(pl, "tokenized_prompts")
        else jnp.asarray(
            pl.tokenized_prompted.argmax(dim=-1).numpy().astype(np.int32)
        ),
    }


@pytest.mark.parametrize("position,csc", [("end", False), ("end", True),
                                          ("middle", False), ("front", False)])
def test_coop_parity(position, csc):
    cfg = _base_cfg("CoOp", N_CTX=4, CTX_INIT="", PREC="fp32", CSC=csc,
                    CLASS_TOKEN_POSITION=position)
    torch, clip_mod, tmod = _setup("coop", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=None)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.prompt_learner
    aux = _aux_from_learner(pl)
    idx = build_position_index_map(position, pl.name_lens, pl.n_ctx, 77)
    if idx is not None:
        aux["index_map"] = jnp.asarray(idx)
    trainable = {"ctx": t(pl.ctx)}

    images = _images()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(images)).numpy()
    ours = coop_forward(
        trainable, frozen, aux, jnp.asarray(images.transpose(0, 2, 3, 1)),
        clip_cfg=clip_cfg, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_logits, **TOL)


def test_cocoop_parity():
    cfg = _base_cfg("CoCoOp", N_CTX=4, CTX_INIT="", PREC="fp32", CSC=False,
                    CLASS_TOKEN_POSITION="end")
    torch, clip_mod, tmod = _setup("cocoop", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=None)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.prompt_learner
    aux = _aux_from_learner(pl)
    trainable = {
        "ctx": t(pl.ctx),
        "meta_net": {
            "linear1": lin(pl.meta_net.linear1),
            "linear2": lin(pl.meta_net.linear2),
        },
    }
    images = _images()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(images)).numpy()
    ours = cocoop_forward(
        trainable, frozen, aux, jnp.asarray(images.transpose(0, 2, 3, 1)),
        clip_cfg=clip_cfg, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_logits, **TOL)


def test_vpt_mpt_parity():
    """VPT blocks with both visual (depth 2 of 2 layers) and text prompts
    (the MPT configuration) — covers the per-block splice + layer-0 append."""
    cfg = _base_cfg(
        "VPT", DEEP_TEXT_N_CTX=2, DEEP_VISUAL_N_CTX=3, TEXT_PROMPT_DEPTH=2,
        VISUAL_PROMPT_DEPTH=2, TEXT_CTX_INIT="a photo of a", PREC="fp32",
    )
    torch, clip_mod, tmod = _setup("vpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()
    # reference TextPromptLearner.forward calls .cuda() (vpt.py:69) — run its
    # buffer directly (the documented CPU bug, SURVEY.md §2.5)
    prompts_embed = ref.text_prompt_learner.prompts

    clip_cfg, frozen = _backbone(clip_model)
    vis = clip_model.visual
    trainable = {
        "visual_ctx": t(vis.visual_ctx),
        "visual_deep_prompts": jnp.stack(
            [t(vis.transformer.resblocks[1].visual_ctx)]
        ),
        "text_deep_prompts": jnp.stack(
            [t(clip_model.transformer.resblocks[1].visual_ctx)]
        ),
    }
    pl = ref.text_prompt_learner
    aux = {
        "token_prefix": t(prompts_embed[:, :1]),
        "token_suffix": t(prompts_embed[:, 1:]),
        "eot_idx": jnp.asarray(
            pl.tokenized_prompted.argmax(dim=-1).numpy().astype(np.int32)
        ),
    }

    images = _images()
    with torch.no_grad():
        img_feats = vis(torch.from_numpy(images))
        txt_feats = ref.text_encoder(prompts_embed, pl.tokenized_prompted)
        img_feats = img_feats / img_feats.norm(dim=-1, keepdim=True)
        txt_feats = txt_feats / txt_feats.norm(dim=-1, keepdim=True)
        ref_logits = (
            clip_model.logit_scale.exp() * img_feats @ txt_feats.t()
        ).numpy()

    ours = vpt_forward(
        trainable, frozen, aux, jnp.asarray(images.transpose(0, 2, 3, 1)),
        clip_cfg=clip_cfg, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_logits, **TOL)


def _head_from_ref(ln_pre, attn_block, ln_post, proj):
    return {
        "ln_pre": {"scale": t(ln_pre.weight), "bias": t(ln_pre.bias)},
        "block": {
            "ln_1": {"scale": t(attn_block.ln_1.weight), "bias": t(attn_block.ln_1.bias)},
            "attn": {
                "qkv_w": t(attn_block.attn.in_proj_weight).T,
                "qkv_b": t(attn_block.attn.in_proj_bias),
                "out_w": t(attn_block.attn.out_proj.weight).T,
                "out_b": t(attn_block.attn.out_proj.bias),
            },
            "ln_2": {"scale": t(attn_block.ln_2.weight), "bias": t(attn_block.ln_2.bias)},
            "mlp": {
                "fc_w": t(attn_block.mlp.c_fc.weight).T,
                "fc_b": t(attn_block.mlp.c_fc.bias),
                "proj_w": t(attn_block.mlp.c_proj.weight).T,
                "proj_b": t(attn_block.mlp.c_proj.bias),
            },
        },
        "ln_post": {"scale": t(ln_post.weight), "bias": t(ln_post.bias)},
        "proj": lin(proj),
    }


def test_umudpt_parity():
    cfg = _base_cfg("UMuDPT", N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=4,
                    PREC="fp32")
    torch, clip_mod, tmod = _setup("umudpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.umudpt_prompt_learner
    aux = _aux_from_learner(pl)
    trainable = {
        "ctx": t(pl.ctx),
        "deep_prompts": t(pl.deep_prompts),
        "t2v": _head_from_ref(pl.ln_pre, pl.self_attn, pl.ln_post, pl.visual_proj),
    }
    images = _images()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(images)).numpy()
    ours = umudpt_forward(
        trainable, frozen, aux, jnp.asarray(images.transpose(0, 2, 3, 1)),
        clip_cfg=clip_cfg, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_logits, **TOL)


def test_uumudpt_parity():
    cfg = _base_cfg("UUMuDPT", N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=4,
                    PREC="fp32")
    torch, clip_mod, tmod = _setup("uumudpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.uumudpt_prompt_learner
    vis = clip_model.visual
    aux = _aux_from_learner(pl)
    trainable = {
        "ctx": t(pl.ctx),
        "deep_prompts": t(pl.deep_prompts),
        "t2v": _head_from_ref(pl.ln_pre, pl.self_attn, pl.ln_post, pl.visual_proj),
        "visual_ctx": t(vis.visual_ctx),
        "visual_ctx_deep_prompts": t(vis.visual_ctx_deep_prompts),
        "v2t": _head_from_ref(
            vis.visual_ctx_ln_intra_pre,
            vis.visual_ctx_self_attn,
            vis.visual_ctx_ln_intra_post,
            vis.visual_ctx_text_proj,
        ),
    }
    images = _images()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(images)).numpy()
    ours = uumudpt_forward(
        trainable, frozen, aux, jnp.asarray(images.transpose(0, 2, 3, 1)),
        clip_cfg=clip_cfg, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_logits, **TOL)


@pytest.mark.parametrize("ctx_init", ["a photo of a", "an itap of"])
def test_coop_ctx_init_parity(ctx_init):
    """CTX_INIT (embedding-initialized context) parity — reference
    coop.py:50-58: n_ctx becomes the WORD count while the init slice is
    embedding positions 1..1+n_ctx, which are BPE TOKENS; when a word
    splits ('itap' -> multiple BPE tokens) the slice is deliberately
    misaligned with words, and our init must reproduce that exact quirk.
    Also pins our embed_classnames aux (prefix/suffix/eot) against the
    reference learner's buffers under a non-'X' prompt prefix, and the full
    logits with OUR-built aux."""
    from mudpt_tpu.trainers.prompt_utils import (
        ctx_vectors_from_init,
        embed_classnames,
    )

    n_ctx = len(ctx_init.split(" "))
    # N_CTX deliberately wrong in the cfg: the reference overrides it with
    # the word count when CTX_INIT is set
    cfg = _base_cfg("CoOp", N_CTX=16, CTX_INIT=ctx_init, PREC="fp32",
                    CSC=False, CLASS_TOKEN_POSITION="end")
    torch, clip_mod, tmod = _setup("coop", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=None)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()
    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.prompt_learner

    ours_ctx = ctx_vectors_from_init(frozen["text"], ctx_init, n_ctx)
    np.testing.assert_allclose(
        np.asarray(ours_ctx), pl.ctx.detach().numpy(), rtol=1e-6, atol=1e-6
    )

    aux_cls = embed_classnames(frozen["text"], CLASSNAMES, n_ctx, ctx_init)
    np.testing.assert_allclose(
        np.asarray(aux_cls.token_prefix), pl.token_prefix.numpy(),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(aux_cls.token_suffix), pl.token_suffix.numpy(),
        rtol=1e-6, atol=1e-6,
    )
    tokenized = getattr(  # the reference buffer name is typo'd (coop.py:96)
        pl, "tokenized_prompts", getattr(pl, "tokenized_prompted", None)
    )
    np.testing.assert_array_equal(
        np.asarray(aux_cls.eot_idx),
        tokenized.argmax(dim=-1).numpy().astype(np.int32),
    )

    images = _images()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(images)).numpy()
    tree = aux_cls.as_device_tree()
    ours = coop_forward(
        {"ctx": ours_ctx}, frozen, tree,
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        clip_cfg=clip_cfg, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_logits, **TOL)


def test_mpt_parity():
    """TRUE MPT (reference trainers/mpt.py CustomCLIP, not the VPT-block
    approximation): its TextPromptLearner owns a LEARNABLE layer-0 text
    context — a (n_ctx, 512) parameter deliberately named ``visual_ctx``
    for the freeze rule (mpt.py:77) — spliced CoOp-style between SOS and
    the classname suffix (construct_prompts, mpt.py:95-124), on top of the
    VPT-style per-block deep prompts in both towers."""
    cfg = _base_cfg(
        "MPT", DEEP_TEXT_N_CTX=2, DEEP_VISUAL_N_CTX=3, TEXT_PROMPT_DEPTH=2,
        VISUAL_PROMPT_DEPTH=2, TEXT_CTX_INIT="a photo of a", PREC="fp32",
    )
    torch, clip_mod, tmod = _setup("mpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    from mudpt_tpu.trainers.vpt import vpt_forward

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.text_prompt_learner
    vis = clip_model.visual
    trainable = {
        "ctx": t(pl.visual_ctx),  # the L0 text ctx (the name is the trick)
        "visual_ctx": t(vis.visual_ctx),
        "visual_deep_prompts": jnp.stack(
            [t(vis.transformer.resblocks[1].visual_ctx)]
        ),
        "text_deep_prompts": jnp.stack(
            [t(clip_model.transformer.resblocks[1].visual_ctx)]
        ),
    }
    aux = {
        "token_prefix": t(pl.token_prefix),
        "token_suffix": t(pl.token_suffix),
        "eot_idx": jnp.asarray(
            pl.tokenized_prompted.argmax(dim=-1).numpy().astype(np.int32)
        ),
    }

    images = _images()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(images)).numpy()
    ours = vpt_forward(
        trainable, frozen, aux, jnp.asarray(images.transpose(0, 2, 3, 1)),
        clip_cfg=clip_cfg, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_logits, **TOL)

    # our MPT trainer's own init reproduces the learner's ctx_init slice
    from mudpt_tpu.trainers.prompt_utils import ctx_vectors_from_init

    ours_ctx = ctx_vectors_from_init(frozen["text"], "a photo of a", 2)
    np.testing.assert_allclose(
        np.asarray(ours_ctx), pl.visual_ctx.detach().numpy(),
        rtol=1e-6, atol=1e-6,
    )
