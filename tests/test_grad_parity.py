"""Gradient-level oracle parity vs the reference's torch autograd.

The product of training IS the gradient: the reference's forward_backward
(reference trainers/mudpt.py:235-251) backprops cross-entropy into the
prompt pytree through the splice positions, the EOT gather, and the
cross-modal projections.  These tests run that exact computation on both
sides — torch ``loss.backward()`` collecting ``.grad`` of every trainable
prompt/projection param vs ``jax.grad`` of our loss w.r.t. the trainable
pytree — and compare leaf by leaf in fp32.

The Pallas blocks are forced ON (interpret mode on CPU) so the hand-written
custom-vjp dx path is what is being certified, under BOTH backward
strategies (save-acts and recompute).  A sign error that is self-consistent
between our two implementations would pass the forward-only parity tests;
it cannot pass these.

DEEP_PROMPT_DEPTH=2 on the 2-layer tiny model so every deep-prompt level is
actually spliced: a dropped splice-position gradient shows up as an exactly
zero leaf, which the nonzero assertion catches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mudpt_tpu.models import layers as L
from mudpt_tpu.ops import fused_block as FB
from mudpt_tpu.trainers.cocoop import cocoop_forward
from mudpt_tpu.trainers.coop import coop_forward
from mudpt_tpu.trainers.mudpt import mudpt_forward
from mudpt_tpu.trainers.umudpt import umudpt_forward
from mudpt_tpu.trainers.uumudpt import uumudpt_forward
from mudpt_tpu.trainers.vpt import vpt_forward

from tests.test_zoo_parity import (
    CLASSNAMES,
    _aux_from_learner,
    _backbone,
    _base_cfg,
    _images,
    _setup,
    _tiny_clip,
    t,
    lin,
)

GTOL = dict(rtol=1e-3, atol=2e-6)
LABELS = np.array([0, 2], dtype=np.int64)


@pytest.fixture(params=[True, False], ids=["save_acts", "recompute"],
                autouse=True)
def pallas_blocks(request):
    """Force the Pallas fused-block path (interpret mode on CPU) under both
    backward strategies, so the custom-vjp dx is what's certified."""
    prev_impl = L._BLOCK_IMPL
    prev_save = FB.save_acts_enabled()
    L.set_block_impl("pallas")
    FB.set_save_acts(request.param)
    yield
    L.set_block_impl(prev_impl)
    FB.set_save_acts(prev_save)


def g(param):
    """torch .grad -> numpy (fails loudly if the reference never produced
    a gradient for a param we train)."""
    assert param.grad is not None, "reference param received no gradient"
    return param.grad.detach().numpy()


def glin(module):
    return {"w": g(module.weight).T, "b": g(module.bias)}


def _torch_backward(torch, ref_model, images, trainable_params):
    """Reference forward_backward: CE(CustomCLIP(image), label).backward()
    (reference trainers/mudpt.py:235-251), grads collected on the prompt
    params only."""
    import torch.nn.functional as F

    for p in ref_model.parameters():
        p.requires_grad_(False)
    for p in trainable_params:
        p.requires_grad_(True)
        p.grad = None
    logits = ref_model(torch.from_numpy(images))
    loss = F.cross_entropy(logits, torch.from_numpy(LABELS))
    loss.backward()
    return float(loss.detach())


def _jax_loss_and_grads(forward, trainable, frozen, aux, images, clip_cfg):
    def loss_fn(tr):
        logits = forward(
            tr, frozen, aux, jnp.asarray(images.transpose(0, 2, 3, 1)),
            clip_cfg=clip_cfg, compute_dtype=jnp.float32,
        ).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(
            logp, jnp.asarray(LABELS)[:, None], axis=1
        ).mean()

    loss, grads = jax.value_and_grad(loss_fn)(trainable)
    return float(loss), grads


def _assert_grad_tree_close(ours, ref_tree):
    """Leaf-by-leaf comparison + the every-leaf-nonzero guard (a dropped
    splice-position gradient is an exactly-zero leaf on our side)."""
    flat_ours = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_tree)[0]
    assert [k for k, _ in flat_ours] == [k for k, _ in flat_ref]
    for (path, a), (_, b) in zip(flat_ours, flat_ref):
        name = jax.tree_util.keystr(path)
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        assert np.abs(b).max() > 1e-9, f"reference grad all-zero at {name}"
        assert np.abs(a).max() > 1e-9, f"our grad all-zero at {name}"
        np.testing.assert_allclose(a, b, err_msg=f"grad mismatch at {name}",
                                   **GTOL)


def _head_grads(ln_pre, attn_block, ln_post, proj):
    return {
        "ln_pre": {"scale": g(ln_pre.weight), "bias": g(ln_pre.bias)},
        "block": {
            "ln_1": {"scale": g(attn_block.ln_1.weight),
                     "bias": g(attn_block.ln_1.bias)},
            "attn": {
                "qkv_w": g(attn_block.attn.in_proj_weight).T,
                "qkv_b": g(attn_block.attn.in_proj_bias),
                "out_w": g(attn_block.attn.out_proj.weight).T,
                "out_b": g(attn_block.attn.out_proj.bias),
            },
            "ln_2": {"scale": g(attn_block.ln_2.weight),
                     "bias": g(attn_block.ln_2.bias)},
            "mlp": {
                "fc_w": g(attn_block.mlp.c_fc.weight).T,
                "fc_b": g(attn_block.mlp.c_fc.bias),
                "proj_w": g(attn_block.mlp.c_proj.weight).T,
                "proj_b": g(attn_block.mlp.c_proj.bias),
            },
        },
        "ln_post": {"scale": g(ln_post.weight), "bias": g(ln_post.bias)},
        "proj": glin(proj),
    }


def test_mudpt_grad_parity():
    cfg = _base_cfg("MuDPT", N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=2,
                    PREC="fp32")
    torch, clip_mod, tmod = _setup("mudpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.mudpt_prompt_learner
    ie = ref.image_encoder
    trainable = {
        "ctx": t(pl.ctx),
        "deep_prompts": t(pl.deep_prompts),
        "embed_projection": lin(pl.embed_projection),
        "deep_projections": lin(pl.deep_projections),
        "visual_ctx": t(ie.visual_ctx),
        "visual_ctx_deep_prompts": t(ie.visual_ctx_deep_prompts),
        "visual_ctx_deep_projections": lin(ie.visual_ctx_deep_projections),
    }
    aux = _aux_from_learner(pl)
    images = _images()

    # trainable set = 'prompt_learner' + 'visual_ctx' names
    # (reference trainers/mudpt.py:205-212)
    torch_params = [
        pl.ctx, pl.deep_prompts,
        pl.embed_projection.weight, pl.embed_projection.bias,
        pl.deep_projections.weight, pl.deep_projections.bias,
        ie.visual_ctx, ie.visual_ctx_deep_prompts,
        ie.visual_ctx_deep_projections.weight,
        ie.visual_ctx_deep_projections.bias,
    ]
    ref_loss = _torch_backward(torch, ref, images, torch_params)
    our_loss, grads = _jax_loss_and_grads(
        mudpt_forward, trainable, frozen, aux, images, clip_cfg
    )
    assert abs(ref_loss - our_loss) < 1e-4

    ref_grads = {
        "ctx": g(pl.ctx),
        "deep_prompts": g(pl.deep_prompts),
        "embed_projection": glin(pl.embed_projection),
        "deep_projections": glin(pl.deep_projections),
        "visual_ctx": g(ie.visual_ctx),
        "visual_ctx_deep_prompts": g(ie.visual_ctx_deep_prompts),
        "visual_ctx_deep_projections": glin(ie.visual_ctx_deep_projections),
    }
    _assert_grad_tree_close(grads, ref_grads)


@pytest.mark.parametrize("csc,position", [(False, "end"), (True, "end"),
                                           (False, "middle"), (False, "front")])
def test_coop_grad_parity(csc, position):
    """All three class-token positions: middle/front route ctx gradients
    through the per-class index-map gather (a dropped or misrouted splice
    gradient would differ from torch autograd here even though the forward
    parity test passes)."""
    cfg = _base_cfg("CoOp", N_CTX=4, CTX_INIT="", PREC="fp32", CSC=csc,
                    CLASS_TOKEN_POSITION=position)
    torch, clip_mod, tmod = _setup("coop", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=None)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.prompt_learner
    aux = _aux_from_learner(pl)
    from mudpt_tpu.trainers.prompt_utils import build_position_index_map

    idx = build_position_index_map(position, pl.name_lens, pl.n_ctx, 77)
    if idx is not None:
        aux["index_map"] = jnp.asarray(idx)
    trainable = {"ctx": t(pl.ctx)}
    images = _images()

    ref_loss = _torch_backward(torch, ref, images, [pl.ctx])
    our_loss, grads = _jax_loss_and_grads(
        coop_forward, trainable, frozen, aux, images, clip_cfg
    )
    assert abs(ref_loss - our_loss) < 1e-4
    _assert_grad_tree_close(grads, {"ctx": g(pl.ctx)})


def test_cocoop_grad_parity():
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

    torch_params = [
        pl.ctx,
        pl.meta_net.linear1.weight, pl.meta_net.linear1.bias,
        pl.meta_net.linear2.weight, pl.meta_net.linear2.bias,
    ]
    ref_loss = _torch_backward(torch, ref, images, torch_params)
    our_loss, grads = _jax_loss_and_grads(
        cocoop_forward, trainable, frozen, aux, images, clip_cfg
    )
    assert abs(ref_loss - our_loss) < 1e-4

    ref_grads = {
        "ctx": g(pl.ctx),
        "meta_net": {
            "linear1": glin(pl.meta_net.linear1),
            "linear2": glin(pl.meta_net.linear2),
        },
    }
    _assert_grad_tree_close(grads, ref_grads)


def test_umudpt_grad_parity():
    cfg = _base_cfg("UMuDPT", N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=2,
                    PREC="fp32")
    torch, clip_mod, tmod = _setup("umudpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.umudpt_prompt_learner
    aux = _aux_from_learner(pl)
    from tests.test_zoo_parity import _head_from_ref

    trainable = {
        "ctx": t(pl.ctx),
        "deep_prompts": t(pl.deep_prompts),
        "t2v": _head_from_ref(pl.ln_pre, pl.self_attn, pl.ln_post,
                              pl.visual_proj),
    }
    images = _images()

    # trainable set = 'prompt_learner' names only (reference
    # trainers/umudpt.py:252-255): ctx + deep prompts + the t2v
    # LightTransformer head; the ViT side has no prompt params of its own
    torch_params = [
        pl.ctx, pl.deep_prompts,
        pl.ln_pre.weight, pl.ln_pre.bias,
        pl.self_attn.ln_1.weight, pl.self_attn.ln_1.bias,
        pl.self_attn.attn.in_proj_weight, pl.self_attn.attn.in_proj_bias,
        pl.self_attn.attn.out_proj.weight, pl.self_attn.attn.out_proj.bias,
        pl.self_attn.ln_2.weight, pl.self_attn.ln_2.bias,
        pl.self_attn.mlp.c_fc.weight, pl.self_attn.mlp.c_fc.bias,
        pl.self_attn.mlp.c_proj.weight, pl.self_attn.mlp.c_proj.bias,
        pl.ln_post.weight, pl.ln_post.bias,
        pl.visual_proj.weight, pl.visual_proj.bias,
    ]
    ref_loss = _torch_backward(torch, ref, images, torch_params)
    our_loss, grads = _jax_loss_and_grads(
        umudpt_forward, trainable, frozen, aux, images, clip_cfg
    )
    assert abs(ref_loss - our_loss) < 1e-4

    ref_grads = {
        "ctx": g(pl.ctx),
        "deep_prompts": g(pl.deep_prompts),
        "t2v": _head_grads(pl.ln_pre, pl.self_attn, pl.ln_post,
                           pl.visual_proj),
    }
    _assert_grad_tree_close(grads, ref_grads)


def test_vpt_mpt_grad_parity():
    """The MPT configuration (text AND visual prompts enabled) — the
    reference trainable rule is any name containing 'visual_ctx'
    (vpt.py:141-144, mpt.py:196-202), which selects the ViT-owned layer-0
    prompt plus the per-block params on BOTH towers (text-layer prompts are
    also named visual_ctx — SURVEY.md §2.3).  The reference CustomCLIP
    forward is reproduced minus the TextPromptLearner .cuda() bug
    (vpt.py:69), exactly as in the forward-parity test."""
    import torch.nn.functional as F

    cfg = _base_cfg(
        "VPT", DEEP_TEXT_N_CTX=2, DEEP_VISUAL_N_CTX=3, TEXT_PROMPT_DEPTH=2,
        VISUAL_PROMPT_DEPTH=2, TEXT_CTX_INIT="a photo of a", PREC="fp32",
    )
    torch, clip_mod, tmod = _setup("vpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()
    prompts_embed = ref.text_prompt_learner.prompts

    clip_cfg, frozen = _backbone(clip_model)
    vis = clip_model.visual
    vis_blk_ctx = vis.transformer.resblocks[1].visual_ctx
    text_blk_ctx = clip_model.transformer.resblocks[1].visual_ctx
    trainable = {
        "visual_ctx": t(vis.visual_ctx),
        "visual_deep_prompts": jnp.stack([t(vis_blk_ctx)]),
        "text_deep_prompts": jnp.stack([t(text_blk_ctx)]),
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

    torch_params = [vis.visual_ctx, vis_blk_ctx, text_blk_ctx]
    for p in ref.parameters():
        p.requires_grad_(False)
    for p in torch_params:
        p.requires_grad_(True)
        p.grad = None
    img_feats = vis(torch.from_numpy(images))
    txt_feats = ref.text_encoder(prompts_embed, pl.tokenized_prompted)
    img_feats = img_feats / img_feats.norm(dim=-1, keepdim=True)
    txt_feats = txt_feats / txt_feats.norm(dim=-1, keepdim=True)
    logits = clip_model.logit_scale.exp() * img_feats @ txt_feats.t()
    loss = F.cross_entropy(logits, torch.from_numpy(LABELS))
    loss.backward()
    ref_loss = float(loss.detach())

    our_loss, grads = _jax_loss_and_grads(
        vpt_forward, trainable, frozen, aux, images, clip_cfg
    )
    assert abs(ref_loss - our_loss) < 1e-4

    ref_grads = {
        "visual_ctx": g(vis.visual_ctx),
        "visual_deep_prompts": np.stack([g(vis_blk_ctx)]),
        "text_deep_prompts": np.stack([g(text_blk_ctx)]),
    }
    _assert_grad_tree_close(grads, ref_grads)


def test_uumudpt_grad_parity():
    cfg = _base_cfg("UUMuDPT", N_CTX=2, CTX_INIT="", DEEP_PROMPT_DEPTH=2,
                    PREC="fp32")
    torch, clip_mod, tmod = _setup("uumudpt", cfg)
    clip_model = _tiny_clip(clip_mod, cfg=cfg)
    ref = tmod.CustomCLIP(cfg, CLASSNAMES, clip_model).float().eval()

    clip_cfg, frozen = _backbone(clip_model)
    pl = ref.uumudpt_prompt_learner
    vis = clip_model.visual
    aux = _aux_from_learner(pl)
    from tests.test_zoo_parity import _head_from_ref

    trainable = {
        "ctx": t(pl.ctx),
        "deep_prompts": t(pl.deep_prompts),
        "t2v": _head_from_ref(pl.ln_pre, pl.self_attn, pl.ln_post,
                              pl.visual_proj),
        "visual_ctx": t(vis.visual_ctx),
        "visual_ctx_deep_prompts": t(vis.visual_ctx_deep_prompts),
        "v2t": _head_from_ref(
            vis.visual_ctx_ln_intra_pre, vis.visual_ctx_self_attn,
            vis.visual_ctx_ln_intra_post, vis.visual_ctx_text_proj,
        ),
    }
    images = _images()

    def head_params(ln_pre, blk, ln_post, proj):
        return [
            ln_pre.weight, ln_pre.bias,
            blk.ln_1.weight, blk.ln_1.bias,
            blk.attn.in_proj_weight, blk.attn.in_proj_bias,
            blk.attn.out_proj.weight, blk.attn.out_proj.bias,
            blk.ln_2.weight, blk.ln_2.bias,
            blk.mlp.c_fc.weight, blk.mlp.c_fc.bias,
            blk.mlp.c_proj.weight, blk.mlp.c_proj.bias,
            ln_post.weight, ln_post.bias,
            proj.weight, proj.bias,
        ]

    # trainable set = 'prompt_learner' + 'visual_ctx*' names
    # (reference trainers/uumudpt.py:255-261)
    torch_params = (
        [pl.ctx, pl.deep_prompts, vis.visual_ctx, vis.visual_ctx_deep_prompts]
        + head_params(pl.ln_pre, pl.self_attn, pl.ln_post, pl.visual_proj)
        + head_params(
            vis.visual_ctx_ln_intra_pre, vis.visual_ctx_self_attn,
            vis.visual_ctx_ln_intra_post, vis.visual_ctx_text_proj,
        )
    )
    ref_loss = _torch_backward(torch, ref, images, torch_params)
    our_loss, grads = _jax_loss_and_grads(
        uumudpt_forward, trainable, frozen, aux, images, clip_cfg
    )
    assert abs(ref_loss - our_loss) < 1e-4

    ref_grads = {
        "ctx": g(pl.ctx),
        "deep_prompts": g(pl.deep_prompts),
        "t2v": _head_grads(pl.ln_pre, pl.self_attn, pl.ln_post,
                           pl.visual_proj),
        "visual_ctx": g(vis.visual_ctx),
        "visual_ctx_deep_prompts": g(vis.visual_ctx_deep_prompts),
        "v2t": _head_grads(
            vis.visual_ctx_ln_intra_pre, vis.visual_ctx_self_attn,
            vis.visual_ctx_ln_intra_post, vis.visual_ctx_text_proj,
        ),
    }
    _assert_grad_tree_close(grads, ref_grads)
