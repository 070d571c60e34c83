"""Numerical parity: our JAX CLIP vs the reference PyTorch CLIP.

Random-weight torch models are built from the reference source (the
executable spec), their state dicts converted with our converter, and both
sides evaluated on identical inputs.  This pins the whole encode path —
patchify, pre-LN blocks, QuickGELU, fp32 LayerNorm, causal mask, EOT gather,
projections — and the prompt-splice semantics of the MuDPT block variants.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mudpt_tpu.models.clip import encode_image, encode_text, clip_forward
from mudpt_tpu.models.convert import torch_state_dict_to_jax, _stack_blocks, _to_numpy
from mudpt_tpu.models.transformer import (
    make_injection_schedule,
    transformer_forward,
    splice_text,
    splice_visual,
)
from mudpt_tpu.models.text import causal_mask

from tests.reference_oracle import import_reference_clip

TOL = dict(rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def torch_mod():
    import torch

    torch.manual_seed(0)
    return torch


@pytest.fixture(scope="module")
def ref_clip(torch_mod):
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
    return model


def test_clip_forward_parity(ref_clip, torch_mod):
    torch = torch_mod
    cfg, params = torch_state_dict_to_jax(ref_clip.state_dict())
    assert cfg.vision_width == 64 and cfg.transformer_layers == 2

    rng = np.random.RandomState(0)
    images = rng.randn(3, 3, 32, 32).astype(np.float32)
    tokens = np.zeros((4, 16), dtype=np.int64)
    for i in range(4):
        n = rng.randint(3, 10)
        tokens[i, 0] = 999  # SOT-ish
        tokens[i, 1:n] = rng.randint(1, 900, n - 1)
        tokens[i, n] = 999  # EOT = max id in row

    with torch.no_grad():
        ref_img = ref_clip.encode_image(torch.from_numpy(images)).numpy()
        ref_txt = ref_clip.encode_text(torch.from_numpy(tokens)).numpy()
        ref_li, ref_lt = ref_clip(torch.from_numpy(images), torch.from_numpy(tokens))

    # our layout is NHWC
    img_nhwc = jnp.asarray(images.transpose(0, 2, 3, 1))
    ours_img = np.asarray(encode_image(params, img_nhwc, cfg))
    ours_txt = np.asarray(encode_text(params, jnp.asarray(tokens, jnp.int32), cfg))

    np.testing.assert_allclose(ours_img, ref_img, **TOL)
    np.testing.assert_allclose(ours_txt, ref_txt, **TOL)

    li, lt = clip_forward(params, img_nhwc, jnp.asarray(tokens, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(li), ref_li.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lt), ref_lt.numpy(), rtol=2e-3, atol=2e-3)


def _mudpt_cfg(mod, n_ctx):
    """Minimal config object for the reference MuDPT block variants."""
    from yacs.config import CfgNode  # the stub installed by reference_oracle

    cfg = CfgNode()
    cfg.TRAINER = CfgNode()
    cfg.TRAINER.NAME = "MuDPT"
    cfg.TRAINER.MUDPT = CfgNode()
    cfg.TRAINER.MUDPT.N_CTX = n_ctx
    return cfg


@pytest.mark.parametrize("is_text", [False, True])
@pytest.mark.parametrize(
    "depth,n_ctx",
    [
        (1, 2),   # no deep prompts at all
        (3, 2),   # interior depth
        (5, 2),   # depth > n_layers: surplus prompt rows are ignored
        (4, 2),   # depth == n_layers: EVERY non-zero layer splices
        (3, 4),   # wider splice window (text 1..1+n_ctx, visual tail-4)
        (4, 4),   # both boundaries at once
    ],
)
def test_mudpt_prompt_splicing_parity(torch_mod, is_text, depth, n_ctx):
    """Reference ResidualAttentionBlock_MuDPT threading (clip/model.py:275-301)
    vs our scan + injection schedule, across prompt depth / n_ctx combos
    including the boundaries (depth == n_layers, depth > n_layers)."""
    torch = torch_mod
    mod = import_reference_clip()
    width, heads, layers = 64, 2, 4
    cfg = _mudpt_cfg(mod, n_ctx)

    mask_t = None
    mask_j = None
    seq = 10
    if is_text:
        mask_t = torch.full((seq, seq), float("-inf")).triu_(1)
        mask_j = causal_mask(seq)

    torch.manual_seed(depth)
    ref_tf = mod.Transformer(
        width, layers, heads, attn_mask=mask_t, is_text_layer=is_text, cfg=cfg
    ).eval()

    blocks = _stack_blocks(
        {k: _to_numpy(v) for k, v in ref_tf.state_dict().items()},
        "resblocks",
        layers,
    )
    blocks = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in blocks.items()}

    rng = np.random.RandomState(depth)
    x = rng.randn(3, seq, width).astype(np.float32)
    deep = rng.randn(depth - 1, n_ctx, width).astype(np.float32)

    with torch.no_grad():
        out_ref = ref_tf(
            [torch.from_numpy(x).permute(1, 0, 2), torch.from_numpy(deep), 0]
        )[0].permute(1, 0, 2).numpy()

    deep_j = jnp.asarray(deep) if depth > 1 else None
    prompts, pmask = make_injection_schedule(layers, deep_j)
    ours = transformer_forward(
        blocks,
        jnp.asarray(x),
        n_head=heads,
        mask=mask_j,
        prompts=prompts,
        prompt_mask=pmask,
        n_ctx=n_ctx,
        is_text=is_text,
    )
    np.testing.assert_allclose(np.asarray(ours), out_ref, **TOL)


def test_splice_shapes():
    x = jnp.zeros((2, 10, 8))
    p = jnp.ones((3, 8))
    st = splice_text(x, p, 3)
    sv = splice_visual(x, p, 3)
    assert st.shape == x.shape and sv.shape == x.shape
    assert (np.asarray(st[:, 1:4]) == 1).all() and (np.asarray(st[:, 0]) == 0).all()
    assert (np.asarray(sv[:, -3:]) == 1).all() and (np.asarray(sv[:, :7]) == 0).all()


@pytest.mark.parametrize("is_text", [False, True])
def test_rolled_scan_matches_unrolled(torch_mod, is_text):
    """MUDPT_TPU_SCAN_UNROLL=1 (rolled lax.scan, the select-based injection
    schedule) must match the default fully-unrolled path (Python-branch
    injection) bit-meaningfully — WITH deep prompts spliced, where the two
    code paths differ most.  Every other test runs the unrolled default, so
    this is the rolled knob's only equivalence pin."""
    from mudpt_tpu.models import transformer as T

    mod = import_reference_clip()
    torch = torch_mod
    width, heads, layers, n_ctx, depth, seq = 64, 2, 4, 2, 3, 10
    cfg = _mudpt_cfg(mod, n_ctx)
    torch.manual_seed(0)
    ref_tf = mod.Transformer(width, layers, heads, attn_mask=None,
                             is_text_layer=is_text, cfg=cfg).eval()
    blocks = _stack_blocks(
        {k: _to_numpy(v) for k, v in ref_tf.state_dict().items()},
        "resblocks", layers,
    )
    blocks = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in blocks.items()}
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, seq, width).astype(np.float32))
    deep = jnp.asarray(rng.randn(depth - 1, n_ctx, width).astype(np.float32))
    prompts, pmask = make_injection_schedule(layers, deep)
    mask = causal_mask(seq) if is_text else None

    def run():
        return np.asarray(transformer_forward(
            blocks, x, n_head=heads, mask=mask, prompts=prompts,
            prompt_mask=pmask, n_ctx=n_ctx, is_text=is_text,
        ))

    unrolled = run()
    prev = T._SCAN_UNROLL
    T._SCAN_UNROLL = "1"
    try:
        rolled = run()
    finally:
        T._SCAN_UNROLL = prev
    np.testing.assert_allclose(rolled, unrolled, rtol=1e-6, atol=1e-6)
