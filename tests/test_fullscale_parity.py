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

pytestmark = __import__('pytest').mark.slow  # measured multi-minute module

import numpy as np
import pytest

import jax.numpy as jnp

from mudpt_tpu.models.clip import cast_matmul_weights, clip_forward
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


@pytest.fixture(scope="module")
def zeroshot_fullscale(torch_mods):
    """Full-scale plain CLIP + transplanted JAX params + reference fp32
    logits, shared by the fp32- and bf16-path zeroshot tests."""
    torch, clip_mod, _ = torch_mods
    torch.manual_seed(5)
    ref = clip_mod.CLIP(**B16, cfg=None).float().eval()

    clip_cfg, params = torch_state_dict_to_jax(ref.state_dict())
    assert clip_cfg.vision_width == 768 and clip_cfg.transformer_heads == 8

    prompts = [f"a photo of a {c}." for c in CLASSNAMES]
    tokens = tokenize(prompts)
    images = _images(b=4)

    with torch.no_grad():
        ref_logits, _ = ref(
            torch.from_numpy(images), torch.from_numpy(tokens.astype(np.int64))
        )
        ref_logits = ref_logits.numpy()
    return clip_cfg, params, tokens, images, ref_logits


def test_fullscale_zeroshot_parity(zeroshot_fullscale):
    """Zero-shot logits at full scale: encode_image + encode_text + cosine
    head vs the reference CLIP.forward (clip/model.py:840-854)."""
    clip_cfg, params, tokens, images, ref_logits = zeroshot_fullscale

    ours, _ = clip_forward(
        params, jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(tokens), clip_cfg, compute_dtype=jnp.float32,
    )
    ours = np.asarray(ours)
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-3, atol=1e-3)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()


def test_fullscale_bf16_drift_vs_reference(zeroshot_fullscale):
    """The TPU production path (bf16 matmul weights + bf16 compute,
    fp32 LayerNorm — what `PREC: fp16` runs, docs/PARITY.md) against the
    REFERENCE's fp32 logits at full scale.  test_precision_drift.py bounds
    bf16 drift against our own fp32; this bounds it against the oracle, so
    a bf16-path-only bug (a cast placed before a LayerNorm, a bf16
    accumulation where fp32 is required) that tracked our own fp32 path
    could not hide.  Calibrated drift at these shapes: ~1.2% of the logit
    scale; bound at 5%.  Ranking: every top-1 whose reference margin
    exceeds the observed drift band must survive."""
    clip_cfg, params, tokens, images, ref_logits = zeroshot_fullscale

    p16 = cast_matmul_weights(params, jnp.bfloat16)
    ours16, _ = clip_forward(
        p16, jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(tokens), clip_cfg, compute_dtype=jnp.bfloat16,
    )
    a = np.asarray(ref_logits, np.float64)
    b = np.asarray(ours16, np.float64)

    band = np.abs(a - b).max()
    rel = band / np.abs(a).max()
    assert rel < 0.05, f"bf16-vs-reference drift too large: {rel:.4f}"

    sorted_ref = np.sort(a, axis=-1)
    margin = sorted_ref[:, -1] - sorted_ref[:, -2]
    decisive = margin > band
    assert decisive.sum() >= len(a) // 2, "margins too degenerate to test"
    assert (a.argmax(-1)[decisive] == b.argmax(-1)[decisive]).all()


def test_fullscale_int8_drift_vs_reference(zeroshot_fullscale, monkeypatch):
    """The int8 W8A8 serving tier (ops/quant_block.py, Pallas interpret
    mode) against the REFERENCE's fp32 logits at full scale: 12 layers of
    per-layer ~1% quantization error compound here, so this bounds the
    end-task drift of the whole quantized forward, not one block.
    Calibrated drift at these shapes (random-init weights): ~4.1% of the
    logit scale; bound at 10%.  Every top-1 whose reference margin
    exceeds the observed drift band must survive quantization (measured:
    3/4 rows decisive, all survive)."""
    from mudpt_tpu.models import layers as L

    clip_cfg, params, tokens, images, ref_logits = zeroshot_fullscale

    monkeypatch.setattr(L, "_BLOCK_IMPL", "pallas")
    monkeypatch.setattr(L, "_QUANT_MODE", "int8")
    p16 = cast_matmul_weights(params, jnp.bfloat16)
    ours_q8, _ = clip_forward(
        p16, jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(tokens), clip_cfg, compute_dtype=jnp.bfloat16,
    )
    a = np.asarray(ref_logits, np.float64)
    b = np.asarray(ours_q8, np.float64)

    band = np.abs(a - b).max()
    rel = band / np.abs(a).max()
    assert rel < 0.10, f"int8-vs-reference drift too large: {rel:.4f}"

    sorted_ref = np.sort(a, axis=-1)
    margin = sorted_ref[:, -1] - sorted_ref[:, -2]
    decisive = margin > band
    assert (a.argmax(-1)[decisive] == b.argmax(-1)[decisive]).all()


@pytest.fixture(scope="module")
def mudpt_fullscale(torch_mods):
    """Full-scale MuDPT CustomCLIP (depth 9, n_ctx 2) + the transplanted
    JAX trees, shared by the forward- and gradient-parity tests (building
    the 12-layer model twice would double the test cost)."""
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
    return ref, clip_cfg, frozen, trainable, aux


def test_fullscale_mudpt_parity(torch_mods, mudpt_fullscale):
    """MuDPT CustomCLIP at full scale (depth 9, n_ctx 2): bidirectional
    coupling + deep splices over 199-token visual / 77-token text sequences
    with 12-head reshapes (reference trainers/mudpt.py:117-184)."""
    torch, _, _ = torch_mods
    ref, clip_cfg, frozen, trainable, aux = mudpt_fullscale

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


def test_fullscale_mudpt_grad_parity(torch_mods, mudpt_fullscale):
    """Gradient parity at FULL scale: torch loss.backward() grads of every
    trainable MuDPT leaf (reference trainers/mudpt.py:235-251 semantics) vs
    jax.grad through real 12-head/768-wide towers and 199/77-token
    sequences.  The tiny-scale test_grad_parity.py certifies the math and
    the Pallas custom-vjp; this certifies the gradient path at the shapes
    training actually uses (12-head attention reshape transposes, depth-9
    splice schedule, full-vocab EOT gathers)."""
    torch, _, _ = torch_mods
    from tests.test_grad_parity import (
        LABELS,
        _assert_grad_tree_close,
        _jax_loss_and_grads,
        _torch_backward,
        g,
        glin,
    )

    ref, clip_cfg, frozen, trainable, aux = mudpt_fullscale
    pl = ref.mudpt_prompt_learner
    ie = ref.image_encoder
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


L14 = dict(
    embed_dim=768, image_resolution=224, vision_layers=24, vision_width=1024,
    vision_patch_size=14, context_length=77, vocab_size=49408,
    transformer_width=768, transformer_heads=12, transformer_layers=12,
)


def test_fullscale_vitl14_zeroshot_parity(torch_mods, monkeypatch):
    """ViT-L/14 at real dims (24 layers, width 1024, 16 vision heads,
    patch 14 -> 257-token sequences; 12-head/768-wide text tower,
    reference clip/model.py:885-904 shape inference).  The ViT-L TPU bench
    row (docs/BENCHMARKS.md) runs these exact shapes; this is their oracle
    evidence: converter transposes, 16-head reshapes and the wider
    embed_dim certified against the reference, fp32 AND the bf16
    production path."""
    # roll the layer scan for this test only: XLA-CPU compile of 2x24
    # unrolled 1024-wide layers dominates the test's runtime (~11 min
    # unrolled); rolled-vs-unrolled equivalence (incl. prompt injection)
    # is pinned by test_model_parity.py::test_rolled_scan_matches_unrolled,
    # and running the ROLLED path against the oracle here gives the scan
    # path its own full-scale oracle coverage.
    from mudpt_tpu.models import transformer as _T

    monkeypatch.setattr(_T, "_SCAN_UNROLL", "1")

    torch, clip_mod, _ = torch_mods
    torch.manual_seed(7)
    ref = clip_mod.CLIP(**L14, cfg=None).float().eval()

    clip_cfg, params = torch_state_dict_to_jax(ref.state_dict())
    assert clip_cfg.vision_width == 1024 and clip_cfg.vision_layers == 24
    assert clip_cfg.vision_patch_size == 14 and clip_cfg.embed_dim == 768

    # b=1 / 3 classes: this test is execution-bound (one 1/8-host-threads
    # virtual device runs a 24-layer 1024-wide model 4 times across the
    # fp32 + bf16 legs); batch size adds nothing to shape coverage here
    prompts = [f"a photo of a {c}." for c in CLASSNAMES[:3]]
    tokens = tokenize(prompts)
    images = _images(b=1)

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

    # bf16 production path at L scale (same bound rationale as
    # test_fullscale_bf16_drift_vs_reference)
    p16 = cast_matmul_weights(params, jnp.bfloat16)
    ours16, _ = clip_forward(
        p16, jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(tokens), clip_cfg, compute_dtype=jnp.bfloat16,
    )
    a = np.asarray(ref_logits, np.float64)
    b = np.asarray(ours16, np.float64)
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 0.05, f"bf16-vs-reference drift too large at L/14: {rel:.4f}"


def test_fullscale_int8_static_drift_vs_reference(zeroshot_fullscale, monkeypatch):
    """The CALIBRATED static-scale int8 tier at full scale, against the
    reference's fp32 logits: per-tensor activation scales are coarser
    than the dynamic tier's per-row scales, so the bound is looser (the
    dynamic tier pins 10%); margin-decisive top-1 rows must still
    survive.  Scales are calibrated on the test batch itself — the
    in-distribution case an exported artifact's calibration set models."""
    from mudpt_tpu.models import layers as L
    from mudpt_tpu.ops import quant_block as QB

    clip_cfg, params, tokens, images, ref_logits = zeroshot_fullscale
    p16 = cast_matmul_weights(params, jnp.bfloat16)
    imgs = jnp.asarray(images.transpose(0, 2, 3, 1))
    toks = jnp.asarray(tokens)

    scales = QB.calibrate(
        lambda im, tk: clip_forward(
            p16, im, tk, clip_cfg, compute_dtype=jnp.bfloat16
        )[0],
        imgs, toks,
    )
    nv, nt = clip_cfg.vision_layers, clip_cfg.transformer_layers
    assert scales.shape == (nv + nt, 4)  # visual tower traces first
    p16s = dict(
        p16,
        visual=dict(
            p16["visual"],
            blocks=QB.attach_scales(p16["visual"]["blocks"], scales[:nv]),
        ),
        text=dict(
            p16["text"],
            blocks=QB.attach_scales(p16["text"]["blocks"], scales[nv:]),
        ),
    )

    monkeypatch.setattr(L, "_BLOCK_IMPL", "pallas")
    monkeypatch.setattr(L, "_QUANT_MODE", "int8_static")
    ours, _ = clip_forward(
        p16s, imgs, toks, clip_cfg, compute_dtype=jnp.bfloat16
    )
    a = np.asarray(ref_logits, np.float64)
    b = np.asarray(ours, np.float64)

    band = np.abs(a - b).max()
    rel = band / np.abs(a).max()
    assert rel < 0.15, f"static-int8-vs-reference drift too large: {rel:.4f}"

    sorted_ref = np.sort(a, axis=-1)
    margin = sorted_ref[:, -1] - sorted_ref[:, -2]
    decisive = margin > band
    assert (a.argmax(-1)[decisive] == b.argmax(-1)[decisive]).all()
