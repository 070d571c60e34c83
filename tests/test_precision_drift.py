"""fp32 vs bf16 drift through the full CLIP forward.

Real-checkpoint accuracy validation is environment-blocked (no network, no
cached OpenAI weights — docs/STATUS.md), so this pins the MECHANISM risk
instead: with reference-scheme weight magnitudes, the bf16 compute path
(what the TPU runs for PREC fp16/amp, docs/PARITY.md) must track the fp32
path closely enough that ranking decisions survive.  This bounds our own
fp32->bf16 drift, not the reference's fp16->bf16 delta — that one needs
real weights and stays the top documented risk.
"""

import numpy as np

import jax.numpy as jnp

from mudpt_tpu.models.clip import (
    CLIPConfig,
    cast_matmul_weights,
    clip_forward,
    init_clip_params,
)
from mudpt_tpu.utils.rng import new_rng

MID = CLIPConfig(
    embed_dim=128,
    image_resolution=64,
    vision_layers=6,
    vision_width=192,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    transformer_width=128,
    transformer_heads=2,
    transformer_layers=6,
)


def test_bf16_forward_tracks_fp32():
    params = init_clip_params(new_rng(0), MID)
    rng = np.random.RandomState(0)
    B, n_cls = 32, 16
    images = jnp.asarray(rng.randn(B, 64, 64, 3), jnp.float32)
    texts = np.full((n_cls, 77), 0, np.int32)
    texts[:, 0] = 49406  # SOT
    for i in range(n_cls):
        texts[i, 1 : 1 + 4] = rng.randint(1, 49000, 4)
        texts[i, 5] = 49407  # EOT
    texts = jnp.asarray(texts)

    logits32, _ = clip_forward(
        params, images, texts, MID, compute_dtype=jnp.float32
    )
    p16 = cast_matmul_weights(params, jnp.bfloat16)
    logits16, _ = clip_forward(
        p16, images, texts, MID, compute_dtype=jnp.bfloat16
    )
    a = np.asarray(logits32, np.float64)
    b = np.asarray(logits16, np.float64)

    # logits are logit_scale * cosine similarities: absolute agreement
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 0.05, f"bf16 drift too large: {rel:.4f}"

    # ranking: every top-1 whose fp32 margin exceeds the drift band must
    # survive the precision drop.  (A blanket agreement bound is weak here
    # by construction: random weights give near-degenerate cosine margins,
    # so flips concentrate inside the drift band — real CLIP class margins
    # are far larger.)
    top32, top16 = a.argmax(-1), b.argmax(-1)
    agree = float((top32 == top16).mean())
    sorted32 = np.sort(a, axis=-1)
    margin = sorted32[:, -1] - sorted32[:, -2]
    decisive = margin > np.abs(a - b).max()
    assert decisive.sum() >= B // 2, "margins too degenerate to test"
    assert (top32[decisive] == top16[decisive]).all()
    assert agree >= 0.75, f"top-1 agreement {agree:.2f}"
