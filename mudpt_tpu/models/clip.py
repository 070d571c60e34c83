"""CLIP model: config, parameter initialization, and forward functions.

The parameter tree is a nested dict of arrays:

  params = {
    "visual": {patch_w, class_embedding, pos_embedding, ln_pre, blocks,
               ln_post, proj},
    "text":   {token_embedding, pos_embedding, blocks, ln_final, projection},
    "logit_scale": scalar,
  }

with ``blocks`` stacked on a leading layer axis (see transformer.py).
Random initialization reproduces the reference's ``initialize_parameters``
(clip/model.py:781-808); checkpoint loading goes through convert.py with the
same shape-inference rules as the reference ``build_model``
(clip/model.py:881-921).

Precision: :func:`cast_matmul_weights` mirrors ``convert_weights``
(clip/model.py:857-878) — only matmul/conv/attention weights and the two
projections change dtype; LayerNorm params and embeddings stay float32, and
LayerNorm always computes in fp32 (layers.py).  On TPU the reduced dtype is
bfloat16 (the fp16<->bf16 drift is absorbed by the parity budget; see
SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 16
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # RN-family checkpoints: "resnet" with per-stage block counts
    # (architecture inference rules of reference clip/model.py:892-898)
    vision_arch: str = "vit"
    vision_layers_per_stage: tuple = ()

    @property
    def vision_heads(self) -> int:
        if self.vision_arch == "resnet":
            return self.vision_width * 32 // 64
        return self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @property
    def vision_seq_len(self) -> int:
        return self.grid_size ** 2 + 1


VIT_B16 = CLIPConfig()
VIT_B32 = CLIPConfig(vision_patch_size=32)
VIT_L14 = CLIPConfig(
    embed_dim=768, vision_layers=24, vision_width=1024, vision_patch_size=14,
    transformer_width=768, transformer_heads=12, transformer_layers=12,
)
# RN-family presets (reference clip/clip.py:31-41 ships RN50/RN101 too;
# dims per the shape-inference rules of clip/model.py:892-898).  These give
# PATH='random' (no-network) runs an RN tower; real checkpoints infer their
# architecture from the state dict (models/convert.infer_config).
RN50 = CLIPConfig(
    embed_dim=1024, vision_layers=16, vision_width=64, vision_patch_size=0,
    vision_arch="resnet", vision_layers_per_stage=(3, 4, 6, 3),
)
RN101 = CLIPConfig(
    embed_dim=512, vision_layers=33, vision_width=64, vision_patch_size=0,
    vision_arch="resnet", vision_layers_per_stage=(3, 4, 23, 3),
)
# EfficientNet-style scaled RN models (reference clip/clip.py:31-41 ships
# all five RN checkpoints).  Dims follow the published OpenAI checkpoints:
# width/resolution/stage scaling plus a matched text tower (the shape
# inference of clip/model.py:892-911 recovers exactly these from the .pt).
RN50X4 = CLIPConfig(
    embed_dim=640, image_resolution=288, vision_layers=26, vision_width=80,
    vision_patch_size=0, vision_arch="resnet",
    vision_layers_per_stage=(4, 6, 10, 6),
    transformer_width=640, transformer_heads=10,
)
RN50X16 = CLIPConfig(
    embed_dim=768, image_resolution=384, vision_layers=40, vision_width=96,
    vision_patch_size=0, vision_arch="resnet",
    vision_layers_per_stage=(6, 8, 18, 8),
    transformer_width=768, transformer_heads=12,
)
RN50X64 = CLIPConfig(
    embed_dim=1024, image_resolution=448, vision_layers=64, vision_width=128,
    vision_patch_size=0, vision_arch="resnet",
    vision_layers_per_stage=(3, 15, 36, 10),
    transformer_width=1024, transformer_heads=16,
)


def _init_block_stack(key, layers: int, width: int) -> dict:
    """Stacked residual blocks with the reference init scheme
    (clip/model.py:800-806): attn in-proj std w^-0.5, out-proj and mlp proj
    std (w^-0.5)(2L)^-0.5, fc std (2w)^-0.5; biases zero, LN unit/zero."""
    k = jax.random.split(key, 4)
    attn_std = width ** -0.5
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    return {
        "ln_1": {"scale": jnp.ones((layers, width)), "bias": jnp.zeros((layers, width))},
        "attn": {
            "qkv_w": jax.random.normal(k[0], (layers, width, 3 * width)) * attn_std,
            "qkv_b": jnp.zeros((layers, 3 * width)),
            "out_w": jax.random.normal(k[1], (layers, width, width)) * proj_std,
            "out_b": jnp.zeros((layers, width)),
        },
        "ln_2": {"scale": jnp.ones((layers, width)), "bias": jnp.zeros((layers, width))},
        "mlp": {
            "fc_w": jax.random.normal(k[2], (layers, width, 4 * width)) * fc_std,
            "fc_b": jnp.zeros((layers, 4 * width)),
            "proj_w": jax.random.normal(k[3], (layers, 4 * width, width)) * proj_std,
            "proj_b": jnp.zeros((layers, width)),
        },
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_clip_params(key: jax.Array, cfg: CLIPConfig = VIT_B16) -> dict:
    """Random init (jitted into ONE device program: per-op dispatch over a
    remote device link would otherwise dominate startup)."""
    return _init_clip_params(key, cfg)


def _init_resnet_visual(key: jax.Array, cfg: CLIPConfig) -> dict:
    """Random ModifiedResNet params in the converter's layout
    (models/resnet.convert_resnet_visual): torch-default conv/linear
    bounds, unit BN statistics.  For PATH='random' smoke/bench runs —
    real RN weights come through the checkpoint converter."""
    w = cfg.vision_width
    C = w * 32  # attnpool embed dim (reference clip/model.py:36-43 stages)
    keys = iter(jax.random.split(key, 8 + 10 * sum(cfg.vision_layers_per_stage)))

    def conv(kk, cin, cout):
        bound = (kk * kk * cin) ** -0.5
        return jax.random.uniform(
            next(keys), (kk, kk, cin, cout), minval=-bound, maxval=bound
        )

    def bn(ch):
        return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,)),
                "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}

    def lin(din, dout):
        bound = din ** -0.5
        kw, kb = jax.random.split(next(keys))
        return {
            "w": jax.random.uniform(kw, (din, dout), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (dout,), minval=-bound, maxval=bound),
        }

    p = {
        "conv1": conv(3, 3, w // 2), "bn1": bn(w // 2),
        "conv2": conv(3, w // 2, w // 2), "bn2": bn(w // 2),
        "conv3": conv(3, w // 2, w), "bn3": bn(w),
    }
    inplanes = w
    for s, blocks in enumerate(cfg.vision_layers_per_stage, start=1):
        planes = w * (2 ** (s - 1))
        stage = {}
        for b in range(blocks):
            bp = {
                "conv1": conv(1, inplanes, planes), "bn1": bn(planes),
                "conv2": conv(3, planes, planes), "bn2": bn(planes),
                "conv3": conv(1, planes, planes * 4), "bn3": bn(planes * 4),
            }
            stride = 2 if (s > 1 and b == 0) else 1
            # reference Bottleneck downsample condition (clip/model.py:31-39)
            if stride > 1 or inplanes != planes * 4:
                bp["downsample"] = {
                    "conv": conv(1, inplanes, planes * 4),
                    "bn": bn(planes * 4),
                }
            stage[str(b)] = bp
            inplanes = planes * 4
        p[f"layer{s}"] = stage
    spacial = cfg.image_resolution // 32
    p["attnpool"] = {
        "pos_embedding": jax.random.normal(
            next(keys), (spacial * spacial + 1, C)
        ) * (C ** -0.5),
        "q": lin(C, C), "k": lin(C, C), "v": lin(C, C),
        "c": lin(C, cfg.embed_dim),
    }
    return p


def _init_clip_params(key: jax.Array, cfg: CLIPConfig = VIT_B16) -> dict:
    kv, kt, k1, k2, k3, k4, k5 = jax.random.split(key, 7)
    vw, tw = cfg.vision_width, cfg.transformer_width
    vscale = vw ** -0.5
    if cfg.vision_arch == "resnet":
        visual = _init_resnet_visual(kv, cfg)
    else:
        visual = {
            "patch_w": jax.random.normal(
                k1, (cfg.vision_patch_size ** 2 * 3, vw)
            ) * vscale,
            "class_embedding": jax.random.normal(k2, (vw,)) * vscale,
            "pos_embedding": jax.random.normal(k3, (cfg.vision_seq_len, vw)) * vscale,
            "ln_pre": {"scale": jnp.ones((vw,)), "bias": jnp.zeros((vw,))},
            "blocks": _init_block_stack(kv, cfg.vision_layers, vw),
            "ln_post": {"scale": jnp.ones((vw,)), "bias": jnp.zeros((vw,))},
            "proj": jax.random.normal(k4, (vw, cfg.embed_dim)) * vscale,
        }
    text = {
        "token_embedding": jax.random.normal(k5, (cfg.vocab_size, tw)) * 0.02,
        "pos_embedding": jax.random.normal(kt, (cfg.context_length, tw)) * 0.01,
        "blocks": _init_block_stack(kt, cfg.transformer_layers, tw),
        "ln_final": {"scale": jnp.ones((tw,)), "bias": jnp.zeros((tw,))},
        "projection": jax.random.normal(kt, (tw, cfg.embed_dim)) * (tw ** -0.5),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32),
    }


_CAST_PATHS = (
    # visual matmul weights (convert_weights touches Conv/Linear/MHA/proj,
    # reference clip/model.py:857-878)
    ("visual", "patch_w"),
    ("visual", "blocks", "attn"),
    ("visual", "blocks", "mlp"),
    ("visual", "proj"),
    ("text", "blocks", "attn"),
    ("text", "blocks", "mlp"),
    ("text", "projection"),
)


def _cast_rn_visual(tree: dict, dtype) -> dict:
    """RN tower cast rules (reference convert_weights touches Conv + the
    attnpool Linears, clip/model.py:857-878): conv kernels and the q/k/v/c
    projections go to the reduced dtype; BatchNorm STATISTICS and the
    positional embedding stay float32 (batch_norm folds scale*rsqrt(var)
    in fp32 — models/resnet.py)."""
    out = {}
    for k, val in tree.items():
        if isinstance(val, dict):
            if k.startswith("bn") or k == "bn":
                out[k] = val
            elif k in ("q", "k", "v", "c"):
                out[k] = jax.tree_util.tree_map(lambda x: x.astype(dtype), val)
            else:
                out[k] = _cast_rn_visual(val, dtype)
        else:
            out[k] = val.astype(dtype) if k.startswith("conv") else val
    return out


def cast_matmul_weights(params: dict, dtype) -> dict:
    """Cast only matmul/attention weights (incl. biases, as the reference
    halves Linear biases too); embeddings and LayerNorms stay float32."""
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy

    def cast_sub(tree):
        return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)

    is_rn = isinstance(out.get("visual"), dict) and "attnpool" in out["visual"]
    if is_rn:
        out["visual"] = _cast_rn_visual(out["visual"], dtype)

    for path in _CAST_PATHS:
        node = out
        for k in path[:-1]:
            node = node.get(k) if isinstance(node, dict) else None
            if node is None:
                break
        if isinstance(node, dict) and path[-1] in node:
            node[path[-1]] = cast_sub(node[path[-1]])
        elif not (is_rn and path[0] == "visual"):
            # An RN tree legitimately lacks the ViT visual paths (handled
            # by _cast_rn_visual above); anything else unresolved would
            # silently leave fp32 weights in the "bf16" tree — a quiet
            # perf/numerics drift. Fail loudly instead.
            raise KeyError(
                f"cast_matmul_weights: expected path {'/'.join(path)} "
                f"missing from the parameter tree"
            )
    return out


# ----------------------------------------------------------------------------
# Forward functions
# ----------------------------------------------------------------------------

def encode_image(
    params: dict,
    images: jax.Array,
    cfg: CLIPConfig = VIT_B16,
    *,
    compute_dtype=jnp.float32,
    layer0_prompt: Optional[jax.Array] = None,
    deep_prompts: Optional[jax.Array] = None,
    mesh_ctx=None,
):
    if cfg.vision_arch == "resnet":
        from mudpt_tpu.models.resnet import resnet_forward

        assert layer0_prompt is None and deep_prompts is None, (
            "prompt injection is defined for the ViT towers only (as in the "
            "reference, whose prompt block variants are transformer-only)"
        )
        return resnet_forward(
            params["visual"],
            images,
            layers=cfg.vision_layers_per_stage,
            heads=cfg.vision_heads,
            compute_dtype=compute_dtype,
        )
    from mudpt_tpu.models.vit import vit_forward

    return vit_forward(
        params["visual"],
        images,
        patch_size=cfg.vision_patch_size,
        n_head=cfg.vision_heads,
        compute_dtype=compute_dtype,
        layer0_prompt=layer0_prompt,
        deep_prompts=deep_prompts,
        mesh_ctx=mesh_ctx,
    )


def encode_text(
    params: dict,
    tokens: jax.Array,
    cfg: CLIPConfig = VIT_B16,
    *,
    compute_dtype=jnp.float32,
    deep_prompts: Optional[jax.Array] = None,
    mesh_ctx=None,
):
    """Zero-shot text encoding from raw token ids (N, 77)."""
    from mudpt_tpu.models.text import embed_tokens, text_forward

    x = embed_tokens(params["text"], tokens, compute_dtype)
    eot_idx = jnp.argmax(tokens, axis=-1)
    return text_forward(
        params["text"],
        x,
        eot_idx,
        n_head=cfg.transformer_heads,
        deep_prompts=deep_prompts,
        mesh_ctx=mesh_ctx,
    )


def cosine_logits(image_features, text_features, logit_scale):
    """L2-normalize both sides, scale by exp(logit_scale)
    (reference clip/model.py:840-854)."""
    img = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    txt = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    scale = jnp.exp(logit_scale).astype(img.dtype)
    return scale * jnp.dot(img, txt.T)


def clip_forward(params, images, tokens, cfg: CLIPConfig = VIT_B16, *, compute_dtype=jnp.float32):
    img = encode_image(params, images, cfg, compute_dtype=compute_dtype)
    txt = encode_text(params, tokens, cfg, compute_dtype=compute_dtype)
    logits_per_image = cosine_logits(
        img.astype(jnp.float32), txt.astype(jnp.float32), params["logit_scale"]
    )
    return logits_per_image, logits_per_image.T


def num_params(tree) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))
