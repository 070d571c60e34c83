"""Primitive layers as pure functions over parameter dicts.

Numerics contract (behavior pinned by the reference, cited per-op):
  * LayerNorm computes in float32 and casts back to the input dtype
    (reference clip/model.py:163-169) — on TPU the backbone runs bfloat16
    activations with fp32 normalization statistics.
  * QuickGELU is ``x * sigmoid(1.702 x)`` (reference clip/model.py:172-175).
  * Attention is a standard pre-LN residual MHA with a fused QKV projection
    (reference clip/model.py:177-198 uses ``nn.MultiheadAttention``);
    here it is expressed batch-first as three MXU matmuls with fp32 softmax.

All functions take ``(params, x, ...)`` and are shape-polymorphic over a
leading batch dimension; weights use (in, out) layout so activations hit the
MXU without transposes.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


# Activation-calibration capture (static int8 serving, ops/quant_block.py):
# while a sink list is installed, the XLA-path attention/mlp record the
# absmax of each of the four quantization sites (LN1 out, pre-out-proj MHA
# accumulation, LN2 out, post-GELU) — 4 scalars per residual block, in
# block call order.  The values are tracers when captured under jit; the
# calibration wrapper returns them as outputs (quant_block.calibrate).
_CALIB_SINK: Optional[list] = None


@contextlib.contextmanager
def calibration_capture(sink: list):
    """Install an activation-absmax sink and force the plain-XLA,
    unquantized block path for the duration (the capture sites live in
    :func:`attention`/:func:`mlp`, which the Pallas kernels bypass)."""
    global _CALIB_SINK, _BLOCK_IMPL, _QUANT_MODE
    prev = (_CALIB_SINK, _BLOCK_IMPL, _QUANT_MODE)
    _CALIB_SINK, _BLOCK_IMPL, _QUANT_MODE = sink, "xla", "none"
    try:
        yield
    finally:
        _CALIB_SINK, _BLOCK_IMPL, _QUANT_MODE = prev


def _calib_record(x: jax.Array) -> None:
    if _CALIB_SINK is not None:
        _CALIB_SINK.append(jnp.max(jnp.abs(x.astype(jnp.float32))))


_LN_DTYPE = os.environ.get("MUDPT_TPU_LN", "fp32")  # fp32 (parity) | bf16 (experiment)


def set_ln_dtype(name: str) -> None:
    """'fp32' (reference parity, clip/model.py:163-169) | 'bf16' (experiment
    — NOT reference numerics).  Config: PERF.LN; env MUDPT_TPU_LN overrides."""
    assert name in ("fp32", "bf16"), name
    global _LN_DTYPE
    _LN_DTYPE = name


def layer_norm(p, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    if _LN_DTYPE == "bf16":
        # experimental: normalize in input precision (NOT reference-parity)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return y * p["scale"].astype(dtype) + p["bias"].astype(dtype)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def linear(p, x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def attention(
    p,
    x: jax.Array,
    n_head: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head self-attention, batch-first: x (B, S, D) -> (B, S, D).

    ``mask`` is an additive (S, S) float array (the text tower's causal mask,
    reference clip/model.py:810-816) or None for full attention.  (The fused
    Pallas path lives in residual_block/ops/fused_block.py, which takes the
    causal flag directly.)
    """
    B, S, D = x.shape
    head_dim = D // n_head
    _calib_record(x)  # site 1: QKV matmul input (LN1 output)
    qkv = jnp.dot(x, p["qkv_w"].astype(x.dtype)) + p["qkv_b"].astype(x.dtype)
    qkv = qkv.reshape(B, S, 3, n_head, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, S, H, hd)
    q = q.transpose(0, 2, 1, 3)  # (B, H, S, hd)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    scale = head_dim ** -0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    # named for the selective remat policy: the (B,H,S,S) fp32 score/prob
    # tensors are the memory hogs — recomputed in backward, never stored
    scores = checkpoint_name(scores, "attn_scores")
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    probs = checkpoint_name(probs, "attn_probs")
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    _calib_record(out)  # site 2: out-projection input (MHA accumulation)
    return jnp.dot(out, p["out_w"].astype(x.dtype)) + p["out_b"].astype(x.dtype)


def mlp(p, x: jax.Array) -> jax.Array:
    _calib_record(x)  # site 3: fc matmul input (LN2 output)
    h = jnp.dot(x, p["fc_w"].astype(x.dtype)) + p["fc_b"].astype(x.dtype)
    h = quick_gelu(h)
    _calib_record(h)  # site 4: proj matmul input (post-GELU)
    return jnp.dot(h, p["proj_w"].astype(x.dtype)) + p["proj_b"].astype(x.dtype)


_BLOCK_IMPL = os.environ.get("MUDPT_TPU_BLOCK", "auto")

# Platform the model computation actually targets.  'auto' impl selection
# must NOT consult jax.default_backend() alone: with a TPU PJRT plugin
# registered (sitecustomize), the default backend says "tpu" even when the
# mesh in use is built from virtual CPU devices — which round 1's driver
# check hit as "Only interpret mode is supported on CPU backend".  Trainers
# record their mesh's device platform here (trainers/base.py).
_PLATFORM_HINT: Optional[str] = None


def set_platform_hint(platform: Optional[str]) -> None:
    """Record the platform ('tpu'/'cpu'/...) of the devices the model will
    run on; overrides jax.default_backend() for 'auto' impl selection."""
    global _PLATFORM_HINT
    _PLATFORM_HINT = platform


def target_platform() -> str:
    if _PLATFORM_HINT is not None:
        return _PLATFORM_HINT
    return jax.default_backend()


def set_block_impl(name: str) -> None:
    """'xla', 'pallas', or 'auto' (pallas on TPU).

    'pallas' = fused VMEM half-block kernels with a frozen-weight backward —
    ONLY valid when block weights receive no gradients, i.e. the
    frozen-backbone prompt-tuning regime (prompt tokens still receive their
    gradients through dx).  Measured ~2x end-to-end on the MuDPT train step
    (docs/BENCHMARKS.md)."""
    assert name in ("xla", "pallas", "auto"), name
    global _BLOCK_IMPL
    _BLOCK_IMPL = name


def resolve_block_impl() -> str:
    if _BLOCK_IMPL == "auto":
        return "pallas" if target_platform() == "tpu" else "xla"
    return _BLOCK_IMPL


# Block quantization mode ('none' | 'int8' | 'int8_static' | 'int8_ste').
# 'int8' runs every block's projection matmuls as s8 x s8 -> s32 W8A8
# kernels — serving/eval only, differentiation raises.  'int8_static' is
# the calibrated variant: blocks whose stacked params carry a 'q8_scales'
# leaf (quant_block.calibrate + attach_scales) quantize activations with
# static per-tensor scales — no in-kernel max-reduce/divide, the full
# dynamic-quant VPU residual reclaimed (docs/BENCHMARKS.md session 8) —
# and uncalibrated blocks fall back to the dynamic recipe.  'int8_ste' is
# quantization-aware prompt tuning: the SAME int8 forward plus a
# straight-through backward (the bf16 save-acts layer backward over the
# quantized forward's saved intermediates), so prompts train against the
# exact backbone numerics that will serve them (ops/quant_block.py).
_QUANT_MODE = os.environ.get("MUDPT_TPU_QUANT", "none")


def set_quant_mode(name: str) -> None:
    assert name in (
        "none", "int8", "int8_static", "int8_ste", "int8_ste_static"
    ), name
    global _QUANT_MODE
    _QUANT_MODE = name


def quant_mode() -> str:
    return _QUANT_MODE


def residual_block(p, x: jax.Array, n_head: int, mask=None, causal=False) -> jax.Array:
    """One pre-LN residual block (reference clip/model.py:177-198)."""
    # Pallas half-block kernels hold weights + intermediates in VMEM; both
    # halves run monolithic up to D=1024 (ViT-L/14) under the raised Mosaic
    # scoped-VMEM cap (attention ~17 MB, MLP ~23 MB — ops/fused_block.py).
    # Wider than 1024 falls back to XLA; a chunked-weight MLP kernel
    # (ops/fused_block.mlp_halfblock_chunked, fully tested) is the starting
    # point if such a tower ever needs the fused path.
    D = x.shape[-1]
    if _QUANT_MODE != "none":
        # quantized tiers exist only in the Pallas layer kernels — refuse
        # to silently fall back to an unquantized path the caller did not
        # ask for
        if not (
            resolve_block_impl() == "pallas"
            and (mask is None or causal)
            and D <= 1024
        ):
            raise ValueError(
                f"quant mode {_QUANT_MODE!r} requires the Pallas block impl "
                "(causal or unmasked attention, width <= 1024; got impl="
                f"{resolve_block_impl()!r}, D={D}); set_quant_mode('none') "
                "or set_block_impl('pallas')"
            )
        if _QUANT_MODE in ("int8_ste", "int8_ste_static"):
            # the static variant is selected per-block by the presence of
            # a calibrated q8_scales leaf (TRAIN.QUANT 'int8_ste_static'
            # attaches them at build; towers without scales run dynamic)
            from mudpt_tpu.ops.quant_block import residual_block_q8_ste

            return residual_block_q8_ste(p, x, n_head, causal)
        if _QUANT_MODE == "int8_static" and "q8_scales" in p:
            from mudpt_tpu.ops.quant_block import residual_block_q8_static

            return residual_block_q8_static(p, x, n_head, causal)
        # 'int8', or 'int8_static' on a tower without calibrated scales
        # (e.g. the per-instance CoCoOp text encode): dynamic per-row quant
        from mudpt_tpu.ops.quant_block import residual_block_q8

        return residual_block_q8(p, x, n_head, causal)
    if resolve_block_impl() == "pallas" and (mask is None or causal) and D <= 1024:
        from mudpt_tpu.ops.fused_block import (
            attn_halfblock,
            layer_fullblock,
            mlp_halfblock,
            save_acts_enabled,
        )

        if save_acts_enabled() and D <= 768:
            # both halves in ONE program per direction: the inter-half
            # residual/gradient stays in VMEM (ops/fused_block.py)
            return layer_fullblock(
                x,
                p["ln_1"]["scale"], p["ln_1"]["bias"],
                p["attn"]["qkv_w"], p["attn"]["qkv_b"],
                p["attn"]["out_w"], p["attn"]["out_b"],
                p["ln_2"]["scale"], p["ln_2"]["bias"],
                p["mlp"]["fc_w"], p["mlp"]["fc_b"],
                p["mlp"]["proj_w"], p["mlp"]["proj_b"],
                n_head, causal,
            )
        x = attn_halfblock(
            x,
            p["ln_1"]["scale"], p["ln_1"]["bias"],
            p["attn"]["qkv_w"], p["attn"]["qkv_b"],
            p["attn"]["out_w"], p["attn"]["out_b"],
            n_head, causal,
        )
        return mlp_halfblock(
            x,
            p["ln_2"]["scale"], p["ln_2"]["bias"],
            p["mlp"]["fc_w"], p["mlp"]["fc_b"],
            p["mlp"]["proj_w"], p["mlp"]["proj_b"],
        )
    x = x + attention(p["attn"], layer_norm(p["ln_1"], x), n_head, mask)
    x = x + mlp(p["mlp"], layer_norm(p["ln_2"], x))
    return x


def residual_block_trainable(p, x: jax.Array, n_head: int, mask=None) -> jax.Array:
    """Pre-LN residual block whose WEIGHTS receive gradients.

    The Pallas fused blocks above carry a custom VJP that deliberately
    returns zero for every weight gradient (valid only for the frozen CLIP
    backbone).  Blocks whose parameters are themselves trained — the
    UMuDPT/UUMuDPT LightTransformer prompt-synthesis heads
    (reference trainers/umudpt.py:56-75, clip/model.py:620-623) — must take
    the XLA autodiff path regardless of the selected block impl, or their
    weights silently stop learning (caught by tests/test_grad_parity.py)."""
    x = x + attention(p["attn"], layer_norm(p["ln_1"], x), n_head, mask)
    x = x + mlp(p["mlp"], layer_norm(p["ln_2"], x))
    return x
