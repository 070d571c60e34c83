"""Int8 (W8A8) fused transformer-layer forward kernel — serving tier.

Post-training quantization of the frozen CLIP backbone for INFERENCE:
the four projection matmuls of every block (QKV, attention out, MLP fc,
MLP proj — ~92% of forward MACs) run as s8 x s8 -> s32 on the MXU, whose
int8 rate is 2x the bf16 rate on v5e (394 vs 197 T-op/s).  Everything
numerically delicate stays in fp32 on the VPU: LayerNorm, softmax,
QuickGELU, and all dequantization arithmetic; the per-head score/PV
contractions (~8% of MACs) stay bf16 — quantizing them would put the
softmax input behind two quantization steps for almost no MAC coverage.

Quantization scheme (the standard dynamic W8A8 recipe):
  * weights: symmetric per-OUTPUT-CHANNEL int8, scales fp32 — computed
    from the bf16 weights by :func:`quantize_cols` (traced jnp, fused by
    XLA; cost is one weight read, ~1/400 of a forward at S=197).
  * activations: symmetric per-TOKEN (row) dynamic int8, computed
    in-kernel from the fp32 LN/GELU outputs the kernel already has.
  * accumulate s32, dequantize fp32: out = acc * row_scale * col_scale.

Two tiers share the quantized forward:
  * ``int8`` (`layer_fullblock_q8`) is **forward-only** — the backward
    raises.  Serves `bench.py --mode eval --quant int8` and
    `serving.export_* (block_impl='pallas_int8')`.
  * ``int8_ste`` (`layer_fullblock_q8_ste`) is **quantization-aware
    prompt tuning**: the same int8 forward plus a straight-through
    backward (the bf16 save-acts layer backward over the quantized
    forward's saved intermediates), so prompts train against the exact
    numerics that will serve them.  `bench.py --quant int8_ste`,
    `TRAIN.QUANT int8_ste`, `MUDPT_TPU_QUANT=int8_ste`.

Reference correspondence: the reference has no quantized path (its
inference runs the fp16 CUDA forward, clip/model.py:857-878); this is a
TPU-native capability addition measured against the repo's own bf16
serving numbers (docs/BENCHMARKS.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mudpt_tpu.ops.fused_block import (
    _call_layer,
    _COMPILER_PARAMS,
    _full,
    _interpret,
    _layer_bwd_kernel,
    _ln_fp32,
    _mha_acc,
    _quick_gelu,
    _row,
    _row_spec_of,
)


def quantize_cols(w: jax.Array):
    """Symmetric per-output-channel int8 quantization of a (Din, Dout)
    weight.  Returns (int8 weight, fp32 (1, Dout) scale)."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(w32 / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _quant_rows(x32):
    """Symmetric per-row dynamic int8: fp32 (S, X) -> (int8 (S, X),
    fp32 (S, 1) scale)."""
    s = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x32 / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _q8_matmul(xq, xs, wq, ws, b):
    """s8 x s8 -> s32 MXU matmul, fp32 dequant + bias: (S, Dout) fp32."""
    acc = jax.lax.dot_general(
        xq, wq[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * ws[...]
    return out + b[...].astype(jnp.float32)


def _layer_fwd_q8_kernel(
    x_ref,
    ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
    ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
    y_ref, acc_ref, *, n_head, causal,
):
    x = x_ref[0]
    # ---- attention half: x1 = x + out(MHA(LN1(x))) ----
    xn, _, _ = _ln_fp32(x, ln1_s[...], ln1_b[...])
    xq, xs = _quant_rows(xn)
    qkv = _q8_matmul(xq, xs, qkv_wq, qkv_ws, qkv_b).astype(x.dtype)
    _mha_acc(qkv, acc_ref, n_head=n_head, causal=causal, act_dtype=x.dtype)
    aq, a_s = _quant_rows(acc_ref[...])
    x1 = x + _q8_matmul(aq, a_s, out_wq, out_ws, out_b).astype(x.dtype)
    # ---- mlp half: y = x1 + proj(QuickGELU(fc(LN2(x1)))) ----
    x2n, _, _ = _ln_fp32(x1, ln2_s[...], ln2_b[...])
    x2q, x2s = _quant_rows(x2n)
    h = _q8_matmul(x2q, x2s, fc_wq, fc_ws, fc_b)          # fp32 (S, 4D)
    g = _quick_gelu(h)                                     # fp32 VPU
    gq, gs = _quant_rows(g)
    y_ref[0] = x1 + _q8_matmul(gq, gs, proj_wq, proj_ws, proj_b).astype(
        x.dtype
    )


def _spec_of(a):
    return _full(*a.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18))
def layer_fullblock_q8(
    x,
    ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
    ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
    n_head: int, causal=False,
):
    """One full pre-LN residual layer, int8 projections (see module doc).

    ``x`` (B, S, D) bf16; ``*_wq`` int8 weights + ``*_ws`` fp32 (1, Dout)
    scales from :func:`quantize_cols`; LN params and biases unquantized.
    Inference-only: differentiation raises NotImplementedError.
    """
    B, S, D = x.shape
    params = (
        ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
        ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
    )
    specs = [_row(S, D)] + [_spec_of(p) for p in params]
    out_shape = jax.ShapeDtypeStruct((B, S, D), x.dtype)
    return pl.pallas_call(
        functools.partial(
            _layer_fwd_q8_kernel, n_head=n_head, causal=causal
        ),
        grid=(B,),
        in_specs=specs,
        out_specs=_row_spec_of(out_shape),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *params)


def _q8_fwd_vjp(
    x,
    ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
    ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
    n_head, causal,
):
    y = layer_fullblock_q8(
        x,
        ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
        ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
        n_head, causal,
    )
    return y, None


def _q8_bwd(n_head, causal, res, g):
    raise NotImplementedError(
        "int8 quantized blocks are inference-only (serving/eval); to TRAIN "
        "against the quantized backbone use quant mode 'int8_ste' "
        "(straight-through backward), or unset quant mode for bf16"
    )


layer_fullblock_q8.defvjp(_q8_fwd_vjp, _q8_bwd)


def _layer_fwd_q8_save_kernel(
    x_ref,
    ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
    ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
    y_ref, y1_ref, qkv_ref, h_ref, acc_ref, *, n_head, causal,
):
    """The int8 layer forward, additionally saving the DEQUANTIZED
    intermediates (qkv, y1, h) the bf16 save-acts backward consumes —
    the quantization-aware-training forward (see layer_fullblock_q8_ste)."""
    x = x_ref[0]
    xn, _, _ = _ln_fp32(x, ln1_s[...], ln1_b[...])
    xq, xs = _quant_rows(xn)
    qkv = _q8_matmul(xq, xs, qkv_wq, qkv_ws, qkv_b).astype(x.dtype)
    qkv_ref[0] = qkv
    _mha_acc(qkv, acc_ref, n_head=n_head, causal=causal, act_dtype=x.dtype)
    aq, a_s = _quant_rows(acc_ref[...])
    y1 = x + _q8_matmul(aq, a_s, out_wq, out_ws, out_b).astype(x.dtype)
    y1_ref[0] = y1
    x2n, _, _ = _ln_fp32(y1, ln2_s[...], ln2_b[...])
    x2q, x2s = _quant_rows(x2n)
    h = _q8_matmul(x2q, x2s, fc_wq, fc_ws, fc_b)          # fp32 (S, 4D)
    h_ref[0] = h.astype(h_ref.dtype)
    g = _quick_gelu(h)
    gq, gs = _quant_rows(g)
    y_ref[0] = y1 + _q8_matmul(gq, gs, proj_wq, proj_ws, proj_b).astype(
        x.dtype
    )


def _quantize_layer(params):
    """(12 bf16 layer params) -> the 17-operand quantized layout the q8
    kernels take.  Traced jnp: XLA hoists it out of any batch loop and the
    cost is one weight read."""
    (ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
     ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b) = params
    qkv_wq, qkv_ws = quantize_cols(qkv_w)
    out_wq, out_ws = quantize_cols(out_w)
    fc_wq, fc_ws = quantize_cols(fc_w)
    proj_wq, proj_ws = quantize_cols(proj_w)
    return (
        ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
        ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def layer_fullblock_q8_ste(x, ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
                           ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b,
                           n_head: int, causal: bool = False):
    """Quantization-aware prompt tuning: the int8 W8A8 forward with a
    straight-through backward, so prompts train against the SAME quantized
    backbone that will serve them (the deploy-aware counterpart of
    post-training quantization — train/serve numerics match).

    Forward: identical to :func:`layer_fullblock_q8` (weights quantized
    per-channel in-trace).  Backward: the existing bf16 save-acts layer
    backward (`fused_block._layer_bwd_kernel`) runs on the QUANTIZED
    forward's saved intermediates (qkv, y1, h) — the true backward of the
    quantized function except that (a) the dx matmuls use the bf16 weights
    in place of their dequantized-int8 copies (within half an int8 LSB
    per channel) and (b) the round/clip requantization steps differentiate
    as identity.  That is the standard straight-through estimator; grads
    flow to x ONLY (frozen layer), like every fused block.

    Takes the ORIGINAL bf16 layer params (same signature as
    `layer_fullblock`); quantization happens inside.
    """
    B, S, D = x.shape
    params = (ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
              ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b)
    qparams = _quantize_layer(params)
    specs = [_row(S, D)] + [_spec_of(p) for p in qparams]
    out_shape = jax.ShapeDtypeStruct((B, S, D), x.dtype)
    return pl.pallas_call(
        functools.partial(
            _layer_fwd_q8_kernel, n_head=n_head, causal=causal
        ),
        grid=(B,),
        in_specs=specs,
        out_specs=_row_spec_of(out_shape),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *qparams)


def _q8_save_forward(x, qparams, n_head, causal, Dh):
    """Run the saving q8 forward kernel: (y, y1, qkv, h)."""
    B, S, D = x.shape
    specs = [_row(S, D)] + [_spec_of(p) for p in qparams]
    out_shapes = (
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        jax.ShapeDtypeStruct((B, S, 3 * D), x.dtype),
        jax.ShapeDtypeStruct((B, S, Dh), x.dtype),
    )
    return pl.pallas_call(
        functools.partial(
            _layer_fwd_q8_save_kernel, n_head=n_head, causal=causal
        ),
        grid=(B,),
        in_specs=specs,
        out_specs=jax.tree_util.tree_map(_row_spec_of, out_shapes),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *qparams)


def _q8_ste_fwd(x, ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
                ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b, n_head, causal):
    from mudpt_tpu.ops import fused_block as FB

    params = (ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
              ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b)
    # same width gate as the bf16 tier: the save set includes h (S x 4D),
    # which at D=1024 fits HBM only within the wide-MLP row-token budget
    # (fused_block.wide_mlp_save — measured, docs/BENCHMARKS.md round 3)
    save_limit = 1024 if FB.wide_mlp_save(x.shape[0] * x.shape[1]) else 768
    if FB.save_acts_enabled() and x.shape[-1] <= save_limit:
        y, y1, qkv, h = _q8_save_forward(
            x, _quantize_layer(params), n_head, causal, fc_w.shape[1]
        )
        return y, (x, y1, qkv, h, params)
    # recompute strategy (saved_acts(False): the large-n_cls text tower and
    # CoCoOp's big vmap'd encode trade backward recompute for HBM): save x
    # only; the backward regenerates the quantized intermediates
    y = layer_fullblock_q8(x, *_quantize_layer(params), n_head, causal)
    return y, (x, None, None, None, params)


def _q8_ste_bwd(n_head, causal, res, g):
    x, y1, qkv, h, params = res
    B, S, D = x.shape
    if y1 is None:
        # recompute the QUANTIZED forward's intermediates (identical
        # quantization chain to the primal forward), then the same dx kernel
        _, y1, qkv, h = _q8_save_forward(
            x, _quantize_layer(params), n_head, causal, params[8].shape[1]
        )
    dx = _call_layer(
        _layer_bwd_kernel, x, params, (y1, qkv, h, g),
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        [pltpu.VMEM((S, 3 * D), x.dtype)],
        n_head=n_head, causal=causal,
    )
    zeros = tuple(jnp.zeros_like(p) for p in params)
    return (dx, *zeros)


layer_fullblock_q8_ste.defvjp(_q8_ste_fwd, _q8_ste_bwd)


def residual_block_q8_ste(p, x: jax.Array, n_head: int, causal=False) -> jax.Array:
    """residual_block under quant modes 'int8_ste'/'int8_ste_static'
    (quantization-aware prompt tuning): same param pytree as the bf16
    tier.  A ``q8_scales`` leaf (TRAIN.QUANT 'int8_ste_static' calibrates
    one at build) selects the static-scale forward — the numerics a
    ``pallas_int8_static`` artifact serves."""
    if "q8_scales" in p:
        return layer_fullblock_q8_ste_static(
            x, p["q8_scales"],
            p["ln_1"]["scale"], p["ln_1"]["bias"],
            p["attn"]["qkv_w"], p["attn"]["qkv_b"],
            p["attn"]["out_w"], p["attn"]["out_b"],
            p["ln_2"]["scale"], p["ln_2"]["bias"],
            p["mlp"]["fc_w"], p["mlp"]["fc_b"],
            p["mlp"]["proj_w"], p["mlp"]["proj_b"],
            n_head, causal,
        )
    return layer_fullblock_q8_ste(
        x,
        p["ln_1"]["scale"], p["ln_1"]["bias"],
        p["attn"]["qkv_w"], p["attn"]["qkv_b"],
        p["attn"]["out_w"], p["attn"]["out_b"],
        p["ln_2"]["scale"], p["ln_2"]["bias"],
        p["mlp"]["fc_w"], p["mlp"]["fc_b"],
        p["mlp"]["proj_w"], p["mlp"]["proj_b"],
        n_head, causal,
    )


# ---------------------------------------------------------------------------
# Static-scale (calibrated) activation quantization
#
# The dynamic per-row recipe pays a VPU chain per quant site (abs ->
# max-reduce -> divide -> round -> clip -> convert) plus a per-row dequant
# multiply.  A dispatch-free on-chip decomposition (tools/probe_q8_residual.py,
# docs/BENCHMARKS.md session 8) measured that chain at 0.117 ms/layer (6.3%
# of the q8 ViT-B layer) — and that per-TENSOR static scales recover ALL of
# it: no max-reduce, the row scale folds into the per-channel weight scale,
# landing at the kernel's bare-int8 floor.  The price is calibration data
# (scales come from observed activation maxima — :func:`calibrate`) and
# saturation of any activation that exceeds its calibrated range.
# ---------------------------------------------------------------------------


def _layer_fwd_q8_static_kernel(
    x_ref,
    ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
    ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
    r_ref, y_ref, acc_ref, *, n_head, causal,
):
    """The q8 layer forward with STATIC activation scales: ``r_ref`` is
    (1, 4) fp32 quant multipliers (127/absmax per site); the matching
    dequant factors (absmax/127) are pre-folded into the weight scales by
    :func:`residual_block_q8_static`, so dequant is one multiply."""
    x = x_ref[0]
    r = r_ref[...]  # (1, 4) fp32

    def quant_static(x32, i):
        q = jnp.clip(jnp.round(x32 * r[0, i]), -127.0, 127.0)
        return q.astype(jnp.int8)

    def matmul_static(xq, wq, ws, b):
        acc = jax.lax.dot_general(
            xq, wq[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * ws[...] + b[...].astype(jnp.float32)

    xn, _, _ = _ln_fp32(x, ln1_s[...], ln1_b[...])
    qkv = matmul_static(
        quant_static(xn, 0), qkv_wq, qkv_ws, qkv_b
    ).astype(x.dtype)
    _mha_acc(qkv, acc_ref, n_head=n_head, causal=causal, act_dtype=x.dtype)
    x1 = x + matmul_static(
        quant_static(acc_ref[...], 1), out_wq, out_ws, out_b
    ).astype(x.dtype)
    x2n, _, _ = _ln_fp32(x1, ln2_s[...], ln2_b[...])
    h = matmul_static(quant_static(x2n, 2), fc_wq, fc_ws, fc_b)
    g = _quick_gelu(h)
    y_ref[0] = x1 + matmul_static(
        quant_static(g, 3), proj_wq, proj_ws, proj_b
    ).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19))
def layer_fullblock_q8_static(
    x,
    ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
    ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
    r,
    n_head: int, causal=False,
):
    """Static-scale q8 layer.  ``r`` is (1, 4) fp32 quant multipliers and
    the ``*_ws`` weight scales must already carry the per-site dequant
    factor (see :func:`residual_block_q8_static`).  Inference-only."""
    B, S, D = x.shape
    params = (
        ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
        ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b, r,
    )
    specs = [_row(S, D)] + [_spec_of(p) for p in params]
    out_shape = jax.ShapeDtypeStruct((B, S, D), x.dtype)
    return pl.pallas_call(
        functools.partial(
            _layer_fwd_q8_static_kernel, n_head=n_head, causal=causal
        ),
        grid=(B,),
        in_specs=specs,
        out_specs=_row_spec_of(out_shape),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *params)


def _q8_static_fwd_vjp(
    x,
    ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
    ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
    r, n_head, causal,
):
    y = layer_fullblock_q8_static(
        x,
        ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
        ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
        r, n_head, causal,
    )
    return y, None


layer_fullblock_q8_static.defvjp(_q8_static_fwd_vjp, _q8_bwd)


def _quantize_layer_static(params, amax):
    """(12 bf16 layer params, (4,) site absmax) -> (the 16-operand
    static-kernel layout with the dequant factors folded into the weight
    scales, r (1, 4) quant multipliers).  Traced jnp — XLA hoists it."""
    (ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
     ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b) = params
    amax = jnp.maximum(amax.astype(jnp.float32), 1e-8)  # (4,)
    r = (127.0 / amax).reshape(1, 4)
    dq = amax / 127.0  # per-site dequant factor, folded into weight scales
    qkv_wq, qkv_ws = quantize_cols(qkv_w)
    out_wq, out_ws = quantize_cols(out_w)
    fc_wq, fc_ws = quantize_cols(fc_w)
    proj_wq, proj_ws = quantize_cols(proj_w)
    return (
        ln1_s, ln1_b, qkv_wq, qkv_ws * dq[0], qkv_b,
        out_wq, out_ws * dq[1], out_b,
        ln2_s, ln2_b, fc_wq, fc_ws * dq[2], fc_b,
        proj_wq, proj_ws * dq[3], proj_b,
    ), r


def residual_block_q8_static(p, x: jax.Array, n_head: int, causal=False) -> jax.Array:
    """The q8 layer with CALIBRATED static activation scales: ``p`` must
    carry a ``q8_scales`` (4,) fp32 leaf of per-site activation absmaxima
    (:func:`calibrate` + :func:`attach_scales`).  Weight quantization and
    the dequant-scale folding are traced jnp — XLA hoists them; the kernel
    itself has NO per-row scale work (docs/BENCHMARKS.md session 8)."""
    qparams, r = _quantize_layer_static(
        (
            p["ln_1"]["scale"], p["ln_1"]["bias"],
            p["attn"]["qkv_w"], p["attn"]["qkv_b"],
            p["attn"]["out_w"], p["attn"]["out_b"],
            p["ln_2"]["scale"], p["ln_2"]["bias"],
            p["mlp"]["fc_w"], p["mlp"]["fc_b"],
            p["mlp"]["proj_w"], p["mlp"]["proj_b"],
        ),
        p["q8_scales"],
    )
    return layer_fullblock_q8_static(x, *qparams, r, n_head, causal)


def calibrate(forward_fn, *args, with_output: bool = False, **kwargs):
    """Run ``forward_fn(*args, **kwargs)`` under activation-absmax capture
    and return (n_blocks, 4) fp32 per-site scales in block call order
    (with ``with_output=True``: ``(scales, forward_output)`` — the output
    is computed on the same unquantized XLA pass the capture rides).

    The capture forces the plain-XLA unquantized block path
    (models/layers.calibration_capture), so pass the UNJITTED forward —
    a pre-traced jit would bypass the capture sites.  Each residual block
    contributes absmaxima of its four quant sites (QKV input, MHA
    accumulation, fc input, post-GELU), reduced over every batch/sequence
    element.  Combine multiple calibration batches with
    ``jnp.maximum(s1, s2)``; attach to a tower with :func:`attach_scales`.
    """
    from mudpt_tpu.models import layers as L

    def wrapped(*a, **k):
        sink: list = []
        with L.calibration_capture(sink):
            out = forward_fn(*a, **k)
        if not sink:
            raise ValueError(
                "calibration forward ran no residual blocks — pass the "
                "unjitted model forward (a pre-traced jit bypasses the "
                "capture sites in models/layers.attention/mlp)"
            )
        if len(sink) % 4:
            raise AssertionError(
                f"capture recorded {len(sink)} site values (not a multiple "
                "of 4) — the block call pattern is not attention+mlp pairs"
            )
        scales = jnp.stack(sink).reshape(-1, 4)
        return (scales, out) if with_output else scales

    return jax.jit(wrapped)(*args, **kwargs)


def attach_scales(blocks: dict, scales: jax.Array) -> dict:
    """Return ``blocks`` (a stacked (L, ...) block pytree) with a
    ``q8_scales`` (L, 4) leaf attached; transformer_forward's per-layer
    slice then hands each block its (4,) row and residual_block dispatches
    to the static kernel under quant mode 'int8_static'."""
    scales = jnp.asarray(scales, jnp.float32)
    n_layers = jax.tree_util.tree_leaves(
        {k: v for k, v in blocks.items() if k != "q8_scales"}
    )[0].shape[0]
    if scales.shape != (n_layers, 4):
        raise ValueError(
            f"scales shape {scales.shape} != ({n_layers}, 4) for this tower"
        )
    out = dict(blocks)
    out["q8_scales"] = scales
    return out


def _layer_fwd_q8_static_save_kernel(
    x_ref,
    ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
    ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
    r_ref, y_ref, y1_ref, qkv_ref, h_ref, acc_ref, *, n_head, causal,
):
    """The static q8 forward, saving the dequantized (qkv, y1, h) the bf16
    save-acts backward consumes — the static variant of the
    quantization-aware-training forward (layer_fullblock_q8_ste_static)."""
    x = x_ref[0]
    r = r_ref[...]

    def quant_static(x32, i):
        q = jnp.clip(jnp.round(x32 * r[0, i]), -127.0, 127.0)
        return q.astype(jnp.int8)

    def matmul_static(xq, wq, ws, b):
        acc = jax.lax.dot_general(
            xq, wq[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * ws[...] + b[...].astype(jnp.float32)

    xn, _, _ = _ln_fp32(x, ln1_s[...], ln1_b[...])
    qkv = matmul_static(
        quant_static(xn, 0), qkv_wq, qkv_ws, qkv_b
    ).astype(x.dtype)
    qkv_ref[0] = qkv
    _mha_acc(qkv, acc_ref, n_head=n_head, causal=causal, act_dtype=x.dtype)
    y1 = x + matmul_static(
        quant_static(acc_ref[...], 1), out_wq, out_ws, out_b
    ).astype(x.dtype)
    y1_ref[0] = y1
    x2n, _, _ = _ln_fp32(y1, ln2_s[...], ln2_b[...])
    h = matmul_static(quant_static(x2n, 2), fc_wq, fc_ws, fc_b)
    h_ref[0] = h.astype(h_ref.dtype)
    g = _quick_gelu(h)
    y_ref[0] = y1 + matmul_static(
        quant_static(g, 3), proj_wq, proj_ws, proj_b
    ).astype(x.dtype)


def _q8_static_save_forward(x, qparams, r, n_head, causal, Dh):
    """Run the saving static q8 forward kernel: (y, y1, qkv, h)."""
    B, S, D = x.shape
    operands = (*qparams, r)
    specs = [_row(S, D)] + [_spec_of(p) for p in operands]
    out_shapes = (
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        jax.ShapeDtypeStruct((B, S, 3 * D), x.dtype),
        jax.ShapeDtypeStruct((B, S, Dh), x.dtype),
    )
    return pl.pallas_call(
        functools.partial(
            _layer_fwd_q8_static_save_kernel, n_head=n_head, causal=causal
        ),
        grid=(B,),
        in_specs=specs,
        out_specs=jax.tree_util.tree_map(_row_spec_of, out_shapes),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15))
def layer_fullblock_q8_ste_static(x, scales,
                                  ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
                                  ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b,
                                  n_head: int, causal: bool = False):
    """Quantization-aware prompt tuning against the CALIBRATED static
    serving tier: the static q8 forward (bit-identical to
    :func:`layer_fullblock_q8_static` on the same scales — the numerics a
    ``pallas_int8_static`` artifact serves) + the same straight-through
    backward as :func:`layer_fullblock_q8_ste`.  ``scales`` is the (4,)
    per-site absmax leaf; like every fused block, gradients flow to ``x``
    only.  Scales are calibrated once at build — activations drifting past
    them during training saturate, the standard static-QAT tradeoff."""
    params = (ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
              ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b)
    qparams, r = _quantize_layer_static(params, scales)
    # the outer custom_vjp owns differentiation; the inner one's primal is
    # exactly the serving-tier forward — bit-identity train/serve by
    # construction
    return layer_fullblock_q8_static(x, *qparams, r, n_head, causal)


def _q8_ste_static_fwd(x, scales, ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
                       ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b,
                       n_head, causal):
    from mudpt_tpu.ops import fused_block as FB

    params = (ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
              ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b)
    save_limit = 1024 if FB.wide_mlp_save(x.shape[0] * x.shape[1]) else 768
    if FB.save_acts_enabled() and x.shape[-1] <= save_limit:
        qparams, r = _quantize_layer_static(params, scales)
        y, y1, qkv, h = _q8_static_save_forward(
            x, qparams, r, n_head, causal, fc_w.shape[1]
        )
        return y, (x, scales, y1, qkv, h, params)
    y = layer_fullblock_q8_ste_static(
        x, scales, *params, n_head, causal
    )
    return y, (x, scales, None, None, None, params)


def _q8_ste_static_bwd(n_head, causal, res, g):
    x, scales, y1, qkv, h, params = res
    B, S, D = x.shape
    if y1 is None:
        qparams, r = _quantize_layer_static(params, scales)
        _, y1, qkv, h = _q8_static_save_forward(
            x, qparams, r, n_head, causal, params[8].shape[1]
        )
    dx = _call_layer(
        _layer_bwd_kernel, x, params, (y1, qkv, h, g),
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        [pltpu.VMEM((S, 3 * D), x.dtype)],
        n_head=n_head, causal=causal,
    )
    zeros = tuple(jnp.zeros_like(p) for p in params)
    return (dx, jnp.zeros_like(scales), *zeros)


layer_fullblock_q8_ste_static.defvjp(_q8_ste_static_fwd, _q8_ste_static_bwd)


def residual_block_q8(p, x: jax.Array, n_head: int, causal=False) -> jax.Array:
    """Quantize a block's projection weights per-channel (traced; XLA
    fuses and the cost is one weight read) and run the int8 layer kernel.

    Drop-in for models/layers.residual_block under quant mode: same param
    pytree, same (B, S, D) contract; prompts ride through ``x`` so the
    splice machinery is untouched.
    """
    qkv_wq, qkv_ws = quantize_cols(p["attn"]["qkv_w"])
    out_wq, out_ws = quantize_cols(p["attn"]["out_w"])
    fc_wq, fc_ws = quantize_cols(p["mlp"]["fc_w"])
    proj_wq, proj_ws = quantize_cols(p["mlp"]["proj_w"])
    return layer_fullblock_q8(
        x,
        p["ln_1"]["scale"], p["ln_1"]["bias"],
        qkv_wq, qkv_ws, p["attn"]["qkv_b"],
        out_wq, out_ws, p["attn"]["out_b"],
        p["ln_2"]["scale"], p["ln_2"]["bias"],
        fc_wq, fc_ws, p["mlp"]["fc_b"],
        proj_wq, proj_ws, p["mlp"]["proj_b"],
        n_head, causal,
    )
