#!/usr/bin/env python
"""Decompose the int8 serving layer's VPU residual on the real chip.

Context (docs/BENCHMARKS.md, session 5/7): the W8A8 serving forward lands
at ~the bf16 compute roofline — model-MFU ~1.0 against the 197 TF/s bf16
peak but only ~0.50 against the measured 343.5 TOP/s int8 MXU rate.  The
suspected residual is the fp32 work BETWEEN the int8 matmuls: the dynamic
per-row quantization chain (abs -> max-reduce -> divide -> round -> clip
-> convert) on every matmul input and the s32 -> fp32 dequant (two scale
multiplies + bias) on every matmul output, plus the LN/softmax/GELU the
bf16 tier also pays.

This probe times ONE FULL LAYER at the real ViT-B serving shape under
ablated kernel variants, dispatch-free (time delta between an L1-layer and
an L2-layer chained tower inside one jit — constant per-run overhead
cancels; chained layers cannot CSE because each consumes the previous
output, and LayerNorm keeps magnitudes bounded so 16 chained random
layers stay finite):

  bf16       the production bf16 layer kernel (no-save forward)
  q8         the production W8A8 kernel (dynamic per-row activation quant)
  q8_static  per-TENSOR static activation scales: no max-reduce, row
             scale folded into the weight scale (the calibrated-scale
             serving recipe) — keeps round/clip/convert
  q8_recip   dynamic, but quantize by reciprocal MULTIPLY x*(127/max)
             instead of the divide x/(max/127)
  q8_floor   int8 matmuls with a bare astype convert, no quant chain, no
             dequant scales: the kernel's int8-MAC + LN/softmax/GELU
             floor (numerically meaningless, timing-only)

Reading the deltas:
  q8 - q8_floor          = total quant/dequant VPU residual
  q8 - q8_recip          = cost of the wide fp32 divide
  q8_recip - q8_static   = cost of the max-reduce + row-scale dequant mul
  q8_static - q8_floor   = cost of round/clip + the remaining converts
  q8_floor - bf16*r      = int8 MAC win at this shape (r = measured
                           int8/bf16 MXU ratio, ~1.59)

Run: python tools/probe_q8_residual.py   (TPU; serial with other chip jobs)
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mudpt_tpu.models import layers as L
    from mudpt_tpu.ops.fused_block import (
        _COMPILER_PARAMS,
        _full,
        _ln_fp32,
        _mha_acc,
        _quick_gelu,
        _row,
        _row_spec_of,
    )
    from mudpt_tpu.ops import quant_block as QB

    L.set_platform_hint("tpu")

    B, S, D, H = 128, 200, 768, 12
    L1, L2 = 4, 16
    REP = 6

    # ---- kernel body, parameterized by the quantization variant ----
    def quant_rows(x32, mode, static_r):
        if mode == "q8":
            s = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
            s = jnp.maximum(s, 1e-8)
            q = jnp.clip(jnp.round(x32 / s), -127.0, 127.0).astype(jnp.int8)
            return q, s
        if mode == "q8_recip":
            m = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-8)
            r = 127.0 / m
            q = jnp.clip(jnp.round(x32 * r), -127.0, 127.0).astype(jnp.int8)
            return q, m / 127.0
        if mode == "q8_noclip":
            # clip is provably redundant with an exact row max: |x|/s <=
            # 127*(1+eps) rounds to <= 127 (and the 1e-8 scale floor only
            # engages when max <= 127e-8, where |x/s| <= 127 outright)
            s = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
            s = jnp.maximum(s, 1e-8)
            q = jnp.round(x32 / s).astype(jnp.int8)
            return q, s
        if mode == "q8_static":
            q = jnp.clip(jnp.round(x32 * static_r), -127.0, 127.0).astype(
                jnp.int8
            )
            return q, None  # scale folded into the weight scale
        if mode == "q8_floor":
            return x32.astype(jnp.int8), None
        raise ValueError(mode)

    def q8_matmul(xq, xs, wq, ws, b, mode):
        acc = jax.lax.dot_general(
            xq, wq[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32)
        if mode in ("q8", "q8_recip", "q8_noclip"):
            out = out * xs * ws[...]
        elif mode == "q8_static":
            out = out * ws[...]  # ws pre-folded with the static row scale
        return out + b[...].astype(jnp.float32)

    def layer_kernel(
        x_ref,
        ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
        ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
        y_ref, acc_ref, *, n_head, mode, static_r,
    ):
        x = x_ref[0]
        xn, _, _ = _ln_fp32(x, ln1_s[...], ln1_b[...])
        xq, xs = quant_rows(xn, mode, static_r)
        qkv = q8_matmul(xq, xs, qkv_wq, qkv_ws, qkv_b, mode).astype(x.dtype)
        _mha_acc(qkv, acc_ref, n_head=n_head, causal=False, act_dtype=x.dtype)
        aq, a_s = quant_rows(acc_ref[...], mode, static_r)
        x1 = x + q8_matmul(aq, a_s, out_wq, out_ws, out_b, mode).astype(x.dtype)
        x2n, _, _ = _ln_fp32(x1, ln2_s[...], ln2_b[...])
        x2q, x2s = quant_rows(x2n, mode, static_r)
        h = q8_matmul(x2q, x2s, fc_wq, fc_ws, fc_b, mode)
        g = _quick_gelu(h)
        gq, gs = quant_rows(g, mode, static_r)
        y_ref[0] = x1 + q8_matmul(gq, gs, proj_wq, proj_ws, proj_b, mode).astype(
            x.dtype
        )

    def build_layer(qparams, mode):
        def run(x):
            specs = [_row(S, D)] + [_full(*p.shape) for p in qparams]
            out_shape = jax.ShapeDtypeStruct((B, S, D), x.dtype)
            return pl.pallas_call(
                functools.partial(
                    layer_kernel, n_head=H, mode=mode, static_r=8.0
                ),
                grid=(B,),
                in_specs=specs,
                out_specs=_row_spec_of(out_shape),
                out_shape=out_shape,
                scratch_shapes=[pltpu.VMEM((S, D), jnp.float32)],
                compiler_params=_COMPILER_PARAMS,
                interpret=False,
            )(x, *qparams)

        return run

    # ---- params + input, generated ON DEVICE (tunnel H2D is ~16 MB/s) ----
    def make_params(key):
        ks = jax.random.split(key, 12)
        n = lambda k, *s: (jax.random.normal(k, s, jnp.float32) * 0.02)
        return (
            jnp.ones((D,), jnp.float32), n(ks[0], D),          # ln1
            n(ks[1], D, 3 * D).astype(jnp.bfloat16), n(ks[2], 3 * D),
            n(ks[3], D, D).astype(jnp.bfloat16), n(ks[4], D),
            jnp.ones((D,), jnp.float32), n(ks[5], D),          # ln2
            n(ks[6], D, 4 * D).astype(jnp.bfloat16), n(ks[7], 4 * D),
            n(ks[8], 4 * D, D).astype(jnp.bfloat16), n(ks[9], D),
        )

    @jax.jit
    def init():
        key = jax.random.PRNGKey(0)
        p = make_params(key)
        x = jax.random.normal(
            jax.random.PRNGKey(1), (B, S, D), jnp.float32
        ).astype(jnp.bfloat16)
        (ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
         ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b) = p
        qkv_wq, qkv_ws = QB.quantize_cols(qkv_w)
        out_wq, out_ws = QB.quantize_cols(out_w)
        fc_wq, fc_ws = QB.quantize_cols(fc_w)
        proj_wq, proj_ws = QB.quantize_cols(proj_w)
        qparams = (
            ln1_s, ln1_b, qkv_wq, qkv_ws, qkv_b, out_wq, out_ws, out_b,
            ln2_s, ln2_b, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b,
        )
        return x, p, qparams

    x, bf16_params, qparams = jax.tree_util.tree_map(
        lambda a: a.block_until_ready(), init()
    )

    # ---- towers: L chained layer calls inside one jit ----
    def tower(layer_fn, nlayers):
        @jax.jit
        def run(x, params):
            for _ in range(nlayers):
                x = layer_fn_apply(layer_fn, x, params)
            return x

        return run

    def layer_fn_apply(layer_fn, x, params):
        return layer_fn(params)(x)

    def bf16_layer(params):
        from mudpt_tpu.ops.fused_block import layer_fullblock

        (ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
         ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b) = params

        def run(x):
            return layer_fullblock(
                x, ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
                ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b, H, False,
            )

        return run

    def timed(fn, x, params):
        y = fn(x, params)
        float(jnp.sum(y.astype(jnp.float32)))  # host fetch barrier
        t0 = time.perf_counter()
        for _ in range(REP):
            y = fn(x, params)
        float(jnp.sum(y.astype(jnp.float32)))
        return (time.perf_counter() - t0) / REP

    results = {}
    variants = [
        ("bf16", bf16_layer, bf16_params),
        ("q8", lambda qp: build_layer(qp, "q8"), qparams),
        ("q8_recip", lambda qp: build_layer(qp, "q8_recip"), qparams),
        ("q8_noclip", lambda qp: build_layer(qp, "q8_noclip"), qparams),
        ("q8_static", lambda qp: build_layer(qp, "q8_static"), qparams),
        ("q8_floor", lambda qp: build_layer(qp, "q8_floor"), qparams),
    ]
    for name, layer_fn, params in variants:
        try:
            t1 = timed(tower(layer_fn, L1), x, params)
            t2 = timed(tower(layer_fn, L2), x, params)
            per_layer = (t2 - t1) / (L2 - L1)
            results[name] = per_layer
            macs = S * (3 * D * D + D * D + 8 * D * D) * 2  # proj matmuls
            print(
                f"{name:10s} {per_layer*1e3:7.3f} ms/layer "
                f"(L{L1}:{t1*1e3:7.2f} L{L2}:{t2*1e3:7.2f})  "
                f"proj-MACs {B*macs/per_layer/1e12:6.1f} T/s"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}")

    if "q8" in results and "q8_floor" in results:
        q8, fl = results["q8"], results["q8_floor"]
        print(f"\nquant/dequant VPU residual: {(q8-fl)*1e3:.3f} ms/layer "
              f"({100*(q8-fl)/q8:.1f}% of the q8 layer)")
        if "q8_recip" in results:
            print(f"  divide -> recip-mul saves: {(q8-results['q8_recip'])*1e3:.3f} ms")
        if "q8_static" in results and "q8_recip" in results:
            print(f"  max-reduce + row-scale mul: "
                  f"{(results['q8_recip']-results['q8_static'])*1e3:.3f} ms")
            print(f"  round/clip/convert floor:   "
                  f"{(results['q8_static']-fl)*1e3:.3f} ms")
    if "bf16" in results:
        print(f"bf16 reference: {results['bf16']*1e3:.3f} ms/layer")


if __name__ == "__main__":
    main()
