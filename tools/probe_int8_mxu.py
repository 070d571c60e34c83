#!/usr/bin/env python
"""Feasibility probe: does Mosaic lower s8 x s8 -> s32 dot_general, and at
what rate vs bf16?  (v5e datasheet: 394 int8 TOPS vs 197 bf16 TFLOPS.)

Three questions, each answered on the real chip:
  1. does a Pallas kernel containing an int8 matmul compile (Mosaic)?
  2. does the in-kernel fp32 -> int8 round/clip/convert chain verify?
  3. measured rate of the int8 matmul vs the same-shape bf16 matmul.

Methodology (two failure modes found the hard way, round 3):
  * a loop of IDENTICAL dots is legally foldable (CSE) -> every iteration
    must contract a DIFFERENT x slice;
  * this tunnel's per-dispatch overhead is ~14 ms, swamping any
    single-call kernel (64 x 1.8 GFLOP = 0.6 ms at peak) -> the kernel
    runs under a grid of G accumulation steps, timed at TWO grid sizes,
    and the rate is taken from the WORK/TIME DELTA so the constant
    per-call overhead cancels.

Run: python tools/probe_int8_mxu.py   (TPU; serial with other chip jobs)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, D, DO = 384, 768, 3072  # MLP-fc-like shape, batched rows
    ITERS = 16  # distinct x slices contracted per grid step (VMEM-resident)
    G1, G2 = 64, 320  # grid sizes: rate = d(work)/d(time) between them

    def mm_kernel(x_ref, w_ref, o_ref, *, acc_dtype):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        acc = jnp.zeros((S, DO), acc_dtype)
        for i in range(ITERS):  # distinct slices: not CSE-foldable
            acc += jax.lax.dot_general(
                x_ref[i], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
        # accumulate across grid steps (int32 wraps at large G: the probe
        # measures rate, it never reads the accumulated values)
        o_ref[...] += acc

    def quant_kernel(x_ref, q_ref, s_ref):
        """fp32 -> per-row int8: the dynamic-quant chain the real kernels
        need (max-abs reduce, divide, round, clip, convert)."""
        x = x_ref[...]
        s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8)
        q = jnp.clip(jnp.round(x / s), -127.0, 127.0)
        q_ref[...] = q.astype(jnp.int8)
        s_ref[...] = s

    cp = pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024,
        dimension_semantics=("arbitrary",),
    )

    rng = np.random.RandomState(0)
    xs32 = rng.randn(ITERS, S, D).astype(np.float32)
    x32 = xs32[0]
    w32 = rng.randn(D, DO).astype(np.float32)
    xb = jnp.asarray(xs32, jnp.bfloat16)
    wb = jnp.asarray(w32, jnp.bfloat16)
    xq = jnp.asarray(np.clip(np.round(xs32 * 10), -127, 127), jnp.int8)
    wq = jnp.asarray(np.clip(np.round(w32 * 10), -127, 127), jnp.int8)

    def build(g, acc_dtype, x, w):
        f = pl.pallas_call(
            lambda xr, wr, orf: mm_kernel(xr, wr, orf, acc_dtype=acc_dtype),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((ITERS, S, D), lambda i: (0, 0, 0)),
                pl.BlockSpec((D, DO), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((S, DO), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((S, DO), acc_dtype),
            compiler_params=cp,
        )
        return jax.jit(f), x, w

    def timed(f, *args, rep=4):
        o = f(*args)  # compile + warm
        np.asarray(o).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(rep):
            o = f(*args)
        np.asarray(o).ravel()[0]  # host fetch: block_until_ready lies here
        return (time.perf_counter() - t0) / rep

    def rate(acc_dtype, x, w):
        f1, *a1 = build(G1, acc_dtype, x, w)
        f2, *a2 = build(G2, acc_dtype, x, w)
        t1, t2 = timed(f1, *a1), timed(f2, *a2)
        flops = 2 * S * D * DO * ITERS * (G2 - G1)
        return flops / (t2 - t1), t1, t2

    # 1+3: matmul rates, dispatch-free via the grid-size delta
    r_bf16, tb1, tb2 = rate(jnp.float32, xb, wb)
    print(f"bf16  G={G1}:{tb1*1e3:7.2f} ms  G={G2}:{tb2*1e3:7.2f} ms"
          f"  -> {r_bf16/1e12:6.1f} TFLOP/s")

    try:
        r_i8, ti1, ti2 = rate(jnp.int32, xq, wq)
        print(f"int8  G={G1}:{ti1*1e3:7.2f} ms  G={G2}:{ti2*1e3:7.2f} ms"
              f"  -> {r_i8/1e12:6.1f} TOP/s  = {r_i8/r_bf16:.2f}x bf16")
    except Exception as e:  # noqa: BLE001
        print(f"int8 matmul FAILED to lower: {type(e).__name__}: {e}")

    # 2: in-kernel dynamic quantization chain
    try:
        f = jax.jit(pl.pallas_call(
            quant_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((S, D), jnp.int8),
                jax.ShapeDtypeStruct((S, 1), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        ))
        q, s = f(jnp.asarray(x32))
        qn, sn = np.asarray(q), np.asarray(s)
        want = np.clip(np.round(x32 / sn), -127, 127).astype(np.int8)
        ok = np.array_equal(qn, want)
        print(f"in-kernel fp32->int8 quant chain: "
              f"{'OK (exact)' if ok else 'VALUE MISMATCH'}")
    except Exception as e:  # noqa: BLE001
        print(f"quant chain FAILED to lower: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
