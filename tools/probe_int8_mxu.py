#!/usr/bin/env python
"""Feasibility probe: does Mosaic lower s8 x s8 -> s32 dot_general, and at
what rate vs bf16?  (v5e datasheet: 394 int8 TOPS vs 197 bf16 TFLOPS.)

Three questions, each answered on the real chip:
  1. does a Pallas kernel containing an int8 matmul compile (Mosaic)?
  2. does the in-kernel fp32 -> int8 round/clip/convert chain verify?
  3. measured rate of the int8 matmul vs the same-shape bf16 matmul.

Run: python tools/probe_int8_mxu.py   (TPU; serial with other chip jobs)
"""

from __future__ import annotations

import functools
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
    ITERS = 64  # matmuls per kernel call, to swamp dispatch overhead

    def mm_bf16_kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((S, DO), jnp.float32)
        for _ in range(ITERS):
            acc += jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[...] = acc.astype(jnp.bfloat16)

    def mm_int8_kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((S, DO), jnp.int32)
        for _ in range(ITERS):
            acc += jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[...] = acc

    def quant_kernel(x_ref, q_ref, s_ref):
        """fp32 -> per-row int8: the dynamic-quant chain the real kernels
        need (max-abs reduce, divide, round, clip, convert)."""
        x = x_ref[...]
        s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8)
        q = jnp.clip(jnp.round(x / s), -127.0, 127.0)
        q_ref[...] = q.astype(jnp.int8)
        s_ref[...] = s

    cp = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    rng = np.random.RandomState(0)
    x32 = rng.randn(S, D).astype(np.float32)
    w32 = rng.randn(D, DO).astype(np.float32)
    xb = jnp.asarray(x32, jnp.bfloat16)
    wb = jnp.asarray(w32, jnp.bfloat16)
    xq = jnp.asarray(np.clip(np.round(x32 * 10), -127, 127), jnp.int8)
    wq = jnp.asarray(np.clip(np.round(w32 * 10), -127, 127), jnp.int8)

    def run(kernel, out_shape, *args):
        f = pl.pallas_call(kernel, out_shape=out_shape, compiler_params=cp)
        f = jax.jit(f)
        o = f(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[0], o)
        t0 = time.perf_counter()
        REP = 8
        for _ in range(REP):
            o = f(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[0], o)
        return (time.perf_counter() - t0) / REP

    # 1+3: matmul rates
    t_bf16 = run(
        mm_bf16_kernel, jax.ShapeDtypeStruct((S, DO), jnp.bfloat16), xb, wb
    )
    macs = S * D * DO * ITERS
    print(f"bf16  {t_bf16*1e3:8.2f} ms  {2*macs/t_bf16/1e12:7.1f} TFLOP/s")

    try:
        t_i8 = run(
            mm_int8_kernel, jax.ShapeDtypeStruct((S, DO), jnp.int32), xq, wq
        )
        print(f"int8  {t_i8*1e3:8.2f} ms  {2*macs/t_i8/1e12:7.1f} TOP/s "
              f" -> {t_bf16/t_i8:.2f}x bf16")
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
            compiler_params=cp,
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
