"""Pallas TPU fused attention for short sequences (seq <= 256).

CLIP's sequences are tiny — 77 text tokens, 197+n_ctx visual tokens
(SURVEY.md §5 long-context: full-sequence attention fits VMEM trivially) —
so instead of a tiled flash kernel this computes each (batch, head)
attention in ONE VMEM-resident program: fp32 scores + softmax fused with
both matmuls, nothing round-trips through HBM between score computation and
the value contraction.

The backward pass is a second Pallas kernel using the standard flash-style
recompute: scores are rebuilt from q/k (they were never stored), then
  dv = p^T g,  dp = g v^T,  ds = p * (dp - rowsum(dp * p)) * scale,
  dq = ds k,   dk = ds^T q.

Both kernels pad S up to a multiple of 128 lanes internally, masking padded
key columns with -inf, so callers pass natural 77/199-length arrays.  The
only mask shape CLIP needs is causal (text tower), expressed as a static
flag.  Layout: (B, H, S, D_head); grid (B*H,).  Falls back to interpret
mode off-TPU so the same code path is unit-testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_len(s: int, multiple: int = 8) -> int:
    return -(-s // multiple) * multiple


def _build_mask(s: int, s_pad: int, causal: bool) -> jnp.ndarray:
    """Additive fp32 (s_pad, s_pad) mask: causal upper-triangle and/or
    -inf on padded key columns.  Uses a large negative instead of -inf so
    fully-masked padded rows still produce finite softmax outputs."""
    neg = jnp.float32(-1e30)
    mask = jnp.zeros((s_pad, s_pad), jnp.float32)
    if causal:
        causal_m = jnp.triu(jnp.full((s_pad, s_pad), neg, jnp.float32), k=1)
        mask = mask + causal_m
    if s_pad != s:
        col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
        mask = jnp.where(col >= s, neg, mask)
    return mask


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    scores = scores + mask_ref[...]
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    scores = scores + mask_ref[...]
    p = jax.nn.softmax(scores, axis=-1)                      # (S, S)
    dv = jax.lax.dot_general(                                # p^T g
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(                                # g v^T
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _call(kernel, out_shapes, qf, kf, vf, mask_full, extra=()):
    n, S, D = qf.shape
    bspec = pl.BlockSpec((1, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    specs = [bspec, bspec, bspec,
             pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    args = [qf, kf, vf, mask_full]
    for e in extra:
        specs.append(bspec)
        args.append(e)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=specs,
        out_specs=jax.tree_util.tree_map(lambda _: bspec, out_shapes),
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, causal: bool = False):
    """Scaled-dot-product attention, q/k/v: (B, H, S, D) -> (B, H, S, D)."""
    out, _ = _fa_fwd(q, k, v, causal)
    return out


def _fa_fwd(q, k, v, causal):
    B, H, S, D = q.shape
    s_pad = _pad_len(S)
    mask_full = _build_mask(S, s_pad, causal)
    if s_pad != S:
        pad = [(0, 0), (0, 0), (0, s_pad - S), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    scale = D ** -0.5
    qf = q.reshape(B * H, s_pad, D)
    kf = k.reshape(B * H, s_pad, D)
    vf = v.reshape(B * H, s_pad, D)
    out = _call(
        functools.partial(_fwd_kernel, scale=scale),
        jax.ShapeDtypeStruct((B * H, s_pad, D), q.dtype),
        qf, kf, vf, mask_full,
    )
    out = out.reshape(B, H, s_pad, D)[:, :, :S]
    return out, (qf, kf, vf, mask_full, (B, H, S, D))


def _fa_bwd(causal, res, g):
    qf, kf, vf, mask_full, (B, H, S, D) = res
    s_pad = qf.shape[1]
    if s_pad != S:
        g = jnp.pad(g, [(0, 0), (0, 0), (0, s_pad - S), (0, 0)])
    gf = g.reshape(B * H, s_pad, D)
    scale = D ** -0.5
    struct = jax.ShapeDtypeStruct((B * H, s_pad, D), qf.dtype)
    dq, dk, dv = _call(
        functools.partial(_bwd_kernel, scale=scale),
        (struct, struct, struct),
        qf, kf, vf, mask_full, extra=(gf,),
    )
    unpad = lambda t: t.reshape(B, H, s_pad, D)[:, :, :S]
    return unpad(dq), unpad(dk), unpad(dv)


fused_attention.defvjp(_fa_fwd, _fa_bwd)
