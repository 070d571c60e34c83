"""Fused residual half-block Pallas kernels with frozen-weight backward.

The frozen-CLIP structure admits a specialization XLA cannot express: the
backbone's weights never receive gradients, so the backward pass through a
block needs ONLY dx — no dW/db/dLN.  Each half-block therefore runs as one
VMEM-resident Pallas program in both directions:

  attention half:  y = x + out_proj(MHA(LN_fp32(x)))
  mlp half:        y = x + proj(QuickGELU(fc(LN_fp32(x))))

Two backward strategies, selected by :func:`set_save_acts`
(``MUDPT_TPU_SAVE_ACTS``):

  * **save-activations (default)** — forward additionally writes the QKV
    projection (attention half) and the MLP pre-activation (mlp half) to
    HBM; backward skips their recompute, re-deriving only the cheap pieces
    (LN statistics from x on the VPU; the per-head softmax from saved q/k —
    bit-identical to forward since both start from the same bf16 qkv).
    This removes the two big recompute matmuls (the 3·D² QKV projection and
    the 4·D² MLP fc), ~55% of forward FLOPs, from the backward pass, at
    ~2.1 MB/image/layer of HBM traffic that pipelines behind the compute.
  * **recompute** — forward saves only x; backward replays the forward
    in-kernel.  Minimum-memory mode for batch sizes where the saved
    activations would not fit HBM.

Gradients w.r.t. the block weights are ZERO by construction — these ops are
only legal under a frozen backbone (the prompt-tuning regime; prompt tokens
receive their gradients through dx at the splice positions).  Enabled via
``MUDPT_TPU_BLOCK=pallas`` / :func:`mudpt_tpu.models.layers.set_block_impl`.

The causal text mask is handled with a static flag (mask built in-kernel).
"""

from __future__ import annotations

import contextlib
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30

# The Mosaic default scoped-VMEM cap is 16 MB; the chip has far more.  The
# D=1024 (ViT-L) kernels sit just above the default (16.2-17.1 MB measured),
# so raise the cap — the compiler still errors if a kernel genuinely
# exceeds physical VMEM.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

# Forward-FLOPs fraction the backward does NOT have to recompute, for
# bench.py's executed-FLOPs accounting.  Save-activations mode re-derives
# only the per-head score matmul (+ softmax): ~0.5 of the ~13 D^2-units per
# token-layer => 0.96 saved.  Recompute mode replays the QKV projection (3),
# score matmul (~0.5) and MLP fc (4) but NEVER the pv/out-proj/MLP-proj
# matmuls (~5.5 of 13) => 0.42 saved even then.
SAVED_FWD_FRACTION_RECOMPUTE = 0.42
# one boolean-env parser, shared semantics with config/perf._as_bool — the
# import-time init and the config applier must agree on what "false" means
_SAVE_ACTS = os.environ.get("MUDPT_TPU_SAVE_ACTS", "1").lower() not in (
    "0", "false", "no", ""
)
SAVED_FWD_FRACTION = 0.96 if _SAVE_ACTS else SAVED_FWD_FRACTION_RECOMPUTE


def set_save_acts(on: bool) -> None:
    """Toggle the save-activations backward (see module docstring)."""
    global _SAVE_ACTS, SAVED_FWD_FRACTION
    _SAVE_ACTS = bool(on)
    SAVED_FWD_FRACTION = 0.96 if _SAVE_ACTS else SAVED_FWD_FRACTION_RECOMPUTE


def save_acts_enabled() -> bool:
    return _SAVE_ACTS


# Wide-MLP (768 < D <= 1024, i.e. ViT-L vision) h-save policy.  Saving the
# (B, S, 4D) pre-activation at D=1024 costs ~2.1 MB/img/layer of HBM: it
# measured +4.6% and model-MFU 0.706 at ViT-L B=96 but OOMs at the
# throughput-optimal batch (docs/BENCHMARKS.md round 3).  'auto' (default)
# enables the save exactly while the per-shard row-token count stays within
# the measured-safe budget (B <= ~112 at ViT-L's padded seq 264), so the
# default ViT-L bench hits the opt-in number without an env var; '1'/'0'
# force.  Env MUDPT_TPU_SAVE_MLP_WIDE overrides the config (config/perf).
_SAVE_MLP_WIDE = "auto"
_WIDE_SAVE_ROW_TOKENS = 112 * 264


def set_save_mlp_wide(mode: str) -> None:
    assert str(mode) in ("auto", "1", "0"), mode
    global _SAVE_MLP_WIDE
    _SAVE_MLP_WIDE = str(mode)


def wide_mlp_save(row_tokens: Optional[int] = None) -> bool:
    """Whether the MLP h-save applies at D in (768, 1024] for a call over
    ``row_tokens`` = rows x padded-seq (None = unknown -> the static
    budget check is skipped and 'auto' says yes)."""
    mode = os.environ.get("MUDPT_TPU_SAVE_MLP_WIDE", _SAVE_MLP_WIDE)
    if mode == "auto":
        return row_tokens is None or row_tokens <= _WIDE_SAVE_ROW_TOKENS
    return mode == "1"


def saved_fraction_for_width(width: int, row_tokens: Optional[int] = None) -> float:
    """Forward-FLOPs fraction the backward skips at a given tower width,
    matching the per-width gating in this module: D<=768 saves qkv + MLP
    pre-activation (0.96); 768<D<=1024 saves qkv and — within the wide-MLP
    policy above — the MLP pre-activation (0.96), else recomputes its fc
    (~0.65); wider falls back to full-recompute behavior (0.42).
    Recompute mode is 0.42 everywhere."""
    if not _SAVE_ACTS:
        return SAVED_FWD_FRACTION_RECOMPUTE
    if width <= 768:
        return 0.96
    if width <= 1024:
        return 0.96 if wide_mlp_save(row_tokens) else 0.65
    return SAVED_FWD_FRACTION_RECOMPUTE


@contextlib.contextmanager
def saved_acts(on: bool):
    """Trace-time scope for the backward strategy.  Values are unaffected
    (both modes compute identical forwards); only what forward stores for
    backward changes — e.g. CoCoOp's chunked per-instance text encode runs
    with saves OFF, where storing qkv/h for chunk·n_cls sequences would
    dwarf the recompute cost (trainers/cocoop.py)."""
    prev = _SAVE_ACTS
    set_save_acts(on)
    try:
        yield
    finally:
        set_save_acts(prev)


def _interpret() -> bool:
    """Interpret-mode fallback for non-TPU targets (unit tests on CPU).

    Decided from the trainer-recorded target platform, not
    ``jax.default_backend()`` — a registered TPU plugin must not force
    compiled Mosaic kernels onto a CPU device mesh."""
    from mudpt_tpu.models.layers import target_platform

    return target_platform() != "tpu"


def _ln_fp32(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * inv
    xn = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return xn, xhat, inv


def _ln_bwd_dx(dxn, xhat, inv, scale):
    """dx of LayerNorm given upstream grad on the normalized output."""
    g = dxn * scale.astype(jnp.float32)  # (S, D) fp32
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gx = jnp.mean(g * xhat, axis=-1, keepdims=True)
    return (g - gm - xhat * gx) * inv


def _causal_mask(S, causal=True):
    """Additive mask.  ``causal`` is the static spec threaded through the
    custom-vjp wrappers: True = standard causal; a ``(period, valid)`` tuple
    = PACKED sequences — several independent rows of one logical batch laid
    out along the sequence axis with stride ``period`` (sublane-aligned),
    each sequence ``valid`` tokens long.  Attention is causal within a
    sequence, blocked across sequences, and pad-key positions are masked;
    pad-query rows compute garbage that stays confined to themselves and is
    dropped at unpack (models/text.py pack_rows)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    if causal is True:
        return jnp.where(col > row, jnp.float32(_NEG), 0.0)
    period, valid = causal
    ok = (
        (col <= row)
        & ((row // period) == (col // period))
        & ((col % period) < valid)
    )
    return jnp.where(ok, 0.0, jnp.float32(_NEG))


def _head_qkv(qkv, D, hd, h):
    q = qkv[:, h * hd : (h + 1) * hd]
    k = qkv[:, D + h * hd : D + (h + 1) * hd]
    v = qkv[:, 2 * D + h * hd : 2 * D + (h + 1) * hd]
    return q, k, v


def _head_probs(q, k, scale, mask):
    """fp32 softmax(q k^T * scale + mask): identical in forward and in the
    backward's re-derivation because both consume the same bf16 q/k."""
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask
    return jax.nn.softmax(scores, axis=-1)


def _attn_block_spec(S, causal):
    """(block_len, mask) the attention loops run over.  A ``(period,
    valid)`` packed spec runs PER-SEQUENCE attention over aligned row
    blocks — the packed projections keep their big-M matmuls while the
    score/AV matmuls and softmax stay at single-sequence size (no ×G FLOP
    inflation, unlike the block-diagonal-mask fallback)."""
    if isinstance(causal, tuple):
        period, valid = causal
        return period, _causal_mask(period, (period, valid))
    if causal:
        return S, _causal_mask(S)
    return S, None


def _mha_acc(qkv, acc_ref, *, n_head, causal, act_dtype):
    """Multi-head attention from a packed qkv into the accumulator ref,
    looping (sequence block × head)."""
    S = qkv.shape[0]
    D = qkv.shape[1] // 3
    hd = D // n_head
    P, mask = _attn_block_spec(S, causal)
    for g in range(S // P):
        rows = slice(g * P, (g + 1) * P)
        qkv_g = qkv if P == S else qkv[rows]
        for h in range(n_head):
            q, k, v = _head_qkv(qkv_g, D, hd, h)
            p = _head_probs(q, k, hd ** -0.5, mask)
            o = jax.lax.dot_general(
                p.astype(act_dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[rows, h * hd : (h + 1) * hd] = o.astype(acc_ref.dtype)


def _mha_grads_into(qkv, d_acc, dqkv_ref, *, n_head, causal, dtype):
    """dq/dk/dv of every (sequence block × head) into the dqkv ref."""
    S = qkv.shape[0]
    D = qkv.shape[1] // 3
    hd = D // n_head
    scale = hd ** -0.5
    P, mask = _attn_block_spec(S, causal)
    for g in range(S // P):
        rows = slice(g * P, (g + 1) * P)
        qkv_g = qkv if P == S else qkv[rows]
        d_acc_g = d_acc if P == S else d_acc[rows]
        for h in range(n_head):
            q, k, v = _head_qkv(qkv_g, D, hd, h)
            p = _head_probs(q, k, scale, mask)
            do = d_acc_g[:, h * hd : (h + 1) * hd]
            dq, dk, dv = _head_grads(p, q, k, v, do, scale, dtype)
            dqkv_ref[rows, h * hd : (h + 1) * hd] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[rows, D + h * hd : D + (h + 1) * hd] = dk.astype(
                dqkv_ref.dtype
            )
            dqkv_ref[rows, 2 * D + h * hd : 2 * D + (h + 1) * hd] = dv.astype(
                dqkv_ref.dtype
            )


def _head_grads(p, q, k, v, do, scale, dtype):
    """dq, dk, dv of one softmax-attention head.

    Matmul OPERANDS are cast to the activation dtype (bf16 on the training
    path — the MXU's full-rate format; fp32 operands run at a fraction of
    peak) with fp32 accumulation; the softmax gradient itself stays fp32 on
    the VPU.  This matches XLA's own mixed-precision attention backward."""
    p_lo = p.astype(dtype)
    do_lo = do.astype(dtype)
    dp = jax.lax.dot_general(                # do @ v^T  -> (S, S) fp32
        do_lo, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv = jax.lax.dot_general(                # p^T @ do
        p_lo, do_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    ds_lo = ds.astype(dtype)
    dq = jax.lax.dot_general(
        ds_lo, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds_lo, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dq, dk, dv


# ---------------------------------------------------------------------------
# attention half-block
# ---------------------------------------------------------------------------

def _attn_project(x, ln_s, ln_b, qkv_w, qkv_b):
    xn, _, _ = _ln_fp32(x, ln_s[...], ln_b[...])
    xn = xn.astype(x.dtype)
    return jax.lax.dot_general(
        xn, qkv_w[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + qkv_b[...].astype(x.dtype)


def _attn_finish(x, acc, out_w, out_b):
    attn_out = jax.lax.dot_general(
        acc.astype(x.dtype), out_w[...].astype(x.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(x.dtype) + out_b[...].astype(x.dtype)
    return x + attn_out


def _attn_fwd_kernel(x_ref, ln_s, ln_b, qkv_w, qkv_b, out_w, out_b, y_ref,
                     acc_ref, *, n_head, causal):
    x = x_ref[0]
    qkv = _attn_project(x, ln_s, ln_b, qkv_w, qkv_b)
    _mha_acc(qkv, acc_ref, n_head=n_head, causal=causal, act_dtype=x.dtype)
    y_ref[0] = _attn_finish(x, acc_ref[...], out_w, out_b)


def _attn_fwd_save_kernel(x_ref, ln_s, ln_b, qkv_w, qkv_b, out_w, out_b,
                          y_ref, qkv_ref, acc_ref, *, n_head, causal):
    """Forward that additionally stores the bf16 QKV projection."""
    x = x_ref[0]
    qkv = _attn_project(x, ln_s, ln_b, qkv_w, qkv_b)
    qkv_ref[0] = qkv
    _mha_acc(qkv, acc_ref, n_head=n_head, causal=causal, act_dtype=x.dtype)
    y_ref[0] = _attn_finish(x, acc_ref[...], out_w, out_b)


def _attn_bwd_core(x, qkv, g, ln_s, ln_b, qkv_w, out_w, dqkv_ref, *,
                   n_head, causal):
    """dx given the (saved or recomputed) QKV projection."""
    # d(attn pre-out) = g @ out_w^T  (contract output dim)
    d_acc = jax.lax.dot_general(
        g, out_w[...].astype(g.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, D) fp32

    _mha_grads_into(
        qkv, d_acc, dqkv_ref, n_head=n_head, causal=causal, dtype=x.dtype
    )

    dxn = jax.lax.dot_general(               # dqkv @ qkv_w^T
        dqkv_ref[...].astype(x.dtype), qkv_w[...].astype(x.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    _, xhat, inv = _ln_fp32(x, ln_s[...], ln_b[...])  # VPU-only recompute
    dx_ln = _ln_bwd_dx(dxn, xhat, inv, ln_s[...])
    return (g.astype(jnp.float32) + dx_ln).astype(x.dtype)


def _attn_bwd_kernel(x_ref, ln_s, ln_b, qkv_w, qkv_b, out_w, out_b, g_ref,
                     dx_ref, dqkv_ref, *, n_head, causal):
    """Recompute the QKV projection, then dx only (weights frozen)."""
    x = x_ref[0]
    qkv = _attn_project(x, ln_s, ln_b, qkv_w, qkv_b)
    dx_ref[0] = _attn_bwd_core(
        x, qkv, g_ref[0], ln_s, ln_b, qkv_w, out_w, dqkv_ref,
        n_head=n_head, causal=causal,
    )


def _attn_bwd_save_kernel(x_ref, ln_s, ln_b, qkv_w, qkv_b, out_w, out_b,
                          qkv_saved, g_ref, dx_ref, dqkv_ref, *, n_head,
                          causal):
    """dx from the forward-saved QKV projection (no projection recompute)."""
    dx_ref[0] = _attn_bwd_core(
        x_ref[0], qkv_saved[0], g_ref[0], ln_s, ln_b, qkv_w, out_w,
        dqkv_ref, n_head=n_head, causal=causal,
    )


# ---------------------------------------------------------------------------
# mlp half-block
# ---------------------------------------------------------------------------

def _quick_gelu(h):
    return h * jax.nn.sigmoid(1.702 * h)


def _quick_gelu_grad(h):
    s = jax.nn.sigmoid(1.702 * h)
    return s + 1.702 * h * s * (1.0 - s)


def _mlp_pre(x, ln_s, ln_b, fc_w, fc_b):
    xn, _, _ = _ln_fp32(x, ln_s[...], ln_b[...])
    xn = xn.astype(x.dtype)
    # GELU runs in fp32: Mosaic miscompiles transcendentals on wide bf16
    # vectors ('vector.broadcast' verification failure)
    return jax.lax.dot_general(
        xn, fc_w[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + fc_b[...].astype(jnp.float32)


def _mlp_fwd_kernel(x_ref, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b, y_ref,
                    *, _unused=None):
    x = x_ref[0]
    h32 = _mlp_pre(x, ln_s, ln_b, fc_w, fc_b)
    a = _quick_gelu(h32).astype(x.dtype)
    out = jax.lax.dot_general(
        a, proj_w[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + proj_b[...].astype(x.dtype)
    y_ref[0] = x + out


def _mlp_fwd_save_kernel(x_ref, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b,
                         y_ref, h_ref, *, _unused=None):
    """Forward that additionally stores the bf16 MLP pre-activation."""
    x = x_ref[0]
    h32 = _mlp_pre(x, ln_s, ln_b, fc_w, fc_b)
    h_ref[0] = h32.astype(h_ref.dtype)
    a = _quick_gelu(h32).astype(x.dtype)
    out = jax.lax.dot_general(
        a, proj_w[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + proj_b[...].astype(x.dtype)
    y_ref[0] = x + out


def _mlp_bwd_core(x, h32, g, ln_s, ln_b, fc_w, proj_w):
    da = jax.lax.dot_general(                # g @ proj_w^T
        g, proj_w[...].astype(g.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = da * _quick_gelu_grad(h32)          # fp32 (Mosaic bf16-sigmoid bug)
    dxn = jax.lax.dot_general(               # dh @ fc_w^T
        dh.astype(x.dtype), fc_w[...].astype(x.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    _, xhat, inv = _ln_fp32(x, ln_s[...], ln_b[...])  # VPU-only recompute
    dx_ln = _ln_bwd_dx(dxn, xhat, inv, ln_s[...])
    return (g.astype(jnp.float32) + dx_ln).astype(x.dtype)


def _mlp_bwd_kernel(x_ref, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b, g_ref,
                    dx_ref, *, _unused=None):
    x = x_ref[0]
    h32 = _mlp_pre(x, ln_s, ln_b, fc_w, fc_b)
    dx_ref[0] = _mlp_bwd_core(x, h32, g_ref[0], ln_s, ln_b, fc_w, proj_w)


def _mlp_bwd_save_kernel(x_ref, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b,
                         h_saved, g_ref, dx_ref, *, _unused=None):
    """dx from the forward-saved pre-activation (no fc recompute)."""
    x = x_ref[0]
    h32 = h_saved[0].astype(jnp.float32)
    dx_ref[0] = _mlp_bwd_core(x, h32, g_ref[0], ln_s, ln_b, fc_w, proj_w)


# ---------------------------------------------------------------------------
# chunked mlp half-block (wide models: stream fc/proj in hidden-dim chunks)
# ---------------------------------------------------------------------------
#
# For D=1024/4D=4096 (ViT-L) the monolithic MLP kernel's weights alone are
# ~17 MB — over VMEM.  Grid (B, K) streams (D, CHUNK) fc columns and
# (CHUNK, D) proj rows per step; the LN output is computed once per image
# (k==0) into persistent scratch and the output accumulates across k.

def _select_row(ref, k):
    """Row k of a small 2-D ref as fp32, via masked sum: dynamic sublane
    slices must be 8-aligned on TPU, but a compare-and-reduce is free."""
    rows = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 0)
    return jnp.sum(
        jnp.where(rows == k, ref[...].astype(jnp.float32), 0.0), axis=0
    )


def _mlp_chunk_fwd_kernel(x_ref, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b,
                          y_ref, xn_ref):
    k = pl.program_id(1)
    x = x_ref[0]

    @pl.when(k == 0)
    def _():
        xn, _, _ = _ln_fp32(x, ln_s[...], ln_b[...])
        xn_ref[...] = xn.astype(x.dtype)
        y_ref[0] = x + proj_b[...].astype(x.dtype)

    h32 = jax.lax.dot_general(
        xn_ref[...], fc_w[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + _select_row(fc_b, k)
    a = _quick_gelu(h32).astype(x.dtype)
    out = jax.lax.dot_general(
        a, proj_w[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y_ref[0] = y_ref[0] + out


def _mlp_chunk_bwd_kernel(x_ref, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b,
                          g_ref, dx_ref, xn_ref, dxn_ref):
    k = pl.program_id(1)
    n_k = pl.num_programs(1)
    x = x_ref[0]
    g = g_ref[0]

    @pl.when(k == 0)
    def _():
        xn, _, _ = _ln_fp32(x, ln_s[...], ln_b[...])
        xn_ref[...] = xn.astype(x.dtype)
        dxn_ref[...] = jnp.zeros_like(dxn_ref)

    h32 = jax.lax.dot_general(
        xn_ref[...], fc_w[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + _select_row(fc_b, k)
    da = jax.lax.dot_general(
        g, proj_w[...].astype(g.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = da * _quick_gelu_grad(h32)
    dxn_ref[...] = dxn_ref[...] + jax.lax.dot_general(
        dh.astype(x.dtype), fc_w[...].astype(x.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        # recompute LN stats for the vjp (cheap; avoids extra scratch)
        _, xhat, inv = _ln_fp32(x, ln_s[...], ln_b[...])
        dx_ln = _ln_bwd_dx(dxn_ref[...], xhat, inv, ln_s[...])
        dx_ref[0] = (g.astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)


def _pick_chunk(dh: int, d: int) -> int:
    # keep the double-buffered (d, chunk)+(chunk, d) weight blocks + the
    # (S, chunk)/(S, d) fp32 staging buffers within the 16 MB VMEM budget:
    # chunk 2048 fits at d<=768; at d=1024 the BACKWARD kernel (which also
    # stages dxn in fp32) measured 840 KB over the limit with chunk 1024,
    # so wide models stream 512-column chunks
    max_chunk = 2048 if d <= 768 else 512
    for c in (2048, 1536, 1024, 512):
        if c <= max_chunk and dh % c == 0:
            return c
    return dh


def _call_mlp_chunked(kernel, x, params, extra, out_shapes, scratch):
    B, S, D = x.shape
    Dh = params[2].shape[1]
    chunk = _pick_chunk(Dh, D)
    K = Dh // chunk
    # fc_b is staged as 2-D (K, chunk), loaded WHOLE (it's a few KB) with the
    # chunk row selected in-kernel by program id: 1-D bf16 blocks narrower
    # than XLA's 1024-element tile fail Mosaic layout verification, and a
    # (1, chunk) block would need a sublane-divisible leading dim
    params = list(params)
    params[3] = params[3].reshape(K, chunk)
    specs = [
        pl.BlockSpec((1, S, D), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D,), lambda i, k: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((D,), lambda i, k: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, chunk), lambda i, k: (0, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, chunk), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, D), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D,), lambda i, k: (0,), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, S, D), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in extra
    ]
    out_spec = pl.BlockSpec(
        (1, S, D), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B, K),
        in_specs=specs,
        out_specs=jax.tree_util.tree_map(lambda _: out_spec, out_shapes),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *params, *extra)


@jax.custom_vjp
def mlp_halfblock_chunked(x, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b):
    """Chunked-weight variant of :func:`mlp_halfblock` for wide models."""
    y, _ = _mlp_chunk_fwd(x, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b)
    return y


def _mlp_chunk_fwd(x, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b):
    B, S, D = x.shape
    params = (ln_s, ln_b, fc_w, fc_b, proj_w, proj_b)
    y = _call_mlp_chunked(
        _mlp_chunk_fwd_kernel, x, params, (),
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        [pltpu.VMEM((S, D), x.dtype)],
    )
    return y, (x, params)


def _mlp_chunk_bwd(res, g):
    x, params = res
    B, S, D = x.shape
    dx = _call_mlp_chunked(
        _mlp_chunk_bwd_kernel, x, params, (g,),
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        [pltpu.VMEM((S, D), x.dtype), pltpu.VMEM((S, D), jnp.float32)],
    )
    zeros = tuple(jnp.zeros_like(p) for p in params)
    return (dx, *zeros)


mlp_halfblock_chunked.defvjp(_mlp_chunk_fwd, _mlp_chunk_bwd)


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJPs
# ---------------------------------------------------------------------------

def _full(*shape):
    return pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


def _row(S, X):
    """One (S, X) image row of a (B, S, X) array per grid step."""
    return pl.BlockSpec((1, S, X), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _row_spec_of(shaped):
    return _row(shaped.shape[1], shaped.shape[2])


def _call_attn(kernel, x, params, extra, out_shapes, scratch, **kw):
    B, S, D = x.shape
    specs = [
        _row(S, D),
        _full(D), _full(D),
        _full(D, 3 * D), _full(3 * D),
        _full(D, D), _full(D),
    ] + [_row_spec_of(e) for e in extra]
    return pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(B,),
        in_specs=specs,
        out_specs=jax.tree_util.tree_map(_row_spec_of, out_shapes),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *params, *extra)


def _call_mlp(kernel, x, params, extra, out_shapes, **kw):
    B, S, D = x.shape
    Dh = params[2].shape[1]  # 4D
    specs = [
        _row(S, D),
        _full(D), _full(D),
        _full(D, Dh), _full(Dh),
        _full(Dh, D), _full(D),
    ] + [_row_spec_of(e) for e in extra]
    return pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(B,),
        in_specs=specs,
        out_specs=jax.tree_util.tree_map(_row_spec_of, out_shapes),
        out_shape=out_shapes,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *params, *extra)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def attn_halfblock(x, ln_s, ln_b, qkv_w, qkv_b, out_w, out_b,
                   n_head: int, causal: bool = False):
    """y = x + out_proj(MHA(LN(x))).  Grads flow to x ONLY (frozen block).

    The primal (inference-only: evaluate(), zero-shot encode) always runs the
    NON-saving kernel — the save-acts qkv write is pure HBM waste when no
    backward follows (pallas_call outputs are not dead-code-eliminated)."""
    B, S, D = x.shape
    params = (ln_s, ln_b, qkv_w, qkv_b, out_w, out_b)
    return _call_attn(
        _attn_fwd_kernel, x, params, (),
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        [pltpu.VMEM((S, D), jnp.float32)],
        n_head=n_head, causal=causal,
    )


def _attn_fwd(x, ln_s, ln_b, qkv_w, qkv_b, out_w, out_b, n_head, causal):
    B, S, D = x.shape
    params = (ln_s, ln_b, qkv_w, qkv_b, out_w, out_b)
    scratch = [pltpu.VMEM((S, D), jnp.float32)]
    # D <= 1024 covers every CLIP tower; the save-backward needs the raised
    # VMEM cap at D=1024 and wins there too once the layer loop is unrolled
    # (ViT-L: 319 vs 299 img/s at batch 128 — on the rolled scan it LOST,
    # 245 vs 261, to the residual-stacking copies; docs/BENCHMARKS.md)
    if _SAVE_ACTS and D <= 1024:
        y, qkv = _call_attn(
            _attn_fwd_save_kernel, x, params, (),
            (
                jax.ShapeDtypeStruct((B, S, D), x.dtype),
                jax.ShapeDtypeStruct((B, S, 3 * D), x.dtype),
            ),
            scratch,
            n_head=n_head, causal=causal,
        )
    else:
        y = _call_attn(
            _attn_fwd_kernel, x, params, (),
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
            scratch,
            n_head=n_head, causal=causal,
        )
        qkv = None
    return y, (x, qkv, params)


def _attn_bwd(n_head, causal, res, g):
    x, qkv, params = res
    B, S, D = x.shape
    # dqkv is staged in the activation dtype: it feeds a bf16-operand matmul
    # (see _attn_bwd_core) and halves the scratch footprint
    scratch = [pltpu.VMEM((S, 3 * D), x.dtype)]
    if qkv is not None:
        dx = _call_attn(
            _attn_bwd_save_kernel, x, params, (qkv, g),
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
            scratch,
            n_head=n_head, causal=causal,
        )
    else:
        dx = _call_attn(
            _attn_bwd_kernel, x, params, (g,),
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
            scratch,
            n_head=n_head, causal=causal,
        )
    zeros = tuple(jnp.zeros_like(p) for p in params)
    return (dx, *zeros)


attn_halfblock.defvjp(_attn_fwd, _attn_bwd)


@jax.custom_vjp
def mlp_halfblock(x, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b):
    """y = x + proj(QuickGELU(fc(LN(x)))).  Grads flow to x ONLY.

    Primal (inference-only) runs the non-saving kernel — no h write."""
    B, S, D = x.shape
    params = (ln_s, ln_b, fc_w, fc_b, proj_w, proj_b)
    return _call_mlp(
        _mlp_fwd_kernel, x, params, (),
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
    )


def _mlp_fwd(x, ln_s, ln_b, fc_w, fc_b, proj_w, proj_b):
    B, S, D = x.shape
    Dh = fc_w.shape[1]
    params = (ln_s, ln_b, fc_w, fc_b, proj_w, proj_b)
    # h-saving at D=1024 puts ~2.1 MB/img/layer more in HBM — applied only
    # within the wide-MLP row-token budget (policy at wide_mlp_save above)
    save_limit = 1024 if wide_mlp_save(B * S) else 768
    if _SAVE_ACTS and D <= save_limit:
        y, h = _call_mlp(
            _mlp_fwd_save_kernel, x, params, (),
            (
                jax.ShapeDtypeStruct((B, S, D), x.dtype),
                jax.ShapeDtypeStruct((B, S, Dh), x.dtype),
            ),
        )
    else:
        y = _call_mlp(
            _mlp_fwd_kernel, x, params, (),
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
        )
        h = None
    return y, (x, h, params)


def _mlp_bwd(res, g):
    x, h, params = res
    B, S, D = x.shape
    if h is not None:
        dx = _call_mlp(
            _mlp_bwd_save_kernel, x, params, (h, g),
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
        )
    else:
        dx = _call_mlp(
            _mlp_bwd_kernel, x, params, (g,),
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
        )
    zeros = tuple(jnp.zeros_like(p) for p in params)
    return (dx, *zeros)


mlp_halfblock.defvjp(_mlp_fwd, _mlp_bwd)


# kept for the standalone microbenchmark in docs/BENCHMARKS.md
def fused_attention_halfblock(x, ln_scale, ln_bias, qkv_w, qkv_b, out_w,
                              out_b, n_head: int):
    return attn_halfblock(
        x, ln_scale, ln_bias, qkv_w, qkv_b, out_w, out_b, n_head, False
    )


# ---------------------------------------------------------------------------
# full-layer kernel: attention half + MLP half in ONE program (save-acts)
# ---------------------------------------------------------------------------
#
# The residual stream between the two halves (y1 = x + attn_out) never
# round-trips through HBM in forward, and in backward the inter-half
# gradient dy1 stays in VMEM — vs the half-block pair this removes
# ~2 reads + 1 write of (B, S, D) bf16 per layer per direction.  y1 IS
# written once (the MLP-half backward needs its LayerNorm statistics; saving
# it is cheaper than recomputing the whole attention half).  D <= 768 only:
# the combined weights (~14 MB bf16) + buffers fit comfortably under the
# raised VMEM cap at ViT-B width, while D=1024 would also re-inflate the
# HBM save set that measured as an OOM for the MLP half.

def _layer_fwd_kernel(x_ref, ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
                      ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b,
                      y_ref, y1_ref, qkv_ref, h_ref, acc_ref, *, n_head,
                      causal):
    x = x_ref[0]
    qkv = _attn_project(x, ln1_s, ln1_b, qkv_w, qkv_b)
    qkv_ref[0] = qkv
    _mha_acc(qkv, acc_ref, n_head=n_head, causal=causal, act_dtype=x.dtype)
    y1 = _attn_finish(x, acc_ref[...], out_w, out_b)
    y1_ref[0] = y1
    h32 = _mlp_pre(y1, ln2_s, ln2_b, fc_w, fc_b)
    h_ref[0] = h32.astype(h_ref.dtype)
    a = _quick_gelu(h32).astype(y1.dtype)
    out = jax.lax.dot_general(
        a, proj_w[...].astype(y1.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y1.dtype) + proj_b[...].astype(y1.dtype)
    y_ref[0] = y1 + out


def _layer_fwd_nosave_kernel(x_ref, ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
                             ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b,
                             y_ref, acc_ref, *, n_head, causal):
    # inference-only variant of _layer_fwd_kernel: no y1/qkv/h HBM writes
    x = x_ref[0]
    qkv = _attn_project(x, ln1_s, ln1_b, qkv_w, qkv_b)
    _mha_acc(qkv, acc_ref, n_head=n_head, causal=causal, act_dtype=x.dtype)
    y1 = _attn_finish(x, acc_ref[...], out_w, out_b)
    h32 = _mlp_pre(y1, ln2_s, ln2_b, fc_w, fc_b)
    a = _quick_gelu(h32).astype(y1.dtype)
    out = jax.lax.dot_general(
        a, proj_w[...].astype(y1.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y1.dtype) + proj_b[...].astype(y1.dtype)
    y_ref[0] = y1 + out


def _layer_bwd_kernel(x_ref, ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
                      ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b,
                      y1_sv, qkv_sv, h_sv, g_ref, dx_ref, dqkv_ref, *,
                      n_head, causal):
    y1 = y1_sv[0]
    h32 = h_sv[0].astype(jnp.float32)
    # MLP-half dx (== g + LN2-chain grad) stays in VMEM as the attention
    # half's upstream gradient
    dy1 = _mlp_bwd_core(y1, h32, g_ref[0], ln2_s, ln2_b, fc_w, proj_w)
    dx_ref[0] = _attn_bwd_core(
        x_ref[0], qkv_sv[0], dy1, ln1_s, ln1_b, qkv_w, out_w, dqkv_ref,
        n_head=n_head, causal=causal,
    )


def _call_layer(kernel, x, params, extra, out_shapes, scratch, **kw):
    B, S, D = x.shape
    Dh = params[8].shape[1]
    specs = [
        _row(S, D),
        _full(D), _full(D),
        _full(D, 3 * D), _full(3 * D),
        _full(D, D), _full(D),
        _full(D), _full(D),
        _full(D, Dh), _full(Dh),
        _full(Dh, D), _full(D),
    ] + [_row_spec_of(e) for e in extra]
    return pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(B,),
        in_specs=specs,
        out_specs=jax.tree_util.tree_map(_row_spec_of, out_shapes),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *params, *extra)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def layer_fullblock(x, ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
                    ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b,
                    n_head: int, causal: bool = False):
    """One full pre-LN residual layer (both halves) as a single Pallas
    program in each direction.  Grads flow to x ONLY (frozen layer).

    Primal (inference-only) runs a no-save kernel: no y1/qkv/h writes."""
    B, S, D = x.shape
    params = (ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
              ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b)
    return _call_layer(
        _layer_fwd_nosave_kernel, x, params, (),
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        [pltpu.VMEM((S, D), jnp.float32)],
        n_head=n_head, causal=causal,
    )


def _layer_fwd(x, ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
               ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b, n_head, causal):
    B, S, D = x.shape
    Dh = fc_w.shape[1]
    params = (ln1_s, ln1_b, qkv_w, qkv_b, out_w, out_b,
              ln2_s, ln2_b, fc_w, fc_b, proj_w, proj_b)
    y, y1, qkv, h = _call_layer(
        _layer_fwd_kernel, x, params, (),
        (
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
            jax.ShapeDtypeStruct((B, S, 3 * D), x.dtype),
            jax.ShapeDtypeStruct((B, S, Dh), x.dtype),
        ),
        [pltpu.VMEM((S, D), jnp.float32)],
        n_head=n_head, causal=causal,
    )
    return y, (x, y1, qkv, h, params)


def _layer_bwd(n_head, causal, res, g):
    x, y1, qkv, h, params = res
    B, S, D = x.shape
    dx = _call_layer(
        _layer_bwd_kernel, x, params, (y1, qkv, h, g),
        jax.ShapeDtypeStruct((B, S, D), x.dtype),
        [pltpu.VMEM((S, 3 * D), x.dtype)],
        n_head=n_head, causal=causal,
    )
    zeros = tuple(jnp.zeros_like(p) for p in params)
    return (dx, *zeros)


layer_fullblock.defvjp(_layer_fwd, _layer_bwd)
