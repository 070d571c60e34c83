"""Packed text rows (MUDPT_TPU_TEXT_PACK): G class sequences per kernel row
must produce bit-meaningful identical features to the unpacked path — same
LN/projections per token, block-causal attention confined to each sequence,
deep-prompt splices at every packed offset — under both the XLA path and
the Pallas kernels (interpret mode), forward AND gradient."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mudpt_tpu.models import layers as L
from mudpt_tpu.models import text as T
from mudpt_tpu.models.clip import init_clip_params
from mudpt_tpu.trainers.base import TINY_TEST
from mudpt_tpu.utils.rng import new_rng

N_CLS, S, N_CTX = 10, 77, 2


@pytest.fixture
def setup():
    params = init_clip_params(new_rng(0), TINY_TEST)["text"]
    rng = np.random.RandomState(2)
    emb = jnp.asarray(rng.randn(N_CLS, S, 64) * 0.1, jnp.float32)
    eot = jnp.asarray(rng.randint(4, S, N_CLS), jnp.int32)
    deep = jnp.asarray(rng.randn(1, N_CTX, 64) * 0.1, jnp.float32)
    return params, emb, eot, deep


def _run(params, emb, eot, deep, pack):
    prev = T._TEXT_PACK
    T.set_text_pack(pack)
    try:
        return np.asarray(
            T.text_forward(params, emb, eot, n_head=1, deep_prompts=deep)
        )
    finally:
        T.set_text_pack(prev)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
# pack=4 does NOT divide N_CLS=10: exercises the pad-to-multiple rows
# (text.py Npad) whose attention blocks are all-padding and must not
# contaminate real classes' features
@pytest.mark.parametrize("pack", [2, 4, 5])
def test_packed_matches_unpacked_forward(setup, impl, pack):
    params, emb, eot, deep = setup
    prev = L._BLOCK_IMPL
    L.set_block_impl(impl)
    try:
        ref = _run(params, emb, eot, deep, 1)
        packed = _run(params, emb, eot, deep, pack)
    finally:
        L.set_block_impl(prev)
    np.testing.assert_allclose(packed, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_packed_matches_unpacked_grad(setup, impl):
    """dL/d(deep_prompts) through the packed splices must equal the
    unpacked path's — a dropped packed-offset splice gradient would show up
    here as a scaled-down or zero gradient."""
    params, emb, eot, deep = setup
    prev = L._BLOCK_IMPL
    L.set_block_impl(impl)

    def loss(d, pack):
        prev_p = T._TEXT_PACK
        T.set_text_pack(pack)
        try:
            out = T.text_forward(params, emb, eot, n_head=1, deep_prompts=d)
        finally:
            T.set_text_pack(prev_p)
        return jnp.sum(out * out)

    try:
        g_ref = jax.grad(loss)(deep, 1)
        g_packed = jax.grad(loss)(deep, 2)
    finally:
        L.set_block_impl(prev)
    assert np.abs(np.asarray(g_ref)).max() > 1e-6
    np.testing.assert_allclose(
        np.asarray(g_packed), np.asarray(g_ref), rtol=5e-4, atol=1e-5
    )


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.slow  # >30s measured (round-4 durations)
def test_packed_under_vmap_matches_unpacked(setup, impl):
    """CoCoOp encodes text inside ``jax.vmap`` over per-instance contexts
    (trainers/cocoop.py per_instance); the auto-pack trigger fires inside
    that vmap at ImageNet-scale class counts, so the packed reshape/pad and
    the Pallas block-attention kernels must batch correctly under vmap —
    forward and gradient w.r.t. the vmapped context."""
    params, emb, eot, _ = setup
    rng = np.random.RandomState(7)
    ctx = jnp.asarray(rng.randn(2, N_CTX, 64) * 0.1, jnp.float32)

    def per_instance(ctx_i):
        e = emb.at[:, 1 : 1 + N_CTX].set(ctx_i[None])
        return T.text_forward(params, e, eot, n_head=1)

    def run(pack):
        prev_p = T._TEXT_PACK
        T.set_text_pack(pack)
        try:
            out = jax.vmap(per_instance)(ctx)
            g = jax.grad(lambda c: jnp.sum(jax.vmap(per_instance)(c) ** 2))(ctx)
            return np.asarray(out), np.asarray(g)
        finally:
            T.set_text_pack(prev_p)

    prev = L._BLOCK_IMPL
    L.set_block_impl(impl)
    try:
        o_ref, g_ref = run(1)
        o_pk, g_pk = run(5)
    finally:
        L.set_block_impl(prev)
    assert np.abs(g_ref).max() > 1e-6
    np.testing.assert_allclose(o_pk, o_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(g_pk, g_ref, rtol=5e-4, atol=1e-5)


def test_auto_pack_requires_unrolled_path(monkeypatch):
    """Auto packing needs the fully-unrolled static path: under a rolled
    scan (MUDPT_TPU_SCAN_UNROLL below the tower depth) transformer_forward
    raises NotImplementedError for packed rows, so _resolve_pack must stay
    at G=1 there (an explicit MUDPT_TPU_TEXT_PACK=G still forces, and gets
    the loud error)."""
    from mudpt_tpu.models import transformer as TR

    monkeypatch.setattr(L, "_BLOCK_IMPL", "pallas")
    monkeypatch.setattr(T, "_TEXT_PACK", 0)

    monkeypatch.setattr(TR, "_SCAN_UNROLL", "auto")
    assert T._resolve_pack(1000, num_layers=12) == 4  # P=80 default

    monkeypatch.setattr(TR, "_SCAN_UNROLL", "1")  # rolled-scan A/B knob
    assert T._resolve_pack(1000, num_layers=12) == 1


def test_auto_pack_scales_with_row_length(monkeypatch):
    """Auto G targets ~256 tokens per packed row (measured sweet spot at
    both P=80 and P=24 — docs/BENCHMARKS.md round 3), capped at 16."""
    monkeypatch.setattr(L, "_BLOCK_IMPL", "pallas")
    monkeypatch.setattr(T, "_TEXT_PACK", 0)
    assert T._auto_pack_g(80) == 4    # full 77-token rows
    assert T._auto_pack_g(24) == 8    # typical EOT-truncated rows
    assert T._auto_pack_g(16) == 8    # floor-length rows (G=16 measured worse)
    assert T._auto_pack_g(256) == 1   # already a full row
    assert T._resolve_pack(1000, num_layers=12, padded_seq=24) == 8
    # pad-waste gate (n_rows >= 8*G): G shrinks to fit the class count
    assert T._resolve_pack(100, num_layers=12, padded_seq=24) == 8
    assert T._resolve_pack(50, num_layers=12, padded_seq=24) == 4
    assert T._resolve_pack(7, num_layers=12, padded_seq=24) == 1
    # row-token recompute threshold: truncated rows keep saves on longer
    assert T._text_saves_off(1000, padded_seq=80)
    assert not T._text_saves_off(1000, padded_seq=24)
    assert T._text_saves_off(2048, padded_seq=24)
