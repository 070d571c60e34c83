"""EOT-truncated text rows (MUDPT_TPU_TEXT_TRUNC) must equal the full-77
path exactly: the text tower is causal and only the EOT position is read
out, so positions beyond max(eot)+1 are provably dead (models/text.py).
Covers all three class-token positions (the index-map bank shrinks with the
row), deep-prompt splices, the packed-rows path, and the loud error when a
splice window exceeds the truncated row."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mudpt_tpu.models import text as T
from mudpt_tpu.models.clip import init_clip_params
from mudpt_tpu.trainers.base import TINY_TEST
from mudpt_tpu.trainers.prompt_utils import (
    build_position_index_map,
    compose_prompts,
    embed_classnames,
)
from mudpt_tpu.utils.rng import new_rng

CLASSNAMES = ["cat", "dog", "german shepherd"]
N_CTX = 4


@pytest.fixture
def setup():
    params = init_clip_params(new_rng(0), TINY_TEST)
    aux = embed_classnames(params["text"], CLASSNAMES, N_CTX, "X X X X")
    rng = np.random.RandomState(3)
    ctx = jnp.asarray(rng.randn(N_CTX, 64).astype(np.float32) * 0.02)
    deep = jnp.asarray(rng.randn(1, N_CTX, 64).astype(np.float32) * 0.02)
    prev = T._TEXT_TRUNC
    yield params, aux, ctx, deep
    T._TEXT_TRUNC = prev


def _feats(params, aux, ctx, deep, position, pack=1):
    tree = aux.as_device_tree()
    idx = build_position_index_map(
        position, aux.name_lens, N_CTX, aux.effective_length()
    )
    prompts = compose_prompts(
        ctx, tree["token_prefix"], tree["token_suffix"],
        jnp.asarray(idx) if idx is not None else None,
    )
    prev = T._TEXT_PACK
    T.set_text_pack(pack)
    try:
        return np.asarray(
            T.text_forward(
                params["text"], prompts, tree["eot_idx"], n_head=1,
                deep_prompts=deep,
            )
        )
    finally:
        T.set_text_pack(prev)


@pytest.mark.parametrize("position", ["end", "middle", "front"])
def test_truncated_matches_full(setup, position):
    params, aux, ctx, deep = setup
    T.set_text_truncate(False)
    full_len = aux.effective_length()
    full = _feats(params, aux, ctx, deep, position)
    T.set_text_truncate(True)
    trunc_len = aux.effective_length()
    trunc = _feats(params, aux, ctx, deep, position)
    assert trunc_len < full_len, "short class prompts must actually truncate"
    assert trunc_len % 8 == 0 and trunc_len >= 16
    np.testing.assert_allclose(trunc, full, rtol=1e-6, atol=1e-6)


def test_truncated_matches_full_packed(setup):
    """Packed rows (G sequences per kernel row) over truncated sequences."""
    params, aux, ctx, deep = setup
    T.set_text_truncate(False)
    full = _feats(params, aux, ctx, deep, "end", pack=1)
    T.set_text_truncate(True)
    packed = _feats(params, aux, ctx, deep, "end", pack=2)
    # packing reshapes change matmul tiling: same tolerance as test_text_pack
    np.testing.assert_allclose(packed, full, rtol=2e-5, atol=2e-5)


def test_oversize_splice_window_raises(setup):
    """A deep-prompt splice window wider than the truncated row must raise
    (an update-slice would clamp and silently corrupt rows otherwise)."""
    params, aux, ctx, deep = setup
    T.set_text_truncate(True)
    tree = aux.as_device_tree()
    L = aux.effective_length()
    wide = jnp.zeros((1, L, 64), jnp.float32)  # splice window 1+L > L
    prompts = compose_prompts(ctx, tree["token_prefix"], tree["token_suffix"])
    with pytest.raises(ValueError, match="splice window"):
        T.text_forward(
            params["text"], prompts, tree["eot_idx"], n_head=1,
            deep_prompts=wide,
        )


def test_zeroshot_template_encode_truncated_matches_full(setup):
    """The zero-shot template path (_encode_templates, shared by ZeroshotCLIP
    and api.zero_shot_classifier) truncates raw token rows host-side; the
    ensembled class features must equal the full-77 encode exactly."""
    from mudpt_tpu.trainers.zsclip import _encode_templates

    params, _, _, _ = setup
    templates = ["a photo of a {}.", "a drawing of the {}."]
    T.set_text_truncate(False)
    full = _encode_templates(params, TINY_TEST, CLASSNAMES, templates, jnp.float32)
    T.set_text_truncate(True)
    trunc = _encode_templates(params, TINY_TEST, CLASSNAMES, templates, jnp.float32)
    np.testing.assert_allclose(trunc, full, rtol=1e-6, atol=1e-6)


def test_cocoop_auto_chunk_scales_with_row_length():
    """CoCoOp's auto encode-chunk caps the live set in ROW-TOKENS, so
    EOT-truncated rows admit proportionally more instances per chunk."""
    from mudpt_tpu.trainers.cocoop import _resolve_chunk

    assert _resolve_chunk(0, 8, 1000, 80) == 4   # full rows: cap 6 -> divisor 4
    assert _resolve_chunk(0, 8, 1000, 24) == 8   # truncated: unchunked
    assert _resolve_chunk(0, 32, 1000, 16) == 32  # 512k row-tokens: unchunked
    assert _resolve_chunk(0, 40, 1000, 16) == 20  # 640k: the measured OOM -> chunk
    assert _resolve_chunk(0, 32, 1000, 24) == 16  # cap 21 -> divisor 16
    assert _resolve_chunk(0, 2, 1000, 24) == 2   # capped at batch
    assert _resolve_chunk(-1, 8, 1000, 24) == 8  # never chunk
    assert _resolve_chunk(4, 8, 1000, 24) == 4   # explicit forces
    # mesh-sharded rows: the per-device budget scales by the shard count
    assert _resolve_chunk(0, 8, 1000, 80, n_shards=8) == 8    # unchunked
    assert _resolve_chunk(0, 64, 1000, 80, n_shards=8, shard_quantum=4) == 32
    assert _resolve_chunk(0, 8, 1000, 80, n_shards=1) == 4    # single chip as above
    # the scaled budget only holds while chunks still shard: candidates
    # must be multiples of the data axis (review finding r4) ...
    assert _resolve_chunk(0, 100, 1000, 80, n_shards=8, shard_quantum=4) == 20
    # ... and with no shardable divisor, fall back to the SINGLE-DEVICE
    # budget (an unsharded chunk must fit one chip)
    assert _resolve_chunk(0, 32, 4000, 80, n_shards=8, shard_quantum=16) == 1


def test_cocoop_unchunked_saves_off_branch_matches(monkeypatch):
    """The unchunked CoCoOp encode disables activation saving once the TRUE
    B*n_cls row-token count crosses the recompute threshold (the
    per-instance text_forward view is blind to the vmap batch factor).
    Forward logits must be identical either way — saves only change what
    the backward reads."""
    import functools

    import jax.numpy as jnp

    from mudpt_tpu.models.clip import init_clip_params
    from mudpt_tpu.trainers.base import TINY_TEST
    from mudpt_tpu.trainers.cocoop import cocoop_forward
    from mudpt_tpu.trainers.prompt_utils import embed_classnames, init_linear, random_ctx
    from mudpt_tpu.utils.rng import new_rng

    params = init_clip_params(new_rng(0), TINY_TEST)
    aux = embed_classnames(
        params["text"], CLASSNAMES, N_CTX, "X X X X"
    ).as_device_tree()
    ks = jax.random.split(new_rng(1), 3)
    trainable = {
        "ctx": random_ctx(ks[0], (N_CTX, 64)),
        "meta_net": {
            "linear1": init_linear(ks[1], 64, 4),
            "linear2": init_linear(ks[2], 4, 64),
        },
    }
    images = jax.random.normal(new_rng(2), (4, 32, 32, 3), jnp.float32)
    fwd = functools.partial(
        cocoop_forward, clip_cfg=TINY_TEST, compute_dtype=jnp.float32,
        encode_chunk=-1,
    )
    base = np.asarray(fwd(trainable, params, aux, images))
    # force the vmap-aware threshold low enough that 4*3 rows trip it
    from mudpt_tpu.models import text as TX

    monkeypatch.setattr(TX, "_AUTO_RECOMPUTE_MIN_ROW_TOKENS", 1)
    forced = np.asarray(fwd(trainable, params, aux, images))
    np.testing.assert_array_equal(forced, base)


def test_truncation_disabled_keeps_reference_shapes(setup):
    params, aux, ctx, deep = setup
    T.set_text_truncate(False)
    tree = aux.as_device_tree()
    assert tree["token_suffix"].shape[1] == 77 - 1 - N_CTX
    assert aux.effective_length() == 77
