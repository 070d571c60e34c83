"""Int8 (W8A8) serving tier (interpret mode on CPU): per-channel weight
quantization numerics, q8 layer forward against the fp32 reference block,
the residual_block quant-mode dispatch, and the inference-only guard."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mudpt_tpu.models import layers as L
from mudpt_tpu.models.layers import attention, layer_norm, mlp
from mudpt_tpu.ops import quant_block as QB


def _params(rng, D):
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
    return {
        "ln_1": {"scale": jnp.asarray(rng.rand(D) + 0.5, jnp.float32),
                 "bias": mk(D)},
        "attn": {"qkv_w": mk(D, 3 * D), "qkv_b": mk(3 * D),
                 "out_w": mk(D, D), "out_b": mk(D)},
        "ln_2": {"scale": jnp.asarray(rng.rand(D) + 0.5, jnp.float32),
                 "bias": mk(D)},
        "mlp": {"fc_w": mk(D, 4 * D), "fc_b": mk(4 * D),
                "proj_w": mk(4 * D, D), "proj_b": mk(D)},
    }


def _ref_layer(p, x, H, mask=None):
    x = x + attention(p["attn"], layer_norm(p["ln_1"], x), H, mask)
    return x + mlp(p["mlp"], layer_norm(p["ln_2"], x))


def test_quantize_cols_numerics():
    """Per-output-channel symmetric int8: exact vs the numpy model, and
    the dequantized weight within half an LSB of the original."""
    rng = np.random.RandomState(0)
    w = rng.randn(48, 96).astype(np.float32) * np.exp(
        rng.randn(96)  # widely varying per-channel magnitudes
    )
    q, s = QB.quantize_cols(jnp.asarray(w))
    qn, sn = np.asarray(q), np.asarray(s)
    want_s = np.maximum(np.abs(w).max(0, keepdims=True) / 127.0, 1e-8)
    np.testing.assert_allclose(sn, want_s, rtol=1e-6)
    np.testing.assert_array_equal(
        qn, np.clip(np.round(w / want_s), -127, 127).astype(np.int8)
    )
    assert np.abs(qn * sn - w).max() <= 0.5 * sn.max() + 1e-7
    # symmetric: no channel saturates past +/-127
    assert qn.max() <= 127 and qn.min() >= -127


@pytest.mark.parametrize("causal", [False, True])
def test_layer_q8_forward_close_to_fp32(causal):
    rng = np.random.RandomState(1)
    D, S, H, B = 64, 40, 2, 3
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)

    from mudpt_tpu.models.text import causal_mask

    mask = causal_mask(S) if causal else None
    ref = np.asarray(_ref_layer(p, x, H, mask))
    got = np.asarray(QB.residual_block_q8(p, x, H, causal))

    # W8A8 on one layer: ~1% relative error is the expected regime
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, f"relative L2 error {rel:.4f}"
    cos = (got.ravel() @ ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref)
    )
    assert cos > 0.999


def test_residual_block_dispatch_and_guards():
    rng = np.random.RandomState(2)
    D, S, H = 64, 24, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(2, S, D), jnp.float32)

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        L.set_quant_mode("int8")
        got = np.asarray(L.residual_block(p, x, H, None, False))
        ref = np.asarray(_ref_layer(p, x, H))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.02

        # xla impl + quant: refuse rather than silently serve unquantized
        L.set_block_impl("xla")
        with pytest.raises(ValueError, match="int8"):
            L.residual_block(p, x, H, None, False)

        # additive-mask (non-causal-flag) attention has no q8 kernel path
        L.set_block_impl("pallas")
        with pytest.raises(ValueError, match="int8"):
            L.residual_block(p, x, H, jnp.zeros((S, S)), False)
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)


@pytest.mark.parametrize("causal", [False, True])
def test_q8_ste_forward_matches_inference_tier(causal):
    """Quantization-aware training (int8_ste) runs the SAME quantized
    forward as the serving tier — train/serve numerics match exactly."""
    rng = np.random.RandomState(6)
    D, S, H, B = 64, 40, 2, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    serve = np.asarray(QB.residual_block_q8(p, x, H, causal))
    train = np.asarray(QB.residual_block_q8_ste(p, x, H, causal))
    np.testing.assert_array_equal(train, serve)


def test_q8_ste_grad_close_to_bf16_and_nonzero():
    """The straight-through dx tracks the bf16 layer's dx (same backward
    kernel; intermediates differ by quantization error only) and is
    nonzero everywhere it should be."""
    from mudpt_tpu.ops.fused_block import layer_fullblock, saved_acts

    rng = np.random.RandomState(7)
    D, S, H, B = 64, 32, 2, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    args = lambda: (
        p["ln_1"]["scale"], p["ln_1"]["bias"],
        p["attn"]["qkv_w"], p["attn"]["qkv_b"],
        p["attn"]["out_w"], p["attn"]["out_b"],
        p["ln_2"]["scale"], p["ln_2"]["bias"],
        p["mlp"]["fc_w"], p["mlp"]["fc_b"],
        p["mlp"]["proj_w"], p["mlp"]["proj_b"],
    )
    loss_q8 = lambda x: jnp.sum(QB.layer_fullblock_q8_ste(x, *args(), H) ** 2)
    with saved_acts(True):
        loss_bf = lambda x: jnp.sum(layer_fullblock(x, *args(), H) ** 2)
        g_bf = np.asarray(jax.grad(loss_bf)(x))
    g_q8 = np.asarray(jax.grad(loss_q8)(x))
    assert np.abs(g_q8).min(axis=-1).max() > 0  # every row gets gradient
    rel = np.linalg.norm(g_q8 - g_bf) / np.linalg.norm(g_bf)
    assert rel < 0.05, f"STE grad diverged from bf16 dx: rel {rel:.4f}"


def test_q8_ste_recompute_matches_save_strategy():
    """Under saved_acts(False) (the large-n_cls text-tower / CoCoOp-vmap
    memory policy) the STE backward regenerates the quantized
    intermediates instead of saving them — value and dx must be
    bit-identical to the save-strategy run."""
    from mudpt_tpu.ops.fused_block import saved_acts

    rng = np.random.RandomState(8)
    D, S, H, B = 64, 32, 2, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    args = (
        p["ln_1"]["scale"], p["ln_1"]["bias"],
        p["attn"]["qkv_w"], p["attn"]["qkv_b"],
        p["attn"]["out_w"], p["attn"]["out_b"],
        p["ln_2"]["scale"], p["ln_2"]["bias"],
        p["mlp"]["fc_w"], p["mlp"]["fc_b"],
        p["mlp"]["proj_w"], p["mlp"]["proj_b"],
    )
    f = lambda x: QB.layer_fullblock_q8_ste(x, *args, H, True)
    loss = lambda x: jnp.sum(f(x) ** 2)
    with saved_acts(True):
        y_save, g_save = f(x), jax.grad(loss)(x)
    with saved_acts(False):
        y_rc, g_rc = f(x), jax.grad(loss)(x)
    np.testing.assert_array_equal(np.asarray(y_rc), np.asarray(y_save))
    np.testing.assert_array_equal(np.asarray(g_rc), np.asarray(g_save))


@pytest.mark.slow  # >30s measured (round-4 durations)
def test_q8_ste_trains_end_to_end(tmp_path):
    """A tiny MuDPT trainer under quant mode 'int8_ste': the jitted train
    step runs, loss drops over a few steps, and the trained prompts serve
    identically under the inference tier ('int8') — the deploy-aware
    training story."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.trainers.mudpt import MuDPT

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        # the build OWNS the process-global mode (it resets it from the
        # config), so opt in via TRAIN.QUANT — the production surface
        cfg = tiny_cfg("MuDPT", tmp_path)
        cfg.TRAIN.QUANT = "int8_ste"
        tr = MuDPT(cfg, devices=jax.devices()[:1])
        batch = next(iter(tr.dm.train_loader))
        sb = shard_batch(tr.mesh, batch)
        trainable, opt_state = tr.trainable, tr.opt_state
        losses = []
        for _ in range(6):
            trainable, opt_state, loss, _ = tr._train_step(
                trainable, opt_state, tr.frozen, tr.aux, sb
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

        # the ste forward IS the serving forward: logits under 'int8' match
        logits_train_mode = np.asarray(
            tr.forward(trainable, tr.frozen, tr.aux, sb["image"])
        )
        L.set_quant_mode("int8")
        logits_serve_mode = np.asarray(
            tr.forward(trainable, tr.frozen, tr.aux, sb["image"])
        )
        np.testing.assert_array_equal(logits_train_mode, logits_serve_mode)
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)


def test_train_quant_config_key(tmp_path):
    """TRAIN.QUANT wires the quant mode through the trainer lifecycle
    (the CLI surface: `train.py ... TRAIN.QUANT int8_ste`); invalid
    values fail at build with remediation."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.trainers.mudpt import MuDPT

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        cfg = tiny_cfg("MuDPT", tmp_path / "a")
        cfg.TRAIN.QUANT = "int8_ste"
        MuDPT(cfg, devices=jax.devices()[:1])
        assert L.quant_mode() == "int8_ste"

        bad = tiny_cfg("MuDPT", tmp_path / "b")
        bad.TRAIN.QUANT = "fp4"
        with pytest.raises(ValueError, match="TRAIN.QUANT"):
            MuDPT(bad, devices=jax.devices()[:1])
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)


def test_q8_is_inference_only():
    rng = np.random.RandomState(3)
    D, S, H = 64, 16, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(1, S, D), jnp.float32)
    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(lambda x: jnp.sum(QB.residual_block_q8(p, x, H, False) ** 2))(x)


def test_q8_under_vmap_matches_unvmapped():
    """CoCoOp's serving composition: the per-instance text encode vmaps
    the tower over the batch — the q8 pallas kernel must batch under
    vmap and match the unvmapped forward row-for-row."""
    from mudpt_tpu.models.transformer import transformer_forward

    rng = np.random.RandomState(5)
    D, S, H, LYR, B, N = 64, 24, 2, 2, 3, 4
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_params(rng, D) for _ in range(LYR)]
    )
    x = jnp.asarray(rng.randn(B, N, S, D), jnp.float32)

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        L.set_quant_mode("int8")
        tower = lambda xi: transformer_forward(stacked, xi, n_head=H, causal=True)
        got = np.asarray(jax.vmap(tower)(x))
        want = np.stack([np.asarray(tower(x[i])) for i in range(B)])
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # >30s measured (round-4 durations)
def test_q8_sharded_forward_matches_single_device(monkeypatch, tmp_path):
    """Multi-chip int8 serving: the MuDPT eval forward with quant mode on
    the 4x2 mesh (towers per-shard via shard_map) must match the 1-device
    quantized forward — the tier is not a single-chip-only feature."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.trainers.mudpt import MuDPT

    monkeypatch.setattr(L, "_BLOCK_IMPL", "pallas")
    monkeypatch.setattr(L, "_QUANT_MODE", "int8")
    # trainer builds reset the process-global mode from config/env — the
    # env opt-in keeps it 'int8' through both builds
    monkeypatch.setenv("MUDPT_TPU_QUANT", "int8")

    devices = jax.devices()
    assert len(devices) >= 8
    tr1 = MuDPT(tiny_cfg("MuDPT", tmp_path / "a"), devices=devices[:1])
    cfg8 = tiny_cfg("MuDPT", tmp_path / "b")
    cfg8.PARALLEL.MODEL = 2
    tr8 = MuDPT(cfg8, devices=devices[:8])

    batch = next(iter(tr1.dm.test_loader))
    logits1 = np.asarray(
        tr1.forward(
            tr1.trainable, tr1.frozen, tr1.aux, shard_batch(tr1.mesh, batch)["image"]
        ),
        np.float32,
    )[:, : tr1.num_classes]
    logits8 = np.asarray(
        tr8.forward(
            tr8.trainable, tr8.frozen, tr8.aux, shard_batch(tr8.mesh, batch)["image"]
        ),
        np.float32,
    )[:, : tr8.num_classes]
    np.testing.assert_allclose(logits1, logits8, rtol=1e-5, atol=1e-5)

    # sanity: quant actually changed the numbers vs the bf16 pallas path
    monkeypatch.setattr(L, "_QUANT_MODE", "none")
    logits_bf16 = np.asarray(
        tr1.forward(
            tr1.trainable, tr1.frozen, tr1.aux, shard_batch(tr1.mesh, batch)["image"]
        ),
        np.float32,
    )[:, : tr1.num_classes]
    assert np.abs(logits_bf16 - logits1).max() > 0


def test_q8_full_tower_eval_path():
    """End-to-end: a 2-layer tower under quant mode stays close to the
    bf16 pallas tower — the composition the serving/eval path runs."""
    from mudpt_tpu.models.transformer import transformer_forward

    rng = np.random.RandomState(4)
    D, S, H, LYR, B = 64, 24, 2, 2, 2
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_params(rng, D) for _ in range(LYR)]
    )
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        ref = np.asarray(transformer_forward(stacked, x, n_head=H))
        L.set_quant_mode("int8")
        got = np.asarray(transformer_forward(stacked, x, n_head=H))
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.03, f"relative L2 error {rel:.4f}"


def test_q8_ste_save_gate_matches_bf16_width_limit(monkeypatch):
    """The STE forward must apply the bf16 tier's save-width gate at
    D>768: the wide-MLP 'auto' policy (fused_block.wide_mlp_save) saves h
    within the measured-safe row-token budget and recomputes beyond it
    (where the S x 4D save set OOMs HBM — docs/BENCHMARKS.md round 3);
    MUDPT_TPU_SAVE_MLP_WIDE=1/0 force either branch."""
    from mudpt_tpu.ops import fused_block as FB

    def flat(p):
        return (p["ln_1"]["scale"], p["ln_1"]["bias"],
                p["attn"]["qkv_w"], p["attn"]["qkv_b"],
                p["attn"]["out_w"], p["attn"]["out_b"],
                p["ln_2"]["scale"], p["ln_2"]["bias"],
                p["mlp"]["fc_w"], p["mlp"]["fc_b"],
                p["mlp"]["proj_w"], p["mlp"]["proj_b"])

    rng = np.random.RandomState(0)
    monkeypatch.delenv("MUDPT_TPU_SAVE_MLP_WIDE", raising=False)
    sentinel = RuntimeError("save kernel invoked")

    def boom(*a, **k):
        raise sentinel

    monkeypatch.setattr(QB, "_q8_save_forward", boom)
    monkeypatch.setattr(FB, "_SAVE_MLP_WIDE", "auto")
    with FB.saved_acts(True):
        # D=896 > 768, tiny rows: 'auto' fits the budget -> save branch
        x = jnp.asarray(rng.randn(1, 8, 896) * 0.1, jnp.float32)
        with pytest.raises(RuntimeError, match="save kernel"):
            QB._q8_ste_fwd(x, *flat(_params(rng, 896)), 14, False)

        # beyond the row-token budget the gate closes -> recompute branch
        monkeypatch.setattr(FB, "_WIDE_SAVE_ROW_TOKENS", 4)
        y, res = QB._q8_ste_fwd(x, *flat(_params(rng, 896)), 14, False)
        assert res[1] is None and y.shape == x.shape

        # explicit env force wins over the budget in both directions
        monkeypatch.setenv("MUDPT_TPU_SAVE_MLP_WIDE", "1")
        with pytest.raises(RuntimeError, match="save kernel"):
            QB._q8_ste_fwd(x, *flat(_params(rng, 896)), 14, False)
        monkeypatch.setattr(FB, "_WIDE_SAVE_ROW_TOKENS", 112 * 264)
        monkeypatch.setenv("MUDPT_TPU_SAVE_MLP_WIDE", "0")
        y, res = QB._q8_ste_fwd(x, *flat(_params(rng, 896)), 14, False)
        assert res[1] is None
        monkeypatch.delenv("MUDPT_TPU_SAVE_MLP_WIDE")

        # D=64 <= 768: the save branch is the fast default regardless
        x64 = jnp.asarray(rng.randn(1, 8, 64) * 0.1, jnp.float32)
        with pytest.raises(RuntimeError, match="save kernel"):
            QB._q8_ste_fwd(x64, *flat(_params(rng, 64)), 2, False)


def test_quant_mode_clears_on_plain_build(tmp_path, monkeypatch):
    """The quant mode is process-global: a TRAIN.QUANT='none' build must
    clear a mode left by a previous build in the same process (A/B
    drivers, base->new eval), while the MUDPT_TPU_QUANT env opt-in still
    applies when the config does not say otherwise."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.trainers.mudpt import MuDPT

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    monkeypatch.delenv("MUDPT_TPU_QUANT", raising=False)
    try:
        L.set_block_impl("pallas")
        cfg = tiny_cfg("MuDPT", tmp_path / "a")
        cfg.TRAIN.QUANT = "int8_ste"
        MuDPT(cfg, devices=jax.devices()[:1])
        assert L.quant_mode() == "int8_ste"

        MuDPT(tiny_cfg("MuDPT", tmp_path / "b"), devices=jax.devices()[:1])
        assert L.quant_mode() == "none"

        monkeypatch.setenv("MUDPT_TPU_QUANT", "int8_ste")
        MuDPT(tiny_cfg("MuDPT", tmp_path / "c"), devices=jax.devices()[:1])
        assert L.quant_mode() == "int8_ste"
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)


# ---------------------------------------------------------------------------
# Static-scale (calibrated) activation quantization — 'int8_static'
# ---------------------------------------------------------------------------


def test_calibrate_sites_and_shapes():
    """calibrate() returns (n_blocks, 4) absmaxima in site order; sites 1
    and 3 (the two LN outputs) are checked against hand-computed values."""
    rng = np.random.RandomState(10)
    D, S, H, B = 64, 24, 2, 3
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)

    scales = np.asarray(QB.calibrate(lambda xx: _ref_layer(p, xx, H), x))
    assert scales.shape == (1, 4) and (scales > 0).all()

    a1 = np.abs(np.asarray(layer_norm(p["ln_1"], x))).max()
    np.testing.assert_allclose(scales[0, 0], a1, rtol=1e-6)
    x1 = x + attention(p["attn"], layer_norm(p["ln_1"], x), H)
    a3 = np.abs(np.asarray(layer_norm(p["ln_2"], x1))).max()
    np.testing.assert_allclose(scales[0, 2], a3, rtol=1e-6)


def test_calibration_capture_restores_globals():
    from mudpt_tpu.models import layers as LL

    prev = (LL._CALIB_SINK, LL._BLOCK_IMPL, LL._QUANT_MODE)
    sink = []
    with pytest.raises(RuntimeError):
        with LL.calibration_capture(sink):
            assert LL.resolve_block_impl() == "xla"
            assert LL.quant_mode() == "none"
            raise RuntimeError("boom")
    assert (LL._CALIB_SINK, LL._BLOCK_IMPL, LL._QUANT_MODE) == prev


def test_static_layer_close_to_fp32():
    """Calibrated static scales: one q8_static layer tracks the fp32
    reference about as well as the dynamic tier (per-tensor scales are
    coarser than per-row, so the bound is looser)."""
    rng = np.random.RandomState(11)
    D, S, H, B = 64, 40, 2, 3
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)

    scales = QB.calibrate(lambda xx: _ref_layer(p, xx, H), x)
    ps = dict(p, q8_scales=scales[0])
    ref = np.asarray(_ref_layer(p, x, H))
    got = np.asarray(QB.residual_block_q8_static(ps, x, H, False))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.04, f"relative L2 error {rel:.4f}"
    cos = (got.ravel() @ ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref)
    )
    assert cos > 0.998


def test_static_dispatch_and_dynamic_fallback():
    """Quant mode 'int8_static': a block WITH a q8_scales leaf runs the
    static kernel (different quantization grid than dynamic); a block
    WITHOUT one falls back bit-exactly to the dynamic tier (the
    uncalibrated-tower path, e.g. CoCoOp's per-instance text encode)."""
    rng = np.random.RandomState(12)
    D, S, H = 64, 24, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(2, S, D), jnp.float32)
    scales = QB.calibrate(lambda xx: _ref_layer(p, xx, H), x)

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        L.set_quant_mode("int8")
        dyn = np.asarray(L.residual_block(p, x, H, None, False))
        L.set_quant_mode("int8_static")
        fallback = np.asarray(L.residual_block(p, x, H, None, False))
        np.testing.assert_array_equal(fallback, dyn)
        ps = dict(p, q8_scales=scales[0])
        static = np.asarray(L.residual_block(ps, x, H, None, False))
        assert np.abs(static - dyn).max() > 0  # a different quant grid ran
        ref = np.asarray(_ref_layer(p, x, H))
        rel = np.linalg.norm(static - ref) / np.linalg.norm(ref)
        assert rel < 0.04
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)


def test_static_tower_via_attach_scales():
    """End-to-end composition: calibrate a 2-layer tower, attach_scales
    onto the stacked params, run transformer_forward under 'int8_static' —
    the per-layer (4,) slice reaches each block and the tower stays close
    to the bf16 tower."""
    from mudpt_tpu.models.transformer import transformer_forward

    rng = np.random.RandomState(13)
    D, S, H, LYR, B = 64, 24, 2, 2, 2
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_params(rng, D) for _ in range(LYR)]
    )
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)

    scales = QB.calibrate(
        lambda xx: transformer_forward(stacked, xx, n_head=H), x
    )
    assert scales.shape == (LYR, 4)
    stacked_s = QB.attach_scales(stacked, scales)

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        ref = np.asarray(transformer_forward(stacked, x, n_head=H))
        L.set_quant_mode("int8_static")
        got = np.asarray(transformer_forward(stacked_s, x, n_head=H))
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, f"relative L2 error {rel:.4f}"


def test_static_outliers_saturate_finite():
    """Activations beyond the calibrated range SATURATE (clip to +/-127)
    rather than wrap or produce non-finite values — the failure mode
    static scales must guard."""
    rng = np.random.RandomState(14)
    D, S, H = 64, 16, 2
    p = _params(rng, D)
    x_small = jnp.asarray(rng.randn(1, S, D) * 0.1, jnp.float32)
    scales = QB.calibrate(lambda xx: _ref_layer(p, xx, H), x_small)
    ps = dict(p, q8_scales=scales[0])
    x_big = x_small * 20.0
    y = np.asarray(QB.residual_block_q8_static(ps, x_big, H, False))
    assert np.isfinite(y).all()


def test_static_is_inference_only():
    rng = np.random.RandomState(15)
    D, S, H = 64, 16, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(1, S, D), jnp.float32)
    scales = QB.calibrate(lambda xx: _ref_layer(p, xx, H), x)
    ps = dict(p, q8_scales=scales[0])
    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(
            lambda x: jnp.sum(QB.residual_block_q8_static(ps, x, H, False) ** 2)
        )(x)


def test_attach_scales_validates_shape():
    rng = np.random.RandomState(16)
    D, LYR = 64, 2
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_params(rng, D) for _ in range(LYR)]
    )
    with pytest.raises(ValueError, match="scales shape"):
        QB.attach_scales(stacked, jnp.ones((3, 4)))
    # re-attaching over an existing leaf replaces it and keeps the check
    ok = QB.attach_scales(stacked, jnp.ones((LYR, 4)))
    ok2 = QB.attach_scales(ok, 2 * jnp.ones((LYR, 4)))
    assert float(ok2["q8_scales"][0, 0]) == 2.0


def test_trainer_int8_static_calibrates_and_serves(tmp_path):
    """TRAIN.QUANT 'int8_static': the build calibrates scales onto the
    frozen towers, eval logits stay close to the unquantized forward, and
    the instance-conditional trainer (CoCoOp) refuses with remediation."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.trainers.cocoop import CoCoOp
    from mudpt_tpu.trainers.mudpt import MuDPT

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        cfg = tiny_cfg("MuDPT", tmp_path / "a")
        cfg.TRAIN.QUANT = "int8_static"
        tr = MuDPT(cfg, devices=jax.devices()[:1])
        assert L.quant_mode() == "int8_static"
        vis = tr.frozen["visual"]["blocks"]
        txt = tr.frozen["text"]["blocks"]
        n_vis = jax.tree_util.tree_leaves(vis["ln_1"])[0].shape[0]
        assert vis["q8_scales"].shape == (n_vis, 4)
        assert "q8_scales" in txt

        batch = shard_batch(tr.mesh, next(iter(tr.dm.test_loader)))
        logits_q = np.asarray(
            tr.forward(tr.trainable, tr.frozen, tr.aux, batch["image"]),
            np.float32,
        )[:, : tr.num_classes]
        L.set_quant_mode("none")
        frozen_plain = {
            k: ({kk: vv for kk, vv in v.items() if kk != "q8_scales"}
                if isinstance(v, dict) else v)
            for k, v in tr.frozen.items()
        }
        for k in ("visual", "text"):
            frozen_plain[k] = dict(tr.frozen[k])
            frozen_plain[k]["blocks"] = {
                kk: vv for kk, vv in tr.frozen[k]["blocks"].items()
                if kk != "q8_scales"
            }
        logits_bf = np.asarray(
            tr.forward(tr.trainable, frozen_plain, tr.aux, batch["image"]),
            np.float32,
        )[:, : tr.num_classes]
        rel = np.linalg.norm(logits_q - logits_bf) / np.linalg.norm(logits_bf)
        # per-TENSOR scales are coarser than per-row, and the width-64 toy
        # model amplifies relative quant error (few channels per tensor);
        # the full-scale drift bound lives in test_fullscale_parity.py
        assert rel < 0.08, f"static-int8 logit drift {rel:.4f}"

        L.set_quant_mode("int8_static")
        cfg2 = tiny_cfg("CoCoOp", tmp_path / "b")
        cfg2.TRAIN.QUANT = "int8_static"
        with pytest.raises(ValueError, match="int8"):
            CoCoOp(cfg2, devices=jax.devices()[:1])
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)


@pytest.mark.slow  # >30s measured (round-4 durations)
def test_q8_static_sharded_forward_matches_single_device(monkeypatch, tmp_path):
    """Multi-chip static int8: the calibrated (L, 4) scale leaves ride the
    shard_map towers as replicated operands — the 4x2-mesh forward must
    match the 1-device one (same build seed => same calibration batch =>
    same scales)."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.trainers.mudpt import MuDPT

    monkeypatch.setattr(L, "_BLOCK_IMPL", "pallas")
    monkeypatch.setattr(L, "_QUANT_MODE", "int8_static")
    monkeypatch.setenv("MUDPT_TPU_QUANT", "int8_static")

    devices = jax.devices()
    assert len(devices) >= 8
    tr1 = MuDPT(tiny_cfg("MuDPT", tmp_path / "a"), devices=devices[:1])
    cfg8 = tiny_cfg("MuDPT", tmp_path / "b")
    cfg8.PARALLEL.MODEL = 2
    tr8 = MuDPT(cfg8, devices=devices[:8])
    np.testing.assert_array_equal(
        np.asarray(tr1.frozen["visual"]["blocks"]["q8_scales"]),
        np.asarray(tr8.frozen["visual"]["blocks"]["q8_scales"]),
    )

    batch = next(iter(tr1.dm.test_loader))
    logits1 = np.asarray(
        tr1.forward(
            tr1.trainable, tr1.frozen, tr1.aux,
            shard_batch(tr1.mesh, batch)["image"],
        ),
        np.float32,
    )[:, : tr1.num_classes]
    logits8 = np.asarray(
        tr8.forward(
            tr8.trainable, tr8.frozen, tr8.aux,
            shard_batch(tr8.mesh, batch)["image"],
        ),
        np.float32,
    )[:, : tr8.num_classes]
    np.testing.assert_allclose(logits1, logits8, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Static-scale quantization-aware training — 'int8_ste_static'
# ---------------------------------------------------------------------------


def _flat(p):
    return (p["ln_1"]["scale"], p["ln_1"]["bias"],
            p["attn"]["qkv_w"], p["attn"]["qkv_b"],
            p["attn"]["out_w"], p["attn"]["out_b"],
            p["ln_2"]["scale"], p["ln_2"]["bias"],
            p["mlp"]["fc_w"], p["mlp"]["fc_b"],
            p["mlp"]["proj_w"], p["mlp"]["proj_b"])


@pytest.mark.parametrize("causal", [False, True])
def test_q8_ste_static_forward_matches_serving_tier(causal):
    """The static-QAT forward IS the pallas_int8_static serving forward —
    the deploy-aware contract, bit-exact."""
    rng = np.random.RandomState(20)
    D, S, H, B = 64, 40, 2, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    scales = QB.calibrate(lambda xx: _ref_layer(p, xx, H), x)
    ps = dict(p, q8_scales=scales[0])
    serve = np.asarray(QB.residual_block_q8_static(ps, x, H, causal))
    train = np.asarray(QB.residual_block_q8_ste(ps, x, H, causal))
    np.testing.assert_array_equal(train, serve)


def test_q8_ste_static_grad_and_recompute():
    """Static-STE dx tracks the bf16 layer dx, and the recompute strategy
    (saved_acts False) is bit-identical to the save strategy."""
    from mudpt_tpu.ops.fused_block import layer_fullblock, saved_acts

    rng = np.random.RandomState(21)
    D, S, H, B = 64, 32, 2, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    scales = QB.calibrate(lambda xx: _ref_layer(p, xx, H), x)[0]

    f = lambda x: QB.layer_fullblock_q8_ste_static(x, scales, *_flat(p), H)
    loss = lambda x: jnp.sum(f(x) ** 2)
    with saved_acts(True):
        y_save, g_save = f(x), jax.grad(loss)(x)
        g_bf = jax.grad(
            lambda x: jnp.sum(layer_fullblock(x, *_flat(p), H) ** 2)
        )(x)
    with saved_acts(False):
        y_rc, g_rc = f(x), jax.grad(loss)(x)
    np.testing.assert_array_equal(np.asarray(y_rc), np.asarray(y_save))
    np.testing.assert_array_equal(np.asarray(g_rc), np.asarray(g_save))
    rel = np.linalg.norm(np.asarray(g_save) - np.asarray(g_bf)) / np.linalg.norm(
        np.asarray(g_bf)
    )
    assert rel < 0.06, f"static-STE grad diverged from bf16 dx: rel {rel:.4f}"
    assert np.abs(np.asarray(g_save)).min(axis=-1).max() > 0


@pytest.mark.slow  # >30s measured (round-4 durations)
def test_trainer_int8_ste_static_trains_and_serves(tmp_path):
    """TRAIN.QUANT 'int8_ste_static': the build calibrates, the jitted
    train step runs and reduces loss, and the trained prompts under the
    'int8_static' SERVING mode (same frozen scales) produce bit-identical
    logits — train/serve parity for the static tier."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.trainers.mudpt import MuDPT

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        cfg = tiny_cfg("MuDPT", tmp_path)
        cfg.TRAIN.QUANT = "int8_ste_static"
        tr = MuDPT(cfg, devices=jax.devices()[:1])
        assert "q8_scales" in tr.frozen["visual"]["blocks"]
        batch = shard_batch(tr.mesh, next(iter(tr.dm.train_loader)))
        trainable, opt_state = tr.trainable, tr.opt_state
        losses = []
        for _ in range(6):
            trainable, opt_state, loss, _ = tr._train_step(
                trainable, opt_state, tr.frozen, tr.aux, batch
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

        logits_train_mode = np.asarray(
            tr.forward(trainable, tr.frozen, tr.aux, batch["image"])
        )
        L.set_quant_mode("int8_static")
        logits_serve_mode = np.asarray(
            tr.forward(trainable, tr.frozen, tr.aux, batch["image"])
        )
        np.testing.assert_array_equal(logits_train_mode, logits_serve_mode)
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)


def test_static_calibration_preserves_data_order(tmp_path):
    """Round-4 review finding: the static-quant calibration fetch at build
    must not advance the train loader's epoch state — exact (mid-epoch)
    resume assumes only run_epoch ever iterated, so a quant trainer's
    epoch-E data order must equal a plain trainer's."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.trainers.mudpt import MuDPT

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        cfg_q = tiny_cfg("MuDPT", tmp_path / "q")
        cfg_q.TRAIN.QUANT = "int8_ste_static"
        tr_q = MuDPT(cfg_q)

        cfg_p = tiny_cfg("MuDPT", tmp_path / "p")
        tr_p = MuDPT(cfg_p)

        assert getattr(tr_q.dm.train_loader, "_epoch", 0) == getattr(
            tr_p.dm.train_loader, "_epoch", 0
        )
        order_q = [b["label"].tolist() for b in tr_q.dm.train_loader]
        order_p = [b["label"].tolist() for b in tr_p.dm.train_loader]
        assert order_q == order_p, "calibration perturbed the epoch order"
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)


@pytest.mark.slow  # builds three tiny trainers (~1 min measured)
def test_cocoop_q8_ste_trains_end_to_end(tmp_path):
    """QAT under CoCoOp's divergent forward (VERDICT r4 weak #4): the
    int8_ste train step composes with the vmap'd 4-D per-instance text
    encode AND the lax.map/checkpoint chunked path (identical losses —
    chunking is bit-equal under saved_acts(False)), and the static tiers
    refuse loudly with the dynamic-tier remediation (no image-independent
    text features to calibrate on, base.py:_calibrate_static_quant)."""
    from tests.test_trainers import tiny_cfg
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.trainers.cocoop import CoCoOp

    prev_impl, prev_q = L._BLOCK_IMPL, L.quant_mode()
    try:
        L.set_block_impl("pallas")
        cfg = tiny_cfg("CoCoOp", tmp_path / "a")
        cfg.TRAIN.QUANT = "int8_ste"
        tr = CoCoOp(cfg, devices=jax.devices()[:1])
        batch = next(iter(tr.dm.train_loader))
        sb = shard_batch(tr.mesh, batch)
        trainable, opt_state = tr.trainable, tr.opt_state
        losses = []
        for _ in range(6):
            trainable, opt_state, loss, _ = tr._train_step(
                trainable, opt_state, tr.frozen, tr.aux, sb
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

        # chunked per-instance encode: same quantized step, same losses
        cfg2 = tiny_cfg("CoCoOp", tmp_path / "b", ENCODE_CHUNK=2)
        cfg2.TRAIN.QUANT = "int8_ste"
        tr2 = CoCoOp(cfg2, devices=jax.devices()[:1])
        t2, o2 = tr2.trainable, tr2.opt_state
        for step in range(3):
            t2, o2, loss2, _ = tr2._train_step(t2, o2, tr2.frozen, tr2.aux, sb)
            np.testing.assert_allclose(
                float(loss2), losses[step], rtol=0, atol=1e-6,
                err_msg=f"chunked QAT loss diverged at step {step}",
            )

        # static calibration has nothing image-independent to calibrate:
        # must refuse at build, naming the dynamic tiers
        cfg3 = tiny_cfg("CoCoOp", tmp_path / "c")
        cfg3.TRAIN.QUANT = "int8_ste_static"
        with pytest.raises(ValueError, match="int8_ste"):
            CoCoOp(cfg3, devices=jax.devices()[:1])
    finally:
        L._BLOCK_IMPL = prev_impl
        L.set_quant_mode(prev_q)
