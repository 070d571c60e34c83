"""PERF config namespace: typed knobs reach the kernel-policy modules with
the documented precedence (module default < programmatic setter < explicit
config < env var), the resolved values land in metrics.jsonl, and serving
artifacts record them in meta.json (VERDICT r3 item 3)."""

import json

import pytest

from mudpt_tpu.config import default_config
from mudpt_tpu.config.perf import apply_perf_config, perf_snapshot
from mudpt_tpu.models import layers as L
from mudpt_tpu.models import text as TX
from mudpt_tpu.models import transformer as T
from mudpt_tpu.ops import fused_block as FB

from tests.test_trainers import tiny_cfg


@pytest.fixture
def _restore_policy():
    saved = (
        L._BLOCK_IMPL, L._LN_DTYPE, FB._SAVE_ACTS, FB._SAVE_MLP_WIDE,
        T._SCAN_UNROLL, T._REMAT_MODE, TX._TEXT_PACK, TX._TEXT_TRUNC,
        TX._TEXT_RECOMPUTE,
    )
    yield
    (L._BLOCK_IMPL, L._LN_DTYPE, FB._SAVE_ACTS, FB._SAVE_MLP_WIDE,
     T._SCAN_UNROLL, T._REMAT_MODE, TX._TEXT_PACK, TX._TEXT_TRUNC,
     TX._TEXT_RECOMPUTE) = saved
    FB.set_save_acts(FB._SAVE_ACTS)  # resync SAVED_FWD_FRACTION


def test_explicit_config_applies(_restore_policy):
    cfg = default_config()
    cfg.PERF.BLOCK = "xla"
    cfg.PERF.SAVE_ACTS = False
    cfg.PERF.SAVE_MLP_WIDE = "1"
    cfg.PERF.SCAN_UNROLL = "2"
    cfg.PERF.REMAT = "full"
    cfg.PERF.TEXT_PACK = 4
    cfg.PERF.TEXT_TRUNC = "0"
    cfg.PERF.TEXT_RECOMPUTE = "1"
    cfg.PERF.LN = "bf16"
    snap = apply_perf_config(cfg.PERF)
    assert L._BLOCK_IMPL == "xla"
    assert FB.save_acts_enabled() is False
    assert FB._SAVE_MLP_WIDE == "1"
    assert T._SCAN_UNROLL == "2" and T._resolve_unroll() == 2
    assert T._REMAT_MODE == "full"
    assert TX._TEXT_PACK == 4
    assert not TX.text_truncate_enabled()
    assert TX._TEXT_RECOMPUTE == "1"
    assert L._LN_DTYPE == "bf16"
    assert snap["BLOCK"] == "xla" and snap["LN"] == "bf16"


def test_default_config_preserves_programmatic_state(_restore_policy):
    """A PERF field left at its default must not clobber a setter call —
    the contract the monkeypatching tests and A/B tools rely on."""
    L.set_block_impl("pallas")
    FB.set_save_acts(False)
    apply_perf_config(default_config().PERF)
    assert L._BLOCK_IMPL == "pallas"
    assert FB.save_acts_enabled() is False


def test_explicit_default_value_still_applies(_restore_policy):
    """A knob explicitly WRITTEN at its default value (YAML ``PERF.BLOCK:
    auto`` or ``cfg.PERF.BLOCK = "auto"``) counts as set and reapplies —
    the recovery path from a leaked process-global ``set_block_impl``.
    Only an untouched default leaves programmatic state alone."""
    from mudpt_tpu.config.config import _merge_dict

    L.set_block_impl("xla")
    cfg = default_config()
    _merge_dict(cfg, {"PERF": {"BLOCK": "auto"}})
    apply_perf_config(cfg.PERF)
    assert L._BLOCK_IMPL == "auto"

    # the same write via attribute assignment (tools/bench code paths)
    L.set_block_impl("xla")
    cfg2 = default_config()
    cfg2.PERF.BLOCK = "auto"
    apply_perf_config(cfg2.PERF)
    assert L._BLOCK_IMPL == "auto"

    # clone() keeps the touched set
    L.set_block_impl("xla")
    apply_perf_config(cfg2.clone().PERF)
    assert L._BLOCK_IMPL == "auto"


def test_env_overrides_config(_restore_policy, monkeypatch):
    monkeypatch.setenv("MUDPT_TPU_BLOCK", "xla")
    monkeypatch.setenv("MUDPT_TPU_SAVE_ACTS", "0")
    cfg = default_config()
    cfg.PERF.BLOCK = "pallas"
    cfg.PERF.SAVE_ACTS = True
    apply_perf_config(cfg.PERF)
    assert L._BLOCK_IMPL == "xla"
    assert FB.save_acts_enabled() is False


def test_yaml_scalar_coercion():
    """PERF.TEXT_TRUNC: 0 etc. arrive from YAML as ints and must merge as
    their string form (the knobs' value space is 'auto' | numerals)."""
    from mudpt_tpu.config.config import _merge_dict

    cfg = default_config()
    _merge_dict(cfg, {"PERF": {"TEXT_TRUNC": 0, "SCAN_UNROLL": 8,
                               "SAVE_MLP_WIDE": 1, "TEXT_RECOMPUTE": 1}})
    assert cfg.PERF.TEXT_TRUNC == "0"
    assert cfg.PERF.SCAN_UNROLL == "8"
    assert cfg.PERF.SAVE_MLP_WIDE == "1"
    assert cfg.PERF.TEXT_RECOMPUTE == "1"


def test_trainer_logs_perf_config(tmp_path, _restore_policy):
    cfg = tiny_cfg("CoOp", tmp_path)
    cfg.PERF.TEXT_PACK = 2
    from mudpt_tpu.trainers import build_trainer

    tr = build_trainer(cfg)
    assert TX._TEXT_PACK == 2
    tr.metrics.close()
    records = [
        json.loads(line) for line in open(f"{cfg.OUTPUT_DIR}/metrics.jsonl")
    ]
    perf = [r for r in records if r.get("kind") == "perf_config"]
    assert perf and perf[0]["TEXT_PACK"] == 2
    assert perf[0]["BLOCK_RESOLVED"] in ("xla", "pallas")
    assert "QUANT" in perf[0] and "TEXT_TRUNC" in perf[0]


def test_wide_mlp_save_auto_policy(_restore_policy):
    """Item 8: 'auto' enables the D<=1024 h-save within the measured-safe
    row-token budget (ViT-L B<=112) and disables it beyond."""
    FB.set_save_mlp_wide("auto")
    assert FB.wide_mlp_save(96 * 264)        # ViT-L B=96: fits
    assert FB.wide_mlp_save(112 * 264)       # boundary
    assert not FB.wide_mlp_save(128 * 264)   # beyond: recompute fc
    assert FB.saved_fraction_for_width(1024, 96 * 264) == 0.96
    assert FB.saved_fraction_for_width(1024, 128 * 264) == 0.65
    FB.set_save_mlp_wide("0")
    assert not FB.wide_mlp_save(8)
    assert FB.saved_fraction_for_width(1024, 8) == 0.65
    FB.set_save_mlp_wide("1")
    assert FB.wide_mlp_save(10**9)
    # width <= 768 and recompute mode are unaffected by the wide policy
    assert FB.saved_fraction_for_width(768, 10**9) == 0.96


def test_serving_meta_records_perf(tmp_path, _restore_policy):
    from mudpt_tpu.serving import export_trainer
    from mudpt_tpu.trainers import build_trainer

    cfg = tiny_cfg("CoOp", tmp_path)
    tr = build_trainer(cfg)
    path = str(tmp_path / "artifact")
    export_trainer(path, tr)
    meta = json.load(open(f"{path}/meta.json"))
    assert "perf" in meta
    assert meta["perf"]["LN"] == "fp32"
    assert "TEXT_TRUNC" in meta["perf"]
