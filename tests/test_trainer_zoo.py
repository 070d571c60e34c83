"""The full trainer zoo: build + one training epoch + eval for every
registered method, on the tiny backbone / synthetic dataset / 8-device mesh."""

import json

import numpy as np
import pytest

from mudpt_tpu.trainers import build_trainer

from tests.test_trainers import tiny_cfg


@pytest.mark.parametrize(
    "trainer,extra",
    [
        ("CoCoOp", {}),
        ("VPT", dict(VISUAL_PROMPT_DEPTH=2, DEEP_VISUAL_N_CTX=2)),
        (
            "MPT",
            dict(
                VISUAL_PROMPT_DEPTH=2,
                DEEP_VISUAL_N_CTX=2,
                TEXT_PROMPT_DEPTH=2,
                DEEP_TEXT_N_CTX=2,
            ),
        ),
        ("UMuDPT", {}),
        ("UUMuDPT", {}),
    ],
)
def test_zoo_trains_one_epoch(tmp_path, trainer, extra):
    cfg = tiny_cfg(trainer, tmp_path, **extra)
    cfg.OPTIM.MAX_EPOCH = 2
    tr = build_trainer(cfg)
    tr.train()
    res = tr.evaluate(tr.dm.test_loader)
    assert res["total"] == len(tr.dm.dataset.test)
    records = [
        json.loads(line)
        for line in open(f"{cfg.OUTPUT_DIR}/metrics.jsonl")
        if '"train"' in line
    ]
    assert records and all(np.isfinite(r["loss"]) for r in records)


def test_vpt_trainable_set(tmp_path):
    cfg = tiny_cfg("VPT", tmp_path, VISUAL_PROMPT_DEPTH=2, DEEP_VISUAL_N_CTX=2)
    tr = build_trainer(cfg)
    assert set(tr.trainable) == {"visual_ctx", "visual_deep_prompts"}

    cfg = tiny_cfg(
        "MPT",
        tmp_path,
        VISUAL_PROMPT_DEPTH=2,
        DEEP_VISUAL_N_CTX=2,
        TEXT_PROMPT_DEPTH=2,
        DEEP_TEXT_N_CTX=2,
    )
    tr = build_trainer(cfg)
    # MPT also owns the learnable layer-0 text ctx its TextPromptLearner
    # splices (reference mpt.py:77,95-124)
    assert set(tr.trainable) == {
        "ctx",
        "visual_ctx",
        "visual_deep_prompts",
        "text_deep_prompts",
    }
    assert not tr.static_text  # text features depend on the L0 ctx


def test_uumudpt_trainable_set(tmp_path):
    cfg = tiny_cfg("UUMuDPT", tmp_path)
    tr = build_trainer(cfg)
    assert set(tr.trainable) == {
        "ctx",
        "deep_prompts",
        "t2v",
        "visual_ctx",
        "visual_ctx_deep_prompts",
        "v2t",
    }


def test_static_text_cache_tracks_frozen(tmp_path):
    """Round-3 advisor finding: any post-build mutation of the frozen tree
    must refresh the static text cache in the same motion (_set_frozen) —
    a stale cache would silently train/eval against the old backbone."""
    import jax

    from tests.test_trainers import tiny_cfg as _tiny

    cfg = _tiny("VPT", tmp_path, VISUAL_PROMPT_DEPTH=2, DEEP_VISUAL_N_CTX=2)
    tr = build_trainer(cfg)
    assert "static_text_features" in tr.aux
    before = np.asarray(tr.aux["static_text_features"])

    frozen = jax.device_get(tr.frozen)
    frozen["text"]["projection"] = frozen["text"]["projection"] * 2.0
    tr._set_frozen(frozen)

    after = np.asarray(tr.aux["static_text_features"])
    fresh = np.asarray(
        tr._text_features(
            tr.trainable,
            tr.frozen,
            {k: v for k, v in tr.aux.items() if k != "static_text_features"},
        )
    )
    np.testing.assert_allclose(after, fresh, rtol=1e-6, atol=1e-7)
    assert np.abs(after - before).max() > 0, "cache did not refresh"
