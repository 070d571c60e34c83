"""Sweep-script smoke test: run the actual bash scripts (tiny config,
synthetic dataset, 1 shot x 1 seed) through train.py end to end."""

import pytest

pytestmark = pytest.mark.slow  # measured multi-minute module (round-4 durations)

import json
import os
import subprocess


def _env(tmp_path):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        DATA=str(tmp_path / "data"),
        OUT_ROOT=str(tmp_path / "out"),
        CFG="test/tiny.yaml",
        DATASETS="synthetic",
        SHOTS="1",
        SEEDS="1",
    )
    return env


def test_run_cls_script(tmp_path):
    res = subprocess.run(
        ["bash", "scripts/mudpt/run_cls.sh"],
        env=_env(tmp_path), capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    run_dir = tmp_path / "out" / "synthetic" / "MuDPT" / "tiny_1shots" / "seed_1"
    assert (run_dir / "metrics.jsonl").exists()
    evals = [
        json.loads(l) for l in open(run_dir / "metrics.jsonl") if '"eval"' in l
    ]
    assert evals and "accuracy" in evals[-1]

    # idempotency: second invocation must skip the existing run
    res2 = subprocess.run(
        ["bash", "scripts/mudpt/run_cls.sh"],
        env=_env(tmp_path), capture_output=True, text=True, timeout=120,
    )
    assert res2.returncode == 0
    assert "Skip existing" in res2.stdout


def test_base2new_scripts(tmp_path):
    env = _env(tmp_path)
    res = subprocess.run(
        ["bash", "scripts/mudpt/train_base2new.sh"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    env["EPOCH"] = "1"
    res = subprocess.run(
        ["bash", "scripts/mudpt/test_base2new.sh"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert (
        tmp_path / "out" / "base2new" / "test_new" / "synthetic" / "MuDPT"
        / "seed_1" / "metrics.jsonl"
    ).exists()
