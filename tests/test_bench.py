"""bench.py smoke tests — the driver-facing surface.

The driver runs ``python bench.py`` on the real chip at every round close
and records the single JSON line; these tests pin that contract (arg
surface, JSON schema, NaN guard) on CPU with the ``test-tiny`` model so a
Python-level regression can never reach the driver first.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(*extra):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--model", "test-tiny", "--batch", "4", "--n-cls", "4",
         "--n-ctx", "2", "--depth", "2", "--steps", "2", "--warmup", "1",
         *extra],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # ONE JSON line contract: the last stdout line parses
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_train_mode_json_contract():
    out = _run_bench()
    for key in ("metric", "value", "unit", "vs_baseline",
                "model_mfu", "model_tflops_per_sec",
                "exec_tflops_per_sec", "hw_utilization"):
        assert key in out, key
    assert out["unit"] == "images/sec/chip"
    assert out["value"] > 0
    assert out["vs_baseline"] > 0


def test_bench_eval_mode_json_contract():
    out = _run_bench("--mode", "eval")
    for key in ("metric", "value", "unit",
                "uncached_img_per_sec", "speedup_vs_per_batch_text",
                "model_mfu"):
        assert key in out, key
    assert out["value"] > 0
    # caching the text tower can never be slower than re-encoding it
    # (allow timer noise at this tiny scale)
    assert out["speedup_vs_per_batch_text"] > 0.8


def test_bench_eval_rejects_pipeline_inputs():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--model", "test-tiny", "--mode", "eval", "--input", "tfdata"],
        env=env, capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert proc.returncode != 0
    assert "resident" in proc.stderr


def test_bench_zoo_eval_mode_json_contract():
    """tools/bench_zoo.py --mode eval (the serving-path zoo bench added in
    round 5): one JSON line per requested method, including the eval-only
    ZeroshotCLIP, with the serving-aux contract (static text cache
    stripped — the timed program is evaluate()'s)."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_zoo.py"),
         "--model", "test-tiny", "--batch", "4", "--n-cls", "4",
         "--size", "32", "--steps", "2", "--warmup", "1", "--mode", "eval",
         "--trainers", "VPT", "ZeroshotCLIP"],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(l) for l in proc.stdout.strip().splitlines()
            if l.startswith("{")]
    by_name = {r["trainer"]: r for r in rows}
    assert set(by_name) == {"VPT", "ZeroshotCLIP"}
    for r in by_name.values():
        assert r["mode"] == "eval" and r["img_per_sec"] > 0
        assert r["text_cached"] is True
        assert "error" not in r

    # --steps 0 is an argparse error, not a bogus per-trainer error row
    bad = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_zoo.py"),
         "--steps", "0"],
        env=env, capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert bad.returncode == 2 and "--steps" in bad.stderr
