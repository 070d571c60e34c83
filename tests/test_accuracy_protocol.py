"""Trained-ACCURACY parity through the full protocol (the north star's
last proxy executable in this environment — BASELINE.json targets ±0.3%
top-1 vs the PyTorch reference on real data/weights, which are blocked
here).

Drives tools/accuracy_ab.py: BOTH stacks (our production engine; the torch
reference CustomCLIP under an executable spec of Dassl's loop) train
through the real recipe — SGD momentum+wd, per-epoch cosine LR with
1-epoch constant warmup, 16-shot sampling, base->new transfer with the
prefix/suffix-deletion checkpoint semantics — from identical weights on
identical data, and the FINAL TEST TOP-1 of every stage must agree.

The committed full table (3 methods x 3 seeds x 10 epochs) lives in
docs/PARITY.md; this test pins one method end to end so the machinery and
the parity stay green.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_full_protocol_accuracy_parity(tmp_path):
    out = tmp_path / "results.jsonl"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # the tool pins jax to CPU itself; subprocess keeps the suite's env
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "accuracy_ab.py"),
            "--methods", "MuDPT", "--seeds", "1", "--epochs", "6",
            "--pretrain-steps", "250",
            "--workdir", str(tmp_path / "work"),
            "--json-out", str(out),
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    rows = [json.loads(line) for line in open(out)]
    stages = {r["stage"]: r for r in rows}
    assert set(stages) == {"cls", "base", "new"}

    # both stacks must actually LEARN (the comparison is vacuous at
    # chance): base training reaches well above the 25% 4-way chance
    assert stages["base"]["ref"] > 60.0, stages
    assert stages["base"]["ours"] > 60.0, stages

    # the parity claim: final test top-1 agrees per stage.  Measured
    # deltas are 0.00 at this config (per-epoch losses track <=1e-4 over
    # all 6x16 steps); the band allows a few argmax flips from fp noise
    # without letting a real training-dynamics bug through.
    for stage, r in stages.items():
        assert abs(r["delta"]) <= 3.0, f"{stage}: {r}"
