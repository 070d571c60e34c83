#!/usr/bin/env python
"""Measure serving throughput of an exported artifact (mudpt_tpu/serving.py)
on the current backend — the end-to-end validation that a `jax.export`
program (including TPU-only Mosaic/int8 variants) executes on real
hardware, not just deserializes.

The timed loop feeds one device-resident batch (params are device-resident
from load), so this measures the artifact's compute path; host decode and
H2D are measured separately (tools/bench_input.py — on this tunnel they
measure the 16 MB/s link, see docs/BENCHMARKS.md).

Run:  python tools/bench_artifact.py --artifact serving/my_model
      (TPU; serial with other chip jobs.  For pinned-batch artifacts the
      batch comes from meta.json; otherwise pass --batch.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--batch", type=int, default=0,
                    help="serving batch (default: the artifact's pinned "
                    "batch from meta.json; required for symbolic-batch "
                    "artifacts)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    from mudpt_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()

    import jax
    import numpy as np

    import mudpt_tpu.serving as serving

    clf = serving.load(args.artifact)
    batch = args.batch or clf.meta.get("batch")
    if not batch:
        ap.error("symbolic-batch artifact: pass --batch")
    res = clf.meta["preprocess"]["resize_then_center_crop"]

    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randn(batch, res, res, 3).astype(np.float32)
    )

    # queue the calls and fetch ONCE at the end (the chip stream executes
    # serially, so the final fetch bounds every queued batch) — per-batch
    # np.asarray round-trips measure the tunnel's dispatch latency, not
    # the artifact (predict() pays them; a real serving host would not)
    for _ in range(max(1, args.warmup)):  # >=1: the first call compiles
        logits = clf._call(clf._leaves, images)
    assert np.isfinite(np.asarray(logits)).all()

    t0 = time.perf_counter()
    for _ in range(args.steps):
        logits = clf._call(clf._leaves, images)
    logits = np.asarray(logits)
    dt = time.perf_counter() - t0

    ips = batch * args.steps / dt
    print(
        json.dumps(
            {
                "metric": (
                    f"serving-artifact throughput "
                    f"({clf.meta.get('block_impl', 'xla')}, batch {batch}, "
                    f"n_cls {len(clf.classnames or [])}, "
                    f"{jax.devices()[0].platform})"
                ),
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "ms_per_batch": round(dt / args.steps * 1e3, 2),
                "finite": bool(np.isfinite(logits).all()),
            }
        )
    )


if __name__ == "__main__":
    main()
