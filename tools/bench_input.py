#!/usr/bin/env python
"""Host-side input-pipeline throughput: decode -> augment -> batch, no TPU.

The tunneled chip's 16 MB/s H2D link makes `bench.py --input ...` measure
the link rather than the pipeline (docs/BENCHMARKS.md round 3); this bench
isolates the HOST half — JPEG decode, random-resized-crop/flip, normalize,
batch assembly — so the pipeline's capability can be compared against the
compute ceiling (1838 img/s train step at B=384) directly:

  python tools/bench_input.py --pipeline threads --workers 16
  python tools/bench_input.py --pipeline tfdata
  python tools/bench_input.py --pipeline grain

Prints one JSON line per run: images/sec sustained over --steps batches
after one warmup pass of --warmup batches.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")  # repo-root execution, like train.py


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pipeline", choices=["threads", "tfdata", "grain"],
                   default="threads")
    p.add_argument("--batch", type=int, default=384)
    p.add_argument("--n-jpegs", type=int, default=2048)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--workers", type=int, default=16,
                   help="threads pipeline decode workers")
    args = p.parse_args(argv)
    if args.batch > args.n_jpegs:
        p.error("--batch exceeds --n-jpegs")
    return args


def main(args) -> None:
    import numpy as np

    from bench import _synth_jpegs, build_pipeline_loader

    items = _synth_jpegs(args.n_jpegs, n_cls=100, side=256)
    loader = build_pipeline_loader(
        args.pipeline, items, args.batch, args.size, workers=args.workers
    )

    def batches():
        while True:
            for b in loader:
                # touch the decoded array so lazy pipelines cannot defer work
                yield np.asarray(b["image"])

    it = batches()
    for _ in range(args.warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        next(it)
    dt = time.perf_counter() - t0
    ips = args.batch * args.steps / dt
    print(
        json.dumps(
            {
                "metric": (
                    f"input pipeline host throughput ({args.pipeline}, "
                    f"batch {args.batch}, {args.size}px random-resized-crop)"
                ),
                "value": round(ips, 1),
                "unit": "images/sec",
                "keeps_up_with_train_step": ips >= 1838.0,
            }
        )
    )


if __name__ == "__main__":
    main(parse_args())
