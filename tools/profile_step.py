#!/usr/bin/env python
"""Profile the MuDPT train step on the TPU and print per-op time.

Runs the same step as bench.py under ``jax.profiler.trace``, converts the
raw xplane with xprof's ``framework_op_stats``, and prints the top ops by
self time — the round-2 A/B methodology (docs/BENCHMARKS.md).

  python tools/profile_step.py --batch 192 --n-cls 1000 [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["ViT-B/16", "ViT-L/14"],
                    default="ViT-B/16")
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--n-cls", type=int, default=1000)
    ap.add_argument("--n-ctx", type=int, default=2)
    ap.add_argument("--depth", type=int, default=9)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--outdir", default="/tmp/mudpt_profile")
    args = ap.parse_args()

    import jax

    from mudpt_tpu.utils.synth_step import build_synth_mudpt_step

    # the exact step bench.py times — shared builder, cannot drift
    st = build_synth_mudpt_step(
        args.model, args.batch, args.n_cls, args.n_ctx, args.depth
    )
    params, aux = st.params, st.aux
    trainable, opt_state, train_step = st.trainable, st.opt_state, st.train_step
    images, labels = st.images, st.labels

    print("compiling + warmup...", flush=True)
    for _ in range(2):  # compile + warm
        trainable, opt_state, loss = train_step(
            trainable, opt_state, params, aux, images, labels
        )
    float(loss)
    print("tracing...", flush=True)

    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            trainable, opt_state, loss = train_step(
                trainable, opt_state, params, aux, images, labels
            )
        float(loss)

    # ---- convert + print framework_op_stats ------------------------------
    from xprof.convert import raw_to_tool_data as rtd

    planes = glob.glob(
        os.path.join(args.outdir, "plugins/profile/*/*.xplane.pb")
    )
    planes.sort(key=os.path.getmtime)
    assert planes, f"no xplane under {args.outdir}"
    data, _ = rtd.xspace_to_tool_data([planes[-1]], "framework_op_stats", {})
    import json as _json

    tables = _json.loads(data.decode() if isinstance(data, bytes) else data)
    table = tables[0] if isinstance(tables, list) else tables
    ids = [c["id"] for c in table["cols"]]
    rows = []
    for r in table["rows"]:
        vals = {i: (c or {}).get("v") for i, c in zip(ids, r["c"])}
        if vals.get("host_or_device") == "Host":
            continue
        rows.append(vals)
    rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
    total = sum(r.get("total_self_time") or 0 for r in rows)
    print(f"device total self-time: {total/1e3:.1f} ms over {args.steps} steps")
    print(f"{'op':64s} {'self_ms':>9s} {'%':>6s} {'occ':>6s} {'GB/s':>7s}")
    for r in rows[: args.top]:
        name = str(r.get("operation", "?"))[:64]
        t_us = r.get("total_self_time") or 0
        occ = r.get("occurrences") or 0
        bw = r.get("measured_memory_bw") or 0
        print(
            f"{name:64s} {t_us/1e3:9.2f} {100*t_us/max(total,1):6.1f} "
            f"{int(occ):6d} {bw:7.1f}"
        )


if __name__ == "__main__":
    main()
