#!/usr/bin/env python
"""Benchmark: MuDPT prompt-tuning training throughput (images/sec/chip).

Measures the full jitted training step of the flagship configuration —
CLIP ViT-B/16 (random weights; throughput is weight-agnostic), bf16
backbone, n_ctx=2, deep prompt depth 9, n_cls classes re-encoded every step
— on the available accelerator, and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": R}

``vs_baseline`` is value / A100_BASELINE_IPS.  The reference publishes no
numbers (BASELINE.md), so the baseline is an estimate of PyTorch MuDPT on
one A100-80G SXM (312 TF/s fp16 dense peak), derived two independent ways
and documented as a bracket in BASELINE.md's addendum:

  (1) analytic: this workload costs ~81 GFLOP/img (fwd + dx-only backward,
      vision tower 199 tokens + the per-step n_cls x 77 text tower); eager
      PyTorch transformer training typically lands at 25-40% MFU on A100
      => 960-1530 img/s at a throughput-optimal batch;
  (2) published ViT-B/16 A100 AMP full-finetune throughputs (~900-1100
      img/s, e.g. timm benchmarks) rescaled by the FLOP ratio of a full
      backward (~2.9x fwd, + optimizer) to this frozen-backbone step
      (~2.2x fwd + text tower) => ~1050-1380 img/s;
  while the reference AS SHIPPED trains at batch 4 (latency-bound,
  single-digit MFU) => ~150-400 img/s.

The pinned 850 sits between as-shipped and fully-tuned (~26% MFU at
optimal batch) and is kept as the denominator every round for
comparability; the bracket above bounds its honesty.  The BASELINE.json
north star is >=2x it per chip.

The JSON reports BOTH FLOP accountings so 'hardware utilization' is never
read as MFU: ``model_*`` counts algorithmic FLOPs only (fwd + dx-only
backward, no recompute); ``exec_*`` counts executed FLOPs including
backward rematerialization.
"""

from __future__ import annotations

import argparse
import json
import os
import time

A100_BASELINE_IPS = 850.0


def _wait_for_accelerator(tries: int = 5, probe_timeout: int = 120,
                          delay: int = 60) -> None:
    """Ride out a transient accelerator outage before committing to the run.

    The tunneled TPU plugin occasionally fails init with UNAVAILABLE — or
    hangs in backend setup — and JAX caches a backend-init failure for the
    life of the process, so an in-process retry cannot recover.  Probing in
    a SUBPROCESS gives every attempt fresh backend state and a hard timeout;
    once a probe succeeds, this process initializes against the now-healthy
    tunnel.  After ``tries`` failures we proceed anyway and let the real run
    raise the underlying error.
    """
    import subprocess
    import sys

    for i in range(tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if i == tries - 1:
            print(
                f"# all {tries} accelerator probes failed; proceeding — the "
                "run will surface the underlying error", file=sys.stderr,
            )
            return
        print(
            f"# accelerator probe {i + 1}/{tries} failed; retrying in "
            f"{delay}s", file=sys.stderr,
        )
        time.sleep(delay)


def main() -> None:
    # honor an explicit JAX_PLATFORMS=cpu for debugging/smoke runs (the
    # sitecustomize-registered TPU plugin overrides the env var otherwise —
    # same mechanism as train.py; the driver's default invocation is
    # unaffected)
    from mudpt_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    from mudpt_tpu.utils.synth_step import MODEL_NAMES

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=list(MODEL_NAMES),
                    default="ViT-B/16")
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--n-cls", type=int, default=100)
    ap.add_argument("--n-ctx", type=int, default=2)
    ap.add_argument("--depth", type=int, default=9)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--remat", choices=["auto", "selective", "full", "none"],
                    default="auto")
    ap.add_argument("--input", choices=["resident", "threads", "tfdata", "grain"],
                    default="resident",
                    help="resident: one device-resident batch every step "
                    "(pure-compute ceiling). threads/tfdata/grain: decode a "
                    "synthetic JPEG dataset through the real input pipeline "
                    "with host->device prefetch (the BASELINE.json north-star "
                    "pipeline), reporting the H2D ceiling alongside.")
    ap.add_argument("--n-jpegs", type=int, default=2048)
    ap.add_argument("--quant",
                    choices=["none", "int8", "int8_static", "int8_ste",
                             "int8_ste_static"],
                    default="none",
                    help="int8 (eval-mode only): post-training W8A8 "
                    "quantization of the block projection matmuls "
                    "(ops/quant_block.py).  int8_static (eval-mode only): "
                    "W8A8 with static activation scales calibrated on the "
                    "bench batch — no per-row quant chain in the kernel "
                    "(docs/BENCHMARKS.md session 8).  int8_ste (train "
                    "mode): quantization-aware prompt tuning — the same "
                    "int8 forward with a straight-through backward, "
                    "training prompts against the numerics that will "
                    "serve them.  int8_ste_static (train mode): QAT "
                    "against the calibrated static tier (scales from the "
                    "bench batch).")
    ap.add_argument("--mode", choices=["train", "eval"], default="train",
                    help="train: the headline train-step bench. eval: the "
                    "inference/serving path (argmax eval step), reporting "
                    "cached-text-features throughput vs re-encoding the "
                    "text tower every batch like the reference does.")
    args = ap.parse_args()
    # ALL argument validation before the (potentially minutes-long)
    # accelerator probe: a bad flag combination must fail immediately
    if args.mode == "eval" and args.input != "resident":
        ap.error("--mode eval supports --input resident only")
    if args.quant in ("int8", "int8_static") and args.mode != "eval":
        ap.error(f"--quant {args.quant} is inference-only; use with --mode "
                 "eval (the quantized blocks have no backward) — for "
                 "training, --quant int8_ste is the straight-through variant")
    if args.quant.startswith("int8_ste") and args.mode != "train":
        ap.error(f"--quant {args.quant} is the TRAINING variant; for serving "
                 "use --quant int8 (identical forward, no save writes)")
    if args.input != "resident" and args.batch > args.n_jpegs:
        # fail BEFORE the multi-minute graph build: tfdata would yield ZERO
        # batches (drop_remainder) and the bench's batch cycler would spin
        # forever; threads/grain would quietly benchmark a mostly
        # zero-padded batch
        ap.error(
            f"--input {args.input}: --batch {args.batch} exceeds the "
            f"synthetic set (--n-jpegs {args.n_jpegs}) — raise --n-jpegs"
        )
    if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
        _wait_for_accelerator()
    if args.mode == "eval":
        _run_eval(args)
        return

    try:
        _run(args)
    except Exception as e:  # OOM insurance: the headline batch leaves only
        #  ~2.5 GB of HBM headroom; an environment with a slightly different
        #  footprint must still produce a bench line, not a traceback
        import sys

        msg = str(e)
        # match on the specific XLA OOM markers only (not bare substrings
        # like "memory") but accept any exception type: the remote-compile
        # tunnel can re-wrap an HBM RESOURCE_EXHAUSTED as a plain
        # RuntimeError, which must still trigger the retry
        is_oom = (
            "RESOURCE_EXHAUSTED" in msg or "HBM" in msg or "Out of memory" in msg
        )
        if args.batch > 256 and is_oom:
            print(f"# batch {args.batch} OOM'd; retrying at 256",
                  file=sys.stderr)
            args.batch = 256
            try:
                _run(args)
            except Exception as e2:
                raise e2 from e
        else:
            raise


def _synth_jpegs(n: int, n_cls: int, side: int = 256):
    """Synthesize (once, cached) a JPEG dataset for input-pipeline benches:
    random-noise images decode at worst-case cost, exercising the full
    decode -> random-resized-crop -> flip -> normalize path."""
    import numpy as np
    from PIL import Image

    from mudpt_tpu.data.datum import Datum

    root = os.path.join("/tmp", f"mudpt_bench_jpegs_{n}x{side}")
    marker = os.path.join(root, ".complete")
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        rng = np.random.RandomState(0)
        for i in range(n):
            arr = rng.randint(0, 256, (side, side, 3), np.uint8)
            Image.fromarray(arr).save(
                os.path.join(root, f"{i}.jpg"), quality=85
            )
        with open(marker, "w") as f:
            f.write("ok")
    return [
        Datum(
            impath=os.path.join(root, f"{i}.jpg"),
            label=i % n_cls,
            classname=f"object number {i % n_cls}",
        )
        for i in range(n)
    ]


def build_pipeline_loader(pipeline: str, items, batch: int, size: int, *,
                          workers: int = 16, seed: int = 0):
    """Construct the named input pipeline over decoded-on-the-fly items
    (shared by bench.py --input and tools/bench_input.py)."""
    if pipeline == "tfdata":
        from mudpt_tpu.data.tfdata import TFDataLoader

        return TFDataLoader(
            items, batch, size=size, is_train=True,
            shuffle=True, drop_last=True, seed=seed,
        )
    from mudpt_tpu.data.transforms import TrainTransform

    tf = TrainTransform(size=size)
    if pipeline == "grain":
        from mudpt_tpu.data.grain_pipeline import GrainLoader

        return GrainLoader(
            items, tf, batch, shuffle=True, drop_last=True, seed=seed
        )
    from mudpt_tpu.data.loader import DataLoader

    return DataLoader(
        items, tf, batch, shuffle=True, drop_last=True,
        num_workers=workers,
    )


def _build_input_loader(args, resolution: int):
    assert args.batch <= args.n_jpegs  # validated at arg parse
    items = _synth_jpegs(args.n_jpegs, args.n_cls)
    return build_pipeline_loader(
        args.input, items, args.batch, resolution,
        workers=int(os.environ.get("MUDPT_BENCH_WORKERS", "16")),
    )


def _run_eval(args) -> None:
    """Inference/serving bench: the trainer-level eval step (on-device
    argmax) with text features encoded ONCE (the framework's evaluate()
    behavior) vs re-encoded per batch (the reference's CustomCLIP.forward,
    mudpt.py:170-184)."""
    from mudpt_tpu.models.transformer import set_remat_mode

    set_remat_mode("none")
    if args.quant != "none":
        from mudpt_tpu.models.layers import set_quant_mode

        set_quant_mode(args.quant)

    import numpy as np

    from mudpt_tpu.utils.synth_step import build_synth_mudpt_step

    st = build_synth_mudpt_step(
        args.model, args.batch, args.n_cls, args.n_ctx, args.depth
    )
    warmup = max(1, args.warmup)

    txt = st.text_features(st.trainable, st.params, st.aux)
    np.asarray(txt)[0, 0]  # force (block_until_ready returns early here)

    if args.quant == "int8_static":
        # calibrate static activation scales for the VISION tower on the
        # bench batch (the text tower's features are cached above; its
        # per-batch re-encode in eval_step_full stays dynamic-quantized)
        import functools

        import jax.numpy as jnp

        from mudpt_tpu.ops import quant_block as QB
        from mudpt_tpu.trainers.mudpt import mudpt_image_logits

        fwd = functools.partial(
            mudpt_image_logits, clip_cfg=st.clip_cfg,
            compute_dtype=jnp.bfloat16,
        )
        scales = QB.calibrate(
            fwd, st.trainable, st.params, st.aux, st.images, txt
        )
        st.params["visual"]["blocks"] = QB.attach_scales(
            st.params["visual"]["blocks"], scales
        )
        # text tower too: only the uncached (per-batch re-encode) loop
        # runs it, but that row is part of the report
        from mudpt_tpu.trainers.mudpt import mudpt_text_features

        tfwd = functools.partial(
            mudpt_text_features, clip_cfg=st.clip_cfg,
            compute_dtype=jnp.bfloat16,
        )
        tscales = QB.calibrate(tfwd, st.trainable, st.params, st.aux)
        st.params["text"]["blocks"] = QB.attach_scales(
            st.params["text"]["blocks"], tscales
        )
        # re-encode the cached features under the static tier so the
        # cached and uncached rows serve identical numerics
        txt = st.text_features(st.trainable, st.params, st.aux)
        np.asarray(txt)[0, 0]

    def time_loop(fn, *extra):
        preds = None
        for _ in range(warmup):
            preds = fn(st.trainable, st.params, st.aux, st.images, *extra)
        int(preds[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            preds = fn(st.trainable, st.params, st.aux, st.images, *extra)
        # host fetch: per-device execution is in-order, so fetching the last
        # step's preds bounds all queued steps
        int(preds[0])
        return args.batch * args.steps / (time.perf_counter() - t0)

    ips_cached = time_loop(st.eval_step_cached, txt)
    ips_full = time_loop(st.eval_step_full)

    # analytic forward FLOPs (matmuls; same accounting as the train bench)
    clip_cfg = st.clip_cfg

    def tower_fwd(n_seq, n_layers, d, rows):
        return (12 * d * d + 4 * n_seq * d) * 2 * n_seq * n_layers * rows

    n_patch = (clip_cfg.image_resolution // clip_cfg.vision_patch_size) ** 2
    img_fwd = tower_fwd(
        n_patch + 1 + args.n_ctx, clip_cfg.vision_layers,
        clip_cfg.vision_width, args.batch,
    )
    peak = float(os.environ.get("TPU_PEAK_FLOPS", 197e12))  # v5e bf16
    if args.quant.startswith("int8"):
        peak *= 2  # v5e MXU int8 rate (394 TOPS); MFU against the int8 peak
    qlabel = {"int8": "int8", "int8_static": "int8-static"}.get(
        args.quant, "bf16"
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"MuDPT {args.model} inference throughput "
                    f"({qlabel}, batch "
                    f"{args.batch}, n_cls {args.n_cls}, cached text features)"
                ),
                "value": round(ips_cached, 2),
                "unit": "images/sec/chip",
                "uncached_img_per_sec": round(ips_full, 2),
                "speedup_vs_per_batch_text": round(ips_cached / ips_full, 3),
                "model_mfu": round(img_fwd * ips_cached / args.batch / peak, 3),
            }
        )
    )


def _run(args) -> None:
    from mudpt_tpu.models.layers import resolve_block_impl
    from mudpt_tpu.models.transformer import set_remat_mode

    if args.quant != "none":
        from mudpt_tpu.models.layers import set_quant_mode

        set_quant_mode(args.quant)
    if args.remat == "auto":
        # pallas fused blocks save only x per layer => no-remat fits large
        # batches; with XLA blocks no-remat fits to ~batch 96 on 16 GB
        if resolve_block_impl() == "pallas":
            set_remat_mode("none")
        else:
            set_remat_mode("none" if args.batch <= 96 else "full")
    else:
        set_remat_mode(args.remat)

    import jax
    import numpy as np

    from mudpt_tpu.utils.synth_step import build_synth_mudpt_step

    st = build_synth_mudpt_step(
        args.model, args.batch, args.n_cls, args.n_ctx, args.depth
    )
    if args.quant == "int8_ste_static":
        # QAT against the calibrated static tier: attach build-time scales
        # to both towers (trainers/base.py does the same for TRAIN.QUANT)
        import functools

        import jax.numpy as jnp

        from mudpt_tpu.ops import quant_block as QB
        from mudpt_tpu.trainers.mudpt import (
            mudpt_image_logits,
            mudpt_text_features,
        )

        kw = dict(clip_cfg=st.clip_cfg, compute_dtype=jnp.bfloat16)
        tscales, txt = QB.calibrate(
            functools.partial(mudpt_text_features, **kw),
            st.trainable, st.params, st.aux, with_output=True,
        )
        st.params["text"]["blocks"] = QB.attach_scales(
            st.params["text"]["blocks"], tscales
        )
        vscales = QB.calibrate(
            functools.partial(mudpt_image_logits, **kw),
            st.trainable, st.params, st.aux, st.images, txt,
        )
        st.params["visual"]["blocks"] = QB.attach_scales(
            st.params["visual"]["blocks"], vscales
        )
    clip_cfg, params, aux = st.clip_cfg, st.params, st.aux
    trainable, opt_state, train_step = st.trainable, st.opt_state, st.train_step
    images, labels = st.images, st.labels

    h2d_mb_s = None
    if args.input == "resident":
        for _ in range(args.warmup):
            trainable, opt_state, loss = train_step(
                trainable, opt_state, params, aux, images, labels
            )
        float(loss)  # host fetch: the only reliable barrier on tunneled devices

        t0 = time.perf_counter()
        for _ in range(args.steps):
            trainable, opt_state, loss = train_step(
                trainable, opt_state, params, aux, images, labels
            )
        # fetch the final loss: the donated-buffer chain forces every queued
        # step to execute before this value exists (block_until_ready alone
        # returns early on remote-relay platforms)
        final_loss = float(loss)
        dt = time.perf_counter() - t0
    else:
        import ml_dtypes

        loader = _build_input_loader(args, clip_cfg.image_resolution)

        def batches():
            while True:
                for b in loader:
                    yield b

        def to_device(b):
            img = np.ascontiguousarray(
                np.asarray(b["image"], np.float32)
            ).astype(ml_dtypes.bfloat16)
            lab = np.asarray(b["label"], np.int32)
            return jax.device_put(img), jax.device_put(lab)

        it = batches()
        # H2D ceiling of this link: repeated full-batch puts, each forced to
        # completion by a tiny fetch (block_until_ready returns early here)
        sample = np.asarray(next(it)["image"], np.float32).astype(
            ml_dtypes.bfloat16
        )
        td = time.perf_counter()
        reps = 3
        for _ in range(reps):
            d = jax.device_put(sample)
            np.asarray(d[0, 0, 0, 0])
        h2d_mb_s = sample.nbytes * reps / (time.perf_counter() - td) / 1e6

        for _ in range(args.warmup):
            di, dl = to_device(next(it))
            trainable, opt_state, loss = train_step(
                trainable, opt_state, params, aux, di, dl
            )
        float(loss)

        # prefetch-1: decode + H2D of the NEXT batch overlaps this step's
        # device compute (same structure as trainers/base._device_prefetch)
        t0 = time.perf_counter()
        nxt = to_device(next(it))
        for i in range(args.steps):
            di, dl = nxt
            trainable, opt_state, loss = train_step(
                trainable, opt_state, params, aux, di, dl
            )
            if i + 1 < args.steps:
                nxt = to_device(next(it))
        final_loss = float(loss)
        dt = time.perf_counter() - t0
    assert final_loss == final_loss, "NaN loss in benchmark"

    ips = args.batch * args.steps / dt

    # FLOPs per step: prefer XLA's own accounting for the compiled step
    # (captures the frozen-backbone backward exactly: no dW for the
    # backbone) — EXCEPT with Pallas fused blocks, whose custom-call FLOPs
    # XLA cannot see; there we use the analytic matmul estimate.
    from mudpt_tpu.models.layers import resolve_block_impl as _rbi

    step_flops = None
    if _rbi() != "pallas":
        try:
            compiled = train_step.lower(
                trainable, opt_state, params, aux, images, labels
            ).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            step_flops = float(ca.get("flops", 0)) or None
        except Exception:
            pass
    def tower_fwd_flops(n_seq, n_layers, d, rows):
        per_tok_layer = (12 * d * d + 4 * n_seq * d) * 2
        return per_tok_layer * n_seq * n_layers * rows

    def tower_bwd_dx_flops(n_seq, n_layers, d, rows):
        # dx-only backward (frozen weights): every linear costs its forward
        # again (dy @ W^T); the two S-wide head matmuls cost 2x (dq,dk / dp,dv)
        per_tok_layer = (12 * d * d + 8 * n_seq * d) * 2
        return per_tok_layer * n_seq * n_layers * rows

    n_patch = (clip_cfg.image_resolution // clip_cfg.vision_patch_size) ** 2
    vis_seq = n_patch + 1 + args.n_ctx
    # EOT-truncated text rows (MUDPT_TPU_TEXT_TRUNC) shrink the executed
    # text tower; count the EXECUTED length so model-MFU does not claim
    # credit for the dead positions truncation eliminated
    txt_seq = (
        int(aux["token_suffix"].shape[1]) + 1 + args.n_ctx
        if "token_suffix" in aux
        else 77
    )
    img_fwd = tower_fwd_flops(
        vis_seq, clip_cfg.vision_layers, clip_cfg.vision_width, args.batch
    )
    txt_fwd = tower_fwd_flops(
        txt_seq, clip_cfg.transformer_layers, clip_cfg.transformer_width,
        args.n_cls,
    )
    img_bwd = tower_bwd_dx_flops(
        vis_seq, clip_cfg.vision_layers, clip_cfg.vision_width, args.batch
    )
    txt_bwd = tower_bwd_dx_flops(
        txt_seq, clip_cfg.transformer_layers, clip_cfg.transformer_width,
        args.n_cls,
    )
    model_flops = img_fwd + txt_fwd + img_bwd + txt_bwd

    if step_flops is None:
        from mudpt_tpu.models import transformer as _T
        from mudpt_tpu.ops import fused_block as _FB

        # executed = model + forward recompute where blocks rematerialize:
        # pallas kernels recompute in-kernel whatever the fwd didn't save
        # (the save-backward applies only at tower width <= 768; wider
        # towers take the full in-kernel recompute — ops/fused_block.py),
        # XLA blocks recompute the whole forward under full remat
        if _rbi() == "pallas":
            from mudpt_tpu.models import text as _TX

            # row-tokens decide the wide-MLP (ViT-L) h-save auto policy —
            # pass the SAME units the kernels gate on (B x the raw tower
            # sequence; _mlp_fwd sees x.shape as-is, no padding) so the
            # executed-FLOPs accounting takes the same branch at the
            # boundary batches
            vis_frac = _FB.saved_fraction_for_width(
                clip_cfg.vision_width, args.batch * vis_seq
            )
            txt_frac = (
                _FB.SAVED_FWD_FRACTION_RECOMPUTE
                if _TX._text_saves_off(args.n_cls, -(-txt_seq // 8) * 8)
                else _FB.saved_fraction_for_width(clip_cfg.transformer_width)
            )
            recompute = img_fwd * (1.0 - vis_frac) + txt_fwd * (1.0 - txt_frac)
        else:
            recompute = (img_fwd + txt_fwd) if _T._REMAT_MODE != "none" else 0.0
        step_flops = model_flops + recompute
    achieved = step_flops * args.steps / dt
    model_achieved = model_flops * args.steps / dt
    peak = float(os.environ.get("TPU_PEAK_FLOPS", 197e12))  # v5e bf16
    qlabel = {
        "int8_ste": "int8-ste", "int8_ste_static": "int8-ste-static"
    }.get(args.quant, "bf16")

    print(
        json.dumps(
            {
                "metric": (
                    f"MuDPT {args.model} prompt-tuning train throughput "
                    f"({qlabel}, "
                    f"batch {args.batch}, n_cls {args.n_cls}, depth {args.depth}"
                    + ("" if args.input == "resident" else f", input {args.input}")
                    + ")"
                ),
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
                # model_* = algorithmic FLOPs (fwd + dx-only bwd, no
                # recompute): the honest MFU.  exec_* = executed FLOPs incl.
                # backward rematerialization: hardware utilization.
                "model_tflops_per_sec": round(model_achieved / 1e12, 2),
                "model_mfu": round(model_achieved / peak, 3),
                "exec_tflops_per_sec": round(achieved / 1e12, 2),
                "hw_utilization": round(achieved / peak, 3),
                **(
                    {"input": args.input,
                     "h2d_mb_per_sec": round(h2d_mb_s, 1)}
                    if h2d_mb_s is not None else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
