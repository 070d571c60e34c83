"""Trainer engine: the Dassl ``TrainerX`` equivalent, TPU-native.

Responsibilities (reference call stack SURVEY.md §3.1): data manager, model
build, optimizer/schedule, the jitted train step (value_and_grad w.r.t. the
PROMPT pytree only — the frozen backbone is a non-differentiated argument,
so optimizer state covers prompts exclusively, matching the per-trainer
requires_grad rules of SURVEY.md §2.3), epoch loop with print-freq logging,
per-epoch checkpoints, evaluation with accuracy/macro-F1, and the
load-for-transfer semantics (class-dependent buffers rebuilt from the live
dataset, learned prompts restored — reference trainers/mudpt.py:270-303).

Sharding: one jitted step over a Mesh('data','model') — batch on `data`,
class-axis text buffers on `model`, params replicated (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mudpt_tpu.data import DataManager
from mudpt_tpu.models.clip import (
    CLIPConfig,
    RN50,
    RN50X4,
    RN50X16,
    RN50X64,
    RN101,
    VIT_B16,
    VIT_B32,
    VIT_L14,
    cast_matmul_weights,
    init_clip_params,
)
from mudpt_tpu.models.convert import load_clip_checkpoint
from mudpt_tpu.parallel import (
    build_mesh,
    host_rows_slice,
    replicate,
    shard_batch,
    shard_class_tree,
)
from mudpt_tpu.trainers.optim import build_optimizer
from mudpt_tpu.utils.checkpoint import load_checkpoint, restore_into, save_checkpoint
from mudpt_tpu.utils.logging import MetricsLogger
from mudpt_tpu.utils.metrics import build_evaluator
from mudpt_tpu.utils.profiling import StepTimer, profile_trace
from mudpt_tpu.utils.registry import TRAINER_REGISTRY
from mudpt_tpu.utils.rng import new_rng, set_seed

TINY_TEST = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    transformer_width=64,
    transformer_heads=1,
    transformer_layers=2,
)

_NAMED_CONFIGS = {
    "ViT-B/16": VIT_B16,
    "ViT-B/32": VIT_B32,
    "ViT-L/14": VIT_L14,
    # reference clip/clip.py:31-41 also ships the 336px fine-tune; same
    # tower, 24x24 patch grid (the converter derives this from a real
    # checkpoint — this preset covers PATH='random' runs)
    "ViT-L/14@336px": dataclasses.replace(VIT_L14, image_resolution=336),
    # RN-family presets (PATH='random' runs; real checkpoints self-infer).
    # Usable with the text-prompt trainers: ZeroshotCLIP(2), CoOp, CoCoOp.
    # All five reference RN checkpoints (clip/clip.py:31-41) are covered.
    "RN50": RN50,
    "RN101": RN101,
    "RN50x4": RN50X4,
    "RN50x16": RN50X16,
    "RN50x64": RN50X64,
    "test-tiny-rn": dataclasses.replace(
        TINY_TEST,
        embed_dim=64,
        vision_width=8,
        vision_patch_size=0,
        vision_arch="resnet",
        vision_layers_per_stage=(1, 1, 1, 1),
        vision_layers=4,
    ),
    "test-tiny": TINY_TEST,
}


def load_backbone(cfg):
    """CLIP backbone: from a local .pt checkpoint (MODEL.BACKBONE.PATH,
    reference trainers/mudpt.py:20-38), an .npz converted cache, the
    ``~/.cache/clip`` download cache (downloading on miss like the
    reference's ``clip.load`` — clip/clip.py:95-109), or random init for
    the named architecture — but ONLY when PATH='random' is explicit.
    A fresh host can therefore never silently train prompts on a
    random-weight CLIP."""
    path = cfg.MODEL.BACKBONE.PATH
    name = cfg.MODEL.BACKBONE.NAME
    if path and path not in ("random",):
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"MODEL.BACKBONE.PATH={path!r} not found. This environment has "
                "no network access; provide a local OpenAI CLIP .pt/.npz file."
            )
        return load_clip_checkpoint(path)
    if path == "random":
        if name not in _NAMED_CONFIGS:
            raise KeyError(
                f"Unknown backbone {name!r}; known: {list(_NAMED_CONFIGS)}"
            )
        clip_cfg = _NAMED_CONFIGS[name]
        params = init_clip_params(new_rng(0), clip_cfg)
        return clip_cfg, params
    # PATH unset: pretrained weights are REQUIRED — cache hit, else download.
    from mudpt_tpu.models.download import _MODELS, download_model

    if name in _MODELS:
        # the cache filename is the download URL's basename (the layout
        # download_model and the reference's clip.load share) — for
        # 'ViT-L/14@336px' that is 'ViT-L-14-336px.pt', which a naive
        # name.replace('/', '-') would miss
        basename = os.path.basename(_MODELS[name])
    else:
        basename = name.replace("/", "-") + ".pt"
    cache = os.path.expanduser(os.path.join("~/.cache/clip", basename))
    if os.path.exists(cache):
        return load_clip_checkpoint(cache)

    if name in _MODELS:
        try:
            return load_clip_checkpoint(download_model(name))
        except Exception as e:  # URLError, socket timeout, checksum, ...
            raise RuntimeError(
                f"Pretrained CLIP {name!r} is not cached at {cache} and the "
                f"download failed ({type(e).__name__}: {e}). Place the OpenAI "
                f".pt file at that path (or set MODEL.BACKBONE.PATH to a local "
                f".pt/.npz), or opt into random weights explicitly with "
                f"MODEL.BACKBONE.PATH='random'."
            ) from e
    raise RuntimeError(
        f"Backbone {name!r} has no pretrained checkpoint (not cached at "
        f"{cache}, not a known download). Set MODEL.BACKBONE.PATH to a local "
        f".pt/.npz file, or request random init explicitly with "
        f"MODEL.BACKBONE.PATH='random'."
    )


class TrainerBase:
    """Shared engine.  Subclasses implement ``build_model`` and set:

      self.clip_cfg   CLIPConfig
      self.frozen     backbone pytree (device)
      self.aux        static buffers pytree (device; class-sharded arrays)
      self.trainable  prompt pytree (device, replicated)
      self.forward    fn(trainable, frozen, aux, images) -> (B, n_cls_padded) logits
      self.model_name checkpoint subdirectory name
    """

    model_name = "prompt_learner"

    def __init__(self, cfg, dataset=None, devices=None):
        self.cfg = cfg
        set_seed(cfg.SEED)
        self.mesh = build_mesh(cfg, devices)
        # 'auto' kernel-impl selection follows the mesh's actual platform
        # (a registered TPU plugin must not select Pallas for a CPU mesh)
        from mudpt_tpu.models.layers import set_platform_hint

        set_platform_hint(self.mesh.mesh.devices.flat[0].platform)
        from mudpt_tpu.models.layers import set_quant_mode

        if cfg.TRAIN.QUANT not in (
            "none", "int8", "int8_static", "int8_ste", "int8_ste_static"
        ):
            raise ValueError(
                f"TRAIN.QUANT must be 'none', 'int8' (eval-only, dynamic "
                f"activation scales), 'int8_static' (eval-only, scales "
                f"calibrated on a training batch), 'int8_ste' "
                f"(quantization-aware training), or 'int8_ste_static' "
                f"(QAT against the calibrated static serving tier); got "
                f"{cfg.TRAIN.QUANT!r}"
            )
        # the mode is process-global: set it on EVERY build so a 'none'
        # trainer clears a mode left by a previous build in the same
        # process (A/B drivers, base->new eval).  An explicit config wins;
        # 'none' defers to the MUDPT_TPU_QUANT env opt-in.
        set_quant_mode(
            cfg.TRAIN.QUANT if cfg.TRAIN.QUANT != "none"
            else os.environ.get("MUDPT_TPU_QUANT", "none")
        )
        # PERF knobs (block impl, save strategies, text packing/truncation,
        # remat, LN dtype): explicit config values apply here, env vars
        # override, defaults leave programmatic state alone (config/perf.py)
        from mudpt_tpu.config.perf import apply_perf_config

        self.perf_resolved = apply_perf_config(cfg.PERF)
        self.dm = DataManager(cfg, dataset, n_data=self.mesh.n_data)
        self.num_classes = self.dm.num_classes
        self.classnames = self.dm.classnames
        self.metrics = MetricsLogger(cfg.OUTPUT_DIR)
        # record the RESOLVED perf/numerics policy: with this line a run's
        # metrics.jsonl + config dump fully reproduce its execution envelope
        # even when env overrides were in play
        self.metrics.log({"kind": "perf_config", **self.perf_resolved})
        # class axis padded to a multiple of the model-parallel degree;
        # loss/eval statically slice back to num_classes
        self.n_cls_padded = (
            -(-self.num_classes // self.mesh.n_model) * self.mesh.n_model
        )
        self.epoch = 0
        self._best_val = -1.0
        self._preempt = False        # set by the SIGTERM handler
        self._preempt_saved = False  # run_epoch wrote a mid-epoch checkpoint
        self._skip_batches = 0       # mid-epoch resume fast-forward

        hp = cfg.trainer_params() if cfg.TRAINER.NAME else None
        # trainers without a PREC hparam (the zero-shot pair) follow their
        # class default — the reference keeps the backbone fp16 there too
        # (build_model applies convert_weights unconditionally,
        # clip/model.py:917; zsclip never floats it)
        prec = getattr(hp, "PREC", self.prec_default) if hp is not None \
            else self.prec_default
        # fp16/amp -> bfloat16 on TPU (fp16 drift absorbed by parity budget)
        self.compute_dtype = jnp.bfloat16 if prec in ("fp16", "amp") else jnp.float32

        self.build_model()
        if self.trainable is not None and cfg.MODEL.INIT_WEIGHTS:
            # warm-start the prompt learner from a previous run's output
            # directory (reference trainers/mudpt.py:220-221
            # load_pretrained_weights); class-dependent buffers stay fresh
            print(f"Initializing prompt weights from {cfg.MODEL.INIT_WEIGHTS}")
            self.load_model(
                cfg.MODEL.INIT_WEIGHTS,
                epoch=self._resolve_checkpoint_epoch(cfg.MODEL.INIT_WEIGHTS),
            )
        if self.trainable is not None:
            self._build_train_state()
        self._jit_steps()
        from mudpt_tpu.models.layers import quant_mode

        if quant_mode() in ("int8_static", "int8_ste_static"):
            self._calibrate_static_quant()
        self._cache_static_text()

    # ------------------------------------------------------------------
    # model plumbing helpers for subclasses
    # ------------------------------------------------------------------
    # trainers that splice prompts into the visual tower set this: prompt
    # injection is defined for the ViT towers only (as in the reference,
    # whose prompt block variants subclass the transformer towers)
    requires_vit = False
    # PREC when the trainer has no PREC hparam (see __init__)
    prec_default = "fp32"

    def load_clip(self):
        clip_cfg, params = load_backbone(self.cfg)
        if self.requires_vit and clip_cfg.vision_arch != "vit":
            raise ValueError(
                f"{type(self).__name__} injects visual prompts and needs a "
                f"ViT backbone; got vision_arch={clip_cfg.vision_arch!r} "
                f"(RN-family backbones work with the text-prompt trainers: "
                f"ZeroshotCLIP, CoOp, CoCoOp)"
            )
        if self.compute_dtype == jnp.bfloat16:
            params = cast_matmul_weights(params, jnp.bfloat16)
        return clip_cfg, params

    def _set_forward(self, forward_fn, text_fn=None, image_fn=None, **kw):
        """Bind the trainer's forward (and, when the method's text features
        do not depend on the image — every prompt trainer except CoCoOp —
        the text/image split that lets evaluate() encode the class prompts
        ONCE per eval pass instead of once per batch; the reference
        re-encodes the full text tower every eval batch, mudpt.py:170-184).

        Contract: forward(tr, fz, aux, img) == image_fn(tr, fz, aux, img,
        text_fn(tr, fz, aux)) — pinned by tests/test_trainers.py."""
        # thread the mesh so the pallas towers can shard_map their rows
        # (batch on 'data', class rows on 'model') — without it a
        # multi-chip mesh all-gathers every pallas operand
        # (parallel/mesh.shard_rows)
        kw.setdefault("mesh_ctx", self.mesh)
        self.forward = functools.partial(forward_fn, **kw)
        if text_fn is not None:
            self.forward_text = functools.partial(text_fn, **kw)
            self.forward_image = functools.partial(image_fn, **kw)

    def place(self, frozen, aux_class_tree, aux_repl, trainable):
        """Device placement with the standard layout."""
        self.frozen = replicate(self.mesh, frozen)
        aux = dict(aux_repl or {})
        aux.update(
            shard_class_tree(self.mesh, aux_class_tree, pad_to=self.n_cls_padded)
        )
        self.aux = aux
        self.trainable = (
            replicate(self.mesh, trainable) if trainable is not None else None
        )

    # ------------------------------------------------------------------
    def _calibrate_static_quant(self):
        """TRAIN.QUANT 'int8_static': calibrate per-tensor activation
        scales on one training batch and attach them to the frozen tower
        params (ops/quant_block.py — the static kernels skip the dynamic
        per-row quant chain; docs/BENCHMARKS.md session 8).  Towers
        without scales (e.g. an RN visual trunk) serve under the dynamic
        int8 recipe — the documented fallback."""
        from mudpt_tpu.ops import quant_block as QB

        fwd_text = getattr(self, "forward_text", None)
        inference = getattr(self, "model_inference", None)
        if fwd_text is None and inference is None:
            raise ValueError(
                "TRAIN.QUANT 'int8_static'/'int8_ste_static' needs "
                "image-independent text features to calibrate on (this "
                "trainer re-encodes text per instance); use the dynamic "
                "tiers instead: TRAIN.QUANT 'int8' (eval) or 'int8_ste' "
                "(QAT — verified for CoCoOp, tests/test_quant_block.py)"
            )
        # the calibration fetch must not advance the loader's epoch state:
        # every pipeline's __iter__ mutates _epoch, and exact mid-epoch
        # resume (set_epoch + decode-and-drop fast-forward) assumes only
        # run_epoch ever iterated — snapshot/restore around the fetch
        loader = self.dm.train_loader
        prev_epoch = getattr(loader, "_epoch", None)
        batch = next(iter(loader))
        if prev_epoch is not None:
            loader._epoch = prev_epoch
        images = jnp.asarray(batch["image"], self.compute_dtype)
        frozen = dict(self.frozen)
        if inference is not None:  # ZeroshotCLIP*: text cached in aux
            vscales = QB.calibrate(
                inference, self.trainable, self.frozen, self.aux, images
            )
        else:
            tscales, txt = QB.calibrate(
                fwd_text, self.trainable, self.frozen, self.aux,
                with_output=True,
            )
            if isinstance(frozen.get("text"), dict) and "blocks" in frozen["text"]:
                frozen["text"] = dict(
                    frozen["text"],
                    blocks=QB.attach_scales(frozen["text"]["blocks"], tscales),
                )
            vscales = QB.calibrate(
                self.forward_image, self.trainable, self.frozen, self.aux,
                images, txt,
            )
        if isinstance(frozen.get("visual"), dict) and "blocks" in frozen["visual"]:
            frozen["visual"] = dict(
                frozen["visual"],
                blocks=QB.attach_scales(frozen["visual"]["blocks"], vscales),
            )
        self._set_frozen(frozen)
        self._static_calibrated = True

    def _set_frozen(self, frozen):
        """EVERY post-build mutation of the frozen tree goes through here:
        the static text cache is a pure function of ``frozen`` (plus the
        trainable-independent prompts), so it is refreshed in the same
        motion — a new recalibration/recast path cannot leave training
        against stale cached features (tests/test_aux.py pins this)."""
        self.frozen = replicate(self.mesh, frozen)
        if "static_text_features" in (getattr(self, "aux", None) or {}):
            self._cache_static_text()

    # ------------------------------------------------------------------
    def _cache_static_text(self):
        """When the trainer declares ``static_text`` (text features are
        independent of the trainable pytree — VPT; MPT never qualifies
        since it trains its layer-0 text ctx, reference mpt.py:77),
        encode the n_cls x 77 class-prompt tower
        ONCE and train/eval against the cached rows.  The reference
        re-runs the frozen text encoder every forward
        (/root/reference/trainers/vpt.py:96-101 — CustomCLIP.forward calls
        text_encoder per batch); at ImageNet scale that tower is a
        double-digit share of per-step FLOPs for a method whose gradients
        never touch it.  The cache lives in ``aux`` — not closed over in
        the jitted step (big constants inline into the remote-compile
        payload) — so every ``_train_step`` call site picks it up
        structurally, and callers that never populated it fall back to the
        per-step encode.  Recomputed after any post-build change to
        ``frozen`` (static int8 recalibration)."""
        if not getattr(self, "static_text", False):
            return
        fn = getattr(self, "_text_features", None)
        if fn is None or self.trainable is None:
            return
        aux = {k: v for k, v in self.aux.items() if k != "static_text_features"}
        self.aux["static_text_features"] = fn(self.trainable, self.frozen, aux)

    # ------------------------------------------------------------------
    def _build_train_state(self):
        steps_per_epoch = max(1, len(self.dm.train_loader))
        self.tx, self.lr_schedule = build_optimizer(self.cfg.OPTIM, steps_per_epoch)
        self.opt_state = self.tx.init(self.trainable)
        self.global_step = 0

    def _jit_steps(self):
        forward = self.forward
        n_cls = self.num_classes
        fwd_text = getattr(self, "forward_text", None)
        fwd_image = getattr(self, "forward_image", None)
        # static_text trainers (VPT configs — no text-side prompt
        # parameters) train against text features encoded ONCE at build —
        # the key is present in aux iff _cache_static_text ran, so direct
        # _train_step callers that never populated it (tests, bench
        # harnesses) transparently fall back to the per-step encode
        static_text = getattr(self, "static_text", False) and fwd_image is not None

        def loss_fn(trainable, frozen, aux, batch):
            if static_text and "static_text_features" in aux:
                logits = fwd_image(
                    trainable, frozen, aux, batch["image"],
                    aux["static_text_features"],
                )
            else:
                logits = forward(trainable, frozen, aux, batch["image"])
            logits = logits[:, :n_cls].astype(jnp.float32)
            labels = batch["label"]
            valid = batch["valid"].astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            denom = jnp.maximum(valid.sum(), 1.0)
            loss = (nll * valid).sum() / denom
            acc = ((jnp.argmax(logits, -1) == labels) * valid).sum() / denom
            return loss, acc

        tx = getattr(self, "tx", None)

        if tx is not None:

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def train_step(trainable, opt_state, frozen, aux, batch):
                (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    trainable, frozen, aux, batch
                )
                updates, opt_state = tx.update(grads, opt_state, trainable)
                trainable = optax.apply_updates(trainable, updates)
                return trainable, opt_state, loss, acc

            self._train_step = train_step

        inference = getattr(self, "model_inference", None) or forward

        # eval returns PREDICTIONS, (B,) int32 replicated: the argmax runs
        # on device so only B ints cross the host link (vs B×n_cls fp32
        # logits — the tunneled chip's scarcest resource), and in pod runs
        # each host reads its own block + metrics are all-reduced
        @functools.partial(jax.jit, out_shardings=self.mesh.replicated)
        def eval_step(trainable, frozen, aux, images):
            logits = inference(trainable, frozen, aux, images)
            return jnp.argmax(
                logits[:, :n_cls].astype(jnp.float32), axis=-1
            ).astype(jnp.int32)

        self._eval_step = eval_step

        # text-feature caching for eval: prompt-trainer text features are a
        # function of (trainable, aux) only, so evaluate() encodes the
        # n_cls x 77 tower once per pass instead of once per batch (at
        # ImageNet scale the text tower is ~60% of per-batch eval FLOPs).
        # model_inference (ZeroshotCLIP) already caches; CoCoOp's per-image
        # meta-net conditioning makes its text features image-dependent.
        if fwd_text is not None and getattr(self, "model_inference", None) is None:
            self._text_features = jax.jit(fwd_text)

            @functools.partial(jax.jit, out_shardings=self.mesh.replicated)
            def eval_step_cached(trainable, frozen, aux, images, txt):
                logits = fwd_image(trainable, frozen, aux, images, txt)
                return jnp.argmax(
                    logits[:, :n_cls].astype(jnp.float32), axis=-1
                ).astype(jnp.int32)

            self._eval_step_cached = eval_step_cached

    # ------------------------------------------------------------------
    # training loop
    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        max_epoch = cfg.OPTIM.MAX_EPOCH
        num_batches = len(self.dm.train_loader)
        start_epoch = self.resume_if_requested()
        print(f"Start training: {max_epoch} epochs x {num_batches} batches")
        restore_handler = (
            self._install_sigterm_handler()
            if cfg.TRAIN.CHECKPOINT_ON_SIGTERM and self.trainable is not None
            else None
        )
        try:
            for self.epoch in range(start_epoch, max_epoch):
                if self._preempt:
                    # signal landed at an epoch boundary (during after_epoch
                    # or on the previous epoch's last batch): record the
                    # boundary position so CHECKPOINT_FREQ=0 runs lose
                    # nothing (batches_done=0 → resume re-enters this epoch
                    # from its first batch)
                    self._save_preempt(0)
                    return self._stop_preempted()
                self.run_epoch()
                if self._preempt and self._preempt_saved:
                    # stopped strictly mid-epoch; skip final test, exit clean
                    return self._stop_preempted()
                # a signal on the epoch's LAST batch falls through: the
                # epoch completed, so run after_epoch (val + boundary
                # checkpoint supersede the mid-epoch state), then stop at
                # the loop top above
                self.after_epoch()
        finally:
            if restore_handler is not None:
                restore_handler()
        self.after_train()

    def _stop_preempted(self):
        print(
            "Training preempted — set RESUME "
            f"{self.cfg.OUTPUT_DIR} to continue exactly"
        )
        self.metrics.close()

    def _install_sigterm_handler(self):
        """SIGTERM (SLURM preemption, TPU maintenance, kubelet eviction) →
        finish the in-flight step, checkpoint, stop cleanly.  Returns a
        restore callable, or None off the main thread (library embeddings).
        Pods: every task receives the scheduler's signal, each host stops at
        its own step boundary, only the primary writes.  Signal-arrival skew
        is NOT coordinated across hosts — if a peer exits before the
        primary reaches its boundary, the primary's next collective never
        completes and the grace period ends in SIGKILL with no preemption
        file; RESUME then degrades to the last epoch checkpoint (safe, just
        coarser).  Bit-exact mid-epoch resume is guaranteed for
        single-process runs; on pods it is best-effort."""
        import signal

        def handler(signum, frame):
            self._preempt = True
            print(
                "SIGTERM received — checkpointing at the next step boundary",
                flush=True,
            )

        try:
            prev = signal.signal(signal.SIGTERM, handler)
        except ValueError:  # not the main thread
            return None
        return lambda: signal.signal(signal.SIGTERM, prev)

    def _save_preempt(self, batches_done: int):
        """Consistent mid-epoch checkpoint after SIGTERM: weights +
        optimizer state + the exact position (0-based epoch, batches_done,
        global_step).  resume_if_requested fast-forwards the deterministic
        loader by batches_done, making the resumed run bit-identical to an
        uninterrupted one (data order and augmentation draws are pure
        functions of (seed, epoch, position) in all three pipelines)."""
        if self.trainable is None:
            return
        self._preempt_saved = True  # every host takes the same train() branch
        if jax.process_index() != 0:
            return
        opt = getattr(self, "opt_state", None)
        path = save_checkpoint(
            self.cfg.OUTPUT_DIR,
            self.model_name,
            self.epoch,
            jax.device_get(self.trainable),
            opt_state=jax.device_get(opt) if opt is not None else None,
            meta={
                "trainer": self.cfg.TRAINER.NAME,
                "batches_done": int(batches_done),
                "global_step": int(self.global_step),
                "best_val": float(self._best_val),
            },
            tag="preempt",
        )
        print(
            f"Preemption checkpoint saved to {path} "
            f"(epoch {self.epoch + 1}, batch {batches_done})"
        )

    def resume_if_requested(self) -> int:
        """cfg.RESUME: reload the newest checkpoint under that directory and
        continue from its epoch.  Restores BOTH the prompt weights and the
        optimizer state (SGD momentum, schedule step) — together with the
        deterministic data order this makes a resumed run bit-identical to an
        uninterrupted one (reference: Dassl register_model(model, optim,
        sched) enrolls all three, trainers/mudpt.py:227).  ``load_model``
        stays weights-only for transfer/warm-start semantics."""
        if not self.cfg.RESUME or self.trainable is None:
            return 0
        num_batches = max(1, len(self.dm.train_loader))
        last = self._latest_epoch_on_primary(self.cfg.RESUME)
        pre = self._ckpt_meta_on_primary(self.cfg.RESUME, tag="preempt")
        if pre is not None and pre["global_step"] > last * num_batches:
            # the preemption checkpoint is further along than any
            # epoch-boundary one: continue from the exact batch position
            self.load_model(self.cfg.RESUME, tag="preempt")
            self._restore_opt_state(self.cfg.RESUME, tag="preempt")
            epoch_idx, done = pre["epoch"], pre["batches_done"]
            if done >= num_batches:  # signal landed on the epoch's last batch
                start = epoch_idx + 1
            else:
                start = epoch_idx
                self._skip_batches = done
            if hasattr(self.dm.train_loader, "set_epoch"):
                self.dm.train_loader.set_epoch(start)
            self.global_step = epoch_idx * num_batches + done
            self._best_val = pre.get("best_val", -1.0)
            print(
                f"Resumed from preemption checkpoint (epoch {epoch_idx + 1}, "
                f"batch {done}/{num_batches})"
            )
            return start
        if not last:
            print(
                "RESUME requested but no checkpoints under "
                f"{os.path.join(self.cfg.RESUME, self.model_name)}"
            )
            return 0
        self.load_model(self.cfg.RESUME, epoch=last)
        self._restore_opt_state(self.cfg.RESUME, epoch=last)
        if hasattr(self.dm.train_loader, "set_epoch"):
            # replay the exact data order an uninterrupted run would see
            self.dm.train_loader.set_epoch(last)
        self.global_step = last * num_batches
        meta = self._ckpt_meta_on_primary(self.cfg.RESUME, epoch=last)
        # without this, a resumed best_val run would re-crown a WORSE epoch
        # as model-best (fresh _best_val = -1 beats everything)
        self._best_val = meta.get("best_val", -1.0) if meta else -1.0
        print(f"Resumed from epoch {last}")
        return last

    def _ckpt_meta_on_primary(self, directory: str, epoch=None, tag=None):
        """Position/score metadata of a checkpoint as seen by the PRIMARY
        host, broadcast (same single-filesystem-owner contract as
        _latest_epoch_on_primary); None when absent.  Meta is read from the
        npz itself (atomic with the weights); a corrupt/torn file is
        CONTAINED — reported as absent with a warning — so a bad preemption
        artifact degrades resume to the last epoch checkpoint instead of
        bricking it (and pod peers never deadlock in the broadcast)."""
        from mudpt_tpu.parallel.multihost import broadcast_from_primary

        vals = np.zeros(5, np.float64)
        if jax.process_index() == 0:
            fname = (
                f"model-{tag}.pth.tar" if tag else f"model.pth.tar-{epoch}"
            )
            p = os.path.join(directory, self.model_name, fname)
            if os.path.exists(p):
                try:
                    data = np.load(p, allow_pickle=False)
                    meta = {
                        k[len("meta/"):]: data[k].item()
                        for k in data.files
                        if k.startswith("meta/") and data[k].ndim == 0
                        and data[k].dtype.kind in "ifu"
                    }
                    vals = np.asarray(
                        [1.0, float(meta.get("epoch", 0)),
                         float(meta.get("batches_done", 0)),
                         float(meta.get("global_step", 0)),
                         float(meta.get("best_val", -1.0))], np.float64,
                    )
                except Exception as e:  # noqa: BLE001 — see docstring
                    print(
                        f"WARNING: unreadable checkpoint meta at {p} "
                        f"({type(e).__name__}: {e}) — ignoring it"
                    )
        vals = np.asarray(broadcast_from_primary(vals))
        if not float(vals[0]):
            return None
        return {"epoch": int(vals[1]), "batches_done": int(vals[2]),
                "global_step": int(vals[3]), "best_val": float(vals[4])}

    def _restore_opt_state(self, directory: str, epoch: int = 0,
                           tag: Optional[str] = None):
        """Graft checkpointed optimizer leaves onto the live opt_state
        (pod-safe: primary reads, everyone receives the broadcast).  Falls
        back to the fresh state — loudly — if the checkpoint predates
        opt-state saving or the leaf structure changed."""
        from mudpt_tpu.parallel.multihost import broadcast_from_primary

        template = jax.device_get(self.opt_state)
        leaves, treedef = jax.tree_util.tree_flatten(template)
        ok = 0
        if jax.process_index() == 0:
            try:
                _, opt_leaves, _ = load_checkpoint(
                    directory, self.model_name, epoch, tag=tag
                )
            except Exception:  # noqa: BLE001 — weights load already vetted the file
                opt_leaves = None
            if (
                opt_leaves is not None
                and len(opt_leaves) == len(leaves)
                and all(
                    tuple(a.shape) == tuple(np.shape(b))
                    for a, b in zip(opt_leaves, leaves)
                )
            ):
                leaves = [
                    np.asarray(a, dtype=np.asarray(b).dtype)
                    for a, b in zip(opt_leaves, leaves)
                ]
                ok = 1
        leaves, ok = broadcast_from_primary((leaves, np.int32(ok)))
        if not int(ok):
            print(
                "WARNING: checkpoint has no matching optimizer state — "
                "resuming with a FRESH optimizer (momentum reset)"
            )
            return
        self.opt_state = replicate(
            self.mesh, jax.tree_util.tree_unflatten(treedef, leaves)
        )

    def _cast_images(self, batch):
        """Host-side image cast to the compute dtype for bf16 runs: the
        forward casts anyway (identical rounding), and halving the pixels
        halves host->device transfer — the scarcest resource on a tunneled
        chip.  Mirrors the reference's image.type(self.dtype)
        (mudpt.py:263-268)."""
        if self.compute_dtype != jnp.bfloat16:
            return batch
        import ml_dtypes

        batch = dict(batch)
        batch["image"] = np.asarray(batch["image"]).astype(ml_dtypes.bfloat16)
        return batch

    def _device_prefetch(self, loader):
        """Move the NEXT batch to device while the current step computes —
        dispatch is async, so device_put overlaps with device compute."""
        it = iter(loader)
        prev = None
        host_local = getattr(self.dm, "host_sharded", False)
        for batch in it:
            cur = shard_batch(
                self.mesh, self._cast_images(batch), host_local=host_local
            )
            if prev is not None:
                yield prev
            prev = cur
        if prev is not None:
            yield prev

    def run_epoch(self):
        cfg = self.cfg
        num_batches = len(self.dm.train_loader)
        t0 = time.time()
        timer = StepTimer()
        profiling = bool(cfg.TRAIN.PROFILE_DIR) and self.epoch == 0
        skip = self._skip_batches
        self._skip_batches = 0
        src = self.dm.train_loader
        if skip:
            # mid-epoch resume: decode-and-drop the batches the preempted
            # run already consumed — the loader is deterministic per
            # (seed, epoch), so the remainder replays exactly
            def _fast_forward(loader=src, k=skip):
                it = iter(loader)
                for _ in range(k):
                    next(it)
                yield from it

            src = _fast_forward()
        for offset, batch in enumerate(self._device_prefetch(src)):
            batch_idx = skip + offset
            trace = profile_trace(
                cfg.TRAIN.PROFILE_DIR if profiling and batch_idx == 1 else None
            )
            timer.start()
            with trace:
                self.trainable, self.opt_state, loss, acc = self._train_step(
                    self.trainable, self.opt_state, self.frozen, self.aux, batch
                )
            timer.stop()
            self.global_step += 1
            if (batch_idx + 1) % max(1, cfg.TRAIN.PRINT_FREQ) == 0 or (
                batch_idx + 1 == num_batches
            ):
                loss_v, acc_v = float(loss), float(acc)
                lr = float(self.lr_schedule(self.global_step - 1))
                elapsed = time.time() - t0
                bsz = cfg.DATALOADER.TRAIN_X.BATCH_SIZE
                print(
                    f"epoch [{self.epoch + 1}/{cfg.OPTIM.MAX_EPOCH}] "
                    f"batch [{batch_idx + 1}/{num_batches}] "
                    f"loss {loss_v:.4f} acc {100 * acc_v:.2f} lr {lr:.2e} "
                    f"step {timer.avg * 1e3:.0f}ms "
                    f"{timer.throughput(bsz):.1f}img/s ({elapsed:.1f}s)"
                )
                self.metrics.log(
                    {
                        "kind": "train",
                        "epoch": self.epoch + 1,
                        "step": self.global_step,
                        "loss": loss_v,
                        "acc": acc_v,
                        "lr": lr,
                        "step_time": timer.avg,
                        "imgs_per_sec": timer.throughput(bsz),
                    }
                )
            if self._preempt and batch_idx + 1 < num_batches:
                # strictly mid-epoch: record the exact position.  A signal
                # on the last batch instead lets the epoch complete so the
                # normal after_epoch val + boundary checkpoint still happen.
                self._save_preempt(batch_idx + 1)
                return

    def after_epoch(self):
        cfg = self.cfg
        is_last = self.epoch + 1 == cfg.OPTIM.MAX_EPOCH
        freq = cfg.TRAIN.CHECKPOINT_FREQ
        do_val = (
            cfg.TEST.FINAL_MODEL == "best_val" and self.dm.val_loader is not None
        )
        is_best = False
        if do_val:
            results = self.evaluate(self.dm.val_loader, split="val")
            score = results["accuracy"]
            if score > self._best_val:
                self._best_val, is_best = score, True
        if is_last or is_best or (freq > 0 and (self.epoch + 1) % freq == 0):
            self.save_model(is_best=is_best)

    def after_train(self):
        if not self.cfg.TEST.NO_TEST:
            has_best = self._exists_on_primary(
                os.path.join(
                    self.cfg.OUTPUT_DIR, self.model_name, "model-best.pth.tar"
                )
            )
            if (
                self.cfg.TEST.FINAL_MODEL == "best_val"
                and self.trainable is not None
                and has_best
            ):
                print("Testing with the best-on-val checkpoint")
                self.load_model(self.cfg.OUTPUT_DIR, epoch=None)
            self.test()
        self.metrics.close()

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def evaluate(self, loader, split: str = "test") -> Dict[str, float]:
        evaluator = build_evaluator(self.cfg, self.num_classes, self.classnames)
        # pod eval sharding (DATALOADER.HOST_SHARD): each host decodes and
        # scores only its block of every global batch; the confusion
        # matrices are summed across processes afterwards, so every host
        # prints identical metrics while eval work scales 1/n_hosts.
        # Keyed off the LOADER (DataManager tags the loaders it block-shards)
        # so a custom full-batch loader passed in is never mis-sliced.
        eval_sharded = getattr(loader, "host_sharded_eval", False)
        if loader is None:  # empty split (e.g. val-only dataset): report
            loader = ()     # zero-sample results instead of crashing
        # encode the class-prompt text tower ONCE per eval pass (prompts are
        # fixed during eval); trainers without the split fall back to the
        # full per-batch forward.  Lazy on the first batch so an empty split
        # never pays the n_cls x 77 encode.
        text_fn = getattr(self, "_text_features", None)
        # static_text trainers already hold the encoded tower in aux; it is
        # passed as the explicit txt argument, so strip it from the aux the
        # jitted eval sees — no duplicated device operand, and the eval jit
        # keeps one aux structure across static and per-pass-encoded
        # trainers (no structural retrace)
        txt = self.aux.get("static_text_features") if self.aux else None
        eval_aux = (
            {k: v for k, v in self.aux.items() if k != "static_text_features"}
            if txt is not None
            else self.aux
        )
        for batch in loader:
            if text_fn is not None and txt is None:
                txt = text_fn(self.trainable, self.frozen, self.aux)
            sb = shard_batch(
                self.mesh, self._cast_images(batch), host_local=eval_sharded
            )
            preds = np.asarray(
                self._eval_step(
                    self.trainable, self.frozen, self.aux, sb["image"]
                )
                if txt is None
                else self._eval_step_cached(
                    self.trainable, self.frozen, eval_aux, sb["image"], txt
                )
            )
            n_local = len(batch["label"])
            if eval_sharded:
                preds = preds[host_rows_slice(self.mesh, n_local)]
            else:
                preds = preds[:n_local]
            evaluator.process_preds(preds, batch["label"], batch["valid"])
        if eval_sharded:
            evaluator.all_reduce()
        results = evaluator.evaluate()
        print(
            f"=> result on {split}: "
            + " ".join(
                f"{k}: {v:.2f}" if isinstance(v, float) else f"{k}: {v}"
                for k, v in results.items()
                if not isinstance(v, dict)
            )
        )
        self.metrics.log({"kind": "eval", "split": split, "epoch": self.epoch + 1,
                          **{k: v for k, v in results.items() if not isinstance(v, dict)}})
        return results

    def test(self) -> Dict[str, float]:
        split = self.cfg.TEST.SPLIT
        loader = self.dm.val_loader if split == "val" else self.dm.test_loader
        return self.evaluate(loader, split=split)

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------
    def save_model(self, is_best: bool = False):
        if self.trainable is None:
            return
        if jax.process_index() != 0:
            return  # pod runs: the primary host owns the checkpoint files
        opt = getattr(self, "opt_state", None)
        path = save_checkpoint(
            self.cfg.OUTPUT_DIR,
            self.model_name,
            self.epoch + 1,
            jax.device_get(self.trainable),
            opt_state=jax.device_get(opt) if opt is not None else None,
            is_best=is_best,
            meta={
                "trainer": self.cfg.TRAINER.NAME,
                "best_val": float(self._best_val),
            },
        )
        print(f"Checkpoint saved to {path}")
        # an epoch-boundary checkpoint supersedes any preemption checkpoint
        # from the segment that led to it — drop it so a later RESUME never
        # rewinds to the stale mid-epoch state (npz first: resume keys on it)
        pre = os.path.join(
            self.cfg.OUTPUT_DIR, self.model_name, "model-preempt.pth.tar"
        )
        for p in (pre, pre + ".json"):
            if os.path.exists(p):
                os.remove(p)

    def _exists_on_primary(self, path: str) -> bool:
        """``os.path.exists`` as decided by the PRIMARY host, broadcast —
        the single filesystem-decision idiom (per-host disks may disagree;
        every host must take the same branch)."""
        from mudpt_tpu.parallel.multihost import broadcast_from_primary

        return bool(int(broadcast_from_primary(np.int32(os.path.exists(path)))))

    def _latest_epoch_on_primary(self, directory: str) -> int:
        """Highest saved epoch under <directory>/<model_name> as seen by the
        PRIMARY host (0 if none), broadcast to all hosts — the single owner
        of the model.pth.tar-<N> filename contract (used by resume and
        MODEL.INIT_WEIGHTS)."""
        import glob
        import re as _re

        eps = [0]
        for path in glob.glob(
            os.path.join(directory, self.model_name, "model.pth.tar-*")
        ):
            m = _re.search(r"model\.pth\.tar-(\d+)$", path)
            if m:
                eps.append(int(m.group(1)))
        from mudpt_tpu.parallel.multihost import broadcast_from_primary

        return int(broadcast_from_primary(np.int32(max(eps))))

    def _resolve_checkpoint_epoch(self, directory: str) -> Optional[int]:
        """None (= model-best.pth.tar) when a best checkpoint exists, else
        the highest saved epoch.  Primary's filesystem decides (pod-safe)."""
        sub = os.path.join(directory, self.model_name)
        if self._exists_on_primary(os.path.join(sub, "model-best.pth.tar")):
            return None
        latest = self._latest_epoch_on_primary(directory)
        if latest == 0:
            raise FileNotFoundError(
                f"No checkpoints under {sub!r} (neither model-best.pth.tar "
                "nor model.pth.tar-<epoch>) — check MODEL.INIT_WEIGHTS"
            )
        return latest

    def load_model(self, directory: Optional[str], epoch: Optional[int] = None,
                   tag: Optional[str] = None):
        """Load learned prompt weights; class-dependent buffers stay as the
        freshly-built ones (the reference deletes token_prefix/suffix from
        the state dict for the same effect, mudpt.py:293-298)."""
        if not directory:
            print("load_model() skipped: no pretrained model given")
            return
        # pod runs: the primary reads the files and broadcasts the merged
        # weights — per-host disks may disagree, and replicated global
        # arrays must be fed identical values on every host
        from mudpt_tpu.parallel.multihost import broadcast_from_primary

        host_tree = jax.device_get(self.trainable)
        ckpt_epoch = -1
        load_error = ""
        if jax.process_index() == 0:
            # a primary-side failure must be BROADCAST, not raised alone —
            # otherwise the other hosts deadlock inside the broadcast below
            try:
                loaded, _, meta = load_checkpoint(
                    directory, self.model_name, epoch, tag=tag
                )
                host_tree = restore_into(host_tree, loaded)
                # NOT `or -1`: a preemption checkpoint from epoch index 0
                # must log as epoch 0, not as the missing-meta sentinel
                e = meta.get("epoch")
                ckpt_epoch = int(e) if e is not None else -1
            except Exception as e:  # noqa: BLE001 — re-raised on every host
                load_error = f"{type(e).__name__}: {e}"
        err = np.frombuffer(
            load_error.encode()[:512].ljust(512, b"\0"), np.uint8
        ).copy()
        host_tree, ckpt_epoch, err = broadcast_from_primary(
            (host_tree, np.int32(ckpt_epoch), err)
        )
        err_msg = bytes(np.asarray(err)).rstrip(b"\0").decode(errors="replace")
        if err_msg:
            raise RuntimeError(
                f"checkpoint load failed on the primary host: {err_msg}"
            )
        print(
            f"Loading weights for {self.model_name} from {directory} "
            f"(epoch={int(ckpt_epoch)})"
        )
        self.trainable = replicate(self.mesh, host_tree)
        # static int8: activation ranges depend (mildly) on the prompts —
        # recalibrate against the loaded weights.  Build-time warm starts
        # run before the first calibration, so this only fires for
        # post-build loads (--eval_only, base->new transfer).
        from mudpt_tpu.models.layers import quant_mode

        if quant_mode() in ("int8_static", "int8_ste_static") and getattr(
            self, "_static_calibrated", False
        ):
            # recalibration mutates frozen via _set_frozen, which refreshes
            # the static text cache in the same motion
            self._calibrate_static_quant()

    # -- abstract -------------------------------------------------------
    # subclasses must set self.forward (a pure function) in build_model()
    forward: Callable = None
    model_inference: Optional[Callable] = None

    def build_model(self):  # pragma: no cover
        raise NotImplementedError


def build_trainer(cfg):
    import mudpt_tpu.trainers  # ensure registration side effects

    cls = TRAINER_REGISTRY.get(cfg.TRAINER.NAME)
    return cls(cfg)
