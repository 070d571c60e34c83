"""AOT serving artifacts: export a trained (or zero-shot) classifier as a
serialized StableHLO program + a params file, loadable WITHOUT any model
code.

The reference ships CLIP as TorchScript archives and loads them for
inference (reference clip/clip.py:95-140, ``torch.jit.load``); its trained
prompts, however, can only be served by reconstructing the full Python
model stack.  The TPU-native equivalent is ``jax.export``: the jitted
scoring function lowers to StableHLO once, the artifact pins the exact
compiled semantics (including the frozen backbone math), and any host with
JAX — CPU or TPU, no mudpt_tpu installed — can deserialize and serve it.

Artifact layout (a directory):

  program.jaxexport   serialized ``jax.export.Exported`` (StableHLO)
  params.npz          flattened operand leaves (bf16 stored as uint16 views)
  meta.json           classnames, preprocessing constants, leaf dtypes,
                      input spec, export platforms

Exported call signature: ``logits = f(*leaves, images)`` with ``images``
a float32 ``(B, H, W, 3)`` batch, normalized with the CLIP mean/std
recorded in ``meta.json`` (clip/clip.py:85).  The batch dimension is
symbolic by default (``jax.export.symbolic_shape``), so ONE artifact
serves any batch size; CoCoOp's chunked per-instance encode needs static
shapes, so its export pins a fixed batch.

Exports default to the PORTABLE XLA block implementation
(``set_block_impl('xla')``): Mosaic custom calls would make the artifact
TPU-only and reject symbolic batch dims.  ``block_impl='pallas'`` opts
into embedding the fused kernels for a TPU-only, pinned-batch artifact —
measured 2.3x the XLA forward on-chip (docs/BENCHMARKS.md session 4).
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
from typing import Optional, Sequence

ARTIFACT_VERSION = 1
_PROGRAM = "program.jaxexport"
_PARAMS = "params.npz"
_META = "meta.json"


@contextlib.contextmanager
def _block_impl(name: str):
    from mudpt_tpu.models import layers

    prev = layers._BLOCK_IMPL
    prev_hint = layers._PLATFORM_HINT
    prev_quant = layers.quant_mode()
    if name.startswith("pallas"):
        layers.set_block_impl("pallas")
        # the kernels lower in interpret mode unless the target platform is
        # TPU (ops/fused_block._interpret); a pallas artifact must embed the
        # real Mosaic custom calls even when exported from a CPU host
        layers.set_platform_hint("tpu")
        layers.set_quant_mode(
            {"pallas_int8": "int8", "pallas_int8_static": "int8_static"}
            .get(name, "none")
        )
    else:
        layers.set_block_impl(name)
        # an ambient quant mode (env opt-in or a TRAIN.QUANT trainer built
        # earlier in this process) would make the XLA trace raise — an
        # explicit block_impl='xla' fully specifies an unquantized artifact
        layers.set_quant_mode("none")
    try:
        yield
    finally:
        layers._BLOCK_IMPL = prev
        layers.set_platform_hint(prev_hint)
        layers.set_quant_mode(prev_quant)


def _unmeshed(fn):
    """Rebind a trainer-bound forward's ``mesh_ctx`` to None: serving
    artifacts are single-device programs (replicate them for fleet
    serving); a captured Mesh would not serialize."""
    if isinstance(fn, functools.partial) and "mesh_ctx" in fn.keywords:
        kw = dict(fn.keywords)
        kw["mesh_ctx"] = None
        return functools.partial(fn.func, *fn.args, **kw)
    return fn


def export_classifier(
    path: str,
    score_fn,
    operands,
    *,
    image_shape: Sequence[int],
    classnames: Optional[Sequence[str]] = None,
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    extra_meta: Optional[dict] = None,
    block_impl: str = "xla",
) -> None:
    """Export ``score_fn(operands, images) -> logits`` as a serving artifact.

    ``operands`` is any pytree of arrays (params, cached text features, …);
    ``image_shape`` is the per-image (H, W, C); ``batch=None`` exports a
    symbolic batch dimension, an int pins it.  ``platforms`` defaults to
    ``("cpu", "tpu")`` so the same artifact serves on either.

    ``block_impl='pallas'`` embeds the fused Mosaic kernels (the
    ``tpu_custom_call`` target carries jax.export's compatibility
    guarantee) — measured 2.3x the portable XLA forward on-chip
    (docs/BENCHMARKS.md session 4) — at the price of a TPU-only artifact
    and a pinned batch (Mosaic grids need static shapes).
    ``block_impl='pallas_int8'`` additionally quantizes every block's
    projection matmuls W8A8 (ops/quant_block.py — the MXU's int8 rate is
    2x bf16 on v5e); same TPU-only + pinned-batch constraints.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    if block_impl in ("pallas", "pallas_int8", "pallas_int8_static"):
        if platforms is None:
            platforms = ("tpu",)
        if list(platforms) != ["tpu"]:
            raise ValueError(
                f"block_impl={block_impl!r} artifacts are TPU-only; pass "
                "platforms=('tpu',) (the Mosaic kernels have no CPU lowering)"
            )
        if batch is None:
            raise ValueError(
                f"block_impl={block_impl!r} needs a pinned batch (Mosaic "
                "grids are static); pass batch=<serving batch size>"
            )
    elif block_impl != "xla":
        raise ValueError(
            "block_impl must be 'xla', 'pallas', 'pallas_int8', or "
            f"'pallas_int8_static', got {block_impl!r}"
        )
    platforms = list(platforms or ("cpu", "tpu"))
    leaves, treedef = jax.tree_util.tree_flatten(operands)

    def flat_fn(leaf_tuple, images):
        ops = jax.tree_util.tree_unflatten(treedef, list(leaf_tuple))
        return score_fn(ops, images)

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    img_spec = jax.ShapeDtypeStruct((b, *image_shape), jnp.float32)
    # read .dtype without np.asarray: that would device->host transfer
    # every leaf a second time (the savez loop below already pays one)
    leaf_specs = tuple(
        jax.ShapeDtypeStruct(
            np.shape(x), getattr(x, "dtype", None) or np.asarray(x).dtype
        )
        for x in leaves
    )

    with _block_impl(block_impl):
        exported = jexport.export(jax.jit(flat_fn), platforms=platforms)(
            leaf_specs, img_spec
        )

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _PROGRAM), "wb") as f:
        f.write(bytes(exported.serialize()))

    arrays, dtypes = {}, []
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        dtypes.append(str(arr.dtype))
        if arr.dtype.name == "bfloat16":  # npz has no bf16: store raw bits
            arr = arr.view(np.uint16)
        arrays[f"leaf_{i:05d}"] = arr
    np.savez(os.path.join(path, _PARAMS), **arrays)

    from mudpt_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "jax_version": jax.__version__,
        "platforms": platforms,
        "block_impl": block_impl,
        "image_shape": list(image_shape),
        "batch": batch,
        "n_leaves": len(leaves),
        "leaf_dtypes": dtypes,
        "classnames": list(classnames) if classnames is not None else None,
        "preprocess": {
            "resize_then_center_crop": image_shape[0],
            "mean": list(CLIP_MEAN),
            "std": list(CLIP_STD),
        },
        **(extra_meta or {}),
    }
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)


def export_trainer(path: str, trainer, *, batch: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None,
                   block_impl: str = "xla",
                   calib_images=None) -> None:
    """Export a built trainer's inference path.

    Text features are encoded ONCE at export time whenever the method's
    prompts are image-independent (every trainer except CoCoOp — the same
    split ``evaluate()`` uses), so the artifact's per-batch cost is the
    vision tower plus one matmul.  CoCoOp exports its full forward (its
    prompts are instance-conditional) and requires a pinned ``batch``.

    ``block_impl='pallas_int8_static'`` bakes CALIBRATED static activation
    scales into the artifact (ops/quant_block.py — reclaims the dynamic
    quant chain's VPU cost, docs/BENCHMARKS.md session 8): pass
    ``calib_images``, a float32 (N, H, W, 3) batch of representative
    PREPROCESSED images (same contract as ``predict``); activation maxima
    are collected over it at export time.
    """
    n_cls = trainer.num_classes
    # a static_text trainer (VPT/MPT) holds its train-time text-feature
    # cache in aux; the artifact carries its own text cache (ops["txt"],
    # encoded below under pinned-unquantized numerics) so the aux copy
    # would be dead weight device_put on every load
    aux = {
        k: v for k, v in trainer.aux.items() if k != "static_text_features"
    }
    ops = {
        "trainable": trainer.trainable,
        "frozen": trainer.frozen,
        "aux": aux,
    }

    def _drop_text_tower(frozen):
        # cached-text artifacts never run the text tower; shipping it
        # would store + device_put ~40% dead weight on every load
        if isinstance(frozen, dict) and "text" in frozen:
            return {k: v for k, v in frozen.items() if k != "text"}
        return frozen

    inference = getattr(trainer, "model_inference", None)
    text_fn = getattr(trainer, "forward_text", None)
    if inference is not None:  # ZeroshotCLIP*: text features already cached in aux
        fn = _unmeshed(inference)
        ops["frozen"] = _drop_text_tower(trainer.frozen)

        def score(o, images):
            return fn(o["trainable"], o["frozen"], o["aux"], images)[:, :n_cls]

    elif text_fn is not None:
        # the export-time text encode runs EAGERLY (outside the
        # _block_impl trace context): pin it to the unquantized path so an
        # ambient quant mode neither raises under the XLA impl nor bakes
        # quantized class features into the artifact
        from mudpt_tpu.models import layers as _layers

        prev_quant = _layers.quant_mode()
        _layers.set_quant_mode("none")
        try:
            ops["txt"] = text_fn(trainer.trainable, trainer.frozen, trainer.aux)
        finally:
            _layers.set_quant_mode(prev_quant)
        ops["frozen"] = _drop_text_tower(trainer.frozen)
        img_fn = _unmeshed(trainer.forward_image)

        def score(o, images):
            return img_fn(
                o["trainable"], o["frozen"], o["aux"], images, o["txt"]
            )[:, :n_cls]

    else:  # CoCoOp: instance-conditional prompts — full forward
        fwd = _unmeshed(trainer.forward)
        if batch is None:
            raise ValueError(
                "this trainer's forward needs static shapes (per-instance "
                "text encode); pass batch=<serving batch size>"
            )

        def score(o, images):
            return fwd(o["trainable"], o["frozen"], o["aux"], images)[:, :n_cls]

    def cast_score(o, images):
        import jax.numpy as jnp

        return score(o, images.astype(trainer.compute_dtype)).astype(jnp.float32)

    def _has_scales(frozen):
        vis = frozen.get("visual") if isinstance(frozen, dict) else None
        return isinstance(vis, dict) and "q8_scales" in vis.get("blocks", {})

    def _strip_scales(tree):
        if isinstance(tree, dict):
            return {
                k: _strip_scales(v) for k, v in tree.items()
                if k != "q8_scales"
            }
        return tree

    from mudpt_tpu.config.perf import perf_snapshot

    # the resolved perf/numerics policy the trainer ran under: together
    # with the config dump this reproduces the artifact's numerics
    extra_meta = {
        "trainer": trainer.cfg.TRAINER.NAME,
        "perf": {k: str(v) for k, v in perf_snapshot().items()},
    }
    if block_impl == "pallas_int8_static":
        if inference is None and text_fn is None:
            raise ValueError(
                "pallas_int8_static needs image-independent prompts to "
                "calibrate the vision tower (this trainer re-encodes text "
                "per instance); use block_impl='pallas_int8' (dynamic "
                "activation scales)"
            )
        if calib_images is None and _has_scales(ops["frozen"]):
            # TRAIN.QUANT 'int8_static'/'int8_ste_static' calibrated the
            # trainer's frozen towers already — reuse those scales, so the
            # artifact serves EXACTLY the numerics the prompts trained
            # against (the deploy-aware-training contract)
            extra_meta["calibration"] = {"reused_trainer_scales": True}
        elif calib_images is None:
            raise ValueError(
                "pallas_int8_static requires calib_images: a float32 "
                "(N, H, W, 3) batch of representative preprocessed images "
                "to calibrate the static activation scales on (or build "
                "the trainer with TRAIN.QUANT int8_static/int8_ste_static "
                "to reuse its calibration)"
            )
        else:
            import jax.numpy as jnp

            from mudpt_tpu.ops import quant_block as QB

            scales = QB.calibrate(
                cast_score, ops, jnp.asarray(calib_images, jnp.float32)
            )
            vis = dict(ops["frozen"]["visual"])
            vis["blocks"] = QB.attach_scales(vis["blocks"], scales)
            ops["frozen"] = dict(ops["frozen"], visual=vis)
            extra_meta["calibration"] = {"n_images": int(len(calib_images))}
    else:
        if calib_images is not None:
            raise ValueError("calib_images is only used by pallas_int8_static")
        # a trainer built under a static quant mode carries q8_scales
        # leaves; non-static artifacts must not ship (or trace over) them
        ops["frozen"] = _strip_scales(ops["frozen"])

    res = trainer.clip_cfg.image_resolution
    kwargs = dict(
        image_shape=(res, res, 3),
        classnames=list(trainer.classnames),
        batch=batch,
        platforms=platforms,
        extra_meta=extra_meta,
        block_impl=block_impl,
    )
    try:
        export_classifier(path, cast_score, ops, **kwargs)
    except KeyError:
        # a trainer whose image path DOES read the text tower (none today):
        # restore ONLY the text tower — re-exporting with the raw
        # trainer.frozen would discard freshly calibrated scales (static
        # path) or re-ship the q8_scales leaves _strip_scales removed
        frozen = ops.get("frozen")
        if (
            not isinstance(frozen, dict)
            or "text" in frozen
            or "text" not in trainer.frozen
        ):
            raise  # the text tower is not what was missing
        text = trainer.frozen["text"]
        if block_impl != "pallas_int8_static":
            text = _strip_scales(text)
        ops["frozen"] = dict(frozen, text=text)
        export_classifier(path, cast_score, ops, **kwargs)


def export_zero_shot(
    path: str,
    clip_cfg,
    params,
    classnames: Sequence[str],
    templates: Sequence[str] = ("a photo of a {}.",),
    *,
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    compute_dtype=None,
    block_impl: str = "xla",
    calib_images=None,
) -> None:
    """Export a template-ensembled zero-shot classifier (api.zero_shot_classifier
    semantics: text tower encoded once at export, reference zsclip.py:105-115).

    ``compute_dtype`` sets the exported vision tower's matmul dtype:
    float32 (the default) maximizes portability; pass ``jnp.bfloat16`` for
    TPU serving (the backbone's production precision — drift bounds in
    tests/test_precision_drift.py and test_fullscale_parity.py)."""
    import jax.numpy as jnp
    import numpy as np

    from mudpt_tpu.trainers.zsclip import _encode_templates, _zs_inference

    compute_dtype = compute_dtype or jnp.float32
    # same guard as export_trainer's text encode: the eager template encode
    # must run unquantized whatever process-global quant mode a prior
    # trainer build left behind (XLA impl would raise; pallas would bake
    # quantized class features into the artifact)
    from mudpt_tpu.models import layers as _layers

    prev_quant = _layers.quant_mode()
    _layers.set_quant_mode("none")
    try:
        txt = np.asarray(
            _encode_templates(
                params, clip_cfg, list(classnames), list(templates), jnp.float32
            )
        )
    finally:
        _layers.set_quant_mode(prev_quant)

    def score(o, images):
        return _zs_inference(
            None, o["params"], {"text_features": o["txt"]}, images,
            clip_cfg=clip_cfg, compute_dtype=compute_dtype,
        ).astype(jnp.float32)

    if block_impl == "pallas_int8_static":
        if calib_images is None:
            raise ValueError(
                "pallas_int8_static requires calib_images (float32 "
                "(N, H, W, 3) preprocessed batch) to calibrate on"
            )
        from mudpt_tpu.ops import quant_block as QB

        ops0 = {"params": params, "txt": txt}
        scales = QB.calibrate(
            score, ops0, jnp.asarray(calib_images, jnp.float32)
        )
        vis = dict(params["visual"])
        vis["blocks"] = QB.attach_scales(vis["blocks"], scales)
        params = dict(params, visual=vis)
    elif calib_images is not None:
        raise ValueError("calib_images is only used by pallas_int8_static")

    export_classifier(
        path,
        score,
        {"params": params, "txt": txt},
        image_shape=(clip_cfg.image_resolution,) * 2 + (3,),
        classnames=classnames,
        batch=batch,
        platforms=platforms,
        extra_meta={"trainer": "zero-shot"},
        block_impl=block_impl,
    )


class ServingClassifier:
    """Load and serve an exported artifact.  Needs ONLY jax + numpy — no
    mudpt_tpu model code, no torch, no checkpoint converters."""

    def __init__(self, exported, leaves, meta):
        import jax

        self._exported = exported
        # params live on device from load: passing host numpy leaves into
        # the jitted call would re-transfer every leaf on EVERY predict
        # (~170 MB for a bf16 ViT-B/16)
        self._leaves = tuple(jax.device_put(x) for x in leaves)
        self.meta = meta
        self.classnames = meta.get("classnames")
        self._call = jax.jit(lambda ls, img: exported.call(ls, img))

    @classmethod
    def load(cls, path: str) -> "ServingClassifier":
        import ml_dtypes
        import numpy as np
        from jax import export as jexport

        with open(os.path.join(path, _META)) as f:
            meta = json.load(f)
        if meta["artifact_version"] > ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {meta['artifact_version']} is newer than "
                f"this loader ({ARTIFACT_VERSION})"
            )
        with open(os.path.join(path, _PROGRAM), "rb") as f:
            exported = jexport.deserialize(bytearray(f.read()))
        leaves = []
        with np.load(os.path.join(path, _PARAMS)) as npz:
            for i, dt in enumerate(meta["leaf_dtypes"]):
                arr = npz[f"leaf_{i:05d}"]
                if dt == "bfloat16":
                    arr = arr.view(ml_dtypes.bfloat16)
                leaves.append(arr)
        return cls(exported, tuple(leaves), meta)

    def predict(self, images) -> "np.ndarray":
        """images: float32 (B, H, W, 3), normalized per meta['preprocess'].
        Returns float32 logits (B, n_classes)."""
        import numpy as np

        batch = self.meta.get("batch")
        if batch is not None and len(images) != batch:
            raise ValueError(
                f"artifact was pinned to batch {batch}; got {len(images)}"
            )
        return np.asarray(self._call(self._leaves, images))


def load(path: str) -> ServingClassifier:
    return ServingClassifier.load(path)
