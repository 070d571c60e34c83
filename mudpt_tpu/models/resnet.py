"""ModifiedResNet vision tower for RN-family CLIP checkpoints.

Functional port of the behavior of the reference ``ModifiedResNet``
(clip/model.py:17-161): 3-conv anti-aliased stem with avgpool, Bottleneck
blocks whose stride is realized as an avgpool after conv2 (and prepended to
the 1x1 downsample conv), and a QKV attention pool instead of global average
pooling (``AttentionPool2d``, clip/model.py:65-100).

The backbone is always frozen in this framework, so BatchNorm runs in
inference mode from checkpoint statistics.  Layout is NHWC (TPU-native);
convs use ``lax.conv_general_dilated`` with HWIO kernels (the converter
transposes from torch's OIHW).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(x: jax.Array, w: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    """NHWC conv with HWIO kernel, symmetric padding."""
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Inference-mode BN from stored statistics (frozen backbone)."""
    scale = (p["scale"] * jax.lax.rsqrt(p["var"] + eps)).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * scale.astype(jnp.float32)).astype(x.dtype)
    return x * scale + bias


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def bottleneck(p: dict, x: jax.Array, stride: int) -> jax.Array:
    """Reference Bottleneck (clip/model.py:17-62): all convs stride 1; an
    avgpool realizes the stride after conv2; downsample = avgpool + 1x1."""
    out = jax.nn.relu(batch_norm(p["bn1"], conv2d(x, p["conv1"])))
    out = jax.nn.relu(batch_norm(p["bn2"], conv2d(out, p["conv2"], padding=1)))
    if stride > 1:
        out = avg_pool(out, stride)
    out = batch_norm(p["bn3"], conv2d(out, p["conv3"]))

    identity = x
    if "downsample" in p:
        identity = x if stride == 1 else avg_pool(x, stride)
        identity = batch_norm(
            p["downsample"]["bn"], conv2d(identity, p["downsample"]["conv"])
        )
    return jax.nn.relu(out + identity)


def attention_pool(p: dict, x: jax.Array, num_heads: int) -> jax.Array:
    """QKV attention pool (clip/model.py:65-100): query = mean token; full
    spatial map as keys/values; separate q/k/v projections."""
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, HW+1, C)
    tokens = tokens + p["pos_embedding"].astype(tokens.dtype)[None]

    def proj(name, t):
        return jnp.dot(t, p[name]["w"].astype(t.dtype)) + p[name]["b"].astype(t.dtype)

    q = proj("q", tokens[:, :1])      # only the mean token queries
    k = proj("k", tokens)
    v = proj("v", tokens)
    hd = C // num_heads
    q = q.reshape(B, 1, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, -1, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, C)
    return jnp.dot(out, p["c"]["w"].astype(out.dtype)) + p["c"]["b"].astype(out.dtype)


def resnet_forward(
    p: dict,
    images: jax.Array,
    *,
    layers: Sequence[int],
    heads: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """images (B, H, W, 3) -> features (B, output_dim)."""
    x = images.astype(compute_dtype)
    for i in (1, 2, 3):
        x = jax.nn.relu(
            batch_norm(
                p[f"bn{i}"],
                conv2d(x, p[f"conv{i}"], stride=2 if i == 1 else 1, padding=1),
            )
        )
    x = avg_pool(x, 2)
    for stage_idx, blocks in enumerate(layers, start=1):
        stage = p[f"layer{stage_idx}"]
        for block_idx in range(blocks):
            stride = 2 if (stage_idx > 1 and block_idx == 0) else 1
            x = bottleneck(stage[str(block_idx)], x, stride)
    return attention_pool(p["attnpool"], x, heads)


# ----------------------------------------------------------------------------
# torch state-dict conversion (keys under "visual.")
# ----------------------------------------------------------------------------

def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd, prefix) -> dict:
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def convert_resnet_visual(sd: dict) -> Tuple[dict, Sequence[int]]:
    """Convert the ``visual.*`` entries of an RN CLIP state dict; returns
    (params, per-stage block counts) using the reference's inference rules
    (clip/model.py:892-898)."""
    v = {k[len("visual."):]: np.asarray(t) for k, t in sd.items()
         if k.startswith("visual.")}
    layers = tuple(
        len({k.split(".")[1] for k in v if k.startswith(f"layer{i}.")})
        for i in (1, 2, 3, 4)
    )

    params: dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv(v[f"conv{i}.weight"])
        params[f"bn{i}"] = _bn(v, f"bn{i}")

    for stage_idx, blocks in enumerate(layers, start=1):
        stage = {}
        for b in range(blocks):
            pre = f"layer{stage_idx}.{b}"
            bp = {
                "conv1": _conv(v[f"{pre}.conv1.weight"]),
                "bn1": _bn(v, f"{pre}.bn1"),
                "conv2": _conv(v[f"{pre}.conv2.weight"]),
                "bn2": _bn(v, f"{pre}.bn2"),
                "conv3": _conv(v[f"{pre}.conv3.weight"]),
                "bn3": _bn(v, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in v:
                bp["downsample"] = {
                    "conv": _conv(v[f"{pre}.downsample.0.weight"]),
                    "bn": _bn(v, f"{pre}.downsample.1"),
                }
            stage[str(b)] = bp
        params[f"layer{stage_idx}"] = stage

    params["attnpool"] = {
        "pos_embedding": v["attnpool.positional_embedding"],
        "q": {"w": v["attnpool.q_proj.weight"].T, "b": v["attnpool.q_proj.bias"]},
        "k": {"w": v["attnpool.k_proj.weight"].T, "b": v["attnpool.k_proj.bias"]},
        "v": {"w": v["attnpool.v_proj.weight"].T, "b": v["attnpool.v_proj.bias"]},
        "c": {"w": v["attnpool.c_proj.weight"].T, "b": v["attnpool.c_proj.bias"]},
    }
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    return params, layers
