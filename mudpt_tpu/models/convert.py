"""PyTorch CLIP checkpoint -> JAX parameter pytree.

Shape-inference rules match the reference ``build_model``
(clip/model.py:881-911): vision width/layers/patch size from
``visual.conv1.weight`` and the block count, text dims from
``text_projection`` / ``positional_embedding`` / ``token_embedding`` /
``ln_final``.  Layout changes for the TPU-native tree:

  * torch Linear weights are (out, in); ours are (in, out) -> transpose;
  * the patch conv (width, 3, P, P) becomes a (P*P*3, width) matmul weight
    ordered (ph, pw, channel) to match ``vit.patchify``;
  * per-block tensors are stacked on a leading layer axis for ``lax.scan``.

Torch is imported lazily (only when actually loading a .pt file); converted
checkpoints can be cached as .npz so production runs never touch torch.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from mudpt_tpu.models.clip import CLIPConfig


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    return t.detach().cpu().float().numpy()


def infer_config(sd: Dict[str, np.ndarray]) -> CLIPConfig:
    if "visual.proj" not in sd:  # RN family (reference clip/model.py:892-898)
        counts = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")})
            for b in (1, 2, 3, 4)
        )
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        output_width = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5
        )
        return CLIPConfig(
            embed_dim=sd["text_projection"].shape[1],
            image_resolution=output_width * 32,
            vision_layers=sum(counts),
            vision_width=vision_width,
            vision_patch_size=0,
            context_length=sd["positional_embedding"].shape[0],
            vocab_size=sd["token_embedding.weight"].shape[0],
            transformer_width=sd["ln_final.weight"].shape[0],
            transformer_heads=sd["ln_final.weight"].shape[0] // 64,
            transformer_layers=len(
                {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
            ),
            vision_arch="resnet",
            vision_layers_per_stage=counts,
        )
    conv1 = sd["visual.conv1.weight"]
    vision_width = conv1.shape[0]
    vision_patch_size = conv1.shape[-1]
    vision_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
    )
    grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=vision_patch_size * grid,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len(
            {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
        ),
    )


def _stack_blocks(sd: Dict[str, np.ndarray], prefix: str, layers: int) -> dict:
    def get(i, name):
        return sd[f"{prefix}.{i}.{name}"]

    return {
        "ln_1": {
            "scale": np.stack([get(i, "ln_1.weight") for i in range(layers)]),
            "bias": np.stack([get(i, "ln_1.bias") for i in range(layers)]),
        },
        "attn": {
            "qkv_w": np.stack(
                [get(i, "attn.in_proj_weight").T for i in range(layers)]
            ),
            "qkv_b": np.stack([get(i, "attn.in_proj_bias") for i in range(layers)]),
            "out_w": np.stack(
                [get(i, "attn.out_proj.weight").T for i in range(layers)]
            ),
            "out_b": np.stack([get(i, "attn.out_proj.bias") for i in range(layers)]),
        },
        "ln_2": {
            "scale": np.stack([get(i, "ln_2.weight") for i in range(layers)]),
            "bias": np.stack([get(i, "ln_2.bias") for i in range(layers)]),
        },
        "mlp": {
            "fc_w": np.stack([get(i, "mlp.c_fc.weight").T for i in range(layers)]),
            "fc_b": np.stack([get(i, "mlp.c_fc.bias") for i in range(layers)]),
            "proj_w": np.stack([get(i, "mlp.c_proj.weight").T for i in range(layers)]),
            "proj_b": np.stack([get(i, "mlp.c_proj.bias") for i in range(layers)]),
        },
    }


def torch_state_dict_to_jax(state_dict) -> Tuple[CLIPConfig, dict]:
    sd = {k: _to_numpy(v) for k, v in state_dict.items()
          if k not in ("input_resolution", "context_length", "vocab_size")}
    cfg = infer_config(sd)

    if cfg.vision_arch == "resnet":
        from mudpt_tpu.models.resnet import convert_resnet_visual

        visual, _ = convert_resnet_visual(sd)
    else:
        conv1 = sd["visual.conv1.weight"]  # (width, 3, P, P)
        visual = {
            "patch_w": conv1.transpose(2, 3, 1, 0).reshape(-1, cfg.vision_width),
            "class_embedding": sd["visual.class_embedding"],
            "pos_embedding": sd["visual.positional_embedding"],
            "ln_pre": {
                "scale": sd["visual.ln_pre.weight"],
                "bias": sd["visual.ln_pre.bias"],
            },
            "blocks": _stack_blocks(
                sd, "visual.transformer.resblocks", cfg.vision_layers
            ),
            "ln_post": {
                "scale": sd["visual.ln_post.weight"],
                "bias": sd["visual.ln_post.bias"],
            },
            "proj": sd["visual.proj"],
        }

    params = {
        "visual": visual,
        "text": {
            "token_embedding": sd["token_embedding.weight"],
            "pos_embedding": sd["positional_embedding"],
            "blocks": _stack_blocks(sd, "transformer.resblocks", cfg.transformer_layers),
            "ln_final": {
                "scale": sd["ln_final.weight"],
                "bias": sd["ln_final.bias"],
            },
            "projection": sd["text_projection"],
        },
        "logit_scale": sd["logit_scale"].reshape(()),
    }
    import jax.numpy as jnp

    params = _tree_map_np(lambda a: jnp.asarray(a, jnp.float32), params)
    return cfg, params


def _tree_map_np(fn, tree):
    if isinstance(tree, dict):
        return {k: _tree_map_np(fn, v) for k, v in tree.items()}
    return fn(tree)


def load_clip_checkpoint(path: str) -> Tuple[CLIPConfig, dict]:
    """Load an OpenAI CLIP .pt file (TorchScript archive or plain state
    dict), mirroring the reference's try-jit-then-state-dict logic
    (trainers/mudpt.py:26-32)."""
    cache = path + ".mudpt_tpu.npz"
    if os.path.exists(cache):
        return load_npz_params(cache)

    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        state_dict = model.state_dict()
    except RuntimeError:
        state_dict = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(state_dict, "state_dict"):
            state_dict = state_dict.state_dict()
    cfg, params = torch_state_dict_to_jax(state_dict)
    try:
        save_npz_params(cache, cfg, params)
    except OSError:
        pass  # read-only checkpoint dir; conversion just stays un-cached
    return cfg, params


# --- flat npz (de)serialization of the converted tree -----------------------

def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_npz_params(path: str, cfg: CLIPConfig, params: dict) -> None:
    import dataclasses
    import json

    flat = _flatten(params)
    meta = {"__cfg__": np.frombuffer(
        json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8
    )}
    np.savez(path, **flat, **meta)


def load_npz_params(path: str) -> Tuple[CLIPConfig, dict]:
    import json

    import jax.numpy as jnp

    data = dict(np.load(path))
    cfg_kwargs = json.loads(bytes(data.pop("__cfg__")).decode())
    cfg_kwargs["vision_layers_per_stage"] = tuple(
        cfg_kwargs.get("vision_layers_per_stage", ())
    )
    flat = {k: v for k, v in data.items()}
    params = _tree_map_np(lambda a: jnp.asarray(a), _unflatten(flat))
    return CLIPConfig(**cfg_kwargs), params
