from mudpt_tpu.models.clip import (
    CLIPConfig,
    init_clip_params,
    encode_image,
    encode_text,
    clip_forward,
    cast_matmul_weights,
    VIT_B16,
    VIT_B32,
)
from mudpt_tpu.models.convert import torch_state_dict_to_jax, load_clip_checkpoint

__all__ = [
    "CLIPConfig",
    "init_clip_params",
    "encode_image",
    "encode_text",
    "clip_forward",
    "cast_matmul_weights",
    "VIT_B16",
    "VIT_B32",
    "torch_state_dict_to_jax",
    "load_clip_checkpoint",
]
