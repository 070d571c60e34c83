from mudpt_tpu.ops.fused_block import (
    attn_halfblock,
    mlp_halfblock,
    mlp_halfblock_chunked,
    set_save_acts,
)

__all__ = [
    "attn_halfblock",
    "mlp_halfblock",
    "mlp_halfblock_chunked",
    "set_save_acts",
]
