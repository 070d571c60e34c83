from mudpt_tpu.ops.flash_attention import fused_attention

__all__ = ["fused_attention"]
