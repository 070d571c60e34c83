from mudpt_tpu.tokenizer.bpe import ClipBPE, get_tokenizer
from mudpt_tpu.tokenizer.tokenize import tokenize, SOT_TOKEN, EOT_TOKEN, CONTEXT_LENGTH

__all__ = [
    "ClipBPE",
    "get_tokenizer",
    "tokenize",
    "SOT_TOKEN",
    "EOT_TOKEN",
    "CONTEXT_LENGTH",
]
