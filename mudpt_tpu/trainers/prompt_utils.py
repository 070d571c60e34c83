"""Shared prompt-learner machinery.

Covers what every reference prompt learner repeats (e.g.
trainers/coop.py:40-175, trainers/mudpt.py:41-130):

  * tokenize "<prefix> <classname>." per class, embed once through the
    frozen token embedding, and register the SOS prefix / class-suffix
    buffers (class-dependent, rebuilt per dataset, never checkpointed);
  * optional context init from a phrase ("a photo of a");
  * class-token-position composition (end/middle/front).  The reference
    builds middle/front prompts with a Python loop over classes
    (coop.py:118-160); here composition is ONE static gather: an index map
    into a [prefix | suffix | ctx] bank is precomputed per class at build
    time, so all three layouts are a single ``take_along_axis`` on device;
  * torch-compatible initializers for the small learned modules
    (projections, meta-nets, LightTransformer).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mudpt_tpu.models.layers import layer_norm, residual_block_trainable
from mudpt_tpu.tokenizer import tokenize, get_tokenizer


@dataclasses.dataclass
class ClassPromptAux:
    """Class-dependent static buffers (the token_prefix / token_suffix
    analogue, reference coop.py:92-95)."""

    tokenized: np.ndarray        # (n_cls, 77) int32
    eot_idx: np.ndarray          # (n_cls,) int32
    token_prefix: jax.Array      # (n_cls, 1, D)
    token_suffix: jax.Array      # (n_cls, 77-1-n_ctx, D)
    name_lens: List[int]
    n_ctx: int
    prompt_prefix: str

    def effective_length(self) -> int:
        """Static composed-sequence length after EOT truncation (the text
        tower is causal and only the EOT position is read out, so positions
        beyond max(eot)+1 are provably dead — models/text.py).  Returns the
        full context length when truncation is disabled."""
        from mudpt_tpu.models.text import effective_text_length

        full = 1 + self.n_ctx + self.token_suffix.shape[1]
        return effective_text_length(int(np.max(self.eot_idx)), full)

    def as_device_tree(self) -> dict:
        suffix = self.token_suffix
        keep = self.effective_length() - 1 - self.n_ctx
        if keep < suffix.shape[1]:
            suffix = suffix[:, :keep]
        return {
            "token_prefix": self.token_prefix,
            "token_suffix": suffix,
            "eot_idx": jnp.asarray(self.eot_idx),
        }


def embed_classnames(
    text_params: dict,
    classnames: Sequence[str],
    n_ctx: int,
    prompt_prefix: str,
) -> ClassPromptAux:
    """Tokenize + embed "<prefix> <name>." per class (coop.py:81-95).

    The embedding gather runs ON DEVICE (host->device traffic is just the
    (n_cls, 77) int token table; the 25M-row token embedding never crosses
    the interconnect — critical when the host link is slow)."""
    tok = get_tokenizer()
    names = [name.replace("_", " ") for name in classnames]
    name_lens = [len(tok.encode(name)) for name in names]
    prompts = [f"{prompt_prefix} {name}." for name in names]
    tokenized = tokenize(prompts)
    embedding = jnp.take(
        text_params["token_embedding"], jnp.asarray(tokenized), axis=0
    ).astype(jnp.float32)
    return ClassPromptAux(
        tokenized=tokenized,
        eot_idx=tokenized.argmax(axis=-1).astype(np.int32),
        token_prefix=embedding[:, :1],
        token_suffix=embedding[:, 1 + n_ctx :],
        name_lens=name_lens,
        n_ctx=n_ctx,
        prompt_prefix=prompt_prefix,
    )


def ctx_vectors_from_init(
    text_params: dict, ctx_init: str, n_ctx: int
) -> jnp.ndarray:
    """Initialize context vectors from a phrase's embeddings
    (reference mudpt.py:59-66): embedding positions 1..1+n_ctx."""
    ctx_init = ctx_init.replace("_", " ")
    tokens = tokenize(ctx_init)
    emb = jnp.take(
        text_params["token_embedding"], jnp.asarray(tokens[0]), axis=0
    )
    return emb[1 : 1 + n_ctx].astype(jnp.float32)


def random_ctx(key, shape, std: float = 0.02) -> jnp.ndarray:
    return jax.random.normal(key, shape) * std


# ----------------------------------------------------------------------------
# Class-token-position composition
# ----------------------------------------------------------------------------

def build_position_index_map(
    position: str,
    name_lens: Sequence[int],
    n_ctx: int,
    context_length: int = 77,
) -> Optional[np.ndarray]:
    """Index map into the per-class bank [prefix(1) | suffix(S) | ctx(n_ctx)]
    realizing the end/middle/front layouts (reference coop.py:106-166).
    Returns None for 'end' (pure concat fast path)."""
    if position == "end":
        return None
    n_cls = len(name_lens)
    S = context_length - 1 - n_ctx
    idx = np.zeros((n_cls, context_length), np.int32)
    for i, L in enumerate(name_lens):
        cols = [0]  # prefix
        suffix = list(range(1, 1 + S))        # bank positions of suffix tokens
        ctx = list(range(1 + S, 1 + S + n_ctx))  # bank positions of ctx tokens
        if position == "middle":
            half = n_ctx // 2
            cols += ctx[:half] + suffix[:L] + ctx[half:] + suffix[L:]
        elif position == "front":
            cols += suffix[:L] + ctx + suffix[L:]
        else:
            raise NotImplementedError(f"class_token_position={position!r}")
        idx[i] = np.asarray(cols, np.int32)
    return idx


def compose_prompts(
    ctx: jax.Array,
    prefix: jax.Array,
    suffix: jax.Array,
    index_map: Optional[jnp.ndarray] = None,
) -> jax.Array:
    """Assemble (n_cls, 77, D) prompt embeddings.

    ``ctx``: (n_ctx, D) shared, (n_cls, n_ctx, D) class-specific, or
    (B, n_cls, n_ctx, D) instance-conditioned (CoCoOp via vmap).
    """
    n_cls = prefix.shape[0]
    if ctx.ndim == 2:
        ctx = jnp.broadcast_to(ctx[None], (n_cls, *ctx.shape))
    ctx = ctx.astype(prefix.dtype)
    if index_map is None:  # 'end'
        return jnp.concatenate([prefix, ctx, suffix], axis=1)
    bank = jnp.concatenate([prefix, suffix, ctx], axis=1)
    return jnp.take_along_axis(bank, index_map[:, :, None], axis=1)


# ----------------------------------------------------------------------------
# Initializers for small learned modules (torch-default-compatible)
# ----------------------------------------------------------------------------

def init_linear(key, d_in: int, d_out: int) -> dict:
    """torch nn.Linear default: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound),
    }


def linear(p: dict, x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def init_light_transformer(key, d_model: int) -> dict:
    """One residual MHA+MLP block (reference trainers/umudpt.py:54-75),
    torch-style init: xavier-uniform fused QKV, default-Linear elsewhere."""
    k = jax.random.split(key, 4)
    limit = math.sqrt(6.0 / (d_model + 3 * d_model))
    out_lin = init_linear(k[1], d_model, d_model)
    fc = init_linear(k[2], d_model, 4 * d_model)
    proj = init_linear(k[3], 4 * d_model, d_model)
    return {
        "ln_1": {"scale": jnp.ones(d_model), "bias": jnp.zeros(d_model)},
        "attn": {
            "qkv_w": jax.random.uniform(
                k[0], (d_model, 3 * d_model), minval=-limit, maxval=limit
            ),
            "qkv_b": jnp.zeros(3 * d_model),
            "out_w": out_lin["w"],
            "out_b": jnp.zeros(d_model),
        },
        "ln_2": {"scale": jnp.ones(d_model), "bias": jnp.zeros(d_model)},
        "mlp": {
            "fc_w": fc["w"],
            "fc_b": fc["b"],
            "proj_w": proj["w"],
            "proj_b": proj["b"],
        },
    }


def light_transformer(p: dict, x: jax.Array, n_head: int) -> jax.Array:
    """x: (B, S, D) — for prompt synthesis B=depth rows, S=n_ctx tokens.

    Always the XLA autodiff block: these weights are TRAINED, and the
    Pallas fused blocks' custom VJP drops weight grads (frozen-only)."""
    return residual_block_trainable(p, x, n_head)


def init_prompt_transform_head(key, d_model: int, d_out: int) -> dict:
    """LN -> LightTransformer -> LN -> Linear head used for cross-modal
    prompt synthesis (reference umudpt.py:121-124, clip/model.py:620-623)."""
    k1, k2 = jax.random.split(key)
    return {
        "ln_pre": {"scale": jnp.ones(d_model), "bias": jnp.zeros(d_model)},
        "block": init_light_transformer(k1, d_model),
        "ln_post": {"scale": jnp.ones(d_model), "bias": jnp.zeros(d_model)},
        "proj": init_linear(k2, d_model, d_out),
    }


def prompt_transform_head(p: dict, x: jax.Array, n_head: int) -> jax.Array:
    """Apply the LN/LT/LN/Linear pipeline (reference umudpt.py:161-178)."""
    y = layer_norm(p["ln_pre"], x)
    y = light_transformer(p["block"], y, n_head)
    y = layer_norm(p["ln_post"], y)
    return linear(p["proj"], y)
