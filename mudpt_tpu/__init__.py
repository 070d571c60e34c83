"""mudpt_tpu — a TPU-native prompt-tuning framework for frozen CLIP.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the MuDPT
reference framework (multi-modal deep prompt tuning for vision-language
models): frozen CLIP towers, a zoo of prompt-tuning trainers (CoOp, CoCoOp,
VPT, MPT, MuDPT, UMuDPT, UUMuDPT, zero-shot), 15 dataset loaders with
few-shot / base-new protocols, a typed config cascade, and a data-parallel +
class-parallel sharded training engine.

Design principles (TPU-first, not a port):
  * The CLIP towers are pure functions over parameter pytrees; the 12
    transformer blocks run as a single ``lax.scan`` over stacked per-layer
    weights with static-shape prompt splicing, instead of Python block lists.
  * Trainable prompt parameters live in their own pytree, separate from the
    frozen backbone, so gradients/optimizer state touch only prompts.
  * Parallelism is expressed with ``jax.sharding`` over a Mesh('data',
    'model'): batch sharded on `data`, the per-class text tower sharded on
    `model`; XLA inserts the ICI collectives.
  * Hot ops (full-sequence attention for seq<=256, the cosine-logit head)
    have Pallas TPU kernels with jnp fallbacks for CPU testing.
"""

__version__ = "0.1.0"
