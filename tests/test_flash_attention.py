"""Pallas fused attention vs the reference jnp implementation (interpret
mode on CPU): forward + gradients, causal and full, padded lengths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mudpt_tpu.ops.flash_attention import fused_attention


def ref_attention(q, k, v, causal):
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * d ** -0.5
    if causal:
        S = q.shape[2]
        mask = jnp.triu(jnp.full((S, S), -jnp.inf), k=1)
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [77, 128, 199])
def test_forward_matches(causal, seq):
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(2, 3, seq, 64), jnp.float32) for _ in range(3))
    out = fused_attention(q, k, v, causal)
    ref = ref_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match(causal):
    rng = np.random.RandomState(1)
    seq = 77
    q, k, v = (jnp.asarray(rng.randn(1, 2, seq, 64), jnp.float32) for _ in range(3))

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, causal) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attention(q, k, v, causal) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4)
