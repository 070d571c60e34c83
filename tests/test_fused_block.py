"""Fused half-block kernels (interpret mode on CPU): forward parity with
the jnp reference block and dx parity with jax.grad — causal and full —
plus the full-tower pallas-block path against the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mudpt_tpu.models import layers as L
from mudpt_tpu.models.layers import attention, layer_norm, mlp
from mudpt_tpu.ops import fused_block as FB
from mudpt_tpu.ops.fused_block import attn_halfblock, mlp_halfblock


@pytest.fixture(params=[True, False], ids=["save_acts", "recompute"])
def save_acts(request):
    """Run kernel tests under both backward strategies."""
    prev = FB.save_acts_enabled()
    FB.set_save_acts(request.param)
    yield request.param
    FB.set_save_acts(prev)


def _params(rng, D):
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
    return {
        "ln_1": {"scale": jnp.asarray(rng.rand(D) + 0.5, jnp.float32),
                 "bias": mk(D)},
        "attn": {"qkv_w": mk(D, 3 * D), "qkv_b": mk(3 * D),
                 "out_w": mk(D, D), "out_b": mk(D)},
        "ln_2": {"scale": jnp.asarray(rng.rand(D) + 0.5, jnp.float32),
                 "bias": mk(D)},
        "mlp": {"fc_w": mk(D, 4 * D), "fc_b": mk(4 * D),
                "proj_w": mk(4 * D, D), "proj_b": mk(D)},
    }


@pytest.mark.parametrize("causal", [False, True])
def test_attn_halfblock_fwd_and_dx(causal, save_acts):
    rng = np.random.RandomState(0)
    D, S, H = 64, 40, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(3, S, D), jnp.float32)

    def ref(x):
        from mudpt_tpu.models.text import causal_mask

        mask = causal_mask(S) if causal else None
        return x + attention(p["attn"], layer_norm(p["ln_1"], x), H, mask)

    def fused(x):
        return attn_halfblock(
            x, p["ln_1"]["scale"], p["ln_1"]["bias"],
            p["attn"]["qkv_w"], p["attn"]["qkv_b"],
            p["attn"]["out_w"], p["attn"]["out_b"], H, causal,
        )

    np.testing.assert_allclose(
        np.asarray(fused(x)), np.asarray(ref(x)), rtol=2e-5, atol=2e-5
    )
    g_ref = jax.grad(lambda x: jnp.sum(ref(x) ** 2))(x)
    g_fused = jax.grad(lambda x: jnp.sum(fused(x) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=5e-4, atol=5e-4
    )


def test_mlp_halfblock_fwd_and_dx(save_acts):
    rng = np.random.RandomState(1)
    D, S = 64, 40
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(3, S, D), jnp.float32)

    def ref(x):
        return x + mlp(p["mlp"], layer_norm(p["ln_2"], x))

    def fused(x):
        return mlp_halfblock(
            x, p["ln_2"]["scale"], p["ln_2"]["bias"],
            p["mlp"]["fc_w"], p["mlp"]["fc_b"],
            p["mlp"]["proj_w"], p["mlp"]["proj_b"],
        )

    np.testing.assert_allclose(
        np.asarray(fused(x)), np.asarray(ref(x)), rtol=2e-5, atol=2e-5
    )
    g_ref = jax.grad(lambda x: jnp.sum(ref(x) ** 2))(x)
    g_fused = jax.grad(lambda x: jnp.sum(fused(x) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=5e-4, atol=5e-4
    )


def test_full_tower_pallas_block_matches_xla(save_acts):
    """transformer_forward with the pallas block impl == XLA impl, and the
    prompt gradient (the only trainable input) matches."""
    from mudpt_tpu.models.transformer import make_injection_schedule, transformer_forward

    rng = np.random.RandomState(2)
    D, S, H, Lyr = 64, 24, 2, 3
    stacked = jax.tree_util.tree_map(
        lambda *_: None, {}
    )
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
    stacked = {
        "ln_1": {"scale": jnp.ones((Lyr, D)), "bias": mk(Lyr, D)},
        "attn": {"qkv_w": mk(Lyr, D, 3 * D), "qkv_b": mk(Lyr, 3 * D),
                 "out_w": mk(Lyr, D, D), "out_b": mk(Lyr, D)},
        "ln_2": {"scale": jnp.ones((Lyr, D)), "bias": mk(Lyr, D)},
        "mlp": {"fc_w": mk(Lyr, D, 4 * D), "fc_b": mk(Lyr, 4 * D),
                "proj_w": mk(Lyr, 4 * D, D), "proj_b": mk(Lyr, D)},
    }
    x = jnp.asarray(rng.randn(2, S, D), jnp.float32)
    deep = jnp.asarray(rng.randn(2, 3, D) * 0.1, jnp.float32)

    def run(deep):
        prompts, pmask = make_injection_schedule(Lyr, deep)
        out = transformer_forward(
            stacked, x, n_head=H, prompts=prompts, prompt_mask=pmask,
            n_ctx=3, is_text=False,
        )
        return jnp.sum(out ** 2)

    try:
        L.set_block_impl("xla")
        val_x, grad_x = jax.value_and_grad(run)(deep)
        L.set_block_impl("pallas")
        val_p, grad_p = jax.value_and_grad(run)(deep)
    finally:
        L.set_block_impl("xla")
    np.testing.assert_allclose(float(val_p), float(val_x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grad_p), np.asarray(grad_x), rtol=5e-4, atol=5e-4
    )


def test_chunked_mlp_halfblock_matches():
    """Chunked-weight MLP kernel (wide-model path) == reference, fwd + dx."""
    from mudpt_tpu.ops.fused_block import mlp_halfblock_chunked

    rng = np.random.RandomState(3)
    # D=768 -> Dh=3072 -> chunk 1536, K=2: exercises the MULTI-chunk
    # streaming path (k>0 accumulation, pl.when gating, 2-D bias row select)
    # that the ViT-L configuration (K=8) relies on
    D, S = 768, 8
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(2, S, D), jnp.float32)

    def ref(x):
        return x + mlp(p["mlp"], layer_norm(p["ln_2"], x))

    def fused(x):
        return mlp_halfblock_chunked(
            x, p["ln_2"]["scale"], p["ln_2"]["bias"],
            p["mlp"]["fc_w"], p["mlp"]["fc_b"],
            p["mlp"]["proj_w"], p["mlp"]["proj_b"],
        )

    np.testing.assert_allclose(
        np.asarray(fused(x)), np.asarray(ref(x)), rtol=2e-5, atol=2e-5
    )
    g_ref = jax.grad(lambda x: jnp.sum(ref(x) ** 2))(x)
    g_fus = jax.grad(lambda x: jnp.sum(fused(x) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g_fus), np.asarray(g_ref), rtol=5e-4, atol=5e-4
    )


@pytest.mark.parametrize("causal", [False, True])
def test_layer_fullblock_fwd_and_dx(causal):
    """Full-layer fused kernel == attention half + MLP half composed,
    forward and dx."""
    from mudpt_tpu.ops.fused_block import layer_fullblock

    rng = np.random.RandomState(4)
    D, S, H = 64, 40, 2
    p = _params(rng, D)
    x = jnp.asarray(rng.randn(3, S, D), jnp.float32)

    def ref(x):
        from mudpt_tpu.models.text import causal_mask

        mask = causal_mask(S) if causal else None
        x = x + attention(p["attn"], layer_norm(p["ln_1"], x), H, mask)
        return x + mlp(p["mlp"], layer_norm(p["ln_2"], x))

    def fused(x):
        return layer_fullblock(
            x,
            p["ln_1"]["scale"], p["ln_1"]["bias"],
            p["attn"]["qkv_w"], p["attn"]["qkv_b"],
            p["attn"]["out_w"], p["attn"]["out_b"],
            p["ln_2"]["scale"], p["ln_2"]["bias"],
            p["mlp"]["fc_w"], p["mlp"]["fc_b"],
            p["mlp"]["proj_w"], p["mlp"]["proj_b"],
            H, causal,
        )

    np.testing.assert_allclose(
        np.asarray(fused(x)), np.asarray(ref(x)), rtol=2e-5, atol=2e-5
    )
    g_ref = jax.grad(lambda x: jnp.sum(ref(x) ** 2))(x)
    g_fused = jax.grad(lambda x: jnp.sum(fused(x) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=5e-4, atol=5e-4
    )
