import time, functools
import jax, jax.numpy as jnp, numpy as np
import optax
from mudpt_tpu.models.clip import VIT_B16, cast_matmul_weights, init_clip_params
from mudpt_tpu.models import layers as L
from mudpt_tpu.trainers.mudpt import mudpt_forward
from mudpt_tpu.trainers.prompt_utils import embed_classnames, init_linear, random_ctx
from mudpt_tpu.utils.rng import new_rng

cfg = VIT_B16
params = cast_matmul_weights(init_clip_params(new_rng(0), cfg), jnp.bfloat16)
aux = embed_classnames(params["text"], [f"object number {i}" for i in range(100)], 2, "a photo of a").as_device_tree()
ks = jax.random.split(new_rng(1), 8)
dim, vdim = 512, 768
trainable0 = {
    "ctx": random_ctx(ks[0], (2, dim)),
    "deep_prompts": random_ctx(ks[1], (8, 2, dim)),
    "embed_projection": init_linear(ks[2], dim, vdim),
    "deep_projections": init_linear(ks[3], dim, vdim),
    "visual_ctx": random_ctx(ks[4], (2, vdim)),
    "visual_ctx_deep_prompts": random_ctx(ks[5], (8, 2, vdim)),
    "visual_ctx_deep_projections": init_linear(ks[6], vdim, dim),
}
tx = optax.sgd(2.5e-3, momentum=0.9)
forward = functools.partial(mudpt_forward, clip_cfg=cfg, compute_dtype=jnp.bfloat16)

def loss_fn(tr, frozen, aux, images, labels):
    lg = forward(tr, frozen, aux, images).astype(jnp.float32)
    lp = jax.nn.log_softmax(lg, -1)
    return -jnp.take_along_axis(lp, labels[:,None], 1).mean()

def run(B, attn_impl):
    L.set_attention_impl(attn_impl)
    @functools.partial(jax.jit, donate_argnums=(0,1))
    def step(tr, st, frozen, aux, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(tr, frozen, aux, images, labels)
        upd, st = tx.update(grads, st, tr)
        return optax.apply_updates(tr, upd), st, loss
    imgs = jnp.asarray(np.random.randn(B,224,224,3), jnp.float32)
    labels = jnp.asarray(np.random.randint(0,100,B), jnp.int32)
    tr = jax.tree_util.tree_map(jnp.copy, trainable0)
    st = tx.init(tr)
    try:
        for _ in range(2):
            tr, st, loss = step(tr, st, params, aux, imgs, labels)
        float(loss)
        N=10
        t0=time.perf_counter()
        for _ in range(N):
            tr, st, loss = step(tr, st, params, aux, imgs, labels)
        float(loss)
        dt=time.perf_counter()-t0
        print(f"B={B} attn={attn_impl}: {B*N/dt:.1f} img/s ({dt/N*1e3:.1f} ms/step)", flush=True)
    except Exception as e:
        print(f"B={B} attn={attn_impl}: FAILED {type(e).__name__} {str(e)[:150]}", flush=True)

import sys
for spec in sys.argv[1:]:
    B, impl = spec.split(":")
    run(int(B), impl)
