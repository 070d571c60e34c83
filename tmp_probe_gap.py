"""Probe: trainer production step vs synth step — forward-only and full."""
import time
import jax, jax.numpy as jnp, numpy as np

def timeit(fn, n=8):
    fn()  # compile/warm
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3

# --- synth harness ---
from mudpt_tpu.utils.synth_step import build_synth_mudpt_step
S = build_synth_mudpt_step("ViT-B/16", 384, 100, 2, 9)
st = {"tr": S.trainable, "opt": S.opt_state}
def synth_train():
    st["tr"], st["opt"], loss = S.train_step(st["tr"], st["opt"], S.params, S.aux, S.images, S.labels)
    float(loss)
def synth_fwd():
    preds = S.eval_step_full(st["tr"], S.params, S.aux, S.images)
    int(preds[0])
print("synth train ms:", round(timeit(synth_train), 1), flush=True)
print("synth fwd   ms:", round(timeit(synth_fwd), 1), flush=True)

# --- trainer harness ---
from mudpt_tpu.config import default_config
from mudpt_tpu.parallel.mesh import shard_batch
from mudpt_tpu.trainers import build_trainer
cfg = default_config()
cfg.TRAINER.NAME = "MuDPT"
cfg.MODEL.BACKBONE.NAME = "ViT-B/16"; cfg.MODEL.BACKBONE.PATH = "random"
cfg.DATASET.NAME = "Synthetic"
cfg.DATASET.SYNTHETIC_NUM_CLASSES = 100
cfg.DATASET.SYNTHETIC_PER_CLASS = 8
cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 384; cfg.DATALOADER.TEST.BATCH_SIZE = 384
cfg.OUTPUT_DIR = ""
cfg.TRAINER.MUDPT.CTX_INIT = ""; cfg.TRAINER.MUDPT.DEEP_PROMPT_DEPTH = 9
tr = build_trainer(cfg)
print("platform hint:", tr.mesh.mesh.devices.flat[0].platform, flush=True)
from mudpt_tpu.models.layers import resolve_block_impl
print("block impl:", resolve_block_impl(), flush=True)
batch = next(iter(tr.dm.train_loader))
sb = shard_batch(tr.mesh, tr._cast_images(batch))
st2 = {"tr": tr.trainable, "opt": tr.opt_state}
def trainer_train():
    st2["tr"], st2["opt"], loss, acc = tr._train_step(st2["tr"], st2["opt"], tr.frozen, tr.aux, sb)
    float(loss)
def trainer_fwd():
    preds = tr._eval_step(st2["tr"], tr.frozen, tr.aux, sb["image"])
    int(preds[0])
print("trainer train ms:", round(timeit(trainer_train), 1), flush=True)
print("trainer fwd   ms:", round(timeit(trainer_fwd), 1), flush=True)
