"""LR schedule semantics (Dassl per-epoch cosine + constant warmup) and
config cascade precedence."""

import math

import numpy as np
import pytest

from mudpt_tpu.config import default_config, merge_from_list
from mudpt_tpu.config.config import OptimCfg
from mudpt_tpu.trainers.optim import make_lr_schedule


def test_cosine_warmup_schedule_matches_torch_semantics():
    cfg = OptimCfg(LR=0.0025, MAX_EPOCH=10, WARMUP_EPOCH=1,
                   WARMUP_TYPE="constant", WARMUP_CONS_LR=1e-5,
                   LR_SCHEDULER="cosine")
    spe = 7  # steps per epoch
    sched = make_lr_schedule(cfg, spe)
    # epoch 0: constant warmup
    for step in range(spe):
        assert float(sched(step)) == pytest.approx(1e-5)
    # epochs 1..9: CosineAnnealingLR stepped per epoch:
    #   lr(e) = LR * 0.5 * (1 + cos(pi * e / MAX_EPOCH))
    for epoch in range(1, 10):
        expected = 0.0025 * 0.5 * (1 + math.cos(math.pi * epoch / 10))
        got = float(sched(epoch * spe + 3))
        assert got == pytest.approx(expected, rel=1e-6), epoch
    # lr is constant within an epoch
    assert float(sched(2 * spe)) == float(sched(2 * spe + spe - 1))


def test_linear_warmup():
    cfg = OptimCfg(LR=0.01, MAX_EPOCH=4, WARMUP_EPOCH=2, WARMUP_TYPE="linear",
                   WARMUP_CONS_LR=0.001, LR_SCHEDULER="cosine")
    sched = make_lr_schedule(cfg, 10)
    lrs = [float(sched(s)) for s in range(20)]
    assert lrs[0] < lrs[10] < 0.01
    assert all(b >= a for a, b in zip(lrs, lrs[1:]))


def test_config_cascade_precedence():
    cfg = default_config()
    assert cfg.TRAINER.MUDPT.N_CTX == 2       # code default (train.py:115-119)
    merge_from_list(cfg, ["TRAINER.MUDPT.N_CTX", "4", "OPTIM.LR", "1e-3"])
    assert cfg.TRAINER.MUDPT.N_CTX == 4
    assert cfg.OPTIM.LR == 1e-3
    # tuple coercion from yacs-style strings
    merge_from_list(cfg, ["INPUT.SIZE", "(128, 128)"])
    assert cfg.INPUT.SIZE == (128, 128)


def test_unknown_keys_warn_not_crash():
    cfg = default_config()
    with pytest.warns(UserWarning):
        merge_from_list(cfg, ["TRAINER.MAPLE.N_CTX", "2"])  # the reference's stale namespace


def test_trainer_params_reflection():
    cfg = default_config()
    cfg.TRAINER.NAME = "MuDPT"
    assert cfg.trainer_params().DEEP_PROMPT_DEPTH == 8
    cfg.TRAINER.NAME = "UUMuDPT"
    assert cfg.trainer_params().N_CTX == 2
    assert cfg.trainer_params("ZeroshotCLIP") is None


def test_sgd_dampening_semantics():
    """SGD_DAMPNING (reference key, torch semantics): with dampening d the
    momentum buffer accumulates (1-d)*grad, so after two identical-gradient
    steps the update follows torch.optim.SGD exactly, INCLUDING the
    first-step quirk (buf_0 = g, dampening not applied)."""
    import jax.numpy as jnp
    import numpy as np

    from mudpt_tpu.config import default_config
    from mudpt_tpu.trainers.optim import build_optimizer

    cfg = default_config().OPTIM
    cfg.NAME = "sgd"
    cfg.LR = 1.0
    cfg.MOMENTUM = 0.5
    cfg.WEIGHT_DECAY = 0.0
    cfg.WARMUP_EPOCH = 0
    cfg.LR_SCHEDULER = "single_step"
    cfg.SGD_DAMPNING = 0.2

    tx, _ = build_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.zeros(3)}
    g = {"w": jnp.ones(3)}
    state = tx.init(params)
    upd1, state = tx.update(g, state, params)
    upd2, state = tx.update(g, state, params)
    # torch: buf1 = g (dampening skipped on the FIRST update) -> upd1 = -g;
    # buf2 = 0.5*g + 0.8*g = 1.3g
    np.testing.assert_allclose(np.asarray(upd1["w"]), -1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd2["w"]), -1.3, rtol=1e-6)

    # torch rejects nesterov + dampening
    import pytest

    cfg.SGD_NESTEROV = True
    with pytest.raises(ValueError):
        build_optimizer(cfg, steps_per_epoch=1)


def test_train_sampler_config():
    """DATALOADER.TRAIN_X.SAMPLER controls train shuffling: 'sequential'
    yields identical first batches across differently-seeded managers."""
    import numpy as np

    from mudpt_tpu.config import default_config
    from mudpt_tpu.data import DataManager

    def first_labels(sampler, seed):
        cfg = default_config()
        cfg.DATASET.NAME = "Synthetic"
        cfg.INPUT.SIZE = (32, 32)
        cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
        cfg.DATALOADER.TRAIN_X.SAMPLER = sampler
        cfg.DATALOADER.NUM_WORKERS = 2
        cfg.SEED = seed
        dm = DataManager(cfg)
        return np.asarray(next(iter(dm.train_loader))["label"])

    seq1, seq2 = first_labels("sequential", 1), first_labels("sequential", 2)
    np.testing.assert_array_equal(seq1, seq2)
    rnd1, rnd2 = first_labels("random", 1), first_labels("random", 2)
    assert not (np.array_equal(rnd1, seq1) and np.array_equal(rnd2, seq2))
