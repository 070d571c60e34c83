"""Multi-host helpers (parallel/multihost.py), exercised single-process on
the 8-device virtual CPU mesh — per VERDICT r1 weak #7:
``host_local_batch_to_global`` is testable today with process_count=1, and
``maybe_initialize_distributed``'s env parsing is unit-testable."""

import numpy as np
import pytest

import jax

from mudpt_tpu.parallel import build_mesh
from mudpt_tpu.parallel.multihost import (
    host_local_batch_to_global,
    is_primary,
    maybe_initialize_distributed,
    process_index,
)


def test_host_local_batch_to_global_single_process():
    """With one process, the host-local shard IS the global batch; the
    result must be laid out with the mesh's batch sharding and round-trip
    the values exactly."""
    ctx = build_mesh()
    assert ctx.mesh.devices.size == 8
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(16, 8, 8, 3).astype(np.float32),
        "label": rng.randint(0, 5, 16).astype(np.int32),
        "valid": np.ones(16, bool),
    }
    g = host_local_batch_to_global(ctx, batch)
    for k, v in batch.items():
        assert g[k].shape == v.shape
        assert g[k].sharding == ctx.batch_sharding
        np.testing.assert_array_equal(np.asarray(g[k]), v)


def test_global_batch_feeds_sharded_step():
    """The assembled global array works as a pjit input: a jitted
    mean-over-batch (which XLA reduces with a psum over 'data') matches the
    local numpy computation."""
    ctx = build_mesh()
    rng = np.random.RandomState(1)
    batch = {"x": rng.randn(32, 4).astype(np.float32)}
    g = host_local_batch_to_global(ctx, batch)

    mean = jax.jit(lambda x: x.mean(axis=0))(g["x"])
    np.testing.assert_allclose(
        np.asarray(mean), batch["x"].mean(axis=0), rtol=1e-6
    )


def test_maybe_initialize_distributed_single_process(monkeypatch):
    """No coordination env => no distributed init, returns False."""
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE", raising=False)
    assert maybe_initialize_distributed() is False


def test_maybe_initialize_distributed_env_parsing(monkeypatch):
    """COORDINATOR_ADDRESS path: the env values are parsed and forwarded to
    jax.distributed.initialize (stubbed — really initializing would wedge a
    single-process test run)."""
    calls = {}

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        calls.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )

    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:8476")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "2")
    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    # process_count stays 1 (stub doesn't create peers) => returns False,
    # but the parse/forward contract is what's under test
    assert maybe_initialize_distributed() is False
    assert calls == {
        "coordinator_address": "10.0.0.1:8476",
        "num_processes": 4,
        "process_id": 2,
    }


def test_primary_and_index():
    assert process_index() == 0
    assert is_primary() is True


@pytest.mark.slow  # 2-process pod run, >60s measured
def test_two_process_train_step_matches_single_process(tmp_path):
    """END-TO-END pod test: two subprocesses (4 virtual CPU devices each)
    form one 8-device mesh via jax.distributed, run two real MuDPT train
    steps with each host feeding its batch slice, and the losses must match
    the identical single-process 8-device run (same seeds everywhere)."""
    import re
    import socket
    import subprocess
    import sys

    # single-process reference losses, computed in-process on the same
    # 8-device mesh with the same config as the worker
    import jax as _jax

    from mudpt_tpu.config import default_config
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.trainers.mudpt import MuDPT

    cfg = default_config()
    cfg.TRAINER.NAME = "MuDPT"
    cfg.MODEL.BACKBONE.NAME = "test-tiny"
    cfg.MODEL.BACKBONE.PATH = "random"
    cfg.DATASET.NAME = "Synthetic"
    cfg.INPUT.SIZE = (32, 32)
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 16
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.OUTPUT_DIR = ""
    cfg.TRAINER.MUDPT.PREC = "fp32"
    cfg.PARALLEL.MODEL = 2

    trainer = MuDPT(cfg, devices=_jax.devices("cpu")[:8])
    ref_losses = []
    it = iter(trainer.dm.train_loader)
    for _ in range(2):
        sharded = shard_batch(trainer.mesh, next(it))
        trainer.trainable, trainer.opt_state, loss, _ = trainer._train_step(
            trainer.trainable, trainer.opt_state, trainer.frozen, trainer.aux,
            sharded,
        )
        ref_losses.append(float(loss))
    ref_acc = trainer.evaluate(trainer.dm.test_loader)["accuracy"]

    with socket.socket() as s:  # free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins its own platform
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(tmp_path)],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=480)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    for out in outs:
        m = re.search(r"LOSSES pid=\d \[([-\d.e, ]+)\]", out)
        assert m, out[-3000:]
        losses = [float(x) for x in m.group(1).split(",")]
        assert len(losses) == 2
        for got, ref in zip(losses, ref_losses):
            assert abs(got - ref) < 1e-5, (losses, ref_losses)
        ma = re.search(r"ACC pid=\d ([-\d.]+)", out)
        assert ma, out[-3000:]
        assert abs(float(ma.group(1)) - ref_acc) < 1e-3, (ma.group(1), ref_acc)

    # checkpoint round-trip (primary writes + broadcast-on-load): both hosts
    # must report the identical post-reload weight checksum
    csums = []
    for out in outs:
        mc = re.search(r"CKSUM pid=\d ([-\d.]+)", out)
        assert mc, out[-3000:]
        csums.append(float(mc.group(1)))
    assert csums[0] == csums[1], csums


@pytest.mark.slow  # 2-process pod run, >60s measured
def test_two_process_host_sharded_input(tmp_path):
    """DATALOADER.HOST_SHARD: hosts decode disjoint item shards and feed
    per-host batch slices; the pod must train in lockstep with finite,
    host-identical (replicated) losses.  Eval is sharded too: each host
    scores only its block of every global batch and the confusion matrices
    are all-reduced — both hosts must report metrics identical to the
    single-process run over the full test set."""
    import os
    import re
    import socket
    import subprocess
    import sys

    # single-process reference: fresh-model accuracy on the same config
    # (deterministic seeds => the pod's pre-training eval must match)
    import jax as _jax

    from mudpt_tpu.config import default_config
    from mudpt_tpu.trainers.mudpt import MuDPT

    cfg = default_config()
    cfg.TRAINER.NAME = "MuDPT"
    cfg.MODEL.BACKBONE.NAME = "test-tiny"
    cfg.MODEL.BACKBONE.PATH = "random"
    cfg.DATASET.NAME = "Synthetic"
    cfg.INPUT.SIZE = (32, 32)
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 16
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.OUTPUT_DIR = ""
    cfg.TRAINER.MUDPT.PREC = "fp32"
    cfg.PARALLEL.MODEL = 2
    ref_trainer = MuDPT(cfg, devices=_jax.devices("cpu")[:8])
    ref = ref_trainer.evaluate(ref_trainer.dm.test_loader)
    ref_acc0, ref_total = ref["accuracy"], ref["total"]

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["POD_HOST_SHARD"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=480)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    per_host = []
    accs0 = []
    for out in outs:
        m = re.search(r"LOSSES pid=\d \[([-\d.e, ]+)\]", out)
        assert m, out[-3000:]
        losses = [float(x) for x in m.group(1).split(",")]
        assert all(l == l and l < 100 for l in losses), losses
        per_host.append(losses)
        ma = re.search(r"ACC0 pid=\d ([-\d.]+) total=(\d+)", out)
        assert ma, out[-3000:]
        accs0.append(float(ma.group(1)))
        assert int(ma.group(2)) == ref_total, (ma.group(2), ref_total)
    assert per_host[0] == per_host[1], per_host
    # sharded eval == single-process eval, identical on every host
    assert accs0[0] == accs0[1], accs0
    assert abs(accs0[0] - ref_acc0) < 1e-3, (accs0, ref_acc0)
