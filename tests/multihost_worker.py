"""One process of a 2-process MuDPT train-step pod test (CPU devices).

Launched as ``python tests/multihost_worker.py <process_id> <coord_port>``
by tests/test_multihost.py — two of these processes form a 2-host 'pod'
with 4 virtual CPU devices each; the trainer builds its Mesh over all 8,
each host feeds its slice of the batch (parallel/mesh.py shard_batch's
multi-process path), and XLA's collectives cross the process boundary.
Prints the per-step losses for the test to compare against the
single-process run.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mudpt_tpu.config import default_config
    from mudpt_tpu.parallel.mesh import shard_batch
    from mudpt_tpu.parallel.multihost import maybe_initialize_distributed
    from mudpt_tpu.trainers import build_trainer  # noqa: F401 (registration)
    from mudpt_tpu.trainers.mudpt import MuDPT

    # exercise the ENV-DRIVEN init path for real (it must run before any
    # call that initializes the XLA backend)
    os.environ["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["NUM_PROCESSES"] = "2"
    os.environ["PROCESS_ID"] = str(pid)
    assert maybe_initialize_distributed() is True
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    assert maybe_initialize_distributed() is True  # already-initialized path

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
    cfg.PARALLEL.MODEL = 2  # dp x tp, spanning both hosts
    if os.environ.get("POD_HOST_SHARD") == "1":
        # scale-up input strategy: disjoint per-host item shards
        cfg.DATALOADER.HOST_SHARD = True
    else:
        # pin the replicated-decode path: the baseline pod test asserts
        # bit-identical losses vs the single-process run, which requires
        # every host to decode the SAME global batch ("auto" would shard)
        cfg.DATALOADER.HOST_SHARD = False

    trainer = MuDPT(cfg, devices=jax.devices())
    assert trainer.mesh.mesh.devices.size == 8
    host_local = trainer.dm.host_sharded
    if os.environ.get("POD_HOST_SHARD") == "1":
        assert host_local and len(trainer.dm._train_items) > 0
        # eval sharding: this host decodes only ~half the test items, yet
        # the all-reduced metrics must cover the full set (checked below
        # and by the test comparing against the single-process run)
        assert trainer.dm.eval_host_sharded
        n_test = len(trainer.dm.dataset.test)
        assert len(trainer.dm.test_loader.items) < n_test
        r0 = trainer.evaluate(trainer.dm.test_loader)
        assert r0["total"] == n_test, (r0["total"], n_test)
        print(f"ACC0 pid={pid} {r0['accuracy']:.6f} total={r0['total']}")

    losses = []
    it = iter(trainer.dm.train_loader)
    for _ in range(2):
        batch = next(it)
        sharded = shard_batch(trainer.mesh, batch, host_local=host_local)
        trainer.trainable, trainer.opt_state, loss, acc = trainer._train_step(
            trainer.trainable, trainer.opt_state, trainer.frozen, trainer.aux,
            sharded,
        )
        losses.append(float(loss))  # replicated: fetchable on every host

    # evaluation also runs in pod mode: eval logits are replicated outputs,
    # every host computes identical metrics over the shared loader
    results = trainer.evaluate(trainer.dm.test_loader)

    # checkpoint round-trip in pod mode: primary writes, primary reads,
    # weights broadcast — every host must end with identical values
    if len(sys.argv) > 3:
        import numpy as np

        trainer.cfg.OUTPUT_DIR = sys.argv[3]
        trainer.save_model()
        trainer.load_model(sys.argv[3], epoch=1)
        csum = float(
            sum(
                np.abs(np.asarray(jax.device_get(leaf), np.float64)).sum()
                for leaf in jax.tree_util.tree_leaves(trainer.trainable)
            )
        )
        print(f"CKSUM pid={pid} {csum:.6f}")

    print(f"LOSSES pid={pid} {losses}")
    print(f"ACC pid={pid} {results['accuracy']:.6f}")


if __name__ == "__main__":
    main()
