"""Worker process for the 2-process Trainer.fit e2e test.

Launched (twice) by tests/test_multiprocess_fit.py with
``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` in
the environment. Each worker forces 4 virtual CPU devices, so the two
processes form one 8-device global mesh — the smallest configuration in
which every multi-HOST code path in the Trainer actually executes:
``jax.make_array_from_process_local_data`` batch assembly, uneven-shard
weight-0 padding batches, the cross-host LR schedule derivation, and the
SIGTERM preemption consensus allgather.

Modes (``--mode``):
- ``train``    fixed-epoch run with ``lr_schedule='linear_warmup'`` over an
               UNEVEN shard split (65 records / 2 hosts → 33 vs 32); prints
               shard/batch accounting + per-epoch history as JSON.
- ``preempt``  longer run with ``handle_preemption=True``; process 0
               SIGTERMs ITSELF at the end of epoch 3 — both hosts must agree
               to stop via the epoch-boundary consensus and checkpoint.
- ``longtrain`` the preempt config with NO self-signal: the orchestrator
               SIGKILLs one host mid-run (hard crash) and later relaunches
               everyone in ``resume`` mode.
- ``resume``   ``fit(resume=True)`` from the preemption/rolling checkpoint;
               must replay the interrupted epoch and finish the schedule.

Process/device geometry comes from the environment: ``JAX_NUM_PROCESSES``
hosts × ``MP_FIT_LOCAL_DEVICES`` virtual CPU devices each (default 4);
``MP_FIT_CKPT_BACKEND`` selects msgpack/orbax/orbax_async checkpoints.

The reference is single-device (reference: audio/train.py:196); multi-host
data parallelism is this framework's added capability, so these assertions
have no reference counterpart to mirror.
"""

import argparse
import json
import os
import signal
import sys

_LOCAL_DEVICES = int(os.environ.get("MP_FIT_LOCAL_DEVICES", "4"))
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_LOCAL_DEVICES}"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CLASSES = 4
DIM = 16
BATCH = 16  # per_host = 8
N_TRAIN = 65  # ceil-split 33/32: host 0 runs 5 local batches, host 1 only 4


class BlobSource:
    """Deterministic per-index Gaussian blobs — identical on every host."""

    def __init__(self, n: int, seed: int):
        self.n = n
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        import numpy as np

        idx = int(idx)
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        label = idx % N_CLASSES
        x = rng.normal(0.0, 1.0, DIM).astype("float32")
        x[label * 3 : label * 3 + 3] += 3.0  # separable class means
        return {"x": x, "label": np.int32(label)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=["train", "preempt", "longtrain", "resume"],
        required=True)
    ap.add_argument("--workdir", required=True)
    args = ap.parse_args()

    from multimodal_lipread_tpu.parallel.distributed import maybe_initialize_distributed

    n_procs = int(os.environ["JAX_NUM_PROCESSES"])
    assert maybe_initialize_distributed(), "distributed init did not fire"
    assert jax.process_count() == n_procs, jax.process_count()
    assert len(jax.devices()) == n_procs * _LOCAL_DEVICES, len(jax.devices())
    pid = jax.process_index()

    import flax.linen as nn
    import numpy as np

    from multimodal_lipread_tpu.data.grain_loader import StreamingDataset
    from multimodal_lipread_tpu.train.trainer import Trainer, TrainerConfig

    class Mlp(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Dense(32)(x)
            # BatchNorm: under SPMD the batch mean over the sharded axis is a
            # cross-host collective; running stats must stay host-identical
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            return nn.Dense(N_CLASSES)(x)

    train_ds = StreamingDataset(BlobSource(N_TRAIN, seed=1), input_keys=("x",))
    val_ds = StreamingDataset(BlobSource(32, seed=2), input_keys=("x",))
    test_ds = StreamingDataset(BlobSource(24, seed=3), input_keys=("x",))

    # msgpack checkpoints go to per-host dirs (models a TPU pod's host-local
    # disks; the orchestrator asserts they come out bit-identical). Orbax
    # checkpoints are COLLECTIVE: every host participates in ONE save to a
    # SHARED directory (the standard multi-host orbax deployment).
    backend = os.environ.get("MP_FIT_CKPT_BACKEND", "msgpack")
    host_dir = os.path.join(args.workdir, f"host{pid}")
    ckpt_dir = (os.path.join(args.workdir, "shared", "ckpt")
                if backend.startswith("orbax")
                else os.path.join(host_dir, "ckpt"))
    common = dict(
        model_name="mpfit",
        num_classes=N_CLASSES,
        batch_size=BATCH,
        learning_rate=1e-2,
        weight_decay=0.0,
        metrics_dir=os.path.join(host_dir, "metrics"),
        checkpoints_dir=ckpt_dir,
        checkpoint_backend=backend,
    )

    if args.mode == "train":
        cfg = TrainerConfig(
            epochs=4, lr_schedule="linear_warmup", warmup_proportion=0.2, **common
        )
        trainer = Trainer(Mlp(), cfg)
        per_host = BATCH // n_procs
        local_batches = -(-len(train_ds) // per_host)
        print(
            "SHARDS "
            + json.dumps(
                {
                    "process": pid,
                    "local_len": len(train_ds),
                    "local_batches": local_batches,
                    "global_batches": train_ds.global_batches(per_host),
                }
            ),
            flush=True,
        )
        result = trainer.fit(train_ds, val_ds, test_ds, progress=None)
    elif args.mode == "preempt":
        cfg = TrainerConfig(
            epochs=8, handle_preemption=True, rolling_checkpoint=True, **common
        )
        trainer = Trainer(Mlp(), cfg)

        def progress(msg):
            # only host 0 receives the "preemption" signal; host 1 must stop
            # via the epoch-boundary consensus allgather
            if pid == 0 and msg.startswith("Epoch 3/"):
                os.kill(os.getpid(), signal.SIGTERM)

        result = trainer.fit(train_ds, val_ds, test_ds, progress=progress)
    elif args.mode == "longtrain":
        # like preempt but with NO graceful signal: the orchestrator SIGKILLs
        # one host mid-run (hard crash), then relaunches everyone in resume
        # mode — recovery rides the atomic rolling checkpoints alone
        cfg = TrainerConfig(
            epochs=8, handle_preemption=True, rolling_checkpoint=True, **common
        )
        trainer = Trainer(Mlp(), cfg)
        result = trainer.fit(train_ds, val_ds, test_ds, progress=None)
    else:  # resume
        cfg = TrainerConfig(
            epochs=8, handle_preemption=True, rolling_checkpoint=True, **common
        )
        trainer = Trainer(Mlp(), cfg)
        result = trainer.fit(train_ds, val_ds, test_ds, resume=True, progress=None)

    payload = {
        "process": pid,
        "preempted": bool(result.get("preempted", False)),
        "epochs": [h["epoch"] for h in result["history"]],
        "train_loss": [round(h["train_loss"], 6) for h in result["history"]],
        "val_acc": [round(h["val_acc"], 4) for h in result["history"]],
        "lr": [round(h["lr"], 8) for h in result["history"]],
        "best_val_acc": round(result["best_val_acc"], 4),
        "final_test_acc": result.get("final_test_acc"),
    }
    print("RESULT " + json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
