"""End-to-end 2-process Trainer.fit over a sharded StreamingDataset.

The flagship capability this framework adds over the single-device reference
(reference: audio/train.py:196) is multi-host data parallelism; these tests
execute the trainer's multi-HOST code paths for real — two OS processes, a
localhost jax.distributed coordinator, 4 virtual CPU devices each (8-device
global mesh):

- uneven ceil-split shards (33 vs 32 records) → the short host must emit a
  weight-0 padding batch so both hosts run the same collective step count
  (trainer._stream_batches)
- ``linear_warmup`` steps-per-epoch derived from ``global_batches`` so both
  hosts compute the identical LR at every collective step
- cross-host metric identity: every epoch metric comes out of replicated
  arrays, so the two hosts' histories must match exactly
- preemption consensus: SIGTERM on ONE host stops BOTH at the next epoch
  boundary with an epoch-boundary checkpoint, and ``resume=True`` replays
  the interrupted epoch to completion with bit-identical checkpoints

Skipped when no localhost port can be bound.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_fit_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError:
            pytest.skip("no localhost port available")
        return s.getsockname()[1]


def _launch(mode: str, workdir: str, timeout: int = 420):
    port = _free_port()
    base_env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    base_env.setdefault("MLT_COMPILE_CACHE", "/tmp/mlt_jax_test_cache")
    procs = []
    for pid in range(2):
        env = dict(
            base_env,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, "--mode", mode, "--workdir", workdir],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"mp fit worker ({mode}) timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"mode={mode} rc={rc}\n{err[-3000:]}"
    return outs


def _parse(outs, tag):
    recs = {}
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith(tag + " "):
                rec = json.loads(line[len(tag) + 1 :])
                recs[rec["process"]] = rec
    assert set(recs) == {0, 1}, f"missing {tag} lines: {sorted(recs)}"
    return recs


@pytest.mark.slow
def test_two_process_fit_uneven_shards(tmp_path):
    """Full fit over a 65-record stream split 33/32 across two hosts."""
    outs = _launch("train", str(tmp_path))
    shards = _parse(outs, "SHARDS")
    # ceil-split: host 0 gets 33 records → 5 local batches; host 1 gets 32 →
    # 4, and must pad one weight-0 collective step up to global_batches
    assert shards[0]["local_batches"] == 5
    assert shards[1]["local_batches"] == 4
    assert shards[0]["global_batches"] == shards[1]["global_batches"] == 5

    res = _parse(outs, "RESULT")
    # SPMD: both hosts computed every metric from replicated arrays — the
    # histories (and the per-step linear_warmup LR trace) must be identical
    assert res[0] == {**res[1], "process": 0}
    assert res[0]["epochs"] == [1, 2, 3, 4]
    assert res[0]["final_test_acc"] is not None
    assert res[0]["final_test_acc"] > 80.0
    # the schedule actually decayed (warmup then linear decay → lr changes)
    assert len(set(res[0]["lr"])) > 1


@pytest.mark.slow
def test_two_process_preemption_consensus_and_resume(tmp_path):
    """SIGTERM on host 0 only → BOTH hosts stop at the epoch boundary, save
    an epoch-boundary checkpoint, and a 2-process resume finishes the run."""
    outs = _launch("preempt", str(tmp_path))
    res = _parse(outs, "RESULT")
    for pid in (0, 1):
        assert res[pid]["preempted"] is True, res[pid]
    # signal lands during epoch 4 (progress fires at the end of epoch 3);
    # consensus stops both hosts after epoch 4's train pass → 3 completed
    assert res[0]["epochs"] == res[1]["epochs"] == [1, 2, 3]
    for pid in (0, 1):
        assert os.path.exists(
            tmp_path / f"host{pid}" / "ckpt" / "mpfit_checkpoint.msgpack"
        )

    outs = _launch("resume", str(tmp_path))
    res = _parse(outs, "RESULT")
    assert res[0] == {**res[1], "process": 0}
    assert res[0]["preempted"] is False
    # resume replays the interrupted epoch 4 and finishes the schedule
    assert res[0]["epochs"] == [4, 5, 6, 7, 8]
    assert res[0]["final_test_acc"] is not None
    assert res[0]["final_test_acc"] > 80.0

    # hosts checkpoint to their own (host-local-disk model) dirs; SPMD means
    # the replicated state they each saved must be BIT-identical
    for kind in ("best", "checkpoint"):
        a = (tmp_path / "host0" / "ckpt" / f"mpfit_{kind}.msgpack").read_bytes()
        b = (tmp_path / "host1" / "ckpt" / f"mpfit_{kind}.msgpack").read_bytes()
        assert a == b, f"host checkpoints diverged ({kind})"
