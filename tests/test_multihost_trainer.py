"""Multi-host pretraining trainer (VERDICT r2 item 6): a 2-process
forced-CPU cluster (same re-exec trick as `dryrun_multichip`) must complete
train steps with the SAME loss as a single process on the same global
batch — the trainer's per-item-deterministic multihost data pipeline makes
the global batch process-count-invariant.
"""

import json
import os
import socket
import subprocess
import sys

import h5py
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_h5(path, n_subjects=4, size=16):
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for i in range(n_subjects):
            g = f.create_group(f"{i:06d}")
            g.create_dataset(
                "img", data=rng.random((2, size, size, size), np.float32)
            )
            g.create_dataset(
                "seg",
                data=rng.integers(0, 3, (size, size, size)).astype(np.uint8),
            )


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(nproc, dataroot, ckpt_dir, name):
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = os.environ.copy()
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(nproc)
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = REPO
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO, "tests", "_multihost_worker.py"),
                    dataroot, ckpt_dir, name,
                ],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker rc={p.returncode}:\n{out[-4000:]}"
        )
    return outs


def _losses(run_dir):
    by_step = {}
    with open(os.path.join(run_dir, "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss/loss" in rec:
                by_step[rec["step"]] = rec["loss/loss"]
    return by_step


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    _make_h5(str(tmp_path / "train_data.hdf5"))
    # val set: the worker runs with evaluation_freq=2 + lr_policy=plateau
    # so the multihost val-loss + plateau re-replication path executes
    _make_h5(str(tmp_path / "val_data.hdf5"), n_subjects=2)
    ckpt = str(tmp_path / "ckpt")

    _run_cluster(1, str(tmp_path), ckpt, "mh1")
    _run_cluster(2, str(tmp_path), ckpt, "mh2")

    l1 = _losses(os.path.join(ckpt, "mh1"))
    l2 = _losses(os.path.join(ckpt, "mh2"))
    assert set(l1) == set(l2) and len(l1) == 2, (l1, l2)
    for step in sorted(l1):
        assert l1[step] == pytest.approx(l2[step], rel=1e-4), (
            step, l1, l2,
        )
    # exactly one writer (rank 0 gates artifacts): the 2-process run's
    # jsonl has ONE loss record per step, not two
    with open(os.path.join(ckpt, "mh2", "scalars.jsonl")) as f:
        steps = [json.loads(ln)["step"] for ln in f if "loss/loss" in ln]
    assert sorted(steps) == sorted(set(steps))

    # the val + plateau path ran (evaluation_freq=2) and is process-count
    # invariant like the train loss
    def _val(run):
        with open(os.path.join(ckpt, run, "scalars.jsonl")) as f:
            return [
                json.loads(ln)["loss/val"] for ln in f if "loss/val" in ln
            ]

    v1, v2 = _val("mh1"), _val("mh2")
    assert len(v1) == len(v2) == 1, (v1, v2)
    assert v1[0] == pytest.approx(v2[0], rel=1e-4)
