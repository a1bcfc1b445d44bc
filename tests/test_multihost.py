"""Multi-host SPMD path (parallel/multihost.py) — unit tests at
process_count=1 plus a 2-process jax.distributed localhost CPU integration
test running a full DP train step from per-process batch shards.

The reference has nothing distributed (SURVEY.md §2.7 calls multi-host a
stretch goal) — which is exactly why this path must be executed under test
rather than assumed."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from pero_pretraining_tpu.parallel.multihost import (
    initialize_distributed,
    make_global_batch,
    process_local_batch_slice,
)

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def test_initialize_distributed_noop_without_config(monkeypatch):
    """No coordinator configured -> single-process mode, no jax.distributed call."""
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False


def test_process_local_batch_slice_single_process():
    sl = process_local_batch_slice(16)
    assert sl == slice(0, 16)
    assert jax.process_count() == 1


def test_make_global_batch_single_process():
    """At process_count=1 the 'global' batch is just the local one, placed
    with the data-axis batch sharding."""
    from pero_pretraining_tpu.configs import MeshConfig
    from pero_pretraining_tpu.parallel.mesh import create_mesh

    n = min(4, jax.device_count())
    mesh = create_mesh(MeshConfig(data=n, model=1), devices=jax.devices()[:n])
    host = {
        "images": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
        "labels": np.arange(8, dtype=np.int32),
    }
    global_batch = make_global_batch(host, mesh)
    assert global_batch["images"].shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(global_batch["images"]), host["images"])
    np.testing.assert_array_equal(np.asarray(global_batch["labels"]), host["labels"])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(num_processes: int, local_devices: int, timeout: float = 600.0):
    """Launch the worker script as `num_processes` jax.distributed processes
    (each with `local_devices` virtual CPU devices) and return process-0's
    parsed JSON line."""
    env_base = dict(os.environ)
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env_base["PYTHONPATH"] = REPO + os.pathsep + env_base.get("PYTHONPATH", "")
    procs = []
    port = _free_port()
    for pid in range(num_processes):
        env = dict(env_base)
        if num_processes > 1:
            env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
            env["JAX_NUM_PROCESSES"] = str(num_processes)
            env["JAX_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=REPO,
            )
        )
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\nstdout: {out}\nstderr: {err[-3000:]}"
    line = [l for l in outs[0][0].splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_two_process_dp_step_matches_single_process():
    """One DP train step over 4 global devices: 2 processes x 2 local devices,
    each feeding its per-process batch shard, must produce the same loss as
    1 process x 4 local devices feeding the full batch."""
    single = _run_workers(num_processes=1, local_devices=4)
    assert single["process_count"] == 1 and single["global_devices"] == 4
    assert single["initialized"] is False

    multi = _run_workers(num_processes=2, local_devices=2)
    assert multi["process_count"] == 2 and multi["global_devices"] == 4
    assert multi["initialized"] is True

    assert np.isclose(multi["loss"], single["loss"], rtol=0, atol=1e-6), (
        f"2-process loss {multi['loss']} != single-process loss {single['loss']}"
    )
