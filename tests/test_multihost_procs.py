"""REAL multi-process multihost test: two OS processes, a local
jax.distributed coordinator, node-range shards, and a cross-process
allgather (VERDICT r01 item 7 — the single-process tests cannot exercise
process_index != 0 or the collective path)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_shard_decode(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"proc{pid}.txt"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    results = [p.communicate(timeout=600) for p in procs]
    for pid, (p, (so, se)) in enumerate(zip(procs, results)):
        assert p.returncode == 0, f"proc {pid} failed:\n{so}\n{se}"
    lines = [out.read_text().split() for out in outs]
    assert lines[0][0] == "ok" and lines[1][0] == "ok"
    # contiguous disjoint shards covering all 400 nodes; equal allgather
    assert int(lines[0][2]) == 0 and int(lines[1][3]) == 400
    assert int(lines[0][3]) == int(lines[1][2])
    assert lines[0][4] == lines[1][4]
