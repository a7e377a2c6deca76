"""Multi-host launch driver (webgraph_ans_tpu/launch.py): 3-process
local dry run with the ordered CSR allgather to process 0."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from webgraph_ans_tpu.ans.prelude import save_pointers, save_states
from webgraph_ans_tpu.bvgraph.store import compress_adjacency
from webgraph_ans_tpu.bvgraph.synth import synth_web_graph


@pytest.mark.slow
def test_launch_local_dryrun_gather(tmp_path):
    adj = synth_web_graph(900, seed=17)
    base = str(tmp_path / "g")
    res = compress_adjacency(adj)
    res.prelude.save(base)
    save_states(base, res.states)
    save_pointers(base, res.pointers)
    gather = str(tmp_path / "gathered.npz")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-m", "webgraph_ans_tpu.launch", base,
         "--local-dryrun", "3", "--reps", "1", "--gather", gather,
         "--lanes-per-host", "8"],
        env=env, capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    reports = [json.loads(line) for line in out.stdout.splitlines()
               if line.startswith("{") and "process" in line]
    assert len(reports) == 3
    assert sorted(r["process"] for r in reports) == [0, 1, 2]
    assert sum(r["arcs"] for r in reports) == adj.num_arcs
    z = np.load(gather)
    np.testing.assert_array_equal(z["succs"], adj.succs)
    np.testing.assert_array_equal(z["offsets"].astype(np.int64),
                                  adj.offsets.astype(np.int64))
