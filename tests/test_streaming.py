"""Streaming pipeline: compress without materializing the input
adjacency, decode without materializing the output CSR (the reference's
mmap'd BvGraphSeq -> BvComp -> RevBuffer shape,
src/bvgraph/random_access.rs:101-132 + src/bvgraph/sequential.rs:29-51)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from webgraph_ans_tpu.bvgraph.graph import load_bvgraph
from webgraph_ans_tpu.bvgraph.sequential import ANSBvGraphSeq
from webgraph_ans_tpu.bvgraph.store import compress_adjacency, store

CNR = os.path.join(os.path.dirname(__file__), "data", "cnr-2000", "cnr-2000")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_streaming_store_bit_identical(tmp_path, cnr2000):
    """The streaming 3-pass pipeline (with and without token spill) makes
    the same BvComp decisions and produces byte-identical artifacts."""
    r1 = store(CNR, str(tmp_path / "ram"))
    r2 = store(CNR, str(tmp_path / "st"), streaming=True)
    np.testing.assert_array_equal(r1.prelude.stream, r2.prelude.stream)
    np.testing.assert_array_equal(r1.states, r2.states)
    np.testing.assert_array_equal(r1.pointers, r2.pointers)
    assert r1.prelude.state == r2.prelude.state
    r3 = store(CNR, str(tmp_path / "sp"), streaming=True,
               spill_path=str(tmp_path / "sp.spill"),
               spill_chunk_tokens=1 << 18)
    np.testing.assert_array_equal(r1.prelude.stream, r3.prelude.stream)
    np.testing.assert_array_equal(r1.states, r3.states)


@pytest.mark.slow
def test_streaming_ram_cap(tmp_path):
    """Under an enforced heap cap (RLIMIT_DATA; RLIMIT_AS would count
    interpreter address-space reservations) the streaming+spill pipeline
    compresses cnr-2000 while the in-RAM pipeline cannot — the cap sits
    between their measured peaks (~43 MB streaming vs ~76 MB in-RAM;
    the in-RAM path dies in the native adjacency/token allocations)."""
    script = textwrap.dedent("""
        import resource, sys
        cap = 60 << 20
        resource.setrlimit(resource.RLIMIT_DATA, (cap, cap))
        from webgraph_ans_tpu.bvgraph.store import store
        store(sys.argv[2], sys.argv[3], streaming=sys.argv[1] == "stream",
              spill_path=sys.argv[3] + ".spill"
              if sys.argv[1] == "stream" else None,
              spill_chunk_tokens=1 << 18)
        print("OK")
    """)
    # single-threaded allocator behavior: BLAS worker threads + glibc
    # per-thread malloc arenas otherwise spin against the rlimit
    env = dict(os.environ, PYTHONPATH=REPO, OPENBLAS_NUM_THREADS="1",
               OMP_NUM_THREADS="1", MKL_NUM_THREADS="1",
               MALLOC_ARENA_MAX="1")
    ok = subprocess.run(
        [sys.executable, "-c", script, "stream", CNR,
         str(tmp_path / "capped")],
        capture_output=True, text=True, env=env, timeout=900)
    assert ok.returncode == 0 and "OK" in ok.stdout, ok.stderr[-2000:]
    try:
        bad = subprocess.run(
            [sys.executable, "-c", script, "ram", CNR,
             str(tmp_path / "capped2")],
            capture_output=True, text=True, env=env, timeout=900)
        failed = bad.returncode != 0
    except subprocess.TimeoutExpired:
        failed = True   # thrashing against the cap counts as not fitting
    assert failed, "in-RAM pipeline unexpectedly fits the streaming RAM cap"


def test_seq_iter_chunks_bit_exact(tmp_path, cnr2000):
    """iter_chunks streams the decoded graph in bounded chunks, matching
    the materializing decoder, across chunk-size boundaries."""
    adj, _ = cnr2000
    store(CNR, str(tmp_path / "g"))
    seq = ANSBvGraphSeq.load(str(tmp_path / "g"))
    tot_nodes = tot_arcs = 0
    for first, chunk in seq.iter_chunks(max_nodes=37003, max_arcs=300001):
        lo = int(adj.offsets[first])
        np.testing.assert_array_equal(
            chunk.succs, adj.succs[lo:lo + chunk.num_arcs])
        tot_nodes += chunk.num_nodes
        tot_arcs += chunk.num_arcs
    assert tot_nodes == adj.num_nodes
    assert tot_arcs == adj.num_arcs


def test_seq_iter_chunks_block_encoded(tmp_path):
    """The cursor re-enters the stream at encode-block boundaries."""
    from webgraph_ans_tpu.bvgraph.graph import Adjacency
    from webgraph_ans_tpu.ans.prelude import save_pointers, save_states

    rng = np.random.default_rng(3)
    lists = [sorted(rng.choice(200, size=int(rng.integers(0, 10)),
                               replace=False).tolist()) for _ in range(200)]
    adj = Adjacency.from_lists(lists)
    res = compress_adjacency(adj, 7, 3, 2, encode_blocks=8)
    res.prelude.save(str(os.path.join(os.fspath(tmp_path), "b")))
    save_states(str(os.path.join(os.fspath(tmp_path), "b")), res.states)
    save_pointers(str(os.path.join(os.fspath(tmp_path), "b")), res.pointers)
    seq = ANSBvGraphSeq.load(str(os.path.join(os.fspath(tmp_path), "b")))
    got = []
    for _first, chunk in seq.iter_chunks(max_nodes=13, max_arcs=64):
        got.extend(chunk.to_lists())
    assert got == lists
