"""Deterministic synthetic web-graph generator for at-scale benchmarks.

The reference's results protocol covers 8 LAW graphs from 6.7M to 91.8G
arcs (reference README.md:106-115); those fixtures are not redistributable
here, so scale evidence beyond the 3.2M-arc cnr-2000 fixture comes from
synthetic graphs that reproduce the *structural* properties the BvGraph
format exploits (and that the codec's component models are shaped by):

- power-law outdegrees (Zipf),
- locality: most arcs point near their source (small residual gaps),
- similarity: consecutive nodes share much of their successor pool
  (drives window references + copy blocks, like crawl ordering does),
- runs of consecutive successors (drives intervals).

Everything is vectorized numpy off a seeded Generator, so a (n, seed)
pair always produces the same graph on any machine.
"""

from __future__ import annotations

import numpy as np

from .graph import Adjacency


def synth_web_graph(num_nodes: int, seed: int = 0, block: int = 8,
                    pool_size: int = 18, take_prob: float = 0.55,
                    run_prob: float = 0.35, run_len: int = 6,
                    private: int = 1) -> Adjacency:
    """Synthesizes a web-like graph with ~num_nodes * (pool_size *
    take_prob + run_prob * run_len + private) arcs (duplicates removed).

    Structure: nodes come in `block`-sized groups sharing a target pool
    (each node samples a subset -> copy blocks + window references),
    plus a run of consecutive targets (-> intervals) and a few global
    Zipf-gap targets (-> residuals)."""
    n = int(num_nodes)
    rng = np.random.default_rng(seed)
    nblocks = -(-n // block)

    # Shared per-block pools: ascending targets anchored near the block,
    # gaps Zipf-distributed (power-law residual gaps when not copied).
    gaps = rng.zipf(1.25, size=(nblocks, pool_size)).astype(np.int64)
    np.clip(gaps, 1, n // 4, out=gaps)
    anchors = (np.arange(nblocks, dtype=np.int64) * block)[:, None]
    pools = anchors - (block * 4) + np.cumsum(gaps, axis=1)
    np.clip(pools, 0, n - 1, out=pools)

    # Each node takes a random subset of its block's pool.
    take = rng.random((n, pool_size)) < take_prob
    pool_per_node = np.broadcast_to(
        pools.repeat(block, axis=0)[:n], (n, pool_size))
    src_pool = np.repeat(np.arange(n, dtype=np.int64), take.sum(axis=1))
    tgt_pool = pool_per_node[take]

    # Interval runs: consecutive targets starting just past the node.
    has_run = rng.random(n) < run_prob
    lens = rng.integers(4, run_len + 4, size=n)
    lens = np.where(has_run, lens, 0)
    run_start = (np.arange(n, dtype=np.int64) + 1 +
                 rng.integers(0, 16, size=n)) % n
    src_run = np.repeat(np.arange(n, dtype=np.int64), lens)
    offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
    t = np.arange(offs[-1], dtype=np.int64) - offs[:-1].repeat(lens)
    tgt_run = np.minimum(run_start.repeat(lens) + t, n - 1)

    # Private residuals: signed Zipf gaps around the source, with a
    # Zipf-distributed per-node count so outdegrees are heavy-tailed.
    npriv = np.minimum(rng.zipf(2.0, size=n) * private, 400)
    src_priv = np.repeat(np.arange(n, dtype=np.int64), npriv)
    k = len(src_priv)
    pg = rng.zipf(1.35, size=k).astype(np.int64)
    sign = np.where(rng.random(k) < 0.5, -1, 1)
    tgt_priv = (src_priv + sign * pg) % n

    src = np.concatenate([src_pool, src_run, src_priv])
    tgt = np.concatenate([tgt_pool, tgt_run, tgt_priv])

    # (src, tgt) packed into one sortable i64 key: one radix-ish sort +
    # unique beats a 2-key lexsort ~4x at the 50M-arc scale.
    key = src * n + tgt
    key = np.unique(key)
    src = key // n
    tgt = key % n

    deg = np.bincount(src, minlength=n)
    offsets = np.zeros(n + 1, np.uint64)
    np.cumsum(deg, out=offsets[1:])
    return Adjacency(offsets, tgt.astype(np.uint32))
