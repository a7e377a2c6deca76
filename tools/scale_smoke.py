"""Scale smoke test: synthesize a ~1M-node power-law graph, compress, and
time the TPU decode kernel (run on the real chip; see docs/ARCHITECTURE.md
for context). Correctness at this scale is asserted via ok flags."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/wgt_jax_cache")
from webgraph_ans_tpu.bvgraph.graph import Adjacency
from webgraph_ans_tpu.bvgraph.store import compress_adjacency
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
from webgraph_ans_tpu.ops.decode_jax import decode_blocks, round_cap, seed_rings

rng = np.random.default_rng(42)
n = 1_000_000
deg = np.minimum(rng.zipf(1.7, size=n), 200).astype(np.int64)
E = int(deg.sum())
src = np.repeat(np.arange(n), deg)
local = rng.random(E) < 0.7
gaps = rng.zipf(1.3, size=E)
tgt = np.where(local, (src + gaps) % n, rng.integers(0, n, size=E))
order = np.lexsort((tgt, src))
tgt_sorted = tgt[order]
keep = np.ones(E, bool)
keep[1:] = (tgt_sorted[1:] != tgt_sorted[:-1]) | (src[order][1:] != src[order][:-1])
tgt2 = tgt_sorted[keep]; src2 = src[order][keep]
deg2 = np.bincount(src2, minlength=n)
off2 = np.zeros(n + 1, np.uint64); np.cumsum(deg2, out=off2[1:])
adj = Adjacency(off2, tgt2.astype(np.uint32))
print(f"graph: {n} nodes, {adj.num_arcs} arcs", flush=True)

t0=time.time()
res = compress_adjacency(adj, 7, 3, 2)
print(f"compress: {time.time()-t0:.1f}s, {len(res.prelude.stream)*16/adj.num_arcs:.2f} bits/link", flush=True)
g = ANSBvGraph(res.prelude, res.states, res.pointers)
dec = TpuGraphDecoder(g)
L=4096
starts, ends = dec._block_bounds(L)
hs, hp = np.asarray(dec.states), np.asarray(dec.pointers)
pre = np.clip(starts[:,None]-7+np.arange(7)[None,:],0,n-1)
t0=time.time()
ring = seed_rings(dec.params, dec.tables, jnp.asarray(hs[pre]), jnp.asarray(hp[pre]), jnp.asarray(starts), 7)
jax.block_until_ready(ring)
print(f"seed {time.time()-t0:.1f}s", flush=True)
est = (2*adj.num_arcs + 3*n)//L
cap = round_cap(dec.params, int(est*1.3))
args = (dec.params, dec.tables, jnp.asarray(hs[starts]), jnp.asarray(hp[starts]),
        jnp.asarray(starts), jnp.asarray(ends), ring, 7, 2)
t0=time.time(); out = decode_blocks(*args, cap); jax.block_until_ready(out)
print(f"decode first {time.time()-t0:.1f}s ok={bool(np.asarray(out[2]).all())} cap={cap}", flush=True)
t0=time.time()
for _ in range(3): out = decode_blocks(*args, cap); jax.block_until_ready(out)
dt=(time.time()-t0)/3
print(f"{adj.num_arcs}-arc decode kernel: {dt*1e3:.1f} ms = {dt/adj.num_arcs*1e9:.2f} ns/arc", flush=True)
