import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/wgt_jax_cache")
np.asarray(jnp.zeros(1))
from webgraph_ans_tpu.bvgraph.random_access import ANSBvGraph
from webgraph_ans_tpu.ops.graph_decode import TpuGraphDecoder
from webgraph_ans_tpu.ops.random_tpu import TpuEmitRandomAccess, _cumsum_i32
from webgraph_ans_tpu.ops import decode_pallas as dp
from webgraph_ans_tpu.ops.emit_pallas import decode_emit_pallas, emit_init_regs_core
from webgraph_ans_tpu.ops.emit_post import _expand_spans
from webgraph_ans_tpu.ops.decode_jax import ROW_SHIFT, seed_rings

def log(*a):
    print(*a, file=sys.stderr, flush=True)

g = ANSBvGraph.load("/tmp/wgt_r5/cnr-2000")
dec = TpuGraphDecoder(g)
ra = TpuEmitRandomAccess(dec)
log("smaxp", ra.smaxp, "feasible frac", float(ra.feasible.mean()))
n = dec.num_nodes
rng = np.random.default_rng(1)
B = 65536
q = np.unique(rng.integers(0, n, B))
gpad = 65536
qp = np.full(gpad, -1, np.int64); qp[:len(q)] = q
qp_d = jnp.asarray(qp.astype(np.int32))
params, tables, plut, ptr_i32, states = dec.params, dec.tables, ra.lut, ra.ptr_d, dec.states
W, mi, H = dec.window, dec.min_interval, ra.H
mf = params[10]; cap = 768; T = 1024; smaxp = ra.smaxp; nch = gpad // 1024

@jax.jit
def prep(qp):
    pad = qp < 0
    qq = jnp.where(pad, 0, qp)
    starts = jnp.where(pad, 0, jnp.maximum(qq - H, 0))
    ends = jnp.where(pad, 0, qq + 1)
    end_abs = jnp.where((ends < n) & ~pad, ptr_i32[jnp.minimum(ends, n - 1)], 0)
    base = jnp.maximum((end_abs >> ROW_SHIFT) - 1, 0)
    entry_abs = jnp.where(pad, 0, ptr_i32[starts])
    seg_base = jnp.maximum(end_abs - (1 + 2 * mf), 0) >> 1
    return starts, ends, base, entry_abs, seg_base

@jax.jit
def slabf(seg_base):
    return dp.build_slab(tables.stream_rows, seg_base, smaxp, gpad // nch)

@jax.jit
def ringsf(starts, base):
    pre = starts[:, None] - W + jnp.arange(W)[None, :]
    pre_cl = jnp.clip(pre, 0, n - 1)
    seed_rel = ptr_i32[pre_cl] - (base << ROW_SHIFT)[:, None]
    return seed_rings(params, tables, states[pre_cl], seed_rel, starts, W, base)

@jax.jit
def initf(starts, ends, ring, entry_abs, seg_base):
    rel_seg = entry_abs - 2 * seg_base
    return emit_init_regs_core(states[jnp.minimum(starts, n-1)], rel_seg, starts, ends, ring, W, gpad, nch, real_starts=jnp.where(qp_d<0,0,qp_d))

kern = functools.partial(decode_emit_pallas, params, plut)
def timeit(name, fn, reps=3):
    jax.block_until_ready(fn()); jax.block_until_ready(fn())
    ts=[]
    for _ in range(reps):
        t0=time.time(); jax.block_until_ready(fn()); ts.append(time.time()-t0)
    log(f"{name:10s} {float(np.median(ts))*1e3:8.1f} ms")

t0=time.time(); starts, ends, base, entry_abs, seg_base = prep(qp_d); jax.block_until_ready(starts); log("prep compile+run", time.time()-t0)
timeit("prep", lambda: prep(qp_d))
t0=time.time(); slab = slabf(seg_base); jax.block_until_ready(slab); log("slab compile+run", time.time()-t0)
timeit("slab", lambda: slabf(seg_base))
t0=time.time(); ring = ringsf(starts, base); jax.block_until_ready(ring); log("rings compile+run", time.time()-t0)
timeit("rings", lambda: ringsf(starts, base))
t0=time.time(); init = initf(starts, ends, ring, entry_abs, seg_base); jax.block_until_ready(init); log("init compile+run", time.time()-t0)
timeit("init", lambda: initf(starts, ends, ring, entry_abs, seg_base))
t0=time.time(); res = kern(slab, init, W, mi, cap, T=T); jax.block_until_ready(res[0]); log("kernel compile+run", time.time()-t0)
timeit("kernel", lambda: kern(slab, init, W, mi, cap, T=T)[0])
val, xch, nib, rows, ok, diag = res
out_cap = 1<<21
@jax.jit
def extract(val, rows, diag):
    markrow, mdirty = diag[0], diag[1]
    start_m = markrow + (mdirty & 1)
    dd = jnp.where((mdirty & 2) != 0, 0, rows - start_m)
    clean = ((mdirty & 1) == 0) & (rows >= 0) & (qp_d >= 0)
    dd_c = jnp.where(clean, jnp.maximum(dd, 0), 0)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32), _cumsum_i32(dd_c.astype(jnp.int32))])
    node, k, valid, _ = _expand_spans(start_m.astype(jnp.int32), dd_c.astype(jnp.int32), clean, out_cap)
    src = (start_m[node] + k) * gpad + node
    flat = jax.lax.bitcast_convert_type(val, jnp.int32).reshape(-1)
    return jnp.where(valid, flat[jnp.clip(src, 0, flat.shape[0]-1)], 0), offs
t0=time.time(); outv, offs = extract(val, rows, diag); jax.block_until_ready(outv); log("extract compile+run", time.time()-t0)
timeit("extract", lambda: extract(val, rows, diag)[1])
timeit("fetch", lambda: np.asarray(outv))
