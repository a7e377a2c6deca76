"""Prototype simulator for the merged-emit decode kernel design (round 4).

Simulates, per lane, the step machine that the Pallas kernel will run:
one FSM decoding BvGraph tokens (one token per step) feeding small run
queues, and an emission side that 3-way-merges (copies read back from a
T-deep ring of the lane's own already-emitted output, interval runs,
residual values) and emits ONE final sorted successor per step.

Validates against the ground-truth adjacency and reports the design
parameters the kernel needs:
  - steps per lane (output cap) incl. stall holes
  - hole fraction and placement (between-slice only?)
  - dirty nodes at ring size T (copy source older than T output rows),
    including taint propagation to descendants
  - queue-depth sensitivity (decode stalls on full queues)

Usage: python tools/proto_merged_emit.py [lanes] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from webgraph_ans_tpu.bvgraph import estimators
from webgraph_ans_tpu.ops.emit_post import (C_EL, C_EMPTY, C_FIRST, C_HOLE,
                                            C_PLACE, C_REFINFO)
from webgraph_ans_tpu.bvgraph.graph import load_bvgraph
from webgraph_ans_tpu.ans.model import build_model
from webgraph_ans_tpu.bvgraph.store import _run_histogram_pass, dump_tokens

CNR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "cnr-2000", "cnr-2000")

# component ids (match ops/decode_jax.py)
C_OUT, C_REF, C_BC, C_BLK, C_IC, C_IS, C_IL, C_FR, C_RES = range(9)


def nat2int(v):
    return (v >> 1) ^ -(v & 1)


def parse_node(vals, comps, i, x, ring_deg, W, mi):
    """Decode one node's tokens starting at index i. Returns (next_i,
    d, copy_runs [(src_start, len)], iv_runs [(left, len)],
    residuals [values], struct_tokens, parent)."""
    d = int(vals[i]); assert comps[i] == C_OUT; i += 1
    copy_runs, iv_runs, res = [], [], []
    parent = -1
    copied = 0
    struct = 1
    if d == 0:
        return i, 0, [], [], [], struct, parent
    if W > 0:
        ref = int(vals[i]); assert comps[i] == C_REF, (i, comps[i]); i += 1
        struct += 1
        if ref > 0:
            parent = x - ref
            refd = ring_deg[parent % (W + 1)]
            bc = int(vals[i]); assert comps[i] == C_BC; i += 1
            struct += 1
            if bc == 0:
                if refd > 0:
                    copy_runs.append((0, refd))
                copied = refd
            else:
                bsum = 0
                for k in range(bc):
                    b = int(vals[i]) + (1 if k > 0 else 0)
                    assert comps[i] == C_BLK; i += 1
                    struct += 1
                    if k % 2 == 0:
                        if b > 0:
                            copy_runs.append((bsum, b))
                        copied += b
                    bsum += b
                if bc % 2 == 0:
                    if refd - bsum > 0:
                        copy_runs.append((bsum, refd - bsum))
                    copied += refd - bsum
    extra = d - copied
    if extra > 0 and mi != 0:
        niv = int(vals[i]); assert comps[i] == C_IC; i += 1
        struct += 1
        ivl = 0
        for k in range(niv):
            v = int(vals[i]); assert comps[i] == C_IS; i += 1
            left = x + nat2int(v) if k == 0 else ivl + 1 + v
            v2 = int(vals[i]); assert comps[i] == C_IL; i += 1
            ln = v2 + mi
            iv_runs.append((left, ln))
            ivl = left + ln
            extra -= ln
            struct += 2
    if extra > 0:
        v = int(vals[i]); assert comps[i] == C_FR; i += 1
        prev = x + nat2int(v)
        res.append(prev)
        for _ in range(extra - 1):
            v = int(vals[i]); assert comps[i] == C_RES; i += 1
            prev = prev + v + 1
            res.append(prev)
    return i, d, copy_runs, iv_runs, res, struct, parent


def simulate_lane(nodes, parsed, T, Q=(64, 64, 64, 8), real_start=0,
                  out_base_ring=None):
    """Step-accurate simulation of one lane. nodes: list of node ids in
    order (halo first). parsed: dict x -> parse_node output. Returns
    (steps, holes, emitted rows list[(x, value|None)], dirty set,
    stats)."""
    QC, QI, QR, QN = Q
    qc, qi, qr, qn = [], [], [], []   # copy runs, iv runs, residuals, node meta
    # decode side state
    di = 0              # node index being decoded
    tok_pos = 0         # token position within current node's "schedule"
    # we re-derive a per-node decode schedule: struct tokens first
    # (1 step each), then residual tokens (1 step each). Run enqueues
    # happen at their struct step; node meta enqueues at first-res (or
    # struct end).
    out_rows = []       # (x, value) emitted; value None = hole
    base = {}           # node -> output base row (lane-local)
    dirty = set()
    # emission side
    ei = None           # current node meta being emitted
    steps = holes = 0
    d_sched = None

    def mk_sched(x):
        (d, cr, ir, rs, struct, parent) = parsed[x]
        # events at decode steps: list of ("run", kind, payload) executed
        # at given struct step; meta ready after first res decode (or
        # struct end when no residuals)
        ev = []
        # copy runs enqueue spread across their block steps; approximate:
        # attach runs to consecutive early struct steps (enqueue rate <=
        # 2/step in the kernel; 1/step here is conservative)
        si = min(2, struct - 1)
        for r in cr:
            ev.append((si, "c", r)); si = min(si + 1, struct - 1)
        for r in ir:
            ev.append((si, "i", r)); si = min(si + 2, struct - 1)
        nres = len(rs)
        meta_step = struct + (1 if nres else 0) - 1
        # queue-overflow nodes: high-water rule — the kernel enqueues the
        # node's meta EARLY with a dirty flag when run enqueues would
        # overflow, and emission switches to grouped/placeholder mode
        # (no merge-gating, queue drains as decode fills). Static
        # approximation here: flag by run counts.
        overflow = len(cr) > QC - 8 or len(ir) > QI - 8
        if overflow:
            meta_step = min(2, struct - 1)
        return dict(d=d, cr=cr, ir=ir, rs=rs, struct=struct,
                    parent=parent, nres=nres, ev=ev, overflow=overflow,
                    meta_step=meta_step, x=x)

    sched = [mk_sched(x) for x in nodes]
    # decode cursor
    dnode = 0
    dstep = 0           # step within node schedule (struct then residuals)
    res_emitted_to_q = 0
    max_qc = max_qi = max_qr = max_qn = 0
    stall_decode = 0

    em_node = None      # emission: current node dict
    em_state = None

    budget = 50 * sum(s["struct"] + s["nres"] + s["d"] for s in sched) + 1000
    while True:
        decode_done = dnode >= len(sched)
        emit_active = em_node is not None or qn
        if decode_done and not emit_active:
            break
        steps += 1
        if steps > budget:
            raise RuntimeError(
                f"sim stuck: dnode={dnode}/{len(sched)} qn={len(qn)} "
                f"qc={len(qc)} qi={len(qi)} qr={len(qr)} em={em_node and em_node['x']}")
        # ---------------- decode substep ----------------
        if not decode_done:
            s = sched[dnode]
            stalled = False
            if dstep < s["struct"]:
                # struct token step: enqueue any events at this step
                evs = ([] if s["overflow"]
                       else [e for e in s["ev"] if e[0] == dstep])
                need_c = sum(1 for e in evs if e[1] == "c")
                need_i = sum(1 for e in evs if e[1] == "i")
                meta_full = (dstep == s["meta_step"] and len(qn) >= QN)
                if len(qc) + need_c > QC or len(qi) + need_i > QI or meta_full:
                    stalled = True
                else:
                    for _, k, r in evs:
                        (qc if k == "c" else qi).append((s["x"], r))
            else:
                # residual token step
                ri = dstep - s["struct"]
                meta_full = (dstep == s["meta_step"] and len(qn) >= QN)
                if len(qr) >= QR or meta_full:
                    stalled = True
                else:
                    qr.append((s["x"], s["rs"][ri]))
            if not stalled and dstep == s["meta_step"]:
                qn.append(s)
            if not stalled:
                dstep += 1
                ntok = s["struct"] + s["nres"]
                if dstep >= ntok:
                    dnode += 1
                    dstep = 0
            else:
                stall_decode += 1
        # ---------------- emission substep ----------------
        emitted = False
        if em_node is None and qn:
            em_node = qn.pop(0)
            x = em_node["x"]
            em_state = dict(ci=0, coff=0, ii=0, ioff=0, rleft=em_node["nres"],
                            emitted=0, dirty=False, first=True)
            if em_node.get("overflow"):
                em_state["dirty"] = True
                dirty.add(x)
            # dirty checks: ring distance + tainted parent
            if em_node["cr"]:
                p = em_node["parent"]
                if p in dirty:
                    em_state["dirty"] = True
                pb = base.get(p)
                if pb is None:
                    em_state["dirty"] = True   # cross-lane parent
                else:
                    first_src = pb + em_node["cr"][0][0]
                    if (len(out_rows) + em_node["d"]) - first_src > T:
                        em_state["dirty"] = True
                if em_state["dirty"]:
                    dirty.add(x)
            if em_node["d"] == 0:
                em_node = None      # zero-degree: consumes this step
                holes += 1
                out_rows.append((C_EMPTY, x, 0))
                continue
            if em_state["dirty"]:
                # refinfo row occupies the pop step; elements follow
                ref = x - em_node["parent"] if em_node["parent"] >= 0 else 0
                base[x] = len(out_rows) + 1
                out_rows.append((C_REFINFO, x, ref))
                continue
            base[x] = len(out_rows)
        if em_node is not None:
            st = em_state
            x = em_node["x"]
            # candidate heads
            hc = hi = hr = None
            if st["ci"] < len(em_node["cr"]):
                src0, ln = em_node["cr"][st["ci"]]
                p = em_node["parent"]
                pb = base.get(p, 0)
                row = pb + src0 + st["coff"]
                if row < len(out_rows) and out_rows[row][0] in (
                        C_EL, C_FIRST, C_PLACE):
                    hc = out_rows[row][2]
                else:
                    hc = -1  # unresolvable; dirty path emits placeholder
            if st["ii"] < len(em_node["ir"]):
                left, ln = em_node["ir"][st["ii"]]
                hi = left + st["ioff"]
            if st["rleft"] > 0:
                # head residual must belong to this node and be present
                if qr and qr[0][0] == x:
                    hr = qr[0][1]
            can_emit = True
            if st["rleft"] > 0 and hr is None:
                can_emit = False       # residual head not decoded yet
            if st["dirty"]:
                # grouped emission: copies (placeholders), intervals, res
                code = C_EL
                if st["ci"] < len(em_node["cr"]):
                    val = em_node["cr"][st["ci"]][0] + st["coff"]  # j
                    code = C_PLACE
                    st["coff"] += 1
                    if st["coff"] == em_node["cr"][st["ci"]][1]:
                        st["ci"] += 1; st["coff"] = 0
                elif hi is not None:
                    val = hi
                    st["ioff"] += 1
                    if st["ioff"] == em_node["ir"][st["ii"]][1]:
                        st["ii"] += 1; st["ioff"] = 0
                elif hr is not None:
                    val = hr; qr.pop(0); st["rleft"] -= 1
                else:
                    val = None
                if val is not None:
                    out_rows.append((code, x, val)); emitted = True
                    st["emitted"] += 1
            elif can_emit:
                best, kind = None, None
                for v, k in ((hc, "c"), (hi, "i"), (hr, "r")):
                    if v is not None and (best is None or v < best):
                        best, kind = v, k
                if best is not None:
                    code = C_FIRST if st["first"] else C_EL
                    st["first"] = False
                    out_rows.append((code, x, best)); emitted = True
                    st["emitted"] += 1
                    if kind == "c":
                        st["coff"] += 1
                        if st["coff"] == em_node["cr"][st["ci"]][1]:
                            st["ci"] += 1; st["coff"] = 0
                    elif kind == "i":
                        st["ioff"] += 1
                        if st["ioff"] == em_node["ir"][st["ii"]][1]:
                            st["ii"] += 1; st["ioff"] = 0
                    else:
                        qr.pop(0); st["rleft"] -= 1
            if st["emitted"] == em_node["d"]:
                # node complete: drop its run-queue entries (the kernel
                # consumes them as it emits; the sim reads runs from the
                # parsed lists, so drop by node id here)
                qc = [e for e in qc if e[0] != x]
                qi = [e for e in qi if e[0] != x]
                em_node = None
        if not emitted:
            holes += 1
            out_rows.append((C_HOLE, 0, 0))
        max_qc = max(max_qc, len(qc)); max_qi = max(max_qi, len(qi))
        max_qr = max(max_qr, len(qr)); max_qn = max(max_qn, len(qn))
    stats = dict(max_qc=max_qc, max_qi=max_qi, max_qr=max_qr,
                 max_qn=max_qn, stall_decode=stall_decode)
    return steps, holes, out_rows, dirty, stats


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    W, MR, MI = 7, 3, 2
    adj, props = load_bvgraph(CNR)
    n = adj.num_nodes
    hist1 = _run_histogram_pass(adj, W, MR, MI, estimators.LOG2,
                                estimators.empty_tables())
    tables = estimators.entropy_tables(build_model(hist1, 12))
    vals, comps = dump_tokens(adj, W, MR, MI, tables)
    print(f"tokens: {len(vals)} ({len(vals)/adj.num_arcs:.3f}/arc)", flush=True)

    # parse every node once (sequential, maintaining outdegree ring)
    ring = [0] * (W + 1)
    parsed = {}
    i = 0
    t0 = time.time()
    for x in range(n):
        i2, d, cr, ir, rs, struct, parent = parse_node(
            vals, comps, i, x, ring, W, MI)
        parsed[x] = (d, cr, ir, rs, struct, parent)
        ring[x % (W + 1)] = d
        i = i2
    assert i == len(vals)
    print(f"parsed all nodes in {time.time()-t0:.1f}s", flush=True)

    ncr = np.array([len(parsed[x][1]) for x in range(n)])
    nir = np.array([len(parsed[x][2]) for x in range(n)])
    print(f"copy runs/node: max {ncr.max()} p99.99 "
          f"{np.percentile(ncr, 99.99):.0f} | iv runs/node: max {nir.max()} "
          f"p99.99 {np.percentile(nir, 99.99):.0f}", flush=True)

    # ground truth check on a full single-lane merge + lane stats
    offs = adj.offsets.astype(np.int64)
    H = int(os.environ.get("WGT_PROTO_H", W * 3))  # halo nodes (0 = none)
    if os.environ.get("WGT_PROTO_GREEDY") == "1":
        # greedy halo-aware split: each lane's step estimate = halo
        # elements + own elements + alpha * nodes; open a new lane when
        # the estimate reaches the global target
        a = float(os.environ.get("WGT_PROTO_ALPHA", "2"))
        halo_el = offs[np.arange(n + 1)] - offs[np.maximum(np.arange(n + 1) - H, 0)]
        def split(target):
            blist = [0]
            acc = halo_el[0]
            for x in range(n):
                w = (offs[x + 1] - offs[x]) + a
                if acc + w > target and x > blist[-1]:
                    if len(blist) == L:
                        return None
                    blist.append(x)
                    acc = halo_el[x]
                acc += w
            while len(blist) < L + 1:
                blist.append(n)
            return np.array(blist, np.int64)

        lo = float((offs[-1] + a * n) / L)
        hi = lo * 8 + float(halo_el.max()) + 4000
        for _ in range(40):
            mid = (lo + hi) / 2
            if split(mid) is None:
                lo = mid
            else:
                hi = mid
        bounds = split(hi)
    elif os.environ.get("WGT_PROTO_ELBAL") == "1":
        # element-balanced lane bounds (meta-cached degrees in the plan)
        a = float(os.environ.get("WGT_PROTO_ALPHA", "0"))
        work = offs + a * np.arange(n + 1)
        targets = np.linspace(0, work[-1], L + 1)
        bounds = np.searchsorted(work, targets).astype(np.int64)
        bounds[0], bounds[-1] = 0, n
    else:
        bounds = np.linspace(0, n, L + 1).astype(np.int64)
    tot_steps = []
    tot_holes = 0
    tot_elems = 0
    all_dirty = set()
    mism = 0
    t0 = time.time()
    for li in range(L):
        s, e = int(bounds[li]), int(bounds[li + 1])
        hs = max(s - H, 0)
        nodes = list(range(hs, e))
        steps, holes, rows, dirty, stats = simulate_lane(
            nodes, parsed, T, real_start=s)
        tot_steps.append(steps)
        tot_holes += holes
        tot_elems += int(offs[e] - offs[s])
        all_dirty |= {x for x in dirty if x >= s}
        # verify each real node's slice
        if li % 64 == 0 or li == L - 1:
            per = {}
            cur = None
            for code, xv, v in rows:
                if code in (C_FIRST, C_REFINFO, C_EMPTY):
                    cur = xv
                if code in (C_EL, C_FIRST):
                    per.setdefault(cur, []).append(v)
            for x in range(s, e):
                want = adj.succs[offs[x]:offs[x + 1]].astype(np.int64).tolist()
                got = per.get(x, [])
                if x not in all_dirty and got != want:
                    mism += 1
                    if mism < 4:
                        print(f"MISMATCH node {x}: got {got[:8]} want {want[:8]}")
    steps_arr = np.array(tot_steps)
    print(f"L={L} T={T}: steps max {steps_arr.max()} mean {steps_arr.mean():.0f} "
          f"(cap_e/arc = {steps_arr.max()*L/adj.num_arcs:.3f})")
    print(f"holes {tot_holes} ({tot_holes/(tot_elems+tot_holes)*100:.1f}% of rows)")
    print(f"dirty nodes: {len(all_dirty)}")
    print(f"verify mismatches (sampled lanes): {mism}")
    print(f"sim time {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()


def emit_channels(adj, W=7, MR=3, MI=2, L=8, T=1024, alpha=2.0,
                  tables=None):
    """Runs the simulator over all lanes of `adj` and packs the kernel
    output contract channels (see ops/emit_post.py): returns
    (val u32 [S, L], xch u32 [S, L], nib u32 [S//8, L], lane_of [n],
    bounds [L+1], dirty set). Test harness for the post-pass."""
    n = adj.num_nodes
    hist1 = _run_histogram_pass(adj, W, MR, MI, estimators.LOG2,
                                estimators.empty_tables())
    tb = tables or estimators.entropy_tables(build_model(hist1, 12))
    vals, comps = dump_tokens(adj, W, MR, MI, tb)
    ring = [0] * (W + 1)
    parsed = {}
    i = 0
    for x in range(n):
        i2, d, cr, ir, rs, struct, parent = parse_node(
            vals, comps, i, x, ring, W, MI)
        parsed[x] = (d, cr, ir, rs, struct, parent)
        ring[x % (W + 1)] = d
        i = i2
    offs = adj.offsets.astype(np.int64)
    work = offs + alpha * np.arange(n + 1)
    targets = np.linspace(0, work[-1], L + 1)
    bounds = np.searchsorted(work, targets).astype(np.int64)
    bounds[0], bounds[-1] = 0, n
    lanes = []
    dirty_all = set()
    for li in range(L):
        s, e = int(bounds[li]), int(bounds[li + 1])
        steps, holes, rows, dirty, _ = simulate_lane(
            list(range(s, e)), parsed, T, real_start=s)
        lanes.append(rows)
        dirty_all |= dirty
    S = -(-max(max((len(r) for r in lanes), default=1), 1) // 8) * 8
    val = np.zeros((S, L), np.uint32)
    xch = np.zeros((S, L), np.uint32)
    codes = np.full((S, L), 0xF, np.uint32)
    for li, rows in enumerate(lanes):
        for r, (c, xv, v) in enumerate(rows):
            codes[r, li] = c
            val[r, li] = np.uint32(v)
            xch[r, li] = np.uint32(xv)
    shifts = (np.arange(S) % 8) * 4
    nib = np.zeros((S // 8, L), np.uint32)
    for k in range(8):
        nib |= (codes[k::8, :] << np.uint32(4 * k))
    lane_of = np.zeros(n, np.int32)
    for li in range(L):
        lane_of[bounds[li]:bounds[li + 1]] = li
    return val, xch, nib, lane_of, bounds, dirty_all
