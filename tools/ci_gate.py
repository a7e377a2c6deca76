"""CI / regression gate: one command that must stay green between rounds.

Runs the test suite, then compresses cnr-2000 and asserts the two
regression invariants the framework must never lose (reference analog:
.github/workflows/rust.yml, which gates build+test; this additionally
gates compression quality):

  1. bits/link <= BITS_LINK_MAX (2.630; reference-band on cnr-2000,
     BVGraph is 2.897),
  2. serial CPU decode ns/arc <= NS_ARC_MAX (a loose 2x guard over the
     measured ~25-35 ns/arc; the TPU number is gated by the driver's
     BENCH_r{N}.json history instead, since this gate must also run on
     CPU-only workers).

Usage:  python tools/ci_gate.py [--skip-tests]
Exit code 0 = gate passed.
"""

import os
import subprocess
import sys
import tempfile
import time

BITS_LINK_MAX = 2.630
NS_ARC_MAX = 90.0

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if "--skip-tests" not in sys.argv:
        print("[gate] pytest ...", flush=True)
        r = subprocess.run([sys.executable, "-m", "pytest", "tests/", "-x", "-q"],
                           cwd=ROOT)
        if r.returncode:
            print("[gate] FAIL: test suite red")
            return 1

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, ROOT)
    from webgraph_ans_tpu.bvgraph.properties import load_bvgraph
    from webgraph_ans_tpu.bvgraph.sequential import ANSBvGraphSeq
    from webgraph_ans_tpu.bvgraph.store import store
    from webgraph_ans_tpu.ans.prelude import Prelude

    base = os.path.join(ROOT, "tests", "data", "cnr-2000", "cnr-2000")
    out = os.path.join(tempfile.mkdtemp(prefix="wgt_gate_"), "cnr-2000")
    store(base, out)
    prelude = Prelude.load(out)
    adj, _ = load_bvgraph(base)
    bits = os.path.getsize(out + ".ans") * 8 / adj.num_arcs
    print(f"[gate] bits/link = {bits:.3f} (max {BITS_LINK_MAX})")
    if bits > BITS_LINK_MAX:
        print("[gate] FAIL: compression regressed")
        return 1

    seq = ANSBvGraphSeq(prelude)
    t0 = time.time()
    got = seq.decode_all()
    ns = (time.time() - t0) / adj.num_arcs * 1e9
    print(f"[gate] serial decode = {ns:.1f} ns/arc (max {NS_ARC_MAX})")
    if ns > NS_ARC_MAX:
        print("[gate] FAIL: serial decode regressed")
        return 1
    if not (got.offsets == adj.offsets).all() or not (got.succs == adj.succs).all():
        print("[gate] FAIL: decode not bit-exact")
        return 1
    print("[gate] PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
