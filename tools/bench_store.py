"""Bench artifact builder subprocess.

Builds the bench's cnr artifacts — serial + block-parallel layouts
(shared model passes), the phase-sampled variant, and the pass-1
estimator tables — in a process of its own. The block layout's pass 3
runs the DEVICE encode kernel, and the bench parent must never touch
the device: a parent that holds an idle axon relay connection while
its measurement subprocesses use the chip degrades them wildly
(hc emit measured 143 ms/rep under a device-holding parent vs 76
standalone; a direct repro wedged the child outright).

Usage: bench_store.py BASE OUT LANES EST_PKL REPORT_JSON
Prints one JSON line {"sizes": {...}, "phases_bytes": N,
"phases_step8_bytes": N}.
"""

import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    base, out, lanes, est_path, report_path = sys.argv[1:6]
    lanes = int(lanes)
    import numpy as np

    from webgraph_ans_tpu.ans.prelude import save_pointers, save_states
    from webgraph_ans_tpu.bvgraph.store import store_layouts

    res_serial, res_blk = store_layouts(
        base, [(out, 1), (out + "-blk", lanes)])
    with open(est_path, "wb") as f:
        pickle.dump(res_blk.est_tables, f)
    with open(report_path, "w") as f:
        json.dump(res_blk.report, f)

    # phase sampling sizes (reference authors' open problem: phases at
    # 2.4-3.4x BVGraph's offsets; step=8 shrinks them ~7x)
    n = res_blk.prelude.num_nodes
    keep = (n - 1 - np.arange(0, n, 8))[::-1]
    save_states(out + "-ps8", np.ascontiguousarray(res_blk.states[keep]))
    save_pointers(out + "-ps8",
                  np.ascontiguousarray(res_blk.pointers[keep]))
    sizes = {tag: os.path.getsize(out + suffix + ".ans")
             for tag, suffix in (("serial", ""), ("block", "-blk"))}
    phases_b = (os.path.getsize(out + ".pointers")
                + os.path.getsize(out + ".states"))
    ps8_b = (os.path.getsize(out + "-ps8.pointers")
             + os.path.getsize(out + "-ps8.states"))
    print(json.dumps({"sizes": sizes, "phases_bytes": phases_b,
                      "phases_step8_bytes": ps8_b}))


if __name__ == "__main__":
    main()
