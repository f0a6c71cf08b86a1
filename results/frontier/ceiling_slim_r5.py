"""Per-op floor analysis for flagship_slim (round-4 verdict weak #3).

flagship_slim is the repo's highest-throughput point (23.1k img/s
measured round 4) but only 81% of its assumed-util roofline with util
0.46 vs the flagship's 0.547 — nearly the same architecture, so the
gap needed naming.  Same method as ceiling_r4: per traced op,

    floor(op) = max( flops / (197 TFLOP/s x 0.926), bytes / 819 GB/s )

untraced remainder charged at its measured rate.

Usage: python results/frontier/ceiling_slim_r5.py
Writes results/frontier/ceiling_slim_r5.json.
"""

import json
import os
import sys

here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(here)))
sys.path.insert(0, here)

from ceiling_r4 import analyze


def main() -> None:
    import measure_frontier as mf

    row = mf.measure("flagship_slim", 128, ops_detail=True)
    out = analyze(row)
    out["method"] = (
        "floor(op) = max(flops/(197T*0.926), bytes/819GB/s) per traced op "
        "(XLA cost-analysis flops/bytes; CostEstimate for Pallas), "
        "untraced remainder at measured rate — ceiling_r4's method "
        "applied to the highest-throughput preset."
    )
    path = os.path.join(here, "ceiling_slim_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k != "per_op"}, indent=1))


if __name__ == "__main__":
    main()
