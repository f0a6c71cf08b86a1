"""Round-4 per-op ceiling analysis of the paper topology (verdict #1).

Round 3 proved 10k img/s IMPOSSIBLE for the letter-faithful topology
(needs 235 TFLOP/s vs the 197 peak) but left a 2.2x gap between the
measured row and `ceiling.json`'s "measured-utilization ceiling" of
7,751 img/s.  That ceiling was computed as (total FLOPs) / (peak x
best-ever-measured util) — a FLOP-only bound that silently grants
bandwidth-bound ops (the trunk's maxpools, conv0 on the 3-channel
input, the head's spectrum streams) compute-bound speed they cannot
have.  This script replaces it with a per-op floor:

    floor(op) = max( flops / (197 TFLOP/s x 0.926),   # best measured MXU
                     bytes / 819 GB/s )               # HBM peak

summed over the traced program (plus the untraced remainder at its
measured rate), where flops/bytes are XLA cost-analysis values per op
(CostEstimate for Pallas ops).  The result is the honest ceiling: what
this program could do if EVERY op hit the best utilization this rig
has ever measured on its binding resource.

Usage: python results/frontier/ceiling_r4.py   (writes ceiling_r4.json)
"""

import json
import os
import sys

here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(here)))
sys.path.insert(0, here)

PEAK_BF16 = 197e12
BEST_MXU_UTIL = 0.926  # head_direct_bf16, results/kernels/kernel_times.json
HBM = 819e9


def analyze(row: dict) -> dict:
    batch = row["batch"]
    total_ms = row["device_ms_per_batch"]
    ops = []
    traced_ms = 0.0
    floor_ms = 0.0
    for op in row["top_ops"]:
        ms = op["ms_per_run"]
        fl = op["gflop_per_run"] * 1e9
        by = op["mb_per_run"] * 1e6
        f_mxu = fl / (PEAK_BF16 * BEST_MXU_UTIL) * 1e3
        f_hbm = by / HBM * 1e3
        floor = max(f_mxu, f_hbm)
        traced_ms += ms
        floor_ms += floor
        ops.append({
            "op": op["tf_op"].replace("jit(forward)/PoseModel/", "")[:64],
            "source": op["source"].split("/")[-1],
            "measured_ms": round(ms, 3),
            "floor_ms": round(floor, 3),
            "binding": "mxu" if f_mxu >= f_hbm else "hbm",
            "x_over_floor": round(ms / floor, 2) if floor > 0 else None,
        })
    untraced_ms = total_ms - traced_ms
    # Untraced remainder (small ops below the top-20 cut): charged at
    # its measured rate — no basis to claim it can improve.
    ceiling_ms = floor_ms + untraced_ms
    return {
        "batch": batch,
        "measured_ms_per_batch": total_ms,
        "measured_images_per_sec": row["measured_images_per_sec"],
        "traced_ms": round(traced_ms, 2),
        "untraced_ms_at_measured_rate": round(untraced_ms, 2),
        "sum_of_op_floors_ms": round(floor_ms, 2),
        "ceiling_ms_per_batch": round(ceiling_ms, 2),
        "ceiling_images_per_sec": round(batch / ceiling_ms * 1e3, 1),
        "gap_to_ceiling": round(total_ms / ceiling_ms, 2),
        "per_op": ops,
    }


def main() -> None:
    import measure_frontier as mf

    row = mf.measure("joint", 128, ops_detail=True)
    out = analyze(row)
    out["method"] = (
        "floor(op) = max(flops/(197T*0.926), bytes/819GB/s) per traced op "
        "(XLA cost-analysis flops/bytes; CostEstimate for Pallas), "
        "untraced remainder at measured rate. Replaces ceiling.json's "
        "FLOP-only 7,751 img/s figure, which granted bandwidth-bound ops "
        "compute-bound speed."
    )
    out["residual_notes"] = {
        "trunk_convs": "conv1/conv2 fusions measure 172-188 TFLOP/s = "
            "87-95% of peak: at their floor already.",
        "trunk_pools": "reduce_window_max fusions measure 713 GB/s = 87% "
            "of HBM peak on 2.65 GB/batch of full-resolution feature "
            "traffic; the maxpool trunk IS the letter-faithful topology "
            "(the flagship's stride-conv trunk removes this traffic and "
            "is the production answer).",
        "head_tail": "the fused Fourier tail now runs the (TB=32, "
            "CoT=128) resident tiling (5.85 ms, was 6.8 at TB=16): the "
            "round-4b sweep (results/kernels/tail_sweep.json) found the "
            "old VMEM pre-filter - not Mosaic - was the blocker, and "
            "time tracks grid-step count (TB=32: 800 steps / 5.85 ms, "
            "TB=16: 1600 / 6.80, TB=8: 3200 / 9.41).  The next tile up "
            "(TB=64) fails the Mosaic compile; layout variants (merged "
            "re/im, contiguous-out, batch-major X - results/kernels/"
            "tail_variants.json) measured neutral-to-worse, so 5.85 ms "
            "is the best KNOWN-ACHIEVABLE, not the physical floor.",
        "head_spectra": "forward/inverse DFT einsum fusions measure "
            "626-714 GB/s = 76-87% of HBM peak on their spectrum "
            "streams: near their floors.",
    }
    path = os.path.join(here, "ceiling_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k != "per_op"}, indent=1))


if __name__ == "__main__":
    main()
