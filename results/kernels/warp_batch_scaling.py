"""Batch-scaling probe for the production shear warp.

train_ceiling.json shows the two warp Pallas passes 8-10x over their
pure-bytes HBM floors inside the fused K=10 train dispatch (1.45
ms/step at batch 32).  The obvious amortization — hoist the
augmentation warp out of the lax.scan (it depends only on (seed,
step), not params) and warp all K batches in ONE batch-320 kernel —
only helps if the kernel is overhead-bound, i.e. scales sublinearly
with batch.

Measured result (2026-08-20, v5e-class chip, 240x360x3 fp32):

    batch  32:  1.595 ms   49.9 us/img
    batch  64:  3.384 ms   52.9 us/img
    batch 128:  7.487 ms   58.5 us/img
    batch 320: 18.751 ms   58.6 us/img

Linear-to-slightly-superlinear: batch 32 is the kernel's BEST
operating point, so the scan hoist is a measured negative.  The
kernel's cost is the per-row hat-matrix construction on the VPU
(~0.5 GFLOP/img/pass of elementwise max/abs/sub to build the 360x360
resample weights), which scales with pixels, not invocations — the
"overhead" over the byte floor is irreducible VPU compute, already
minimized by the round-5 channel-in-sublane orientation sweep
(12.67 -> 1.60 ms; ops/warp_pallas.py).

Usage: python results/kernels/warp_batch_scaling.py
Writes results/kernels/warp_batch_scaling.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from jointpose.devtime import measure_device_time
from jointpose.ops.warp_pallas import shear_warp
from jointpose.perf import aot_compile


def main():
    assert jax.default_backend() != "cpu"
    rng = np.random.RandomState(0)
    rows = []
    for b in (32, 64, 128, 320):
        imgs = jnp.asarray(rng.rand(b, 240, 360, 3), jnp.float32)
        a = jnp.asarray(
            np.tile(np.eye(2) * 1.05, (b, 1, 1)) + rng.randn(b, 2, 2) * 0.03,
            jnp.float32)
        off = jnp.asarray(rng.randn(b, 2) * 3, jnp.float32)
        compiled, _ = aot_compile(jax.jit(shear_warp), imgs, a, off)
        t = measure_device_time(compiled, imgs, a, off, iters=8, warmup=2)
        assert t is not None
        ms = t.median_run_s * 1e3
        row = {"batch": b, "device_ms": round(ms, 3),
               "us_per_img": round(ms / b * 1e3, 1)}
        print(json.dumps(row), flush=True)
        rows.append(row)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "warp_batch_scaling.json"), "w") as f:
        json.dump({"image_hw": [240, 360], "rows": rows}, f, indent=1)
        f.write("\n")
    print("wrote warp_batch_scaling.json")


if __name__ == "__main__":
    main()
