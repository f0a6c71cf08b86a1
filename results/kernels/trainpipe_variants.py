"""Round-4b micro-benchmarks of the C=3 image-pipeline ops (training).

The flagship train trace (results/train_throughput/train_ops_flagship
.json) shows the image-side ops running at 3/128 lane utilization:
the pyramid reshape-mean reduce at 4.5 GB/s (4.6 ms/step), the
normalize mul at ~12 GB/s (4.2 ms/step) and the two shear-warp passes
at ~16 GB/s effective (8.5 ms/step).  This measures isolated variants
at the training shapes (B=32, 240x360x3):

  pyramid: reshape-mean (current) vs nn.avg_pool (reduce_window) vs a
    depthwise 2x2/stride-2 conv (convs get XLA's dedicated 3-channel
    image handling — space-to-depth — which elementwise ops do not);
  warp: production two-pass shear vs a T=32 row-block variant (halves
    the grid steps; per-row hat-build work is unchanged).

Usage: python results/kernels/trainpipe_variants.py
Writes results/kernels/trainpipe_variants.json.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from jointpose.devtime import measure_device_time

B, H, W, C = 32, 240, 360, 3


def pyramid_reshape_mean(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.mean(x, axis=(2, 4), dtype=x.dtype)


def pyramid_avg_pool(x):
    from flax import linen as nn

    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2), padding="SAME")


def pyramid_depthwise_conv(x):
    c = x.shape[-1]
    kern = jnp.full((2, 2, 1, c), 0.25, x.dtype)
    return lax.conv_general_dilated(
        x, kern, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def normalize(x):
    return (x.astype(jnp.bfloat16) - 0.5) * 2.0


def normalize_flat(x):
    # Same math on a flattened view — does freeing the layout help?
    b, h, w, c = x.shape
    return ((x.reshape(b, h * w * c).astype(jnp.bfloat16) - 0.5) * 2.0
            ).reshape(b, h, w, c)


def main():
    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    x32 = jax.block_until_ready(x32)
    rows = {}

    def time_it(name, fn, *args):
        def bench_fn(*a):
            return fn(*a)

        try:
            t = measure_device_time(jax.jit(bench_fn), *args, iters=8,
                                    warmup=2, program_name="bench_fn")
        except Exception as e:
            rows[name] = f"FAILED: {type(e).__name__}: {str(e)[:160]}"
            print(f"{name}: {rows[name]}", flush=True)
            return
        ms = None if t is None else round(t.median_run_s * 1e3, 3)
        rows[name] = ms
        print(f"{name}: {ms} ms", flush=True)

    # Pyramid variants on the normalized bf16 tensor (as in the model).
    xb = jax.block_until_ready(((x32 - 0.5) * 2.0).astype(jnp.bfloat16))
    time_it("pyramid_reshape_mean_bf16", pyramid_reshape_mean, xb)
    time_it("pyramid_avg_pool_bf16", pyramid_avg_pool, xb)
    time_it("pyramid_depthwise_conv_bf16", pyramid_depthwise_conv, xb)

    # Normalize variants (fp32 in, bf16 out — the Detector's ingest).
    time_it("normalize", normalize, x32)
    time_it("normalize_flat", normalize_flat, x32)

    # Warp row-block variants.
    from jointpose.ops import warp_pallas as wp

    a_inv = jnp.tile(jnp.asarray([[0.95, 0.08], [-0.06, 1.02]], jnp.float32),
                     (B, 1, 1))
    b_inv = jnp.tile(jnp.asarray([3.0, -2.0], jnp.float32), (B, 1))
    # Row-major orientation (the rounds-3/4 production kernel; kept as
    # shear_warp_rowmajor after the round-5 flip).
    time_it("shear_warp_t16", wp.shear_warp_rowmajor, x32, a_inv, b_inv)

    orig = wp._row_block
    try:
        wp._row_block = lambda n: 32 if n % 32 == 0 else orig(n)
        time_it("shear_warp_t32", wp.shear_warp_rowmajor, x32, a_inv, b_inv)
        wp._row_block = lambda n: 8
        time_it("shear_warp_t8", wp.shear_warp_rowmajor, x32, a_inv, b_inv)
    finally:
        wp._row_block = orig

    # Round 5: channel-in-sublane operand orientation — full resample
    # axis in MXU lanes ((C, S_in) @ (S_in, S_out) per row), XLA
    # transposes between passes (included in the timing).  This is now
    # the production shear_warp (the 8x measured win below is why).
    time_it("shear_warp_csub_t16", wp.shear_warp, x32, a_inv, b_inv)
    try:
        wp._row_block = lambda n: 32 if n % 32 == 0 else orig(n)
        time_it("shear_warp_csub_t32", wp.shear_warp, x32, a_inv, b_inv)
    finally:
        wp._row_block = orig

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "trainpipe_variants.json"), "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print("wrote trainpipe_variants.json")


if __name__ == "__main__":
    main()
