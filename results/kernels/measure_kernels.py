"""Measured device time of every hot-kernel implementation variant.

Round-3 capability: jointpose/devtime.py gives real per-op device
times, and the first measured breakdown of the paper topology showed
the two Pallas kernels are its SLOWEST ops (head kdft tail 36 TFLOP/s,
fused Fourier MRF 14.6 TFLOP/s) while XLA's convs run at ~90% MXU —
the round-2 cost model scored traffic, not time.  This script times
each implementation of (a) the 9x9x512 head conv and (b) the stride-1
(45, 67) MRF message pass in isolation at production geometry/batch, so
impl selection and tile-shape work is driven by measurement.

Usage: python results/kernels/measure_kernels.py [batch]
Writes results/kernels/kernel_times.json.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.lax as lax
import jax.numpy as jnp

from jointpose.devtime import measure_device_time
from jointpose.perf import PEAK_BF16_FLOPS, aot_compile


def time_fn(name: str, fn, *args, algo_flops: float) -> dict:
    jitted = jax.jit(fn)
    compiled, cost = aot_compile(jitted, *args)
    # program_name=None: devtime unwraps the executable's real HLO
    # module name (the trace events are named jit_<module>, not after
    # our display label).
    t = measure_device_time(compiled, *args, iters=6, warmup=2)
    if t is None:
        return {"name": name, "error": "no device events"}
    ms = t.median_run_s * 1e3
    row = {
        "name": name,
        "device_ms": round(ms, 3),
        "cost_gflop": round(cost["flops"] / 1e9, 1),
        "cost_mb": round(cost["bytes"] / 1e6, 1),
        "algo_gflop": round(algo_flops / 1e9, 1),
        "tflops_vs_cost": round(cost["flops"] / t.median_run_s / 1e12, 1),
        "mxu_util": round(cost["flops"] / t.median_run_s / PEAK_BF16_FLOPS, 3),
    }
    print(json.dumps(row), flush=True)
    return row


def head_conv_variants(batch: int) -> list[dict]:
    from jointpose.ops.fft_conv import fft_conv2d

    h, w, ci, co, k = 60, 90, 128, 512, 9
    rngs = jax.random.split(jax.random.PRNGKey(0), 2)
    x = (jax.random.normal(rngs[0], (batch, h, w, ci)) * 0.5).astype(jnp.bfloat16)
    kern = (jax.random.normal(rngs[1], (k, k, ci, co)) * 0.05).astype(jnp.float32)
    direct_flops = 2.0 * batch * h * w * k * k * ci * co

    def direct(x, kern):
        return lax.conv_general_dilated(
            x, kern.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    rows = [
        time_fn("head_direct_bf16", direct, x, kern, algo_flops=direct_flops),
        time_fn(
            "head_fft_xla_tail",
            functools.partial(fft_conv2d, pallas_tail=False),
            x, kern, algo_flops=direct_flops,
        ),
        time_fn(
            "head_fft_pallas_tail",
            functools.partial(fft_conv2d, pallas_tail=True),
            x, kern, algo_flops=direct_flops,
        ),
    ]
    return rows


def mrf_variants(batch: int) -> list[dict]:
    from jointpose.ops.mrf_fft import mrf_message_pass_fft
    from jointpose.ops.mrf_fft_pallas import mrf_message_pass_fft_fused
    from jointpose.ops.mrf_pallas import mrf_message_pass_pallas
    from jointpose.ops.mrf_xla import mrf_message_pass_xla

    kj, hw, win = 9, (60, 90), (45, 67)
    rngs = jax.random.split(jax.random.PRNGKey(1), 3)
    p = jax.nn.softmax(
        jax.random.normal(rngs[0], (batch, *hw, kj)).reshape(batch, -1, kj), axis=1
    ).reshape(batch, *hw, kj)
    kernels = jax.nn.softplus(jax.random.normal(rngs[1], (*win, kj, kj)))
    biases = jax.nn.softplus(jax.random.normal(rngs[2], (kj, kj)) - 4.0)
    # Grouped-conv algorithmic FLOPs (what the message pass computes).
    algo = 2.0 * batch * kj * kj * hw[0] * hw[1] * win[0] * win[1]
    variants = {
        "mrf_xla_grouped": mrf_message_pass_xla,
        "mrf_pallas_epilogue": mrf_message_pass_pallas,
        "mrf_fft_xla": mrf_message_pass_fft,
        "mrf_fft_fused_pallas": mrf_message_pass_fft_fused,
        # MRFConfig.precision='default': single-pass bf16 matmuls with
        # fp32 accumulation instead of the 3-pass bf16 HIGHEST rounding
        # — the evidence row for the inference-surface precision flip
        # (PDJ-parity gated, see BASELINE.md round 3).
        "mrf_fft_fused_pallas_defprec": functools.partial(
            mrf_message_pass_fft_fused, precision=jax.lax.Precision.DEFAULT
        ),
    }
    return [
        time_fn(name, fn, p, kernels, biases, algo_flops=algo)
        for name, fn in variants.items()
    ]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    out = {
        "backend": jax.default_backend(),
        "batch": batch,
        "head_conv": head_conv_variants(batch),
        "mrf_pass": mrf_variants(batch),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "kernel_times.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote kernel_times.json")


if __name__ == "__main__":
    main()
