"""Measured device time of MRF message-pass impls at the FLAGSHIP
coarse geometry (round-3 verdict weak #2 / next #8).

The flagship's 7.545 ms/batch-128 trace shows its MRF stage costs
~1.56 ms: the stride-2 coarse pass runs the (17, 25)-window K^2 conv on
the 30x40 grid through XLA's grouped conv (dense-rewritten, 9x FLOPs,
36% MXU) + the Pallas log/sum epilogue.  The fused Fourier Pallas
kernel (ops/mrf_fft_pallas.py) was only ever selected for stride-1
large-window geometry (select_impl); at the paper geometry it measured
17x faster than the grouped conv (kernel_times.json).  This script
times every impl at the coarse geometry so selection there is also
measurement-driven.

Usage: python results/kernels/measure_mrf_coarse.py [batch]
Writes results/kernels/mrf_coarse_times.json.
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

# Flagship: heatmap 60x80, MRF stride 2 -> 30x40 coarse grid; window
# (17, 25) on the coarse grid; K=9 joints (configs.py _preset_flagship).
H, W, K = 30, 40, 9
WIN = (17, 25)


def time_fn(name: str, fn, *args, algo_flops: float) -> dict:
    jitted = jax.jit(fn)
    compiled, cost = aot_compile(jitted, *args)
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


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rngs = jax.random.split(jax.random.PRNGKey(0), 2)
    p = jax.nn.softmax(
        jax.random.normal(rngs[0], (batch, H, W, K)).reshape(batch, -1, K), axis=1
    ).reshape(batch, H, W, K).astype(jnp.bfloat16)
    kernels = jax.nn.softplus(
        jax.random.normal(rngs[1], (*WIN, K, K)) * 0.5
    ).astype(jnp.bfloat16)
    biases = jnp.full((K, K), 1e-4, jnp.float32)

    # True algorithmic FLOPs of the direct form (grouped conv): every
    # output tap multiplies one input channel.
    algo = batch * H * W * K * K * WIN[0] * WIN[1] * 2

    from jointpose.ops.mrf_fft import mrf_message_pass_fft
    from jointpose.ops.mrf_fft_pallas import mrf_message_pass_fft_fused
    from jointpose.ops.mrf_pallas import mrf_message_pass_pallas
    from jointpose.ops.mrf_xla import mrf_message_pass_xla

    rows = [
        time_fn(
            "coarse_xla_grouped",
            functools.partial(mrf_message_pass_xla, eps=1e-6, precision=None),
            p, kernels, biases, algo_flops=algo,
        ),
        time_fn(
            "coarse_pallas_epilogue",
            functools.partial(mrf_message_pass_pallas, eps=1e-6, precision=None),
            p, kernels, biases, algo_flops=algo,
        ),
        time_fn(
            "coarse_fft_xla",
            functools.partial(
                mrf_message_pass_fft, eps=1e-6, precision=None,
                use_pallas_epilogue=False,
            ),
            p, kernels, biases, algo_flops=algo,
        ),
        time_fn(
            "coarse_fft_fused_pallas",
            functools.partial(mrf_message_pass_fft_fused, eps=1e-6, precision=None),
            p, kernels, biases, algo_flops=algo,
        ),
        time_fn(
            "coarse_fft_fused_pallas_defprec",
            functools.partial(
                mrf_message_pass_fft_fused, eps=1e-6,
                precision=lax.Precision.DEFAULT,
            ),
            p, kernels, biases, algo_flops=algo,
        ),
    ]
    out = {
        "backend": jax.default_backend(),
        "batch": batch,
        "geometry": {"hw": [H, W], "window": list(WIN), "k": K,
                     "note": "flagship stride-2 coarse grid"},
        "rows": rows,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "mrf_coarse_times.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
