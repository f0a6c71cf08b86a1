"""Measure the PDJ-vs-throughput frontier (round-2 verdict task 3).

For each model point, compile the exact production inference program
(bench.py's build_inference_fn: forward + softmax + decode) and record
cost-analysis FLOPs/bytes per image + roofline img/s.  Run on the TPU
backend so the numbers describe the real compiled program.

Usage: python results/frontier/measure_frontier.py [batch]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

from bench import build_inference_fn
from jointpose.configs import get_config, with_mrf_precision
from jointpose.perf import compiled_cost, roofline_images_per_sec

POINTS = [
    "single_scale", "multires", "mrf", "joint", "joint+stride",
    "eval_tta", "eval_tta+stride", "flagship", "flagship_slim",
    # int8 PTQ rows (ops/quant.py): s8xs8->s32 convs, int8 inter-layer
    # tensors.  Measured verdict (2026-08-18): int8 is slightly SLOWER
    # than bf16 on every preset on this chip — the quantized head is
    # locked out of the Fourier path and the requantize epilogues
    # outweigh the byte savings.  int8 is the deployment-compression
    # option (2x smaller artifacts at neutral PDJ), not a throughput
    # lever; rows are kept to document that measurement.
    "flagship+int8", "flagship_slim+int8", "joint+stride+int8", "mrf+int8",
]


def build_int8_inference_fn(config, rng, images):
    """The quantized production graph: int8 detector + float MRF tail +
    decode (+TTA when the preset evals with it).  Activation scales are
    calibrated on a small random batch — scales do not change the
    compiled program's cost, only its accuracy (measured separately in
    results/quant_r3/)."""
    import jax.numpy as jnp

    from jointpose.evaluate import flip_images, unflip_heatmaps
    from jointpose.models.pose import PoseModel
    from jointpose.ops.heatmaps import decode_probs, model_probs
    from jointpose.ops.quant import make_quantized_apply_fn

    model = PoseModel(config)
    params = model.init(rng, images[:1])
    calib = jax.random.uniform(rng, (8, *config.data.image_hw, 3), jnp.float32)
    apply_fn = make_quantized_apply_fn(config, params, calib)
    stride = config.data.heatmap_stride

    def probs_fn(images):
        return model_probs(apply_fn(None, images))

    def forward(params_unused, images):
        probs = probs_fn(images)
        if config.eval_flip_tta:
            probs = 0.5 * (probs + unflip_heatmaps(probs_fn(flip_images(images))))
        return decode_probs(probs, stride, refine=config.decode_refine)

    return model, params, jax.jit(forward)


def build_tta_inference_fn(config):
    """The TTA preset's real production graph: forward both orientations,
    average unflipped probabilities, decode (bench.py times the plain
    forward; the eval_tta frontier row must charge the 2x)."""
    import jax.numpy as jnp

    from jointpose.evaluate import flip_images, unflip_heatmaps
    from jointpose.models.pose import PoseModel
    from jointpose.ops.heatmaps import decode_probs, model_probs

    model = PoseModel(config)
    stride = config.data.heatmap_stride

    def forward(params, images):
        probs = model_probs(model.apply(params, images))
        flipped = model_probs(model.apply(params, flip_images(images)))
        probs = 0.5 * (probs + unflip_heatmaps(flipped))
        return decode_probs(probs, stride, refine=config.decode_refine)

    return model, jax.jit(forward)


def measure(name: str, batch: int, ops_detail: bool = False) -> dict:
    from jointpose.devtime import measure_device_time
    from jointpose.perf import PEAK_BF16_FLOPS, PEAK_INT8_OPS, aot_compile

    # "<preset>+stride" rows measure the param-shape-compatible
    # stride-conv trunk (BASELINE.md footnote 5) on the same preset;
    # "+int8" rows the PTQ detector (variants compose, e.g.
    # "joint+stride+int8").
    parts = name.split("+")
    base, variants = parts[0], set(parts[1:])
    config = get_config(base)
    if "stride" in variants:
        from jointpose.configs import with_pool_mode

        config = with_pool_mode(config, "stride")
    # Frontier rows describe the PRODUCTION inference program, which
    # (round 3) runs the MRF message pass at single-pass bf16 — the
    # predict/serve default, PDJ-parity gated in
    # results/precision_gate/summary.json.
    config = with_mrf_precision(config, "default")
    rng = jax.random.PRNGKey(0)
    # Production ingest: raw uint8 RGB, normalized in-graph (matches
    # bench.py; the convert fuses into the first conv's input read).
    images = jax.numpy.zeros((batch, *config.data.image_hw, 3), jax.numpy.uint8)
    if "int8" in variants:
        model, params, forward = build_int8_inference_fn(config, rng, images)
    else:
        if config.eval_flip_tta:
            model, forward = build_tta_inference_fn(config)
        else:
            model, forward = build_inference_fn(config)
        params = model.init(rng, images[:1])
    compiled, cost = aot_compile(forward, params, images)
    flops_img = cost["flops"] / batch
    bytes_img = cost["bytes"] / batch
    # int8 programs: cost analysis counts s8 MACs, so every derived
    # field must divide by the chip's 394 TOP/s int8 peak — the bf16
    # peak yields utils > 1 and rooflines below measured (ADVICE r3).
    peak = PEAK_INT8_OPS if "int8" in variants else PEAK_BF16_FLOPS
    # Two derived columns with distinct semantics (round-4 verdict weak
    # #2 — the old single column baked an ASSUMED 0.6 MXU util, which
    # the int8 direct conv beats at 0.77 measured, putting the "bound"
    # below the measurement):
    #   roofline_images_per_sec — the true min(peak MXU, raw HBM) bound
    #     at util 1.0; no measurement can exceed it.
    #   expected_images_per_sec_assumed_util — the old planning number
    #     at 0.6 MXU / 0.8 HBM sustained fractions; measurements may
    #     legitimately beat it.
    roof = roofline_images_per_sec(
        flops_img, bytes_img, peak_flops=peak, mxu_util=1.0, hbm_eff=1.0
    )
    expected = roofline_images_per_sec(flops_img, bytes_img, peak_flops=peak)
    row = {
        "preset": name,
        "batch": batch,
        "gflop_per_image": round(flops_img / 1e9, 3),
        "mb_per_image": round(bytes_img / 1e6, 2),
        "flop_ledger": "int8" if "int8" in variants else "bf16",
        "roofline_images_per_sec": round(roof, 1),
        "expected_images_per_sec_assumed_util": round(expected, 1),
        "mrf": None
        if config.mrf is None
        else {
            "window": list(config.mrf.window),
            "stride": config.mrf.stride,
            "impl": config.mrf.impl,
        },
        "tta": config.eval_flip_tta,
        "int8": "int8" in variants,
        "input_dtype": "uint8",
        "mrf_precision": None if config.mrf is None else config.mrf.precision,
    }
    # Round 3: measured device time (jointpose/devtime.py) — the real
    # number next to the model-derived roofline.
    timing = measure_device_time(
        compiled, params, images, iters=6, warmup=2, program_name="forward"
    )
    if timing is not None and timing.num_runs >= 3:
        med = timing.median_run_s
        row["device_ms_per_batch"] = round(med * 1e3, 3)
        row["measured_images_per_sec"] = round(batch / med, 1)
        row["measured_mxu_util"] = round(flops_img * batch / med / peak, 3)
        if ops_detail:
            # Per-op device-time/traffic breakdown (round-2 verdict
            # missing #3: publish where the paper topology's bytes go).
            n = max(timing.num_runs, 1)
            row["top_ops"] = [
                {
                    "name": o.name,
                    "ms_per_run": round(o.duration_s * 1e3 / n, 4),
                    "gflop_per_run": round(o.flops / n / 1e9, 2),
                    "mb_per_run": round(o.bytes_accessed / n / 1e6, 2),
                    "category": o.category,
                    "tf_op": o.tf_op,
                    "source": o.source,
                }
                for o in timing.top_ops(20)
            ]
    print(json.dumps(row), flush=True)
    return row


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    # Full op detail on the paper topology (the row round-2's verdict
    # asks to break down) and the flagship (the headline).
    rows = [
        measure(name, batch,
                ops_detail=name in ("mrf", "flagship", "flagship_slim",
                                    "joint+stride+int8"))
        for name in POINTS
    ]
    out = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "rows": rows,
    }
    with open("results/frontier/frontier_costs.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote results/frontier/frontier_costs.json")


if __name__ == "__main__":
    main()
