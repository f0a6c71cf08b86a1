"""North-star benchmark: FLIC images/sec/chip, detector+MRF inference.

Measures the reference's headline path (SURVEY §3.2: multi-res detector
-> MRF message pass -> argmax decode to joint coordinates) on the
flagship config in steady state — compile excluded, timed over repeated
batches (SURVEY §4 perf harness).  Baseline target: >=10,000
images/sec/chip (BASELINE.json:5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from jointpose.configs import get_config
from jointpose.models.pose import PoseModel
from jointpose.ops.heatmaps import decode_probs, model_probs

BASELINE_IMAGES_PER_SEC = 10_000.0


def build_inference_fn(config):
    model = PoseModel(config)
    stride = config.data.heatmap_stride

    def forward(params, images):
        out = model.apply(params, images)
        # The exact production decode (softmax + sub-pixel refinement) —
        # the benchmark must time the program users actually run; the
        # refinement is NOT softmax-invariant, so no shortcut here.
        return decode_probs(model_probs(out), stride, refine=config.decode_refine)

    return model, jax.jit(forward)


def main(batch_size: int = 128, warmup: int = 5, iters: int = 30) -> dict:
    config = get_config("flagship")
    model, forward = build_inference_fn(config)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (batch_size, *config.data.image_hw, 3), jnp.float32)
    params = model.init(rng, images[:1])

    for _ in range(warmup):
        jax.block_until_ready(forward(params, images))

    # Block every iteration: with an async device relay, blocking only on
    # the final output can under-count in-flight work.
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(forward(params, images))
    dt = time.perf_counter() - t0

    images_per_sec = batch_size * iters / dt
    result = {
        "metric": "flic_images_per_sec_per_chip_detector_mrf_inference",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
