"""Training batch-scaling: is batch 32 pinning the flagship headline?

The headline training row (2,727 img/s, materialized-uint8, K=10) runs
at the presets' batch 32.  The per-op ceiling names small-batch
overheads (warp hat-build, sub-128 conv tiles), so larger batches could
amortize them — this measures the same fused dispatch at batch
32/64/128 to quantify that headroom.  Accuracy parity at larger batch
would need an LR/schedule retune (linear-scaling rule), so these are
throughput rows only; the shipped presets stay at 32.

Usage: python results/train_throughput/batch_scaling.py
Writes results/train_throughput/batch_scaling.json.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

from measure_train import measure  # noqa: E402  (sibling harness)
import measure_train  # noqa: E402


def main():
    assert jax.default_backend() != "cpu"
    rows = []
    for b in (32, 64, 128):
        orig_get_config = measure_train.get_config

        def patched(preset, _b=b):
            cfg = orig_get_config(preset)
            return dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, batch_size=_b))

        measure_train.get_config = patched
        try:
            row = measure("flagship", "joint", warp_impl="shear",
                          materialized=True)
        finally:
            measure_train.get_config = orig_get_config
        row["batch"] = b
        print(json.dumps(row), flush=True)
        rows.append(row)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "batch_scaling.json"), "w") as f:
        json.dump({"rows": rows}, f, indent=1)
        f.write("\n")
    print("wrote batch_scaling.json")


if __name__ == "__main__":
    main()
