"""Per-op device trace of the flagship shear train dispatch (round 4b).

The measured flagship training row is 677 img/s vs a 1,632 img/s
min(MXU, HBM) roofline — 41%, the largest honest gap left in the repo.
This dumps the traced top ops of the K=10 fused train dispatch so the
gap can be named per-op (the same standard the inference rows meet).

Usage: python results/train_throughput/trace_train_ops.py [preset]
Writes results/train_throughput/train_ops_<preset>.json.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from jointpose.configs import get_config
from jointpose.data.pipeline import make_dataset
from jointpose.devtime import parse_trace
from jointpose.models.pose import PoseModel
from jointpose.perf import PEAK_BF16_FLOPS, aot_compile
from jointpose.train import create_state, make_train_multistep

HBM = 819e9


def main():
    args = [a for a in sys.argv[1:] if a != "--materialized"]
    materialized = "--materialized" in sys.argv
    preset = args[0] if args else "flagship"
    config = get_config(preset)
    k = 10
    train_ds, _ = make_dataset(config.data)
    state = create_state(config, PoseModel(config), jax.random.PRNGKey(0))
    b = config.train.batch_size
    batch_src = train_ds.get_batch
    if materialized:
        # Same pre-rendered uint8 split as measure_train.py's
        # materialized rows (production data semantics).
        n = 512
        ims, jts, vss = [], [], []
        for i0 in range(0, n, 64):
            bd = train_ds.get_batch(jnp.arange(i0, i0 + 64, dtype=jnp.int32))
            ims.append(np.asarray(bd["image"]))
            jts.append(np.asarray(bd["joints"]))
            vss.append(np.asarray(bd["visible"]))
        image_u8 = jnp.asarray(
            (np.concatenate(ims) * 255.0).round().astype(np.uint8))
        joints_d = jnp.asarray(np.concatenate(jts))
        vis_d = jnp.asarray(np.concatenate(vss))

        def batch_src(indices):
            i = indices % n
            return {
                "image": image_u8[i].astype(jnp.float32) / 255.0,
                "joints": joints_d[i],
                "visible": vis_d[i],
            }

    step_fn = make_train_multistep(config, "joint", batch_src, k)
    idx = jnp.arange(k * b, dtype=jnp.int32).reshape(k, b)
    compiled, _ = aot_compile(step_fn, state, idx)

    trace_dir = "/tmp/jp_train_ops_trace"
    jax.profiler.start_trace(trace_dir)
    s = state
    for _ in range(4):
        s, metrics = compiled(s, idx)
    jax.block_until_ready(metrics)
    jax.profiler.stop_trace()

    name = compiled._executable.xla_executable.hlo_modules()[0].name
    t = parse_trace(trace_dir, name.removeprefix("jit_"))
    assert t is not None, "no device events"
    med_ms = t.median_run_s * 1e3
    n_runs = t.num_runs
    rows = []
    for op in t.ops[:28]:
        ms = op.duration_s / n_runs * 1e3
        fl = op.flops / n_runs
        by = op.bytes_accessed / n_runs
        rows.append({
            "op": (op.tf_op or op.name)[:110],
            "source": op.source.split("/")[-1],
            "ms_per_run": round(ms, 3),
            "gflop": round(fl / 1e9, 2),
            "mb": round(by / 1e6, 1),
            "tflops_eff": round(fl / (ms / 1e3) / 1e12, 1) if ms else None,
            "gbps_eff": round(by / (ms / 1e3) / 1e9, 0) if ms else None,
            "mxu_frac": round(fl / (ms / 1e3) / PEAK_BF16_FLOPS, 2) if ms else None,
            "hbm_frac": round(by / (ms / 1e3) / HBM, 2) if ms else None,
        })
    out = {
        "preset": preset,
        "stage": "joint",
        "warp_impl": config.augment.warp_impl,
        "data": "materialized_uint8" if materialized else "synthetic_ingraph",
        "batch": b,
        "k": k,
        "device_ms_per_dispatch": round(med_ms, 2),
        "images_per_sec": round(b * k / (med_ms / 1e3), 1),
        "top_ops": rows,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    suffix = "_materialized" if materialized else ""
    path = os.path.join(here, f"train_ops_{preset}{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({**out, "top_ops": rows[:10]}, indent=1))


if __name__ == "__main__":
    main()
