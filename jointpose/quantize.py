"""Offline quantization entry: checkpoint -> int8 deployment artifact.

Quantize once, deploy many: runs the PTQ calibration (ops/quant.py)
against a trained checkpoint and writes the int8 detector artifact
(npz: int8 weights, per-channel weight scales, static activation
scales, fp32 biases — ~4x smaller than the fp32 params).  The artifact
loads into ``predict``/``serve`` via ``--quantize-artifact``, skipping
recalibration at deploy time.

CLI:  python -m jointpose.quantize --config flagship \
          --checkpoint runs/flagship/checkpoints --best \
          --calib 256 --out runs/flagship/int8.npz
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="jointpose int8 quantization")
    parser.add_argument("--config", default="flagship")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--best", action="store_true")
    parser.add_argument("--calib", type=int, default=256,
                        help="number of training images for activation-scale "
                             "calibration")
    parser.add_argument("--out", required=True, help="artifact path (.npz)")
    parser.add_argument("--pool-mode", choices=["max", "stride"], default=None)
    from jointpose.cli import add_platform_flag, apply_platform

    add_platform_flag(parser)
    args = parser.parse_args(argv)
    apply_platform(args.platform)

    from jointpose.checkpoint import reconcile_config
    from jointpose.configs import get_config
    from jointpose.data.pipeline import make_dataset
    from jointpose.ops.quant import quantize_detector, save_quantized
    from jointpose.predict import restore_params

    config = reconcile_config(get_config(args.config), args.checkpoint, args.pool_mode)
    params, step = restore_params(config, args.checkpoint, args.step, best=args.best)
    train_ds, _ = make_dataset(config.data)
    calib = train_ds.get_batch(
        jnp.arange(min(args.calib, train_ds.size), dtype=jnp.int32)
    )["image"]
    qparams = quantize_detector(config, params, calib)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_quantized(args.out, qparams)

    n_int8 = sum(int(np.prod(n["w_q"].shape)) for n in qparams.values())
    size_mb = os.path.getsize(args.out) / 1e6
    print(
        f"quantized {len(qparams)} convs ({n_int8:,} int8 weights) from "
        f"checkpoint step {step}, calibrated on {calib.shape[0]} images "
        f"-> {args.out} ({size_mb:.2f} MB)"
    )


if __name__ == "__main__":
    main()
