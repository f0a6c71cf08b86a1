"""Batch inference entry: checkpoint -> joint coordinates (+ overlays).

The reference's "inference" is rerunning its script in eval mode
(SURVEY §3.2/§3.3); this gives the same capability as a first-class
CLI and library call: restore a checkpoint, run the detector+MRF
forward in one jitted program, decode to image-space joint
coordinates, and emit JSONL (one record per example) with optional
heatmap-overlay figures.

CLI:  python -m jointpose.predict --config flagship \
          --checkpoint runs/flagship/checkpoints --workdir out/ \
          [--split test] [--num 64] [--figures]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from jointpose import skeleton
from jointpose.configs import Config, get_config
from jointpose.data.pipeline import make_dataset
from jointpose.evaluate import flip_images, unflip_heatmaps
from jointpose.models.pose import PoseModel
from jointpose.ops.heatmaps import decode_probs, model_probs


def build_predictor(config: Config, params, mesh=None, spatial: bool = False):
    """Return a jitted fn: images (B,H,W,3) -> (coords (B,K,2), probs).

    With ``mesh`` (a ('data','model') `jax.sharding.Mesh`), inference is
    data-parallel: the batch shards over the mesh 'data' axis and XLA
    partitions the whole forward SPMD — same program, N chips.  The
    data-axis size must divide the batch size.  ``spatial=True`` (with a
    model axis > 1) additionally runs the detector trunk with image rows
    sharded over 'model' — XLA-inserted halo exchanges — and engages the
    MRF's source-joint TP, so a single image's latency also scales.
    """
    if config.detector.head_conv_impl == "auto":
        # Resolve 'auto' ONCE at the checkpoint-metadata resolution
        # point (config geometry + training batch) rather than per
        # trace: the roofline choice is batch-dependent, and a predictor
        # built for a different batch would otherwise run different
        # bf16 head numerics than the evaluated model.  Keeps every
        # surface (predict, serve, pipelined PP) on one program.
        import dataclasses as _dc

        from jointpose.models.detector import resolve_head_conv_impl

        config = config.replace(
            detector=_dc.replace(
                config.detector,
                head_conv_impl=resolve_head_conv_impl(
                    config.detector, config.data.image_hw,
                    config.train.batch_size,
                ),
            )
        )
    use_model_axis = mesh is not None and mesh.shape["model"] > 1
    model = PoseModel(
        config,
        mesh=mesh if use_model_axis else None,
        spatial=spatial and use_model_axis,
    )
    stride = config.data.heatmap_stride
    if mesh is not None:
        from jointpose.parallel.mesh import batch_sharding, shard_params

        params = {"params": shard_params(params["params"], mesh)}
        in_sharding = batch_sharding(mesh)

    def probs_fn(images):
        return model_probs(model.apply(params, images))

    @jax.jit
    def _predict(images):
        probs = probs_fn(images)
        if config.eval_flip_tta:
            probs = 0.5 * (probs + unflip_heatmaps(probs_fn(flip_images(images))))
        coords = decode_probs(probs, stride, refine=config.decode_refine)
        return coords, probs

    if mesh is None:
        return _predict

    def predict(images):
        return _predict(jax.device_put(images, in_sharding))

    return predict


def restore_params(
    config: Config, checkpoint_dir: str, step: int | None = None, best: bool = False
):
    """Restore model params from an orbax checkpoint directory.

    ``best=True`` picks the keep-best-by-PDJ checkpoint; otherwise the
    given ``step`` or the latest.
    """
    from jointpose.checkpoint import Checkpointer
    from jointpose.train import create_state

    model = PoseModel(config)
    template = create_state(config, model, jax.random.PRNGKey(0))
    ckpt = Checkpointer(checkpoint_dir, keep=1)
    if best and step is None:
        step = ckpt.best_step()
        if step is None:
            raise FileNotFoundError(
                f"no best checkpoint recorded under {checkpoint_dir} (run "
                "crashed before the first eval, or legacy layout); pass an "
                "explicit step or best=False for the latest"
            )
    if step is None:
        step = ckpt.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {checkpoint_dir}")
    # Params-only partial restore: inference must not depend on the
    # saving run's optimizer layout (e.g. a train-time --mrf-lr-mult
    # changes the opt_state pytree shape).
    restored = ckpt.restore_subtree({"params": template.params}, step=step)
    ckpt.close()
    return {"params": restored["params"]}, int(step)


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="jointpose batch inference")
    parser.add_argument("--config", default="flagship")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--step", type=int, default=None,
                        help="checkpoint step (default: latest)")
    parser.add_argument("--best", action="store_true",
                        help="use the keep-best-by-PDJ checkpoint")
    parser.add_argument("--split", choices=["train", "test"], default="test")
    parser.add_argument("--num", type=int, default=32)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--figures", action="store_true")
    parser.add_argument("--pool-mode", choices=["max", "stride"], default=None,
                        help="override the trunk downsampling mode (normally "
                             "auto-adopted from the checkpoint's metadata)")
    parser.add_argument("--mesh-data", type=int, default=0,
                        help="data-parallel inference over this many devices "
                             "(0 = single device; must divide the batch size)")
    parser.add_argument("--mesh-model", type=int, default=1,
                        help="model-axis size: spatial-shard the detector "
                             "trunk (rows over 'model', XLA halo exchanges) "
                             "and source-joint-shard the MRF pass; composes "
                             "with --mesh-data on a 2-D mesh")
    parser.add_argument("--mrf-precision", choices=["high", "default"],
                        default="default",
                        help="MRF message-pass matmul precision; inference "
                             "defaults to 'default' (single-pass bf16 — "
                             "measured 3.7x faster, PDJ-parity gated; "
                             "BASELINE.md round 3)")
    parser.add_argument("--pipeline", type=int, default=0, metavar="N_MICRO",
                        help="pipeline-parallel inference: split the devices "
                             "into a detector stage and an MRF+decode stage "
                             "and stream N_MICRO microbatches per batch "
                             "(needs >= 2 devices; exclusive with --mesh-*)")
    parser.add_argument("--quantize", type=int, default=0, metavar="N_CALIB",
                        help="run the int8-quantized detector (PTQ, "
                             "ops/quant.py), calibrating on N_CALIB training "
                             "images (exclusive with --mesh-*/--pipeline)")
    parser.add_argument("--quantize-artifact", default=None, metavar="NPZ",
                        help="load a prebuilt int8 artifact (python -m "
                             "jointpose.quantize) instead of calibrating")
    from jointpose.cli import add_platform_flag, apply_platform

    add_platform_flag(parser)
    args = parser.parse_args(argv)
    apply_platform(args.platform)

    from jointpose.checkpoint import reconcile_config
    from jointpose.configs import with_mrf_precision

    config = reconcile_config(get_config(args.config), args.checkpoint, args.pool_mode)
    config = with_mrf_precision(config, args.mrf_precision)
    params, step = restore_params(config, args.checkpoint, args.step, best=args.best)
    mesh = None
    if args.mesh_data > 1 or args.mesh_model > 1:
        from jointpose.configs import MeshConfig
        from jointpose.parallel.mesh import make_mesh

        data_axis = max(args.mesh_data, 1)
        if args.batch_size % data_axis:
            raise SystemExit(
                f"--mesh-data {args.mesh_data} must divide --batch-size "
                f"{args.batch_size}"
            )
        mesh = make_mesh(MeshConfig(data=data_axis, model=args.mesh_model))
    train_ds, test_ds = make_dataset(config.data)
    ds = train_ds if args.split == "train" else test_ds
    if args.pipeline > 0:
        if mesh is not None:
            raise SystemExit("--pipeline is exclusive with --mesh-data/--mesh-model")
        if args.batch_size % args.pipeline:
            raise SystemExit(
                f"--pipeline {args.pipeline} must divide --batch-size "
                f"{args.batch_size}"
            )
        from jointpose.parallel.pipeline import build_pipelined_predictor

        # --quantize/--quantize-artifact compose: int8 detector in stage 0.
        qparams = None
        if args.quantize_artifact:
            from jointpose.ops.quant import load_quantized

            qparams = load_quantized(args.quantize_artifact)
        elif args.quantize > 0:
            from jointpose.ops.quant import quantize_detector

            calib = train_ds.get_batch(
                jnp.arange(min(args.quantize, train_ds.size), dtype=jnp.int32)
            )["image"]
            qparams = quantize_detector(config, params, calib)
        predict = build_pipelined_predictor(
            config, params, n_micro=args.pipeline, qparams=qparams
        )
    elif args.quantize > 0 or args.quantize_artifact:
        if mesh is not None:
            raise SystemExit("--quantize is exclusive with --mesh-data/--mesh-model")
        from jointpose.ops.quant import build_quantized_predictor, load_quantized

        if args.quantize_artifact:
            qparams = load_quantized(args.quantize_artifact)
            predict = build_quantized_predictor(config, params, qparams=qparams)
            print(f"int8 detector (artifact {args.quantize_artifact})")
        else:
            calib = train_ds.get_batch(
                jnp.arange(min(args.quantize, train_ds.size), dtype=jnp.int32)
            )["image"]
            predict = build_quantized_predictor(config, params, calib)
            print(f"int8 detector (calibrated on {calib.shape[0]} train images)")
    else:
        predict = build_predictor(
            config, params, mesh=mesh, spatial=args.mesh_model > 1
        )

    os.makedirs(args.workdir, exist_ok=True)
    out_path = os.path.join(args.workdir, "predictions.jsonl")
    n = min(args.num, ds.size)
    bs = args.batch_size
    with open(out_path, "w") as f:
        for start in range(0, n, bs):
            idx = np.arange(start, min(start + bs, n), dtype=np.int32)
            pad = bs - len(idx)
            batch = ds.get_batch(jnp.asarray(np.pad(idx, (0, pad), mode="edge")))
            coords, probs = predict(batch["image"])
            coords_np = np.asarray(coords)[: len(idx)]
            for row, ex in zip(coords_np, idx.tolist()):
                f.write(json.dumps({
                    "example": int(ex),
                    "split": args.split,
                    "joints": {
                        name: [float(row[j, 0]), float(row[j, 1])]
                        for j, name in enumerate(skeleton.JOINTS)
                    },
                }) + "\n")
            if args.figures and start == 0:
                from jointpose.visualize import save_heatmap_overlays

                save_heatmap_overlays(
                    np.asarray(batch["image"])[: len(idx)],
                    np.asarray(probs)[: len(idx)],
                    os.path.join(args.workdir, "predictions.png"),
                    coords_np,
                )
    print(f"wrote {n} predictions (checkpoint step {step}) to {out_path}")


if __name__ == "__main__":
    main()
