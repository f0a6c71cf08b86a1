"""PDJ/PCK evaluation with flip-averaged TTA (SURVEY C11, §3.3).

PDJ@t (percentage of detected joints): a joint is detected if the
pixel-argmax of its heatmap lies within t × torso-diameter of the
ground truth, torso diameter being the left-shoulder ↔ right-hip
distance (FLIC protocol, arXiv:1406.2984 §4).  Headline numbers are
PDJ@0.05 for wrists and elbows (BASELINE.json:2).

Flip TTA mirrors the image, runs the model, mirrors the heatmaps back
while swapping left/right joint channels, and averages in probability
space — the L/R swap is the classic silent-accuracy bug, covered by
tests (SURVEY §7 hard-parts #3).

Everything here is batched XLA; the per-batch forward+decode is jitted
once and reused.

CLI (the reference's eval mode):
  python -m jointpose.evaluate --config eval_tta \
      --checkpoint runs/joint/checkpoints [--best] [--split test] [--curves out.png]
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from jointpose import skeleton
from jointpose.configs import Config
from jointpose.data.pipeline import Dataset
from jointpose.ops.heatmaps import decode_probs, model_probs

# numpy on purpose: a module-scope jnp.asarray would initialize the
# backend at IMPORT time, before the CLIs' --platform flag can apply.
_FLIP_PERM = np.asarray(skeleton.FLIP_PERM, dtype=np.int32)

DEFAULT_THRESHOLDS: tuple[float, ...] = tuple(np.linspace(0.0, 0.2, 21).round(3).tolist())


def flip_images(images: jnp.ndarray) -> jnp.ndarray:
    """Mirror (B, H, W, C) images horizontally."""
    return images[:, :, ::-1, :]


def unflip_heatmaps(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Mirror heatmaps back and swap L/R joint channels.

    Args:
      heatmaps: (B, H, W, K) heatmaps computed on flipped images.
    """
    return heatmaps[:, :, ::-1, :][..., _FLIP_PERM]


def torso_diameter(joints_xy: jnp.ndarray) -> jnp.ndarray:
    """Per-example torso diameter (..., K, 2) -> (...,)."""
    a = joints_xy[..., skeleton.JOINT_INDEX[skeleton.TORSO_PAIR[0]], :]
    b = joints_xy[..., skeleton.JOINT_INDEX[skeleton.TORSO_PAIR[1]], :]
    return jnp.linalg.norm(a - b, axis=-1)


def pdj_counts(
    pred_xy: jnp.ndarray,
    gt_xy: jnp.ndarray,
    visible: jnp.ndarray,
    thresholds: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detection counts for a batch.

    Args:
      pred_xy / gt_xy: (B, K, 2) image-pixel coords.
      visible: (B, K).
      thresholds: (T,) PDJ thresholds (fractions of torso diameter).
    Returns:
      (detected (T, K) counts, visible (K,) counts, torso-valid example
      count () — examples whose torso endpoints are both annotated;
      tracked explicitly per example because inferring it from per-joint
      visible counts conflates joint occlusion with torso exclusion on
      mixed-visibility data like real FLIC).
    """
    dist = jnp.linalg.norm(pred_xy - gt_xy, axis=-1)  # (B, K)
    torso = torso_diameter(gt_xy)[:, None]  # (B, 1)
    # Examples whose torso endpoints aren't both annotated have no valid
    # normalizer (missing joints sit at (0,0) -> a bogus huge torso that
    # would count everything as detected): exclude them entirely.
    li = skeleton.JOINT_INDEX[skeleton.TORSO_PAIR[0]]
    ri = skeleton.JOINT_INDEX[skeleton.TORSO_PAIR[1]]
    torso_ok = (visible[:, li] * visible[:, ri]).astype(jnp.float32)[:, None]
    vis = visible.astype(jnp.float32) * torso_ok
    ok = dist[None] <= thresholds[:, None, None] * torso[None]  # (T, B, K)
    detected = jnp.sum(ok.astype(jnp.float32) * vis[None], axis=1)  # (T, K)
    return detected, jnp.sum(vis, axis=0), jnp.sum(torso_ok)


def make_eval_step(
    config: Config, apply_fn: Callable, thresholds=DEFAULT_THRESHOLDS
) -> Callable:
    """Build the jitted per-batch eval: forward (+TTA) -> decode -> counts."""
    stride = config.data.heatmap_stride
    thr = jnp.asarray(thresholds, jnp.float32)

    def heatmap_probs(params, images):
        return model_probs(apply_fn(params, images))

    @jax.jit
    def _step(params, batch):
        probs = heatmap_probs(params, batch["image"])
        if config.eval_flip_tta:
            flipped = heatmap_probs(params, flip_images(batch["image"]))
            probs = 0.5 * (probs + unflip_heatmaps(flipped))
        pred = decode_probs(probs, stride, refine=config.decode_refine)
        return pdj_counts(pred, batch["joints"], batch["visible"], thr)

    def eval_step(params, batch):
        return _step(params, batch)

    # Recorded so evaluate() can reject a prebuilt step whose thresholds
    # disagree with the labels it would report them under.
    eval_step.thresholds = tuple(float(t) for t in thresholds)
    return eval_step


def evaluate(
    params,
    dataset: Dataset,
    config: Config,
    apply_fn: Callable,
    thresholds=DEFAULT_THRESHOLDS,
    max_batches: int | None = None,
    eval_step: Callable | None = None,
    mesh=None,
    uint8_ingest: bool = False,
) -> dict:
    """Full-split evaluation; returns PDJ curves and headline numbers.

    Pass a prebuilt ``eval_step`` (from :func:`make_eval_step`) when
    calling repeatedly — each ``make_eval_step`` closure is a fresh jit
    cache entry, so rebuilding per call recompiles the forward pass.

    With ``mesh`` (a ('data','model') `jax.sharding.Mesh`), each eval
    batch is placed sharded over the mesh 'data' axis and XLA partitions
    the whole forward+counts SPMD (the (T, K) count outputs are
    unsharded, so the batch reduction compiles to an ICI all-reduce) —
    same program, N chips.  The data-axis size must divide the eval
    batch size.  Model-axis TP/SP engage through the ``apply_fn``'s own
    model (build it with ``PoseModel(config, mesh=..., spatial=...)``).
    """
    if mesh is not None and config.train.batch_size % mesh.shape["data"]:
        raise ValueError(
            f"eval batch size {config.train.batch_size} must be divisible "
            f"by the mesh data axis ({mesh.shape['data']})"
        )
    if eval_step is not None and hasattr(eval_step, "thresholds"):
        assert eval_step.thresholds == tuple(float(t) for t in thresholds), (
            "prebuilt eval_step was built with different thresholds than "
            "the labels requested here"
        )
    eval_step = eval_step or make_eval_step(config, apply_fn, thresholds)
    batch = config.train.batch_size
    detected = np.zeros((len(thresholds), skeleton.NUM_JOINTS))
    visible = np.zeros((skeleton.NUM_JOINTS,))
    # Exact-split coverage: the final ragged chunk is padded by wrapping
    # (keeping the jitted batch shape static) and the padded duplicates
    # are masked out through `visible`, so every example counts once.
    n = dataset.size
    examples_seen = 0
    torso_seen = 0.0
    for i, start in enumerate(range(0, n, batch)):
        if max_batches is not None and i >= max_batches:
            break
        idx = (np.arange(start, start + batch, dtype=np.int32)) % n
        got = dataset.get_batch(jnp.asarray(idx))
        if uint8_ingest and got["image"].dtype != jnp.uint8:
            # Score the PRODUCTION input contract: clients send raw
            # uint8 RGB (serve.py), which the model normalizes in-graph
            # — so the eval sees exactly the 8-bit-quantized pixel
            # values a deployment sees, not the float source frames.
            # Datasets that already hand back uint8 (the materialized
            # host pipeline, data/pipeline.py) already satisfy the
            # contract and must pass through untouched — re-scaling
            # uint8 by 255 would saturate every nonzero pixel.
            got = dict(got)
            got["image"] = jnp.round(got["image"] * 255.0).astype(jnp.uint8)
        real = min(batch, n - start)
        if start + batch > n:
            mask = (np.arange(start, start + batch) < n).astype(np.float32)
            got = dict(got)
            got["visible"] = got["visible"] * jnp.asarray(mask)[:, None]
        examples_seen += real
        if mesh is not None:
            from jointpose.parallel.mesh import shard_batch

            got = shard_batch(dict(got), mesh)
        d, v, t = eval_step(params, got)
        detected += np.asarray(d)
        visible += np.asarray(v)
        torso_seen += float(t)
    curves = detected / np.maximum(visible[None], 1.0)  # (T, K)
    thresholds_np = np.asarray(thresholds)
    t05 = int(np.argmin(np.abs(thresholds_np - 0.05)))
    per_joint_05 = {
        name: float(curves[t05, j]) for j, name in enumerate(skeleton.JOINTS)
    }
    headline = float(
        np.mean([per_joint_05[n] for n in skeleton.HEADLINE_JOINTS])
    )
    return {
        "thresholds": thresholds_np.tolist(),
        "pdj_curves": curves.tolist(),  # (T, K)
        "pdj_at_05": per_joint_05,
        "pdj_at_05_wrist_elbow": headline,
        # Examples processed; torso-less examples are excluded from the
        # curves but still counted here (see num_torso_excluded).
        "num_examples": float(examples_seen),
        "num_torso_excluded": float(examples_seen - torso_seen),
    }


def main(argv: list[str] | None = None) -> None:
    import argparse
    import json

    parser = argparse.ArgumentParser(description="jointpose PDJ evaluation")
    parser.add_argument("--config", default="eval_tta")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--best", action="store_true")
    parser.add_argument("--split", choices=["train", "test"], default="test")
    parser.add_argument("--max-batches", type=int, default=None)
    # TTA / decode-refinement overrides: any preset's checkpoints can be
    # evaluated with or without flip TTA and sub-pixel refinement — the
    # model architecture (and so checkpoint shapes) is independent of
    # both, so e.g. the flagship headline number (flagship + --tta) is
    # reproducible here without an architecture-mismatched preset.
    parser.add_argument("--tta", action=argparse.BooleanOptionalAction, default=None,
                        help="override the preset's eval_flip_tta")
    parser.add_argument("--refine", action=argparse.BooleanOptionalAction, default=None,
                        help="override the preset's decode_refine")
    parser.add_argument("--pool-mode", choices=["max", "stride"], default=None,
                        help="override the trunk downsampling mode (normally "
                             "auto-adopted from the checkpoint's recorded "
                             "run_config.json; an override contradicting the "
                             "record is an error)")
    parser.add_argument("--mrf-precision", choices=["high", "default"], default=None,
                        help="matmul precision inside the MRF message pass "
                             "(measured round 3: 'default' is 3.7x faster on "
                             "chip at 0.4%% max rel output err; this flag is "
                             "the PDJ-parity gate for flipping inference)")
    parser.add_argument("--mesh-data", type=int, default=0,
                        help="data-parallel evaluation over this many devices "
                             "(0 = single device; must divide the batch size)")
    parser.add_argument("--mesh-model", type=int, default=1,
                        help="model-axis size: spatial-shard the detector "
                             "trunk and source-joint-shard the MRF pass; "
                             "composes with --mesh-data on a 2-D mesh")
    parser.add_argument("--quantize-artifact", default=None, metavar="NPZ",
                        help="evaluate a prebuilt int8 artifact (python -m "
                             "jointpose.quantize) instead of calibrating — "
                             "the exact tensors a deployment serves")
    parser.add_argument("--quantize", type=int, default=0, metavar="N_CALIB",
                        help="evaluate the int8-quantized detector (PTQ, "
                             "ops/quant.py), calibrating activation scales "
                             "on N_CALIB training images (exclusive with "
                             "--mesh-*)")
    parser.add_argument("--uint8-ingest", action="store_true",
                        help="feed the split as raw uint8 RGB (the serving "
                             "input contract; the model normalizes in-graph) "
                             "— scores the exact numerics a production "
                             "request sees")
    parser.add_argument("--source", choices=["synthetic", "flic"], default=None,
                        help="override the preset's data source (evaluate a "
                             "checkpoint against the FLIC loader path)")
    parser.add_argument("--flic-dir", default=None,
                        help="FLIC root (examples.mat + images/); defaults "
                             "to the config's flic_dir")
    parser.add_argument("--curves", default=None,
                        help="write the PDJ-curve figure to this PNG path")
    parser.add_argument("--json-out", default=None,
                        help="write the full metrics dict to this JSON path")
    from jointpose.cli import add_platform_flag, apply_platform

    add_platform_flag(parser)
    args = parser.parse_args(argv)
    apply_platform(args.platform)

    from jointpose.configs import get_config
    from jointpose.data.pipeline import make_dataset
    from jointpose.models.pose import PoseModel
    from jointpose.predict import restore_params

    config = get_config(args.config)
    if args.tta is not None:
        config = config.replace(eval_flip_tta=args.tta)
    if args.refine is not None:
        config = config.replace(decode_refine=args.refine)
    if args.mrf_precision is not None and config.mrf is not None:
        import dataclasses

        config = config.replace(
            mrf=dataclasses.replace(config.mrf, precision=args.mrf_precision)
        )
    if args.source is not None or args.flic_dir is not None:
        import dataclasses

        dd: dict = {}
        if args.source is not None:
            dd["source"] = args.source
        if args.flic_dir is not None:
            dd["flic_dir"] = args.flic_dir
        config = config.replace(data=dataclasses.replace(config.data, **dd))
    from jointpose.checkpoint import reconcile_config

    config = reconcile_config(config, args.checkpoint, args.pool_mode)
    params, step = restore_params(config, args.checkpoint, args.step, best=args.best)
    train_ds, test_ds = make_dataset(config.data)
    ds = train_ds if args.split == "train" else test_ds
    if config.data.device_cache_gb > 0 and jax.process_count() == 1:
        from jointpose.data.pipeline import device_cache

        ds = device_cache(ds, config.data.device_cache_gb * 1e9)
    mesh = None
    if args.mesh_data > 1 or args.mesh_model > 1:
        from jointpose.configs import MeshConfig
        from jointpose.parallel.mesh import make_mesh, shard_params

        mesh = make_mesh(
            MeshConfig(data=max(args.mesh_data, 1), model=args.mesh_model)
        )
        params = shard_params(params, mesh)
    use_model_axis = mesh is not None and mesh.shape["model"] > 1
    if args.quantize > 0 or args.quantize_artifact:
        if mesh is not None:
            raise SystemExit("--quantize is exclusive with --mesh-data/--mesh-model")
        from jointpose.ops.quant import make_quantized_apply_fn

        if args.quantize_artifact:
            from jointpose.ops.quant import load_quantized

            apply_fn = make_quantized_apply_fn(
                config, params, qparams=load_quantized(args.quantize_artifact)
            )
            print(f"int8 detector (artifact {args.quantize_artifact})")
        else:
            calib = train_ds.get_batch(
                jnp.arange(min(args.quantize, train_ds.size), dtype=jnp.int32)
            )["image"]
            apply_fn = make_quantized_apply_fn(config, params, calib)
            print(f"int8 detector (calibrated on {calib.shape[0]} train images)")
    else:
        model = PoseModel(
            config,
            mesh=mesh if use_model_axis else None,
            spatial=use_model_axis,
        )
        apply_fn = model.apply
    ev = evaluate(
        params, ds, config, apply_fn, max_batches=args.max_batches, mesh=mesh,
        uint8_ingest=args.uint8_ingest,
    )

    print(f"checkpoint step {step}, {args.split} split, "
          f"{int(ev['num_examples'])} examples")
    for name, v in ev["pdj_at_05"].items():
        print(f"  PDJ@0.05 {name:>5}: {v:.4f}")
    print(f"  PDJ@0.05 wrist/elbow: {ev['pdj_at_05_wrist_elbow']:.4f}")
    if args.curves:
        from jointpose.visualize import save_pdj_curves

        save_pdj_curves(ev, args.curves)
        print(f"curves -> {args.curves}")
    if args.json_out:
        import os

        os.makedirs(os.path.dirname(os.path.abspath(args.json_out)), exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(ev, f, indent=1)
        print(f"metrics -> {args.json_out}")


if __name__ == "__main__":
    main()
