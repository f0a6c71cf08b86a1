"""Two-stage inference pipeline parallelism: detector | MRF + decode.

The reference has no multi-device story at all (SURVEY §2: parallelism
"optional"); this is the TPU-native pipeline axis to complement DP
(batch over 'data'), TP (head channels / MRF source joints) and SP
(trunk rows).  The pose model splits at its natural seam — the detector
(trunk + wide head, ~95% of the FLOPs) and the MRF message pass +
decode — onto two disjoint device groups:

- stage 0 devices run the detector on each microbatch;
- the (B, H', W', K) logits hop groups via ``jax.device_put`` (an ICI
  device-to-device copy on TPU — the heatmaps are stride²·K/3 smaller
  than the input images, so the hop is cheap);
- stage 1 devices run the MRF + spatial softmax + sub-pixel decode.

JAX dispatch is asynchronous, so the host loop keeps both groups busy:
stage 0 of microbatch i+1 executes while stage 1 of microbatch i is
still running — classic pipelining with a one-microbatch bubble at fill
and drain.  Each stage group is additionally a 1-axis 'data' mesh, so
microbatches shard over the devices *within* a stage (PP × DP).

Flip TTA composes: stage 0 emits logits for both orientations stacked
on a leading axis; stage 1 unflips and averages probabilities exactly
like the single-program path (`predict.build_predictor`), so results
are bitwise-comparable up to reduction order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jointpose.configs import Config
from jointpose.models.detector import Detector
from jointpose.models.pose import make_logits_tail_fn
from jointpose.ops.heatmaps import decode_probs, model_probs


def _stage_mesh(devices) -> Mesh:
    return Mesh(np.asarray(devices), ("data",))


def split_stage_devices(devices=None) -> tuple[list, list]:
    """Split a device list into the two stage groups (detector-heavy
    stage 0 gets the extra device when the count is odd)."""
    devices = list(jax.devices() if devices is None else devices)
    if len(devices) < 2:
        raise ValueError(
            f"pipeline parallelism needs >= 2 devices, have {len(devices)}"
        )
    cut = (len(devices) + 1) // 2
    return devices[:cut], devices[cut:]


def build_pipelined_predictor(
    config: Config, params, devices=None, n_micro: int = 2,
    qparams: dict | None = None,
):
    """Return predict(images) -> (coords, probs) running PP over two
    device groups, microbatched ``n_micro`` ways.

    Semantics match `predict.build_predictor` (same decode, same flip
    TTA); only the execution schedule differs.  The batch must divide
    by ``n_micro``, and each microbatch by its stage's device count.

    With ``qparams`` (from ``ops.quant.quantize_detector`` or a loaded
    artifact) stage 0 runs the int8 detector — PP x DP x int8 compose.
    """
    g0, g1 = split_stage_devices(devices)
    mesh0, mesh1 = _stage_mesh(g0), _stage_mesh(g1)
    cfg = config
    dtype = jnp.dtype(cfg.compute_dtype)
    stride = cfg.data.heatmap_stride
    tta = cfg.eval_flip_tta

    if cfg.detector.head_conv_impl == "auto":
        # Pin 'auto' HERE, not per trace: stage 0 traces at the
        # microbatch size, where the batch-dependent roofline could
        # pick a different head impl (and bf16 numerics) than the
        # single-program path at the full batch.  Resolve at the same
        # point checkpoint metadata does (config geometry + training
        # batch) so PP, eval, and serve provably run one program.
        import dataclasses

        from jointpose.models.detector import resolve_head_conv_impl

        impl = resolve_head_conv_impl(
            cfg.detector, cfg.data.image_hw, cfg.train.batch_size
        )
        cfg = cfg.replace(
            detector=dataclasses.replace(cfg.detector, head_conv_impl=impl)
        )
    det = Detector(cfg.detector, cfg.num_joints, dtype=dtype)
    # Params replicate within each stage group; activations shard on the
    # batch axis (PP x DP).
    if qparams is not None:
        from jointpose.ops.quant import quant_detector_logits

        qparams0 = jax.device_put(qparams, NamedSharding(mesh0, P()))

        def det_logits(images):
            return quant_detector_logits(cfg, qparams0, images)
    else:
        det_params = jax.device_put(
            {"params": params["params"]["detector"]}, NamedSharding(mesh0, P())
        )

        def det_logits(images):
            return det.apply(det_params, images)
    stage1_params = (
        jax.device_put(params, NamedSharding(mesh1, P()))
        if cfg.mrf is not None
        else params
    )
    tail = make_logits_tail_fn(cfg, stage1_params)

    def _probs(logits):
        return model_probs(tail(logits))

    @jax.jit
    def stage0(images):
        # uint8 production ingest normalizes in-graph, same as PoseModel
        # (models/pose.py) — keep the two paths numerically identical.
        # (quant_detector_logits handles uint8 itself.)
        if images.dtype == jnp.uint8 and qparams is None:
            images = images.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)
        logits = det_logits(images)
        if tta:
            from jointpose.evaluate import flip_images

            flipped = det_logits(flip_images(images))
            return jnp.stack([logits, flipped])
        return logits

    @jax.jit
    def stage1(logits):
        if tta:
            from jointpose.evaluate import unflip_heatmaps

            probs = 0.5 * (_probs(logits[0]) + unflip_heatmaps(_probs(logits[1])))
        else:
            probs = _probs(logits)
        return decode_probs(probs, stride, refine=cfg.decode_refine), probs

    in0 = NamedSharding(mesh0, P("data"))
    # The inter-stage hop: batch-sharded over stage 1's devices.  With
    # TTA the stacked orientation axis leads, batch is axis 1.
    in1 = NamedSharding(mesh1, P(None, "data") if tta else P("data"))

    def predict(images):
        b = images.shape[0]
        if b % n_micro:
            raise ValueError(f"batch {b} must divide into {n_micro} microbatches")
        mb = b // n_micro
        if mb % len(g0) or mb % len(g1):
            raise ValueError(
                f"microbatch {mb} must divide stage device counts "
                f"({len(g0)}, {len(g1)})"
            )
        outs = []
        for i in range(n_micro):
            x = jax.device_put(images[i * mb : (i + 1) * mb], in0)
            logits = stage0(x)
            # Async dispatch: this transfer + stage1 enqueue while the
            # next iteration's stage0 starts filling stage 0's queue.
            outs.append(stage1(jax.device_put(logits, in1)))
        coords = jnp.concatenate([c for c, _ in outs])
        probs = jnp.concatenate([p for _, p in outs])
        return coords, probs

    return predict
