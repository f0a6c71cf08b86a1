"""Post-training int8 quantization for the part detector.

TPU rationale: v5e's MXU runs s8xs8->s32 at 394 TOPS — 2x the bf16
peak — and int8 activations carry half the HBM bytes of bf16, so a
quantized detector roughly doubles BOTH roofline terms of the
inference frontier (the detector is ~95% of the pose model's FLOPs;
the MRF tail stays float).  The reference (TF-1.x) has no quantized
path at all — this is a beyond-reference serving capability.

Scheme (standard PTQ, chosen for XLA fusion):
- weights: per-output-channel symmetric int8 (scale = amax/127);
- activations: per-tensor symmetric int8 with *static* scales from a
  calibration pass (amax of each conv's input over calibration
  batches), so serving has zero dynamic-range computation;
- every conv: s8 x s8 -> s32 (``preferred_element_type``), then an
  fp32 epilogue (dequant scale, bias, ReLU) fused by XLA with the
  requantize to the NEXT conv's input scale — inter-layer tensors
  materialize in HBM as int8, nothing wider;
- 2x2 maxpool runs ON int8: max commutes with the monotone requant;
- the multires fusion sum runs in int16 at the head conv's input
  scale: both branch tensors are requantized to that scale first,
  which is sound because ReLU outputs are non-negative, so
  amax(branch) <= amax(branch sum) — the calibrated edge bounds both;
- the wide head conv always runs as a direct int8 conv (the Fourier
  impl is float-only; at int8 throughput direct wins the roofline at
  every preset geometry below the paper's 9x9x512 head).

Calibration replicates ``models/detector.py::Detector`` exactly in
fp32 (parity-tested against ``Detector.apply``), recording amax at
every conv input edge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jointpose.configs import Config, DetectorConfig

_DIMS = ("NHWC", "HWIO", "NHWC")
_QMAX = 127.0


def _conv_names(cfg: DetectorConfig) -> list[str]:
    if cfg.share_trunk:
        trunks = ["trunk"]
    elif cfg.multires:
        trunks = ["trunk_full", "trunk_half"]
    else:
        # Detector only instantiates trunk_half under multires
        # (models/detector.py:158-160); emitting it here would KeyError
        # on single-res share_trunk=False checkpoints.
        trunks = ["trunk_full"]
    names = [
        f"{t}/conv{i}" for t in trunks for i in range(len(cfg.trunk_features))
    ]
    names.append("head_wide")
    names += [f"head_1x1_{i}" for i in range(len(cfg.head_features) - 1)]
    names.append("head_out")
    return names


def _lookup(det_params: dict, name: str) -> dict:
    node = det_params
    for part in name.split("/"):
        node = node[part]
    return node


def _pool_int(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 SAME maxpool for integer dtypes (nn.max_pool assumes -inf
    init; integer lattices use the dtype's minimum)."""
    return jax.lax.reduce_window(
        x, jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype), jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "SAME",
    )


def _avg_pyramid(x: jnp.ndarray) -> jnp.ndarray:
    from flax import linen as nn

    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2), padding="SAME")


def _fp_forward(cfg: DetectorConfig, num_joints: int, det_params: dict,
                images: jnp.ndarray, amax: dict | None = None) -> jnp.ndarray:
    """fp32 replica of Detector.__call__ (always-direct head conv).

    With ``amax`` it additionally records the running abs-max of every
    conv's input — the activation edges of the quantized graph.
    Parity with ``Detector.apply`` is asserted in tests so the
    calibration graph can never drift from the served topology.
    """
    stride_conv = cfg.pool_mode == "stride"

    def conv(name: str, x: jnp.ndarray, strides=(1, 1)) -> jnp.ndarray:
        if amax is not None:
            m = jnp.max(jnp.abs(x))
            amax[name] = jnp.maximum(amax.get(name, 0.0), m)
        p = _lookup(det_params, name)
        y = jax.lax.conv_general_dilated(
            x, p["kernel"], strides, "SAME", dimension_numbers=_DIMS
        )
        return y + p["bias"]

    def trunk(x: jnp.ndarray, prefix: str) -> jnp.ndarray:
        for i in range(len(cfg.trunk_features)):
            pooled = cfg.trunk_pool[i]
            x = jax.nn.relu(conv(
                f"{prefix}/conv{i}", x,
                (2, 2) if (pooled and stride_conv) else (1, 1),
            ))
            if pooled and not stride_conv:
                from flax import linen as nn

                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        return x

    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    x = (images.astype(jnp.float32) - 0.5) * 2.0
    t0 = "trunk" if cfg.share_trunk else "trunk_full"
    full = trunk(x, t0)
    if cfg.multires:
        t1 = "trunk" if cfg.share_trunk else "trunk_half"
        half = trunk(_avg_pyramid(x), t1)
        from jointpose.models.detector import _upsample2x

        full = full + _upsample2x(half)
    y = jax.nn.relu(conv("head_wide", full))
    for i in range(len(cfg.head_features) - 1):
        y = jax.nn.relu(conv(f"head_1x1_{i}", y))
    return conv("head_out", y)


def fp_reference_logits(config: Config, params, images) -> jnp.ndarray:
    """The calibration graph's logits (for parity tests vs Detector)."""
    return _fp_forward(
        config.detector, config.num_joints, params["params"]["detector"], images
    )


def calibrate_detector(config: Config, params, calib_images,
                       batch_size: int = 32) -> dict[str, float]:
    """Run fp32 calibration batches; return per-edge activation scales."""
    cfg = config.detector
    det_params = params["params"]["detector"]

    @jax.jit
    def one_batch(images):
        amax: dict = {}
        _fp_forward(cfg, config.num_joints, det_params, images, amax)
        return amax

    scales: dict[str, float] = {}
    for start in range(0, calib_images.shape[0], batch_size):
        amax = jax.device_get(one_batch(calib_images[start : start + batch_size]))
        for k, v in amax.items():
            scales[k] = max(scales.get(k, 0.0), float(v))
    return {k: max(v, 1e-6) / _QMAX for k, v in scales.items()}


def quantize_detector(config: Config, params, calib_images) -> dict:
    """PTQ: trained PoseModel params + calibration images -> qparams.

    qparams is a flat dict {conv name: {"w_q" int8 (kh,kw,in,out),
    "w_scale" fp32 (out,), "bias" fp32 (out,), "in_scale" fp32 scalar}}
    — a plain pytree, checkpointable like any other.
    """
    in_scales = calibrate_detector(config, params, calib_images)
    det_params = params["params"]["detector"]
    q: dict = {}
    for name in _conv_names(config.detector):
        p = _lookup(det_params, name)
        w = jnp.asarray(p["kernel"], jnp.float32)
        w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / _QMAX
        q[name] = {
            "w_q": jnp.clip(jnp.round(w / w_scale), -_QMAX, _QMAX).astype(jnp.int8),
            "w_scale": w_scale,
            "bias": jnp.asarray(p["bias"], jnp.float32),
            "in_scale": jnp.float32(in_scales[name]),
        }
    return q


def quant_detector_logits(config: Config, qparams: dict,
                          images: jnp.ndarray) -> jnp.ndarray:
    """int8 detector forward: images (float in [0,1] or raw uint8) ->
    fp32 logits.  Every inter-conv tensor is int8; convs are s8xs8->s32.
    """
    cfg = config.detector
    stride_conv = cfg.pool_mode == "stride"

    def requant(x_fp: jnp.ndarray, scale) -> jnp.ndarray:
        return jnp.clip(jnp.round(x_fp / scale), -_QMAX, _QMAX).astype(jnp.int8)

    def qconv(name: str, xq: jnp.ndarray, strides=(1, 1)) -> jnp.ndarray:
        """s8 conv + fp32 epilogue (dequant, bias) -> fp32 pre-activation."""
        p = qparams[name]
        y = jax.lax.conv_general_dilated(
            xq, p["w_q"], strides, "SAME", dimension_numbers=_DIMS,
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * (p["in_scale"] * p["w_scale"]) + p["bias"]

    def trunk(xq: jnp.ndarray, prefix: str) -> jnp.ndarray:
        """int8 input -> int8 features at the head conv's input scale."""
        for i in range(len(cfg.trunk_features)):
            pooled = cfg.trunk_pool[i]
            name = f"{prefix}/conv{i}"
            y = jax.nn.relu(qconv(
                name, xq, (2, 2) if (pooled and stride_conv) else (1, 1)
            ))
            # Requantize straight to the NEXT edge's scale so only int8
            # hits HBM; maxpool commutes with the monotone requant, so
            # pooling runs on int8.
            nxt = (f"{prefix}/conv{i + 1}"
                   if i + 1 < len(cfg.trunk_features) else "head_wide")
            xq = requant(y, qparams[nxt]["in_scale"])
            if pooled and not stride_conv:
                xq = _pool_int(xq)
        return xq

    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    x = (images.astype(jnp.float32) - 0.5) * 2.0
    s0 = qparams[_conv_names(cfg)[0]]["in_scale"]
    t0 = "trunk" if cfg.share_trunk else "trunk_full"
    full_q = trunk(requant(x, s0), t0)
    if cfg.multires:
        t1 = "trunk" if cfg.share_trunk else "trunk_half"
        half_prefix = t1
        s_half = qparams[f"{half_prefix}/conv0"]["in_scale"]
        half_q = trunk(requant(_avg_pyramid(x), s_half), half_prefix)
        from jointpose.models.detector import _upsample2x

        # Both branches sit at head_wide's input scale; ReLU outputs are
        # >= 0 so the calibrated sum edge bounds each branch, and the
        # int16 sum clips back to the same int8 lattice (+-1 LSB from
        # independent branch rounding).
        fused = full_q.astype(jnp.int16) + _upsample2x(half_q).astype(jnp.int16)
        full_q = jnp.clip(fused, -127, 127).astype(jnp.int8)
    y = jax.nn.relu(qconv("head_wide", full_q))
    for i in range(len(cfg.head_features) - 1):
        name = f"head_1x1_{i}"
        y = jax.nn.relu(qconv(name, requant(y, qparams[name]["in_scale"])))
    return qconv("head_out", requant(y, qparams["head_out"]["in_scale"]))


def save_quantized(path: str, qparams: dict) -> None:
    """Write a quantized-detector deployment artifact (npz; int8 weights
    stay int8 on disk — the artifact is ~4x smaller than fp32 params)."""
    import numpy as np

    flat = {
        f"{name}|{field}": np.asarray(arr)
        for name, node in qparams.items()
        for field, arr in node.items()
    }
    np.savez(path, **flat)


def load_quantized(path: str) -> dict:
    """Load a `save_quantized` artifact back into a qparams pytree."""
    import numpy as np

    q: dict = {}
    with np.load(path) as z:
        for key in z.files:
            name, field = key.rsplit("|", 1)
            q.setdefault(name, {})[field] = jnp.asarray(z[key])
    return q


def make_quantized_apply_fn(config: Config, params, calib_images=None,
                            qparams: dict | None = None):
    """Return apply_fn(_params, images) -> PoseModel-style output dict
    (int8 detector + float MRF tail).

    Quantizes on ``calib_images`` unless a prebuilt/loaded ``qparams``
    is given (the deploy-an-artifact path).  Drop-in for
    ``evaluate.make_eval_step`` / ``evaluate.evaluate``'s apply_fn (the
    leading params argument is ignored — the quantized weights are
    baked in), so the full PDJ harness runs unchanged on the quantized
    model.
    """
    from jointpose.models.pose import make_logits_tail_fn

    if qparams is None:
        qparams = quantize_detector(config, params, calib_images)
    tail = make_logits_tail_fn(config, params)

    def apply_fn(_params, images):
        return tail(quant_detector_logits(config, qparams, images))

    return apply_fn


def build_quantized_predictor(config: Config, params, calib_images=None,
                              qparams: dict | None = None):
    """predict(images) -> (coords, probs) with the int8 detector and the
    float MRF + decode tail (exact same tail as build_predictor)."""
    from jointpose.evaluate import flip_images, unflip_heatmaps
    from jointpose.ops.heatmaps import decode_probs, model_probs

    apply_fn = make_quantized_apply_fn(config, params, calib_images, qparams)
    stride = config.data.heatmap_stride

    def probs_fn(images):
        return model_probs(apply_fn(None, images))

    @jax.jit
    def predict(images):
        probs = probs_fn(images)
        if config.eval_flip_tta:
            probs = 0.5 * (probs + unflip_heatmaps(probs_fn(flip_images(images))))
        coords = decode_probs(probs, stride, refine=config.decode_refine)
        return coords, probs

    return predict
