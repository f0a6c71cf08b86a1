"""Joint CNN+MRF composition (SURVEY §1 Models layer; C5+C6+C7).

The PoseModel is the framework's flagship model: images in, per-joint
heatmaps out — detector logits always, MRF-refined log-heatmaps when the
config enables the spatial model.  This is the path the north-star
metric times (SURVEY §3.2).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from jointpose.configs import Config
from jointpose.models.detector import Detector
from jointpose.models.mrf import SpatialModel
from jointpose.ops.heatmaps import spatial_softmax


def make_logits_tail_fn(config: Config, params) -> Callable[[jnp.ndarray], dict]:
    """Return fn(detector logits fp32) -> PoseModel-style output dict.

    Shares the exact unaries/normalization semantics of
    ``PoseModel.__call__`` for callers that produce detector logits out
    of band (the pipeline-parallel stage split, the int8-quantized
    detector) and need the identical MRF tail: the returned dict
    composes with ``ops.heatmaps.model_probs`` / ``model_scores`` and
    with ``evaluate.make_eval_step`` apply_fns.  ``params`` is the full
    PoseModel param dict; with ``config.mrf`` unset the dict carries
    only the logits.
    """
    cfg = config
    if cfg.mrf is None:
        return lambda logits: {"detector_logits": logits}
    mrf = SpatialModel(cfg.mrf, cfg.num_joints, dtype=jnp.dtype(cfg.compute_dtype))
    mrf_params = {"params": params["params"]["spatial_model"]}

    def tail(logits: jnp.ndarray) -> dict:
        if cfg.mrf.normalize_input:
            unaries = spatial_softmax(logits)
        else:
            unaries = jnp.maximum(logits, 0.0)
        return {
            "detector_logits": logits,
            "mrf_log_heatmaps": mrf.apply(mrf_params, unaries),
        }

    return tail


class PoseModel(nn.Module):
    config: Config
    # Optional overrides threaded to the SpatialModel (prior init, Pallas
    # message pass); None = module defaults.
    mrf_raw_kernel_init: Callable[..., jnp.ndarray] | None = None
    mrf_message_pass: Callable[..., jnp.ndarray] | None = None
    # Device mesh for model-axis TP of the MRF (see SpatialModel.mesh).
    mesh: Any = None
    # With ``spatial=True`` (and a mesh), the detector trunk also runs
    # spatially sharded — image rows split over 'model', XLA-inserted
    # halo exchanges — and re-gathers rows before the head
    # (parallel/mesh.py spatial_image_sharding).
    spatial: bool = False

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, freeze_detector: bool = False
    ) -> dict[str, Any]:
        """Forward pass.

        ``freeze_detector=True`` stops gradients at the detector logits
        (BASELINE config 3: the spatial model trains on fixed unaries),
        letting XLA elide the detector backward pass entirely.

        ``images`` may be float in [0, 1] (the training pipeline) or raw
        uint8 RGB (the production ingest path) — uint8 is normalized
        in-graph, so the convert fuses into the first conv's input read
        and HBM sees one byte per pixel-channel instead of four.
        """
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        if images.dtype == jnp.uint8:
            images = images.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)
        logits = Detector(
            cfg.detector,
            cfg.num_joints,
            dtype=dtype,
            spatial_mesh=self.mesh if self.spatial else None,
            name="detector",
        )(images)
        if freeze_detector:
            import jax

            logits = jax.lax.stop_gradient(logits)
        out: dict[str, Any] = {"detector_logits": logits}
        if cfg.mrf is not None:
            if cfg.mrf.normalize_input:
                unaries = spatial_softmax(logits)
            else:
                unaries = jnp.maximum(logits, 0.0)
            out["mrf_log_heatmaps"] = SpatialModel(
                cfg.mrf,
                cfg.num_joints,
                dtype=dtype,
                raw_kernel_init=self.mrf_raw_kernel_init,
                message_pass=self.mrf_message_pass,
                mesh=self.mesh,
                name="spatial_model",
            )(unaries)
        return out
