"""Heatmap losses (SURVEY C8; arXiv:1406.2984 §3.3).

The paper trains per-pixel regression (MSE) between predicted and
target heatmaps; a per-joint spatial softmax cross-entropy is the other
idiom TF-era reimplementations used (SURVEY C8 [R:low]) — both are
provided and selected by ``TrainConfig.detector_loss`` / ``mrf_loss``.
All losses mask invisible joints and reduce in fp32.
"""

from __future__ import annotations

import jax.numpy as jnp

from jointpose.ops.heatmaps import spatial_log_softmax


def heatmap_mse(
    pred: jnp.ndarray, target: jnp.ndarray, visible: jnp.ndarray
) -> jnp.ndarray:
    """Masked per-pixel MSE.

    Args:
      pred/target: (B, H, W, K) heatmaps.
      visible: (B, K) joint mask.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    vis = visible.astype(jnp.float32)[:, None, None, :]
    se = (pred - target) ** 2 * vis
    denom = jnp.maximum(jnp.sum(vis), 1.0) * pred.shape[1] * pred.shape[2]
    return jnp.sum(se) / denom


def heatmap_ce(
    logits: jnp.ndarray, target_dist: jnp.ndarray, visible: jnp.ndarray
) -> jnp.ndarray:
    """Per-joint spatial cross-entropy against a normalized target.

    Args:
      logits: (B, H, W, K) unnormalized scores (detector logits or MRF
        log p̄ — the spatial log-softmax normalizes either).
      target_dist: (B, H, W, K) target distributions (sum to 1 per
        visible joint).
      visible: (B, K) joint mask.
    """
    logp = spatial_log_softmax(logits)
    vis = visible.astype(jnp.float32)
    ce = -jnp.sum(target_dist.astype(jnp.float32) * logp, axis=(1, 2))  # (B, K)
    return jnp.sum(ce * vis) / jnp.maximum(jnp.sum(vis), 1.0)


def mrf_heatmap_loss(
    kind: str, log_heatmaps: jnp.ndarray, targets: dict, visible: jnp.ndarray
) -> jnp.ndarray:
    """Loss on the spatial model's log-space output (SURVEY C8).

    'ce': log p̄ goes straight into the spatial softmax CE (the
    log-softmax shift-normalizes it).

    'mse': the paper's per-pixel regression — but regressing the RAW
    log-space output against a [0,1] Gaussian is degenerate: log p̄ is
    a sum of K log-messages, unbounded below, so the raw-MSE gradient
    is dominated by calibrating an arbitrary offset.  The regression
    space is therefore the peak-normalized heatmap
    ``exp(log p̄ − max log p̄)`` ∈ (0,1] — peak exactly 1, directly
    comparable to the 'peak1' target, and invariant to the message
    products' global scale, matching how the decode (argmax + local
    refinement) consumes the same output.
    """
    if kind == "ce":
        return heatmap_ce(log_heatmaps, targets["dist"], visible)
    if kind == "mse":
        lhm = log_heatmaps.astype(jnp.float32)
        peak = jnp.max(lhm, axis=(1, 2), keepdims=True)
        # Peak-normalize the target as well: its rendered max is <1 for
        # off-pixel-center joints, and both sides peaking at exactly 1
        # makes a perfect shape match an exact zero of the loss.  (The
        # max guard only protects invisible joints' all-zero targets
        # from 0/0; their contribution is masked out in heatmap_mse.)
        tgt = targets["peak1"].astype(jnp.float32)
        tgt = tgt / jnp.maximum(jnp.max(tgt, axis=(1, 2), keepdims=True), 1e-6)
        return heatmap_mse(jnp.exp(lhm - peak), tgt, visible)
    raise ValueError(f"unknown loss kind {kind!r}")


def heatmap_loss(
    kind: str, pred: jnp.ndarray, targets: dict, visible: jnp.ndarray
) -> jnp.ndarray:
    """Dispatch on loss kind using pre-rendered targets.

    ``targets`` carries both renderings: 'peak1' (max-1 Gaussian, for
    MSE) and 'dist' (normalized, for CE).
    """
    if kind == "mse":
        return heatmap_mse(pred, targets["peak1"], visible)
    if kind == "ce":
        return heatmap_ce(pred, targets["dist"], visible)
    raise ValueError(f"unknown loss kind {kind!r}")
