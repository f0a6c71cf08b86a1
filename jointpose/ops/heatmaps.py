"""Heatmap math shared by models, losses and eval."""

from __future__ import annotations

import jax.numpy as jnp


def spatial_log_softmax(x: jnp.ndarray) -> jnp.ndarray:
    """Log-softmax over the two spatial axes of (..., H, W, K), fp32."""
    x = x.astype(jnp.float32)
    m = jnp.max(x, axis=(-3, -2), keepdims=True)
    z = x - m
    lse = jnp.log(jnp.sum(jnp.exp(z), axis=(-3, -2), keepdims=True))
    return z - lse


def spatial_softmax(x: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the two spatial axes of (..., H, W, K), fp32."""
    return jnp.exp(spatial_log_softmax(x))


def model_scores(out: dict) -> jnp.ndarray:
    """The model's final heatmap scores: MRF log-heatmaps when the
    spatial model ran, detector logits otherwise."""
    return out.get("mrf_log_heatmaps", out["detector_logits"])


def model_probs(out: dict) -> jnp.ndarray:
    """Per-joint probability heatmaps from a PoseModel output dict."""
    return spatial_softmax(model_scores(out))


def decode_probs(probs: jnp.ndarray, stride: int, refine: bool = False):
    """THE production decode: probability heatmaps -> image coords.

    All consumers (evaluate, predict, serve, bench, train figures) share
    this one path so the coordinate convention and the (not
    softmax-invariant) sub-pixel refinement can never drift apart.
    """
    from jointpose.data.targets import heatmap_to_coords

    return heatmap_to_coords(probs, stride, refine=refine)
