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
