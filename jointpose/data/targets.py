"""Gaussian heatmap target rendering (SURVEY C4; arXiv:1406.2984 §3.1).

The reference renders, per joint, a 2-D Gaussian centered at the
ground-truth location at heatmap resolution (¼ of the input), on the
host in numpy.  Here rendering is pure XLA elementwise math over a
coordinate grid — it fuses into the surrounding jit program and runs
on-device (TPU VPU), so targets never cross the host↔device boundary.
"""

from __future__ import annotations

import jax.numpy as jnp


def render_gaussian_heatmaps(
    joints_hm: jnp.ndarray,
    visible: jnp.ndarray,
    heatmap_hw: tuple[int, int],
    sigma: float,
    normalize: bool = False,
) -> jnp.ndarray:
    """Render per-joint Gaussian target heatmaps.

    Args:
      joints_hm: (..., K, 2) joint coordinates in heatmap pixels, (x, y).
      visible:   (..., K) bool/float mask; invisible joints render as zero.
      heatmap_hw: (Hm, Wm) heatmap height/width.
      sigma: Gaussian std-dev in heatmap pixels.
      normalize: if True each visible channel sums to 1 (a distribution —
        used as the CE / MRF target); if False the peak value is 1
        (the paper's regression target).

    Returns:
      (..., Hm, Wm, K) float32 heatmaps.
    """
    hm_h, hm_w = heatmap_hw
    x = joints_hm[..., 0]  # (..., K)
    y = joints_hm[..., 1]
    ys = jnp.arange(hm_h, dtype=jnp.float32)  # (Hm,)
    xs = jnp.arange(hm_w, dtype=jnp.float32)  # (Wm,)
    # (..., Hm, Wm, K) via broadcasting: grid axes inserted before K.
    dy = ys[:, None, None] - y[..., None, None, :]  # (..., Hm, 1, K)
    dx = xs[None, :, None] - x[..., None, None, :]  # (..., 1, Wm, K)
    d2 = dy * dy + dx * dx
    hm = jnp.exp(-d2 / (2.0 * sigma * sigma))
    if normalize:
        denom = jnp.sum(hm, axis=(-3, -2), keepdims=True)
        hm = hm / jnp.maximum(denom, 1e-12)
    vis = visible.astype(jnp.float32)[..., None, None, :]
    return (hm * vis).astype(jnp.float32)


def heatmap_to_coords(heatmaps: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Hard-argmax decode: heatmaps (..., Hm, Wm, K) -> image coords (..., K, 2).

    Matches the reference's per-channel pixel argmax (SURVEY §3.2 last
    step), mapped back to input resolution through the heatmap stride
    with a half-stride center offset.  Returned as (x, y).
    """
    hm_h, hm_w = heatmaps.shape[-3], heatmaps.shape[-2]
    flat = heatmaps.reshape(*heatmaps.shape[:-3], hm_h * hm_w, heatmaps.shape[-1])
    idx = jnp.argmax(flat, axis=-2)  # (..., K)
    yy = (idx // hm_w).astype(jnp.float32)
    xx = (idx % hm_w).astype(jnp.float32)
    coords_hm = jnp.stack([xx, yy], axis=-1)  # (..., K, 2) in heatmap px
    return coords_hm * stride + (stride - 1) / 2.0
