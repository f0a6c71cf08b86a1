"""On-device crop/scale/rotate/flip augmentation (SURVEY C3).

The reference augments on the host in Python per batch (SURVEY §3.1 hot
loop, "[CPU, Python]") — a guaranteed input-pipeline bottleneck at TPU
speeds (SURVEY §7 hard-parts #5).  Here the whole geometric transform is
expressed as one inverse affine map per image and executed inside jit:
bilinear resampling via ``jax.scipy.ndimage.map_coordinates`` (vmapped
over batch and channels), joint coordinates transformed by the forward
affine, and the left/right joint-label permutation applied under
horizontal flips (``skeleton.FLIP_PERM`` — the classic silent-accuracy
bug called out in SURVEY §7 hard-parts #3).

Everything is static-shaped and branch-free (flip/rotation applied via
arithmetic select), so XLA compiles one program for all draws.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jointpose import skeleton
from jointpose.configs import AugmentConfig

# numpy on purpose: a module-scope jnp.asarray would initialize the
# backend at IMPORT time, before the CLIs' --platform flag can apply
# (and would block module import entirely when the TPU relay is down).
_FLIP_PERM = np.asarray(skeleton.FLIP_PERM, dtype=np.int32)


class AugmentParams(NamedTuple):
    """Per-image augmentation draw (all shapes (B,))."""

    scale: jnp.ndarray
    angle: jnp.ndarray  # radians
    tx: jnp.ndarray  # pixels
    ty: jnp.ndarray  # pixels
    flip: jnp.ndarray  # {0., 1.}
    # Explicit random crop: a (crop_frac*H, crop_frac*W) sub-window at
    # origin (crop_x0, crop_y0) resampled back to (H, W).  frac=1,
    # origin=0 is the identity.
    crop_frac: jnp.ndarray = None
    crop_x0: jnp.ndarray = None  # pixels
    crop_y0: jnp.ndarray = None  # pixels


def _fill_crop_identity(p: AugmentParams) -> AugmentParams:
    if p.crop_frac is not None:
        return p
    batch = p.scale.shape[0]
    z = jnp.zeros((batch,), jnp.float32)
    return p._replace(
        crop_frac=jnp.ones((batch,), jnp.float32), crop_x0=z, crop_y0=z
    )


def identity_augment_params(batch: int) -> AugmentParams:
    z = jnp.zeros((batch,), jnp.float32)
    return _fill_crop_identity(
        AugmentParams(scale=jnp.ones((batch,), jnp.float32), angle=z, tx=z, ty=z, flip=z)
    )


def random_augment_params(
    rng: jax.Array, batch: int, cfg: AugmentConfig, image_hw: tuple[int, int]
) -> AugmentParams:
    """Draw per-image scale/rotation/translation/flip parameters."""
    h, w = image_hw
    k_s, k_a, k_t, k_f, k_c, k_o = jax.random.split(rng, 6)
    scale = jax.random.uniform(
        k_s, (batch,), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
    )
    max_rad = cfg.rotate_deg * jnp.pi / 180.0
    angle = jax.random.uniform(k_a, (batch,), minval=-max_rad, maxval=max_rad)
    t = jax.random.uniform(k_t, (batch, 2), minval=-cfg.translate_frac, maxval=cfg.translate_frac)
    flip = (jax.random.uniform(k_f, (batch,)) < cfg.flip_prob).astype(jnp.float32)
    frac = jax.random.uniform(
        k_c, (batch,), minval=cfg.crop_frac_range[0], maxval=cfg.crop_frac_range[1]
    )
    # Uniform in-frame origin: 0 <= x0 <= (1 - frac) * (w - 1).
    o = jax.random.uniform(k_o, (batch, 2))
    return AugmentParams(
        scale=scale.astype(jnp.float32),
        angle=angle.astype(jnp.float32),
        tx=(t[:, 0] * w).astype(jnp.float32),
        ty=(t[:, 1] * h).astype(jnp.float32),
        flip=flip,
        crop_frac=frac.astype(jnp.float32),
        crop_x0=(o[:, 0] * (1.0 - frac) * (w - 1.0)).astype(jnp.float32),
        crop_y0=(o[:, 1] * (1.0 - frac) * (h - 1.0)).astype(jnp.float32),
    )


def _forward_affine(params: AugmentParams, image_hw: tuple[int, int]):
    """2x2 matrix + offset of the forward map dst = A @ src + b (per image).

    The transform rotates by ``angle`` and scales by ``scale`` about the
    image center, then translates by (tx, ty), then (optionally) mirrors
    horizontally about the vertical center line.  Coordinates are (x, y).

    All 2x2 algebra is written out elementwise: coordinate math must not
    be lowered through ``dot`` (whose default precision is reduced on
    TPU/onednn backends — a 0.1% coordinate error is a PDJ bug).
    """
    h, w = image_hw
    params = _fill_crop_identity(params)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos = jnp.cos(params.angle) * params.scale
    sin = jnp.sin(params.angle) * params.scale
    # Rotation+scale about center, then translation: p' = R (p - c) + c + t
    # Row-major entries of A = [[axx, axy], [ayx, ayy]].
    axx, axy, ayx, ayy = cos, -sin, sin, cos
    bx = cx - (axx * cx + axy * cy) + params.tx
    by = cy - (ayx * cx + ayy * cy) + params.ty
    # Explicit crop FIRST: q = (p - o) / frac (the crop window resampled
    # to full size), then the rotate/scale/translate map above.  Compose
    # A_total = A * zoom (the crop is an isotropic zoom) and fold the
    # crop origin into the offset.
    zoom = 1.0 / params.crop_frac
    ox, oy = -params.crop_x0 * zoom, -params.crop_y0 * zoom
    bx = axx * ox + axy * oy + bx
    by = ayx * ox + ayy * oy + by
    axx, axy, ayx, ayy = axx * zoom, axy * zoom, ayx * zoom, ayy * zoom
    # Horizontal mirror F(p) = (w-1-x, y): compose F after the affine.
    #   F(A p + b) = M A p + M b + m,  M = diag(-1, 1), m = (w-1, 0)
    f = params.flip
    axx = (1 - f) * axx + f * (-axx)
    axy = (1 - f) * axy + f * (-axy)
    bx = (1 - f) * bx + f * (w - 1.0 - bx)
    a = jnp.stack(
        [jnp.stack([axx, axy], -1), jnp.stack([ayx, ayy], -1)], -2
    )  # (B, 2, 2)
    b = jnp.stack([bx, by], -1)  # (B, 2)
    return a, b


def _apply_affine(a: jnp.ndarray, b: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply per-image affine (B,2,2),(B,2) to points (B,K,2), elementwise."""
    x, y = pts[..., 0], pts[..., 1]
    ox = a[:, None, 0, 0] * x + a[:, None, 0, 1] * y + b[:, None, 0]
    oy = a[:, None, 1, 0] * x + a[:, None, 1, 1] * y + b[:, None, 1]
    return jnp.stack([ox, oy], axis=-1)


def transform_joints(
    joints_xy: jnp.ndarray,
    visible: jnp.ndarray,
    params: AugmentParams,
    image_hw: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the forward affine to joint coords; permute labels under flip.

    Args:
      joints_xy: (B, K, 2) image-pixel coords (x, y).
      visible: (B, K) mask.
    Returns:
      (joints', visible'): transformed coords and visibility (joints that
      leave the frame become invisible).
    """
    h, w = image_hw
    a, b = _forward_affine(params, image_hw)
    out = _apply_affine(a, b, joints_xy)
    # Flip permutes the joint-label axis (L<->R swap).
    flipped = out[:, _FLIP_PERM, :]
    vis_flipped = visible[:, _FLIP_PERM]
    f = params.flip[:, None, None]
    out = (1 - f) * out + f * flipped
    vis = (1 - params.flip[:, None]) * visible + params.flip[:, None] * vis_flipped
    in_frame = (
        (out[..., 0] >= 0.0)
        & (out[..., 0] <= w - 1.0)
        & (out[..., 1] >= 0.0)
        & (out[..., 1] <= h - 1.0)
    )
    return out, vis * in_frame.astype(visible.dtype)


def _warp_images(images: jnp.ndarray, a_inv: jnp.ndarray, b_inv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear inverse warp of a batch: src = A_inv dst + b_inv per image.

    Implementation choice is driven by measured TPU lowering costs
    (cost_analysis at 240x360x3, B=32 — XLA lowers image-scale gathers
    to one-hot contractions):

    - per-image vmapped ``map_coordinates``: ~0.8 GB/img accessed  <- used
    - manual bilinear, per-image gather tables: ~23 GB/img
    - manual bilinear, one global flattened table: ~23 GB/img
      (a bare 2.76M-row take alone costs ~5.7 GB/img)

    A Pallas warp kernel (image resident in VMEM, ~1 MB) is the future
    lever if augmentation ever bounds training throughput.
    """
    h, w = images.shape[1], images.shape[2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W) each

    def warp_one(image, ai, bi):
        src_x = ai[0, 0] * gx + ai[0, 1] * gy + bi[0]
        src_y = ai[1, 0] * gx + ai[1, 1] * gy + bi[1]
        coords = jnp.stack([src_y, src_x])  # map_coordinates wants (row, col)

        def one_channel(chan):
            return jax.scipy.ndimage.map_coordinates(
                chan, list(coords), order=1, mode="constant"
            )

        return jax.vmap(one_channel, in_axes=2, out_axes=2)(image)

    return jax.vmap(warp_one)(images, a_inv, b_inv)


def augment_batch(
    images: jnp.ndarray,
    joints_xy: jnp.ndarray,
    visible: jnp.ndarray,
    params: AugmentParams,
    warp_impl: str = "gather",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Warp a batch of images and transform their joint annotations.

    Args:
      images: (B, H, W, C) float in [0, 1], or raw uint8 RGB (converted
        to float here — bilinear blending needs float math; the convert
        runs on device so uint8 splits ride the host->device transfer
        at one byte per pixel-channel).
      joints_xy: (B, K, 2) image coords (x, y).
      visible: (B, K).
      warp_impl: 'gather' (map_coordinates bilinear, the historical
        stream) or 'shear' (two-pass Pallas matmul resample,
        ~400x less HBM traffic; AugmentConfig.warp_impl).
    Returns:
      (images', joints', visible') with float images.
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) * (1.0 / 255.0)
    image_hw = (images.shape[1], images.shape[2])
    a, b = _forward_affine(params, image_hw)
    # Closed-form 2x2 inverse (elementwise; see _forward_affine on precision).
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    inv00 = a[:, 1, 1] / det
    inv01 = -a[:, 0, 1] / det
    inv10 = -a[:, 1, 0] / det
    inv11 = a[:, 0, 0] / det
    a_inv = jnp.stack(
        [jnp.stack([inv00, inv01], -1), jnp.stack([inv10, inv11], -1)], -2
    )
    b_inv = jnp.stack(
        [-(inv00 * b[:, 0] + inv01 * b[:, 1]), -(inv10 * b[:, 0] + inv11 * b[:, 1])], -1
    )
    if warp_impl == "shear":
        # Gather-free two-pass resample (jointpose/ops/warp_pallas.py):
        # ~2 MB/img of traffic vs the gather's measured ~0.8 GB/img.
        # Different (equally valid) sample values under rotation, so
        # presets that enable it get a different training stream — see
        # BASELINE.md round 3.
        from jointpose.ops.warp_pallas import shear_warp

        warped = shear_warp(images, a_inv, b_inv)
    else:
        warped = _warp_images(images, a_inv, b_inv)
    joints_out, vis_out = transform_joints(joints_xy, visible, params, image_hw)
    return warped, joints_out, vis_out
