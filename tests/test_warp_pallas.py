"""Tests for the gather-free two-pass shear warp (ops/warp_pallas.py).

Correctness contract: (a) exact identity/integer-shift behavior, (b)
bitwise-class agreement with single-pass bilinear for axis-aligned
maps (where the two resamplings coincide mathematically), (c) the
Pallas kernel matches the plain-jnp two-pass oracle everywhere, and
(d) the end-to-end invariant that matters for training: image content
follows the transformed joint coordinates under full scale/rotate/
flip/crop draws.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointpose.data.augment import (
    AugmentParams,
    _fill_crop_identity,
    _forward_affine,
    augment_batch,
    identity_augment_params,
    random_augment_params,
)
from jointpose.configs import AugmentConfig
from jointpose.ops.warp_pallas import shear_warp, shear_warp_reference


def _inverse(params, hw):
    a, b = _forward_affine(params, hw)
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    a_inv = (
        jnp.stack(
            [
                jnp.stack([a[:, 1, 1], -a[:, 0, 1]], -1),
                jnp.stack([-a[:, 1, 0], a[:, 0, 0]], -1),
            ],
            -2,
        )
        / det[:, None, None]
    )
    b_inv = -jnp.einsum("bij,bj->bi", a_inv, b)
    return a_inv, b_inv


def _images(batch=2, h=24, w=32, c=3, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (batch, h, w, c))


def test_identity_is_exact():
    imgs = _images()
    p = identity_augment_params(imgs.shape[0])
    a_inv, b_inv = _inverse(p, imgs.shape[1:3])
    out = shear_warp(imgs, a_inv, b_inv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-6)


def test_integer_translation_is_exact_shift():
    imgs = _images(batch=1)
    z = jnp.zeros((1,), jnp.float32)
    p = _fill_crop_identity(
        AugmentParams(scale=jnp.ones((1,)), angle=z, tx=z + 3.0, ty=z - 2.0, flip=z)
    )
    a_inv, b_inv = _inverse(p, imgs.shape[1:3])
    out = np.asarray(shear_warp(imgs, a_inv, b_inv))
    # dst = src + (3, -2): content moves right 3 and up 2.
    ref = np.zeros_like(out)
    ref[:, : 24 - 2, 3:, :] = np.asarray(imgs)[:, 2:, : 32 - 3, :]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_axis_aligned_matches_gather_bilinear():
    """Scale + fractional translate + flip (no rotation): the two-pass
    resample coincides with single-pass bilinear, so the shear warp
    must match the historical map_coordinates path."""
    from jointpose.data.augment import _warp_images

    imgs = _images(batch=3, h=20, w=28)
    z = jnp.zeros((3,), jnp.float32)
    p = _fill_crop_identity(
        AugmentParams(
            scale=jnp.asarray([0.8, 1.0, 1.25]),
            angle=z,
            tx=jnp.asarray([0.5, -1.25, 2.0]),
            ty=jnp.asarray([1.5, 0.25, -0.75]),
            flip=jnp.asarray([0.0, 1.0, 0.0]),
        )
    )
    a_inv, b_inv = _inverse(p, imgs.shape[1:3])
    ours = np.asarray(shear_warp(imgs, a_inv, b_inv))
    ref = np.asarray(_warp_images(imgs, a_inv, b_inv))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_pallas_matches_reference_oracle_with_rotation():
    imgs = _images(batch=2, h=24, w=36)
    cfg = AugmentConfig()
    p = random_augment_params(jax.random.PRNGKey(7), 2, cfg, imgs.shape[1:3])
    a_inv, b_inv = _inverse(p, imgs.shape[1:3])
    ours = np.asarray(shear_warp(imgs, a_inv, b_inv))
    ref = np.asarray(shear_warp_reference(imgs, a_inv, b_inv))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_csub_variant_matches_production_kernel():
    """Round 5: the channel-in-sublane orientation (now the production
    shear_warp) computes the identical two-pass math as the original
    row-major kernel through transposed operands — the two orientations
    must match to fp32 noise under a full draw (rotation + shear
    engaged).  This pins that the round-5 kernel flip did not change
    the training stream."""
    from jointpose.ops.warp_pallas import shear_warp_rowmajor

    imgs = _images(batch=3, h=24, w=36)
    cfg = AugmentConfig()
    p = random_augment_params(jax.random.PRNGKey(3), 3, cfg, imgs.shape[1:3])
    a_inv, b_inv = _inverse(p, imgs.shape[1:3])
    ours = np.asarray(shear_warp(imgs, a_inv, b_inv))
    want = np.asarray(shear_warp_rowmajor(imgs, a_inv, b_inv))
    np.testing.assert_allclose(ours, want, atol=2e-6)


@pytest.mark.parametrize("seed", [1, 5])
def test_content_follows_joints_under_full_draw(seed):
    """Render a bright dot at each joint, augment with warp_impl='shear',
    and check the warped dot lands at the transformed joint coordinate
    — the invariant training actually depends on."""
    h, w = 48, 64
    rng = np.random.default_rng(seed)
    joints = jnp.asarray(
        rng.uniform([10, 10], [w - 11, h - 11], size=(2, 9, 2)), jnp.float32
    )
    vis = jnp.ones((2, 9), jnp.float32)
    ys, xs = jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    imgs = jnp.zeros((2, h, w, 9))
    for k in range(9):
        d2 = (gx[None] - joints[:, k, 0, None, None]) ** 2 + (
            gy[None] - joints[:, k, 1, None, None]
        ) ** 2
        imgs = imgs.at[..., k].set(jnp.exp(-d2 / 4.0))
    cfg = AugmentConfig(rotate_deg=25.0, crop_frac_range=(0.8, 1.0))
    p = random_augment_params(jax.random.PRNGKey(seed), 2, cfg, (h, w))
    warped, _, _ = augment_batch(imgs, joints, vis, p, warp_impl="shear")
    # Channel k carries ORIGINAL joint k's content (augment_batch
    # permutes joint labels under flip, not image channels), so compare
    # against the raw per-image affine applied to joint k.
    a, b_off = _forward_affine(p, (h, w))
    exp = jnp.einsum("bij,bkj->bki", a, joints) + b_off[:, None, :]
    for b in range(2):
        for k in range(9):
            ex, ey = float(exp[b, k, 0]), float(exp[b, k, 1])
            if not (3 <= ex <= w - 4 and 3 <= ey <= h - 4):
                continue  # dot clipped at the frame edge
            flat = np.asarray(warped[b, :, :, k]).argmax()
            py, px = divmod(int(flat), w)
            # Sub-pixel truth vs integer argmax: within ~1.2 px.
            assert abs(px - ex) < 1.25, (b, k, px, ex)
            assert abs(py - ey) < 1.25, (b, k, py, ey)
