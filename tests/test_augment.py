"""Unit tests for the on-device augmentation coordinate math (SURVEY C3).

Covers the invariants SURVEY §4 calls out: rotate/scale of a known
point, flip involution including the left/right joint-label swap, and
image/coordinate consistency under warping.
"""

import jax.numpy as jnp
import numpy as np

from jointpose import skeleton
from jointpose.data.augment import (
    AugmentParams,
    augment_batch,
    identity_augment_params,
    transform_joints,
)

HW = (32, 48)  # (H, W)


def _params(scale=1.0, angle=0.0, tx=0.0, ty=0.0, flip=0.0, batch=1):
    mk = lambda v: jnp.full((batch,), v, jnp.float32)
    return AugmentParams(scale=mk(scale), angle=mk(angle), tx=mk(tx), ty=mk(ty), flip=mk(flip))


def test_identity_transform_is_noop():
    joints = jnp.asarray([[[10.0, 20.0], [5.0, 5.0]] + [[8.0, 8.0]] * 7])  # (1, 9, 2)
    vis = jnp.ones((1, 9))
    out, vis_out = transform_joints(joints, vis, identity_augment_params(1), HW)
    np.testing.assert_allclose(np.asarray(out), np.asarray(joints), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vis_out), 1.0)


def test_center_is_fixed_point_of_rotation_and_scale():
    h, w = HW
    center = jnp.asarray([[(w - 1) / 2, (h - 1) / 2]] * skeleton.NUM_JOINTS)[None]
    vis = jnp.ones((1, skeleton.NUM_JOINTS))
    out, _ = transform_joints(center, vis, _params(scale=1.27, angle=0.9), HW)
    np.testing.assert_allclose(np.asarray(out), np.asarray(center), atol=1e-4)


def test_rotation_of_known_point():
    # Point one unit right of center, rotated by +90deg -> one unit below
    # center (y grows downward; rotation matrix [[c,-s],[s,c]] on (x,y)).
    h, w = HW
    cx, cy = (w - 1) / 2, (h - 1) / 2
    joints = jnp.tile(jnp.asarray([[cx + 5.0, cy]]), (skeleton.NUM_JOINTS, 1))[None]
    vis = jnp.ones((1, skeleton.NUM_JOINTS))
    out, _ = transform_joints(joints, vis, _params(angle=np.pi / 2), HW)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [cx, cy + 5.0], atol=1e-4)


def test_scale_about_center():
    h, w = HW
    cx, cy = (w - 1) / 2, (h - 1) / 2
    joints = jnp.tile(jnp.asarray([[cx + 4.0, cy - 2.0]]), (skeleton.NUM_JOINTS, 1))[None]
    vis = jnp.ones((1, skeleton.NUM_JOINTS))
    out, _ = transform_joints(joints, vis, _params(scale=2.0), HW)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [cx + 8.0, cy - 4.0], atol=1e-4)


def test_translation():
    joints = jnp.tile(jnp.asarray([[10.0, 12.0]]), (skeleton.NUM_JOINTS, 1))[None]
    vis = jnp.ones((1, skeleton.NUM_JOINTS))
    out, _ = transform_joints(joints, vis, _params(tx=3.0, ty=-2.0), HW)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [13.0, 10.0], atol=1e-4)


def test_flip_swaps_left_right_labels_and_mirrors_x():
    h, w = HW
    k = skeleton.NUM_JOINTS
    joints = jnp.asarray(np.random.RandomState(0).uniform(2, 28, size=(1, k, 2)), jnp.float32)
    vis = jnp.ones((1, k))
    out, _ = transform_joints(joints, vis, _params(flip=1.0), HW)
    # Joint i's new coords are the mirrored coords of its flip partner.
    perm = list(skeleton.FLIP_PERM)
    expected_x = (w - 1) - np.asarray(joints)[0, perm, 0]
    expected_y = np.asarray(joints)[0, perm, 1]
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], expected_x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out)[0, :, 1], expected_y, atol=1e-4)
    # lsho's slot now holds the mirrored rsho.
    li, ri = skeleton.JOINT_INDEX["lsho"], skeleton.JOINT_INDEX["rsho"]
    assert perm[li] == ri


def test_flip_is_involution():
    k = skeleton.NUM_JOINTS
    joints = jnp.asarray(np.random.RandomState(1).uniform(2, 28, size=(1, k, 2)), jnp.float32)
    vis = jnp.ones((1, k))
    once, _ = transform_joints(joints, vis, _params(flip=1.0), HW)
    twice, _ = transform_joints(once, vis, _params(flip=1.0), HW)
    np.testing.assert_allclose(np.asarray(twice), np.asarray(joints), atol=1e-4)


def test_out_of_frame_joint_becomes_invisible():
    joints = jnp.tile(jnp.asarray([[2.0, 16.0]]), (skeleton.NUM_JOINTS, 1))[None]
    vis = jnp.ones((1, skeleton.NUM_JOINTS))
    _, vis_out = transform_joints(joints, vis, _params(tx=-10.0), HW)
    np.testing.assert_allclose(np.asarray(vis_out), 0.0)


def test_warped_image_tracks_joints():
    # Paint a bright dot at a known joint, augment, check the warped image
    # is bright at the transformed joint location.
    h, w = HW
    k = skeleton.NUM_JOINTS
    joint = np.asarray([30.0, 10.0])  # (x, y)
    img = np.zeros((1, h, w, 3), np.float32)
    img[0, int(joint[1]) - 1 : int(joint[1]) + 2, int(joint[0]) - 1 : int(joint[0]) + 2] = 1.0
    joints = jnp.tile(jnp.asarray(joint)[None], (k, 1))[None]
    vis = jnp.ones((1, k))
    params = _params(scale=1.1, angle=0.3, tx=2.0, ty=-1.0, flip=1.0)
    warped, joints_out, vis_out = augment_batch(jnp.asarray(img), joints, vis, params)
    assert float(vis_out[0, 0]) == 1.0
    x, y = np.asarray(joints_out)[0, 0]
    patch = np.asarray(warped)[0, int(round(y)) - 1 : int(round(y)) + 2,
                               int(round(x)) - 1 : int(round(x)) + 2]
    assert patch.max() > 0.5, f"dot not found near transformed joint ({x:.1f},{y:.1f})"
    # Far from the dot the image should be dark.
    far = np.asarray(warped)[0]
    mask = np.ones((h, w), bool)
    y0, x0 = int(round(y)), int(round(x))
    mask[max(0, y0 - 6) : y0 + 7, max(0, x0 - 6) : x0 + 7] = False
    assert far[mask].max() < 0.5


def _crop_params(frac, x0, y0, batch=1, **kw):
    p = _params(batch=batch, **kw)
    mk = lambda v: jnp.full((batch,), v, jnp.float32)
    return p._replace(crop_frac=mk(frac), crop_x0=mk(x0), crop_y0=mk(y0))


def test_crop_maps_window_corners_to_frame_corners():
    # The crop window [(x0, y0), (x0 + frac*(w-1), y0 + frac*(h-1))]
    # resamples to the full frame: its corners land on the frame corners.
    h, w = HW
    frac, x0, y0 = 0.5, 6.0, 4.0
    corners = jnp.asarray(
        [[x0, y0], [x0 + frac * (w - 1), y0 + frac * (h - 1)]]
        + [[x0 + 1.0, y0 + 1.0]] * (skeleton.NUM_JOINTS - 2)
    )[None]
    vis = jnp.ones((1, skeleton.NUM_JOINTS))
    out, vis_out = transform_joints(corners, vis, _crop_params(frac, x0, y0), HW)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[0, 1]), [w - 1.0, h - 1.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(vis_out), 1.0)


def test_crop_composes_with_flip_label_swap():
    # Crop then mirror: x' = (w-1) - (x - x0)/frac.
    h, w = HW
    frac, x0, y0 = 0.5, 6.0, 4.0
    joints = jnp.tile(jnp.asarray([[x0 + 2.0, y0 + 3.0]]), (skeleton.NUM_JOINTS, 1))[None]
    vis = jnp.ones((1, skeleton.NUM_JOINTS))
    out, _ = transform_joints(joints, vis, _crop_params(frac, x0, y0, flip=1.0), HW)
    np.testing.assert_allclose(
        np.asarray(out[0, skeleton.FLIP_PERM[0]]),
        [(w - 1.0) - 2.0 / frac, 3.0 / frac],
        atol=1e-4,
    )


def test_crop_outside_window_becomes_invisible():
    h, w = HW
    joints = jnp.tile(jnp.asarray([[1.0, 1.0]]), (skeleton.NUM_JOINTS, 1))[None]
    vis = jnp.ones((1, skeleton.NUM_JOINTS))
    _, vis_out = transform_joints(joints, vis, _crop_params(0.5, 10.0, 8.0), HW)
    np.testing.assert_allclose(np.asarray(vis_out), 0.0)


def test_crop_warped_image_matches_coordinates():
    # A linear-ramp image warped by a pure crop must equal the ramp
    # evaluated at the source coordinates (bilinear is exact on ramps).
    h, w = HW
    frac, x0, y0 = 0.5, 6.0, 4.0
    gx = jnp.tile(jnp.arange(w, dtype=jnp.float32)[None, :, None], (h, 1, 1))
    images = gx[None]  # (1, H, W, 1) value == x coordinate
    joints = jnp.tile(jnp.asarray([[x0 + 2.0, y0 + 2.0]]), (skeleton.NUM_JOINTS, 1))[None]
    vis = jnp.ones((1, skeleton.NUM_JOINTS))
    warped, out, _ = augment_batch(images, joints, vis, _crop_params(frac, x0, y0))
    ys = np.arange(h)
    xs = np.arange(w)
    expected = x0 + frac * xs  # src x of each dst column
    interior = np.asarray(warped[0, : int(frac * (h - 1)), : int(frac * (w - 1)), 0])
    np.testing.assert_allclose(
        interior, np.tile(expected[: interior.shape[1]], (interior.shape[0], 1)),
        atol=1e-3,
    )


def test_identity_crop_matches_legacy_params():
    # Params built without crop fields (legacy call sites) behave as the
    # identity crop.
    joints = jnp.tile(jnp.asarray([[10.0, 12.0]]), (skeleton.NUM_JOINTS, 1))[None]
    vis = jnp.ones((1, skeleton.NUM_JOINTS))
    legacy = _params(scale=1.3, angle=0.4, tx=2.0)
    explicit = legacy._replace(
        crop_frac=jnp.ones((1,)), crop_x0=jnp.zeros((1,)), crop_y0=jnp.zeros((1,))
    )
    a, _ = transform_joints(joints, vis, legacy, HW)
    b, _ = transform_joints(joints, vis, explicit, HW)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
