"""Tests for pairwise displacement prior estimation (SURVEY C9, §4).

Includes the survey's mandated synthetic 2-joint known-offset test and
the critical convention check: a prior estimated from data, used as an
MRF kernel, must move probability mass to where the data says the
target joint is.
"""

import jax.numpy as jnp
import numpy as np

from jointpose.data.pipeline import make_dataset
from jointpose.ops.mrf_xla import mrf_message_pass_xla
from jointpose.priors import (
    expected_displacement,
    estimate_priors,
    pairwise_displacement_histograms,
)

WIN = (11, 15)


def _two_joint_set(offset_xy=(4.0, -2.0), n=200, jitter=0.0, seed=0):
    rs = np.random.RandomState(seed)
    base = rs.uniform(10, 20, size=(n, 1, 2))
    off = np.asarray(offset_xy) + jitter * rs.randn(n, 1, 2)
    joints = np.concatenate([base, base + off], axis=1)  # (N, 2, 2)
    visible = np.ones((n, 2), np.float32)
    return joints.astype(np.float32), visible


def test_known_offset_prior_peak():
    joints, vis = _two_joint_set(offset_xy=(4.0, -2.0))
    priors = pairwise_displacement_histograms(joints, vis, WIN, smooth_sigma=0.0)
    cy, cx = WIN[0] // 2, WIN[1] // 2
    # Pair (v=0, a=1): displacement (dx=4, dy=-2) -> tap at (cy+2, cx-4).
    peak = np.unravel_index(priors[:, :, 0, 1].argmax(), WIN)
    assert peak == (cy + 2, cx - 4), peak
    # Reverse pair gets the negated displacement.
    peak_rev = np.unravel_index(priors[:, :, 1, 0].argmax(), WIN)
    assert peak_rev == (cy - 2, cx + 4), peak_rev
    # Self-pairs are deltas at the center.
    assert np.unravel_index(priors[:, :, 0, 0].argmax(), WIN) == (cy, cx)
    np.testing.assert_allclose(priors.sum(axis=(0, 1)), 1.0, atol=1e-5)


def test_expected_displacement_matches_offset():
    joints, vis = _two_joint_set(offset_xy=(3.0, 1.0), jitter=0.8, seed=1)
    priors = pairwise_displacement_histograms(joints, vis, WIN, smooth_sigma=1.0)
    disp = expected_displacement(priors)
    np.testing.assert_allclose(disp[0, 1], [3.0, 1.0], atol=0.35)
    np.testing.assert_allclose(disp[1, 0], [-3.0, -1.0], atol=0.35)
    np.testing.assert_allclose(disp[0, 0], [0.0, 0.0], atol=1e-5)


def test_invisible_pairs_fall_back_to_uniform():
    joints, vis = _two_joint_set()
    vis[:, 1] = 0.0  # joint 1 never visible
    priors = pairwise_displacement_histograms(joints, vis, WIN, smooth_sigma=0.0)
    np.testing.assert_allclose(priors[:, :, 0, 1], 1.0 / (WIN[0] * WIN[1]))
    np.testing.assert_allclose(priors.sum(axis=(0, 1)), 1.0, atol=1e-5)


def test_prior_as_mrf_kernel_moves_mass_to_target():
    # End-to-end convention check (priors -> MRF): with a delta unary at
    # joint v and the estimated prior as kernel, joint a's refined map
    # must peak at v's position + the empirical offset.
    offset = (4.0, -2.0)
    joints, vis = _two_joint_set(offset_xy=offset)
    priors = pairwise_displacement_histograms(joints, vis, WIN, smooth_sigma=0.0)
    h, w = 24, 32
    p = np.zeros((1, h, w, 2), np.float32)
    p[0, 10, 12, 0] = 1.0  # joint 0 at (y=10, x=12)
    p[0, 12, 20, 1] = 1.0
    out = np.asarray(
        mrf_message_pass_xla(
            jnp.asarray(p), jnp.asarray(priors), jnp.full((2, 2), 1e-5, jnp.float32)
        )
    )
    # Joint 1's map: contribution from joint 0 should peak at
    # (10 + dy, 12 + dx) = (8, 16); the self-term peaks at (12, 20); with
    # a delta unary both terms multiply, but only positions where BOTH
    # factors exceed the bias floor can win — the (v=0) message dominates
    # the argmax unless self-term zeroes it.  Use uniform self-pairs to
    # isolate the cross-joint message.
    priors_iso = priors.copy()
    priors_iso[:, :, 0, 0] = 1.0 / (WIN[0] * WIN[1])
    priors_iso[:, :, 1, 1] = 1.0 / (WIN[0] * WIN[1])
    out = np.asarray(
        mrf_message_pass_xla(
            jnp.asarray(p), jnp.asarray(priors_iso), jnp.full((2, 2), 1e-5, jnp.float32)
        )
    )
    peak1 = np.unravel_index(out[0, :, :, 1].argmax(), (h, w))
    assert peak1 == (10 - 2, 12 + 4), peak1


def test_estimate_priors_from_synthetic_dataset(tiny_config):
    train, _ = make_dataset(tiny_config.data)
    priors = estimate_priors(train, tiny_config, smooth_sigma=1.0)
    wh, ww = tiny_config.mrf.window
    k = tiny_config.num_joints
    assert priors.shape == (wh, ww, k, k)
    np.testing.assert_allclose(priors.sum(axis=(0, 1)), 1.0, atol=1e-4)
    # Anatomy sanity on synthetic poses: hips sit below shoulders, so the
    # expected dy of (v=lsho -> a=lhip) is positive (y grows downward).
    from jointpose import skeleton

    disp = expected_displacement(priors)
    v, a = skeleton.JOINT_INDEX["lsho"], skeleton.JOINT_INDEX["lhip"]
    assert disp[v, a, 1] > 0.5, disp[v, a]
