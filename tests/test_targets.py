"""Unit tests for Gaussian heatmap rendering and argmax decode (SURVEY C4)."""

import jax.numpy as jnp
import numpy as np

from jointpose.data.targets import heatmap_to_coords, render_gaussian_heatmaps


def test_gaussian_peak_location_and_value():
    joints = jnp.asarray([[[12.0, 7.0], [3.0, 20.0]]])  # (1, K=2, 2) (x, y)
    vis = jnp.ones((1, 2))
    hm = render_gaussian_heatmaps(joints, vis, heatmap_hw=(24, 32), sigma=1.5)
    assert hm.shape == (1, 24, 32, 2)
    # Peak of channel 0 at (y=7, x=12), value 1 (integer-coord joint).
    np.testing.assert_allclose(hm[0, 7, 12, 0], 1.0, atol=1e-6)
    flat0 = np.asarray(hm[0, :, :, 0])
    assert np.unravel_index(flat0.argmax(), flat0.shape) == (7, 12)
    flat1 = np.asarray(hm[0, :, :, 1])
    assert np.unravel_index(flat1.argmax(), flat1.shape) == (20, 3)


def test_gaussian_sigma_controls_width():
    joints = jnp.asarray([[[16.0, 12.0]]])
    vis = jnp.ones((1, 1))
    narrow = render_gaussian_heatmaps(joints, vis, (24, 32), sigma=1.0)
    wide = render_gaussian_heatmaps(joints, vis, (24, 32), sigma=3.0)
    # One sigma away: value should be exp(-0.5) for both.
    np.testing.assert_allclose(narrow[0, 12, 17, 0], np.exp(-0.5), atol=1e-5)
    np.testing.assert_allclose(wide[0, 12 + 3, 16, 0], np.exp(-0.5), atol=1e-5)
    assert float(wide.sum()) > float(narrow.sum())


def test_invisible_joint_renders_zero():
    joints = jnp.asarray([[[5.0, 5.0], [9.0, 9.0]]])
    vis = jnp.asarray([[1.0, 0.0]])
    hm = render_gaussian_heatmaps(joints, vis, (16, 16), sigma=1.5)
    assert float(jnp.abs(hm[..., 1]).max()) == 0.0
    assert float(hm[..., 0].max()) == 1.0


def test_normalized_target_sums_to_one():
    joints = jnp.asarray([[[10.0, 8.0]]])
    vis = jnp.ones((1, 1))
    hm = render_gaussian_heatmaps(joints, vis, (24, 32), sigma=2.0, normalize=True)
    np.testing.assert_allclose(float(hm.sum()), 1.0, atol=1e-5)


def test_argmax_decode_roundtrip():
    # Render at known heatmap coords, decode back to image coords.
    stride = 4
    joints_hm = jnp.asarray([[[12.0, 7.0], [3.0, 20.0]]])
    vis = jnp.ones((1, 2))
    hm = render_gaussian_heatmaps(joints_hm, vis, (24, 32), sigma=1.5)
    coords = heatmap_to_coords(hm, stride=stride)
    expected = np.asarray([[[12.0, 7.0], [3.0, 20.0]]]) * stride + (stride - 1) / 2
    np.testing.assert_allclose(np.asarray(coords), expected, atol=1e-5)


def test_refined_decode_improves_subpixel_accuracy():
    # Joints at non-integer heatmap coords: plain argmax quantizes to the
    # grid; the 3x3 softmax-centroid refinement must get closer.
    stride = 4
    rs = np.random.RandomState(0)
    joints_hm = jnp.asarray(rs.uniform(4, 18, (8, 5, 2)), jnp.float32)
    vis = jnp.ones((8, 5))
    hm = render_gaussian_heatmaps(joints_hm, vis, (24, 32), sigma=1.5)
    expected = np.asarray(joints_hm) * stride + (stride - 1) / 2
    plain = np.asarray(heatmap_to_coords(hm, stride))
    refined = np.asarray(heatmap_to_coords(hm, stride, refine=True))
    err_plain = np.linalg.norm(plain - expected, axis=-1).mean()
    err_refined = np.linalg.norm(refined - expected, axis=-1).mean()
    assert err_refined < err_plain * 0.75, (err_plain, err_refined)
    assert err_refined < 2.0  # image px


def test_refined_decode_exact_at_integer_peaks():
    # At integer-coordinate peaks the refinement must not move the
    # decode materially (symmetric neighborhood -> ~zero offset).
    stride = 4
    joints_hm = jnp.asarray([[[12.0, 7.0], [20.0, 15.0]]])
    vis = jnp.ones((1, 2))
    hm = render_gaussian_heatmaps(joints_hm, vis, (24, 32), sigma=1.5)
    plain = np.asarray(heatmap_to_coords(hm, stride))
    refined = np.asarray(heatmap_to_coords(hm, stride, refine=True))
    np.testing.assert_allclose(refined, plain, atol=0.3)


def test_render_decode_convention_roundtrip_unbiased():
    # Regression (review finding): rendering targets for ground-truth
    # image coords and decoding them back must be bias-free — a perfect
    # model's predictions should sit on the ground truth, not
    # +(stride-1)/2 px off.
    from jointpose.data.targets import image_to_heatmap_coords

    stride = 4
    rs = np.random.RandomState(3)
    joints_img = jnp.asarray(rs.uniform(20, 70, (16, 5, 2)), jnp.float32)
    vis = jnp.ones((16, 5))
    joints_hm = image_to_heatmap_coords(joints_img, stride)
    hm = render_gaussian_heatmaps(joints_hm, vis, (24, 32), sigma=1.5)
    decoded = np.asarray(heatmap_to_coords(hm, stride, refine=True))
    bias = (decoded - np.asarray(joints_img)).mean(axis=(0, 1))
    assert np.abs(bias).max() < 0.25, f"systematic bias {bias}"
    err = np.linalg.norm(decoded - np.asarray(joints_img), axis=-1).mean()
    assert err < 1.5, err
