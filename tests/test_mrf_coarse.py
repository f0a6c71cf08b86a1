"""Tests for the coarse (stride-2) MRF variant (MRFConfig.stride)."""

import jax
import jax.numpy as jnp
import numpy as np

from jointpose.configs import MRFConfig
from jointpose.models.mrf import SpatialModel
from jointpose.ops.mrf_xla import mrf_message_pass_coarse, mrf_message_pass_xla

H, W, K = 24, 32, 3
WIN = (7, 9)  # coarse-grid window


def _heatmaps(seed=0, batch=1):
    p = np.random.RandomState(seed).rand(batch, H, W, K).astype(np.float32)
    p /= p.sum(axis=(1, 2), keepdims=True)
    return jnp.asarray(p)


def test_coarse_shapes_and_finiteness():
    p = _heatmaps()
    kernels = jnp.asarray(np.random.RandomState(1).rand(*WIN, K, K) * 0.1, jnp.float32)
    biases = jnp.full((K, K), 1e-4, jnp.float32)
    out = mrf_message_pass_coarse(p, kernels, biases, stride=2)
    assert out.shape == (1, H, W, K)
    assert np.isfinite(np.asarray(out)).all()


def test_coarse_delta_kernel_moves_peak():
    # Same displacement-semantics check as the full-res pass, but the
    # kernel taps act on the coarse grid: a tap cluster at coarse offset
    # (dy, dx) moves the peak by stride*(dy, dx) heatmap pixels.  Joint 1
    # is uniform so its self-message is a constant and the cross-message
    # from joint 0 alone determines the argmax; the cross kernel is a
    # 3x3 blob so the upsampled message survives bilinear interpolation.
    p = np.zeros((1, H, W, 2), np.float32)
    p[0, 8, 12, 0] = 1.0
    p[0, :, :, 1] = 1.0
    p /= p.sum(axis=(1, 2), keepdims=True)
    dy, dx = 2, 3  # coarse-grid displacement
    wh, ww = WIN
    cy, cx = wh // 2, ww // 2
    kernels = np.zeros((wh, ww, 2, 2), np.float32)
    kernels[cy - dy - 1 : cy - dy + 2, cx - dx - 1 : cx - dx + 2, 0, 1] = 1.0 / 9
    for v in range(2):
        for a in range(2):
            if (v, a) != (0, 1):
                kernels[:, :, v, a] = 1.0 / (wh * ww)
    out = np.asarray(
        mrf_message_pass_coarse(
            jnp.asarray(p), jnp.asarray(kernels),
            jnp.full((2, 2), 1e-6, jnp.float32), stride=2,
        )
    )
    # Joint 1's unary is uniform, so argmax = cross-message peak at
    # (8 + 2*dy, 12 + 2*dx) = (12, 18) up to upsampling alignment.
    peak = np.unravel_index(out[0, :, :, 1].argmax(), (H, W))
    assert abs(peak[0] - 12) <= 1 and abs(peak[1] - 18) <= 1, peak


def test_coarse_unary_dominates_localization():
    # With near-uniform kernels, the argmax of the coarse-MRF output must
    # sit exactly at the full-resolution unary peak (no coarse snapping).
    p = np.full((1, H, W, K), 1e-7, np.float32)
    p[0, 13, 21, :] = 1.0  # deliberately odd coords (not stride-aligned)
    p /= p.sum(axis=(1, 2), keepdims=True)
    kernels = jnp.full((*WIN, K, K), 1.0 / (WIN[0] * WIN[1]), jnp.float32)
    biases = jnp.full((K, K), 1e-4, jnp.float32)
    out = np.asarray(
        mrf_message_pass_coarse(jnp.asarray(p), kernels, biases, stride=2)
    )
    for a in range(K):
        peak = np.unravel_index(out[0, :, :, a].argmax(), (H, W))
        assert peak == (13, 21), (a, peak)


def test_spatial_model_module_coarse():
    cfg = MRFConfig(window=WIN, stride=2, use_pallas=False)
    model = SpatialModel(cfg, num_joints=K)
    p = _heatmaps(batch=2)
    params = model.init(jax.random.PRNGKey(0), p)
    out = model.apply(params, p)
    assert out.shape == (2, H, W, K)
    assert np.isfinite(np.asarray(out)).all()
    assert params["params"]["raw_kernels"].shape == (*WIN, K, K)


def test_coarse_mass_preserving_pool():
    # The sum-pool inside the coarse pass must preserve channel mass:
    # with uniform full-extent kernels the output's message term is
    # spatially constant, same as the full-res pass.
    p = _heatmaps()
    hc, wc = H // 2, W // 2
    full_win = (2 * hc - 1, 2 * wc - 1)
    kernels = jnp.full((*full_win, K, K), 1.0 / (hc * wc), jnp.float32)
    biases = jnp.full((K, K), 1e-4, jnp.float32)
    import jax.lax as lax

    out = np.asarray(
        mrf_message_pass_coarse(p, kernels, biases, stride=2,
                                precision=lax.Precision.HIGHEST)
    )
    unary = np.log(np.maximum(np.asarray(p), 1e-6))
    message = out - unary
    np.testing.assert_allclose(
        message, np.broadcast_to(message[:, :1, :1, :], message.shape),
        rtol=1e-4, atol=1e-3,
    )
