"""Parity tests: fused Pallas MRF epilogue vs the XLA oracle (SURVEY §4
"Numerics/parity tests").  Runs in Pallas interpreter mode on CPU; the
same code path compiles on TPU (exercised by bench/driver)."""

import jax
import jax.numpy as jnp
import numpy as np

from jointpose.ops.mrf_pallas import mrf_epilogue_pallas, mrf_message_pass_pallas
from jointpose.ops.mrf_xla import mrf_message_pass_xla, pairwise_conv

H, W, K = 12, 16, 9
WIN = (7, 9)


def _inputs(seed=0):
    rs = np.random.RandomState(seed)
    p = rs.rand(2, H, W, K).astype(np.float32)
    p /= p.sum(axis=(1, 2), keepdims=True)
    kernels = (rs.rand(*WIN, K, K) * 0.1).astype(np.float32)
    biases = (rs.rand(K, K) * 0.01 + 1e-4).astype(np.float32)
    return jnp.asarray(p), jnp.asarray(kernels), jnp.asarray(biases)


def test_epilogue_matches_xla():
    p, kernels, biases = _inputs()
    resp = pairwise_conv(p, kernels)
    got = mrf_epilogue_pallas(resp, biases)
    want = mrf_message_pass_xla(p, kernels, biases)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_full_pass_matches_xla():
    p, kernels, biases = _inputs(seed=1)
    got = mrf_message_pass_pallas(p, kernels, biases)
    want = mrf_message_pass_xla(p, kernels, biases)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_epilogue_handles_nonmultiple_rows():
    # B*H*W = 2*12*16 = 384 < _ROWS forces a ragged final tile.
    p, kernels, biases = _inputs(seed=2)
    resp = pairwise_conv(p[:1, :5, :7], kernels)
    got = mrf_epilogue_pallas(resp, biases)
    want = mrf_message_pass_xla(p[:1, :5, :7], kernels, biases)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gradients_match_xla():
    p, kernels, biases = _inputs(seed=3)

    def loss_pallas(kern, bias):
        out = mrf_message_pass_pallas(p, kern, bias)
        return jnp.sum(out * jnp.cos(out))  # nontrivial downstream grad

    def loss_xla(kern, bias):
        out = mrf_message_pass_xla(p, kern, bias)
        return jnp.sum(out * jnp.cos(out))

    gk_p, gb_p = jax.grad(loss_pallas, argnums=(0, 1))(kernels, biases)
    gk_x, gb_x = jax.grad(loss_xla, argnums=(0, 1))(kernels, biases)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_x), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x), rtol=2e-4, atol=2e-5)


def test_grad_zero_below_eps_floor():
    # Where resp + bias <= eps the log is floored and the gradient must
    # be exactly zero (not inf/nan).
    resp = jnp.full((1, 2, 2, K, K), -1.0, jnp.float32)  # resp+bias < 0 < eps
    biases = jnp.full((K, K), 1e-8, jnp.float32)

    def loss(r):
        return jnp.sum(mrf_epilogue_pallas(r, biases))

    g = np.asarray(jax.grad(loss)(resp))
    assert np.all(g == 0.0)


def test_spatial_model_uses_pallas_when_enabled():
    from jointpose.configs import MRFConfig
    from jointpose.models.mrf import SpatialModel
    from jointpose.ops.mrf_pallas import mrf_message_pass_pallas as pallas_pass

    p, _, _ = _inputs()
    cfg = MRFConfig(window=WIN, use_pallas=True)
    model = SpatialModel(cfg, num_joints=K, message_pass=pallas_pass)
    params = model.init(jax.random.PRNGKey(0), p)
    out_pallas = model.apply(params, p)
    model_xla = SpatialModel(
        MRFConfig(window=WIN, use_pallas=False), num_joints=K
    )
    out_xla = model_xla.apply(params, p)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), rtol=1e-5, atol=1e-5
    )
