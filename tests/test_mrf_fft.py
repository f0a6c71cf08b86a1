"""Parity + gradient tests for the Fourier-space MRF message pass
(ops/mrf_fft.py) against the XLA grouped-conv oracle (SURVEY §4
numerics tests; round-2 task: kill the dense-rewrite FLOP waste)."""

import dataclasses

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from jointpose.configs import MRFConfig
from jointpose.models.mrf import select_impl
from jointpose.ops.mrf_fft import fft_pairwise_conv, mrf_message_pass_fft
from jointpose.ops.mrf_xla import (
    mrf_message_pass_coarse,
    mrf_message_pass_xla,
    pairwise_conv,
)

K = 9
HI = lax.Precision.HIGHEST


def _inputs(hw=(12, 18), win=(7, 11), batch=2, seed=0):
    rngs = jax.random.split(jax.random.PRNGKey(seed), 3)
    p = jax.nn.softmax(
        jax.random.normal(rngs[0], (batch, *hw, K)).reshape(batch, -1, K), axis=1
    ).reshape(batch, *hw, K)
    kernels = jax.nn.softplus(jax.random.normal(rngs[1], (*win, K, K)))
    biases = jax.nn.softplus(jax.random.normal(rngs[2], (K, K)) - 4.0)
    return p, kernels, biases


@pytest.mark.parametrize(
    "hw,win",
    [
        ((12, 18), (7, 11)),  # window < map
        ((12, 18), (25, 13)),  # window taller than the map
        ((15, 22), (29, 43)),  # window wider + taller (paper regime scaled)
    ],
)
def test_fft_conv_matches_grouped_conv(hw, win):
    p, kernels, _ = _inputs(hw, win)
    want = pairwise_conv(p, kernels, precision=HI)
    got = fft_pairwise_conv(p, kernels, precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fft_message_pass_matches_xla():
    p, kernels, biases = _inputs()
    want = mrf_message_pass_xla(p, kernels, biases, precision=HI)
    got = mrf_message_pass_fft(p, kernels, biases, precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # And with the plain-jnp epilogue.
    got2 = mrf_message_pass_fft(
        p, kernels, biases, precision=HI, use_pallas_epilogue=False
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), atol=1e-4)


def test_fft_message_pass_gradients_match_xla():
    p, kernels, biases = _inputs()

    def loss(fn, p, kernels, biases):
        out = fn(p, kernels, biases, precision=HI)
        return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

    gx = jax.grad(lambda *a: loss(mrf_message_pass_xla, *a), argnums=(0, 1, 2))(
        p, kernels, biases
    )
    gf = jax.grad(lambda *a: loss(mrf_message_pass_fft, *a), argnums=(0, 1, 2))(
        p, kernels, biases
    )
    for a, b, name in zip(gx, gf, ("dp", "dkernels", "dbiases")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3, rtol=1e-3, err_msg=name
        )


def test_fused_pallas_pass_matches_xla():
    # The single fused kernel (forward DFTs + Pallas pointwise/inverse/
    # epilogue) in interpret mode on CPU; compiled-on-TPU parity is
    # bench.py's job.  Batch 6 exercises the tb=2 tiling path.
    from jointpose.ops.mrf_fft_pallas import mrf_message_pass_fft_fused

    p, kernels, biases = _inputs(batch=6)
    want = mrf_message_pass_xla(p, kernels, biases, precision=HI)
    got = mrf_message_pass_fft_fused(p, kernels, biases, precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_pallas_pass_gradients_match_xla():
    from jointpose.ops.mrf_fft_pallas import mrf_message_pass_fft_fused

    p, kernels, biases = _inputs()

    def loss(fn, p, kernels, biases):
        out = fn(p, kernels, biases, precision=HI)
        return jnp.sum(out * jnp.cos(out))

    gx = jax.grad(lambda *a: loss(mrf_message_pass_xla, *a), argnums=(0, 1, 2))(
        p, kernels, biases
    )
    gf = jax.grad(
        lambda *a: loss(mrf_message_pass_fft_fused, *a), argnums=(0, 1, 2)
    )(p, kernels, biases)
    for a, b, name in zip(gx, gf, ("dp", "dkernels", "dbiases")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3, rtol=1e-3, err_msg=name
        )


def test_fft_under_coarse_stride():
    # The coarse (stride>1) wrapper accepts any message_pass impl.
    p, kernels, biases = _inputs(hw=(16, 24), win=(7, 9))
    want = mrf_message_pass_coarse(
        p, kernels, biases, stride=2, precision=HI,
        message_pass=mrf_message_pass_xla,
    )
    got = mrf_message_pass_coarse(
        p, kernels, biases, stride=2, precision=HI,
        message_pass=mrf_message_pass_fft,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_impl_auto_selection():
    # Paper presets (stride-1 large window) -> fft; coarse + tiny ->
    # direct conv with the XLA epilogue (measured faster than the
    # Pallas epilogue at both production geometries — select_impl doc).
    assert select_impl(MRFConfig(window=(45, 67), stride=1)) == "fft"
    assert select_impl(MRFConfig(window=(17, 25), stride=2)) == "xla"
    assert select_impl(MRFConfig(window=(11, 15), stride=1)) == "xla"
    assert select_impl(MRFConfig(window=(11, 15), use_pallas=False)) == "xla"
    assert select_impl(MRFConfig(impl="pallas", window=(11, 15))) == "pallas"
    assert select_impl(MRFConfig(impl="xla", window=(45, 67))) == "xla"
    assert select_impl(MRFConfig(impl="fft", window=(11, 15))) == "fft"


def test_spatial_model_fft_impl_matches_xla(tiny_config):
    from jointpose.models.mrf import SpatialModel

    p, _, _ = _inputs(hw=(12, 16), win=(9, 13))
    cfg_x = MRFConfig(window=(9, 13), impl="xla")
    cfg_f = MRFConfig(window=(9, 13), impl="fft", use_pallas=False)
    mx = SpatialModel(config=cfg_x, num_joints=K)
    mf = SpatialModel(config=cfg_f, num_joints=K)
    params = mx.init(jax.random.PRNGKey(0), p)
    want = mx.apply(params, p)
    got = mf.apply(params, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_train_step_differentiates_through_fft(tiny_config):
    # End-to-end: one joint-stage train step with the fft impl computes a
    # finite loss and finite grads (the VERDICT 'Done' criterion).
    from jointpose.train import create_state, make_train_step
    from jointpose.models.pose import PoseModel
    from jointpose.data.pipeline import make_dataset

    cfg = tiny_config.replace(
        mrf=dataclasses.replace(tiny_config.mrf, impl="fft"),
        augment=dataclasses.replace(tiny_config.augment, enabled=False),
    )
    model = PoseModel(cfg)
    state = create_state(cfg, model, jax.random.PRNGKey(0))
    train_ds, _ = make_dataset(cfg.data)
    step_fn = make_train_step(cfg, "joint")
    batch = train_ds.get_batch(jnp.arange(cfg.train.batch_size, dtype=jnp.int32))
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"])) and float(metrics["grad_norm"]) > 0
