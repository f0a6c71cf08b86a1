"""Inference pipeline parallelism: two stage groups must reproduce the
single-program predictor exactly (tests run on 8 fake CPU devices)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointpose.configs import get_config
from jointpose.models.pose import PoseModel
from jointpose.parallel.pipeline import (
    build_pipelined_predictor,
    split_stage_devices,
)
from jointpose.predict import build_predictor


@pytest.fixture(scope="module")
def tiny_params():
    cfg = get_config("tiny")
    model = PoseModel(cfg)
    h, w = cfg.data.image_hw
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    return cfg, params


def _images(cfg, n, seed=0, dtype=np.float32):
    h, w = cfg.data.image_hw
    rs = np.random.RandomState(seed)
    if dtype == np.uint8:
        return rs.randint(0, 256, (n, h, w, 3), dtype=np.uint8)
    return rs.rand(n, h, w, 3).astype(np.float32)


def test_split_stage_devices():
    g0, g1 = split_stage_devices(jax.devices()[:8])
    assert len(g0) == 4 and len(g1) == 4
    g0, g1 = split_stage_devices(jax.devices()[:3])
    assert len(g0) == 2 and len(g1) == 1
    with pytest.raises(ValueError, match=">= 2 devices"):
        split_stage_devices(jax.devices()[:1])


@pytest.mark.parametrize("dtype", [np.float32, np.uint8])
def test_pipeline_matches_single_program(tiny_params, dtype):
    cfg, params = tiny_params
    imgs = _images(cfg, 8, seed=1, dtype=dtype)
    want_c, want_p = build_predictor(cfg, params)(jnp.asarray(imgs))
    pp = build_pipelined_predictor(cfg, params, devices=jax.devices()[:8],
                                   n_micro=2)
    got_c, got_p = pp(imgs)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-3)


def test_pipeline_pins_auto_head_impl(tiny_params):
    # head_conv_impl='auto' is batch-dependent; stage 0 traces at the
    # MICROBATCH size, so without build-time pinning the pipelined
    # detector could resolve a different impl (and numerics) than the
    # single-program path at the full batch (round-3 review finding).
    cfg, params = tiny_params
    cfg = cfg.replace(
        detector=dataclasses.replace(cfg.detector, head_conv_impl="auto")
    )
    imgs = _images(cfg, 8, seed=3)
    want_c, want_p = build_predictor(cfg, params)(jnp.asarray(imgs))
    pp = build_pipelined_predictor(cfg, params, devices=jax.devices()[:4],
                                   n_micro=2)
    got_c, got_p = pp(imgs)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-3)


def test_pipeline_with_flip_tta(tiny_params):
    cfg, params = tiny_params
    cfg = dataclasses.replace(cfg, eval_flip_tta=True)
    imgs = _images(cfg, 4, seed=2)
    want_c, want_p = build_predictor(cfg, params)(jnp.asarray(imgs))
    pp = build_pipelined_predictor(cfg, params, devices=jax.devices()[:4],
                                   n_micro=2)
    got_c, got_p = pp(imgs)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-3)


def test_pipeline_rejects_indivisible_batches(tiny_params):
    cfg, params = tiny_params
    pp = build_pipelined_predictor(cfg, params, devices=jax.devices()[:4],
                                   n_micro=2)
    with pytest.raises(ValueError, match="microbatches"):
        pp(_images(cfg, 5))
    with pytest.raises(ValueError, match="stage device counts"):
        pp(_images(cfg, 2))  # microbatch 1 vs 2-device stage


def test_pipeline_with_int8_stage0(tiny_params):
    # PP x int8: the pipelined predictor with qparams must agree with
    # the single-program quantized predictor exactly (same int8 graph,
    # different schedule).
    import dataclasses as dc

    from jointpose.ops.quant import build_quantized_predictor, quantize_detector

    cfg, params = tiny_params
    cfg = cfg.replace(detector=dc.replace(cfg.detector, head_conv_impl="direct"))
    calib = jnp.asarray(_images(cfg, 4, seed=7))
    q = quantize_detector(cfg, params, calib)
    imgs = _images(cfg, 4, seed=8)
    want_c, want_p = build_quantized_predictor(cfg, params, qparams=q)(
        jnp.asarray(imgs)
    )
    pp = build_pipelined_predictor(cfg, params, devices=jax.devices()[:4],
                                   n_micro=2, qparams=q)
    got_c, got_p = pp(imgs)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-3)


def test_pipeline_detector_only(tiny_params):
    # cfg.mrf=None: stage 1 degenerates to softmax+decode but the
    # schedule must still run and agree with the single program.
    cfg, _ = tiny_params
    cfg = dataclasses.replace(cfg, mrf=None)
    model = PoseModel(cfg)
    h, w = cfg.data.image_hw
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, h, w, 3)))
    imgs = _images(cfg, 4, seed=4)
    want_c, _ = build_predictor(cfg, params)(jnp.asarray(imgs))
    pp = build_pipelined_predictor(cfg, params, devices=jax.devices()[:4],
                                   n_micro=2)
    got_c, _ = pp(imgs)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-3)
