"""int8 post-training quantization of the detector (ops/quant.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointpose.configs import get_config
from jointpose.models.detector import Detector
from jointpose.models.pose import PoseModel
from jointpose.ops.quant import (
    build_quantized_predictor,
    calibrate_detector,
    fp_reference_logits,
    quant_detector_logits,
    quantize_detector,
)


def _direct_cfg(name="tiny"):
    cfg = get_config(name)
    return cfg.replace(
        detector=dataclasses.replace(cfg.detector, head_conv_impl="direct")
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _direct_cfg()
    model = PoseModel(cfg)
    h, w = cfg.data.image_hw
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    rs = np.random.RandomState(0)
    calib = jnp.asarray(rs.rand(8, h, w, 3), jnp.float32)
    return cfg, params, calib


def test_calibration_graph_matches_detector(setup):
    # The fp32 calibration replica must be the exact served topology:
    # parity with Detector.apply at fp32 compute dtype.
    cfg, params, calib = setup
    det = Detector(cfg.detector, cfg.num_joints, dtype=jnp.float32)
    want = det.apply({"params": params["params"]["detector"]}, calib)
    got = fp_reference_logits(cfg, params, calib)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_calibration_scales_cover_every_conv(setup):
    cfg, params, calib = setup
    scales = calibrate_detector(cfg, params, calib)
    n_trunk = len(cfg.detector.trunk_features)
    n_head = len(cfg.detector.head_features) + 1  # wide + 1x1s + out
    assert len(scales) == n_trunk + n_head
    assert all(s > 0 for s in scales.values())


def test_quantized_logits_close_to_fp(setup):
    cfg, params, calib = setup
    q = quantize_detector(cfg, params, calib)
    for node in q.values():
        assert node["w_q"].dtype == jnp.int8
    imgs = jnp.asarray(np.random.RandomState(1).rand(4, *cfg.data.image_hw, 3),
                       jnp.float32)
    fp = np.asarray(fp_reference_logits(cfg, params, imgs))
    qi = np.asarray(jax.jit(
        lambda x: quant_detector_logits(cfg, q, x)
    )(imgs))
    scale = np.abs(fp).max()
    err = np.abs(qi - fp).max()
    assert err <= 0.08 * scale, f"int8 error {err:.4g} vs range {scale:.4g}"


def test_quantized_uint8_input(setup):
    cfg, params, calib = setup
    q = quantize_detector(cfg, params, calib)
    rs = np.random.RandomState(2)
    u8 = rs.randint(0, 256, (2, *cfg.data.image_hw, 3), dtype=np.uint8)
    a = np.asarray(quant_detector_logits(cfg, q, jnp.asarray(u8)))
    b = np.asarray(quant_detector_logits(
        cfg, q, jnp.asarray(u8, jnp.float32) / 255.0
    ))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_quantized_predictor_end_to_end(setup):
    # Full serving path: int8 detector + float MRF tail + decode; the
    # decoded joint positions should mostly agree with the fp predictor.
    cfg, params, calib = setup
    from jointpose.predict import build_predictor

    imgs = jnp.asarray(np.random.RandomState(3).rand(4, *cfg.data.image_hw, 3),
                       jnp.float32)
    qc, qp = build_quantized_predictor(cfg, params, calib)(imgs)
    fc, fpb = build_predictor(cfg, params)(imgs)
    assert qc.shape == fc.shape and qp.shape == fpb.shape
    assert np.isfinite(np.asarray(qp)).all()
    stride = cfg.data.heatmap_stride
    # Heatmap-argmax decode is robust to small logit error: demand most
    # joints land within one heatmap cell of the fp prediction.
    close = np.abs(np.asarray(qc) - np.asarray(fc)).max(-1) <= stride
    assert close.mean() >= 0.8, f"only {close.mean():.2f} joints within 1 cell"


def test_artifact_roundtrip(setup, tmp_path):
    # save_quantized -> load_quantized must reproduce logits exactly
    # (int8 weights stay int8 on disk).
    from jointpose.ops.quant import load_quantized, save_quantized

    cfg, params, calib = setup
    q = quantize_detector(cfg, params, calib)
    path = str(tmp_path / "int8.npz")
    save_quantized(path, q)
    q2 = load_quantized(path)
    assert q2["head_wide"]["w_q"].dtype == jnp.int8
    imgs = calib[:2]
    a = np.asarray(quant_detector_logits(cfg, q, imgs))
    b = np.asarray(quant_detector_logits(cfg, q2, imgs))
    np.testing.assert_array_equal(a, b)


def test_quantize_cli(tmp_path):
    # Full offline flow: train-free checkpoint -> artifact -> predictor.
    cfg = _direct_cfg()
    from jointpose.checkpoint import Checkpointer
    from jointpose.quantize import main as quantize_main
    from jointpose.train import create_state

    ckpt_dir = str(tmp_path / "ck")
    state = create_state(cfg, PoseModel(cfg), jax.random.PRNGKey(0))
    ckpt = Checkpointer(ckpt_dir, keep=1)
    ckpt.save(0, state)
    ckpt.close()
    out = str(tmp_path / "int8.npz")
    quantize_main(["--config", "tiny", "--checkpoint", ckpt_dir,
                   "--calib", "4", "--out", out])
    from jointpose.ops.quant import load_quantized

    q = load_quantized(out)
    assert "head_out" in q and q["head_out"]["w_q"].dtype == jnp.int8

    # The eval surface accepts the same artifact (deploy-what-you-eval):
    from jointpose.evaluate import main as evaluate_main

    evaluate_main(["--config", "tiny", "--checkpoint", ckpt_dir,
                   "--step", "0", "--max-batches", "1", "--no-tta",
                   "--quantize-artifact", out,
                   "--json-out", str(tmp_path / "m.json")])
    import json as _json

    with open(tmp_path / "m.json") as f:
        m = _json.load(f)
    assert 0.0 <= m["pdj_at_05_wrist_elbow"] <= 1.0


def test_quantized_single_res_unshared_trunk():
    # share_trunk=False without multires: the Detector instantiates only
    # trunk_full (no trunk_half) — quantization's conv-name walk must
    # not emit the absent branch (regression: KeyError on such
    # checkpoints).
    cfg = _direct_cfg()
    cfg = cfg.replace(
        detector=dataclasses.replace(
            cfg.detector, multires=False, share_trunk=False
        )
    )
    model = PoseModel(cfg)
    h, w = cfg.data.image_hw
    params = model.init(jax.random.PRNGKey(6), jnp.zeros((1, h, w, 3)))
    calib = jnp.asarray(np.random.RandomState(7).rand(4, h, w, 3), jnp.float32)
    q = quantize_detector(cfg, params, calib)
    got = quant_detector_logits(cfg, q, calib)
    want = fp_reference_logits(cfg, params, calib)
    assert np.isfinite(np.asarray(got)).all()
    # int8 tracks fp within the usual PTQ tolerance
    err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
    scale = max(float(np.max(np.abs(np.asarray(want)))), 1e-6)
    assert err / scale < 0.15


def test_quantized_predictor_non_multires():
    cfg = _direct_cfg()
    cfg = cfg.replace(detector=dataclasses.replace(cfg.detector, multires=False))
    model = PoseModel(cfg)
    h, w = cfg.data.image_hw
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((1, h, w, 3)))
    calib = jnp.asarray(np.random.RandomState(5).rand(4, h, w, 3), jnp.float32)
    q = quantize_detector(cfg, params, calib)
    out = quant_detector_logits(cfg, q, calib)
    assert np.isfinite(np.asarray(out)).all()
