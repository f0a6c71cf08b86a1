"""Tests for the joint CNN+MRF composition (SURVEY C5+C6+C7 wiring)."""

import jax
import jax.numpy as jnp
import numpy as np

from jointpose.models.pose import PoseModel


def test_pose_model_detector_only(tiny_config):
    cfg = tiny_config.replace(mrf=None)
    model = PoseModel(cfg)
    x = jnp.zeros((2, *cfg.data.image_hw, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert set(out) == {"detector_logits"}
    assert out["detector_logits"].shape == (2, *cfg.heatmap_hw, cfg.num_joints)


def test_pose_model_with_mrf(tiny_config):
    model = PoseModel(tiny_config)
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, *tiny_config.data.image_hw, 3), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert set(out) == {"detector_logits", "mrf_log_heatmaps"}
    hm = out["mrf_log_heatmaps"]
    assert hm.shape == (2, *tiny_config.heatmap_hw, tiny_config.num_joints)
    assert np.isfinite(np.asarray(hm)).all()


def test_pose_model_param_structure(tiny_config):
    model = PoseModel(tiny_config)
    x = jnp.zeros((1, *tiny_config.data.image_hw, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert "detector" in params and "spatial_model" in params
    sm = params["spatial_model"]
    k = tiny_config.num_joints
    wh, ww = tiny_config.mrf.window
    assert sm["raw_kernels"].shape == (wh, ww, k, k)
    assert sm["raw_bias"].shape == (k, k)


def test_pose_model_grad_flows_end_to_end(tiny_config):
    model = PoseModel(tiny_config)
    x = jnp.asarray(
        np.random.RandomState(1).rand(1, *tiny_config.data.image_hw, 3), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out = model.apply(p, x)
        return jnp.mean(out["mrf_log_heatmaps"] ** 2) + jnp.mean(
            out["detector_logits"] ** 2
        )

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # Detector grads must be nonzero (gradient flows through the MRF).
    det_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["params"]["detector"])
    )
    assert det_norm > 0.0


def test_uint8_ingest_matches_normalized_float(tiny_config):
    # Production ingest: raw uint8 RGB is normalized in-graph; the
    # result must match feeding the same image as float/255.
    model = PoseModel(tiny_config)
    u8 = np.random.RandomState(3).randint(
        0, 256, (2, *tiny_config.data.image_hw, 3), dtype=np.uint8
    )
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(u8))
    out_u8 = model.apply(params, jnp.asarray(u8))
    out_f = model.apply(params, jnp.asarray(u8.astype(np.float32) / 255.0))
    np.testing.assert_allclose(
        np.asarray(out_u8["detector_logits"]),
        np.asarray(out_f["detector_logits"]),
        atol=1e-5,
    )
