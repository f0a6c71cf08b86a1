"""Tests for the fully-conv detector (SURVEY C5/C6)."""

import jax
import jax.numpy as jnp
import numpy as np

from jointpose.configs import DetectorConfig, get_config
from jointpose.models.detector import Detector, _upsample2x


def _init_and_apply(cfg: DetectorConfig, image_hw=(48, 64), batch=2, k=9):
    model = Detector(cfg, num_joints=k)
    x = jnp.asarray(np.random.RandomState(0).rand(batch, *image_hw, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, model.apply(params, x)


def test_single_scale_output_shape():
    cfg = DetectorConfig(trunk_features=(8, 16), trunk_pool=(True, True),
                         head_features=(32, 16), head_kernel=5, multires=False)
    _, _, out = _init_and_apply(cfg)
    assert out.shape == (2, 12, 16, 9)
    assert out.dtype == jnp.float32
    assert Detector.stride(cfg) == 4


def test_multires_output_shape_matches_single_scale():
    cfg = DetectorConfig(trunk_features=(8, 16), trunk_pool=(True, True),
                         head_features=(32, 16), head_kernel=5, multires=True)
    _, params, out = _init_and_apply(cfg)
    assert out.shape == (2, 12, 16, 9)


def test_multires_shared_trunk_has_single_trunk_params():
    cfg = DetectorConfig(trunk_features=(8, 16), trunk_pool=(True, True),
                         head_features=(32, 16), head_kernel=5,
                         multires=True, share_trunk=True)
    _, params, _ = _init_and_apply(cfg)
    names = set(params["params"].keys())
    assert "trunk" in names and "trunk_half" not in names


def test_multires_separate_trunks():
    cfg = DetectorConfig(trunk_features=(8,), trunk_pool=(True,),
                         head_features=(16,), head_kernel=3,
                         multires=True, share_trunk=False)
    _, params, out = _init_and_apply(cfg)
    names = set(params["params"].keys())
    assert {"trunk_full", "trunk_half"} <= names
    assert out.shape == (2, 24, 32, 9)


def test_multires_branch_contributes():
    # Zeroing is hard without surgery; instead check multires output
    # differs from single-scale with identical trunk/head params count
    # signature: the fused model must produce different logits than the
    # single-scale one on the same input and same seed.
    kw = dict(trunk_features=(8, 16), trunk_pool=(True, True),
              head_features=(32, 16), head_kernel=5)
    _, _, single = _init_and_apply(DetectorConfig(multires=False, **kw))
    _, _, multi = _init_and_apply(DetectorConfig(multires=True, **kw))
    assert not np.allclose(np.asarray(single), np.asarray(multi))


def test_upsample2x_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = _upsample2x(x)
    expected = np.asarray([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], np.float32)
    np.testing.assert_array_equal(np.asarray(up)[0, :, :, 0], expected)


def test_detector_is_translation_covariant():
    # A fully-conv net must shift its output when the input shifts by one
    # heatmap stride.  Crop two windows of a wider image offset by one
    # stride and compare heatmap columns at interior positions (further
    # than the ~32px receptive field from either edge).
    cfg = DetectorConfig(trunk_features=(8, 16), trunk_pool=(True, True),
                         head_features=(32, 16), head_kernel=5, multires=False)
    model = Detector(cfg, num_joints=3)
    rs = np.random.RandomState(0)
    stride = Detector.stride(cfg)
    wide = rs.rand(1, 48, 128 + stride, 3).astype(np.float32)
    x_a = jnp.asarray(wide[:, :, :128])
    x_b = jnp.asarray(wide[:, :, stride : 128 + stride])
    params = model.init(jax.random.PRNGKey(0), x_a)
    out_a = np.asarray(model.apply(params, x_a))  # (1, 12, 32, 3)
    out_b = np.asarray(model.apply(params, x_b))
    margin = 10  # heatmap cells; > RF/stride from both edges
    np.testing.assert_allclose(
        out_b[:, :, margin:-margin, :],
        out_a[:, :, margin + 1 : out_a.shape[2] - margin + 1, :],
        atol=5e-3,
    )


def test_flagship_preset_builds():
    cfg = get_config("flagship")
    model = Detector(cfg.detector, cfg.num_joints)
    x = jnp.zeros((1, *cfg.data.image_hw, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, *cfg.heatmap_hw, cfg.num_joints)


def test_stride_pool_mode_same_shapes_and_params():
    # 'stride' pooling keeps output shapes and the parameter pytree
    # identical to 'max' pooling (checkpoint layout compatible).
    import dataclasses

    import jax
    import jax.numpy as jnp

    from jointpose.configs import DetectorConfig
    from jointpose.models.detector import Detector

    images = jnp.zeros((2, 32, 48, 3), jnp.float32)
    base = DetectorConfig(
        trunk_features=(8, 16),
        trunk_pool=(True, True),
        head_features=(16, 8),
        head_kernel=5,
        multires=True,
    )
    out = {}
    params = {}
    for mode in ("max", "stride"):
        det = Detector(
            config=dataclasses.replace(base, pool_mode=mode), num_joints=9
        )
        p = det.init(jax.random.PRNGKey(0), images)
        params[mode] = p
        out[mode] = det.apply(p, images)
    assert out["max"].shape == out["stride"].shape == (2, 8, 12, 9)
    assert jax.tree.structure(params["max"]) == jax.tree.structure(params["stride"])
    for a, b in zip(jax.tree.leaves(params["max"]), jax.tree.leaves(params["stride"])):
        assert a.shape == b.shape
