"""Tests for the synthetic-FLIC source and batch pipeline (SURVEY C2)."""

import jax.numpy as jnp
import numpy as np

from jointpose.configs import get_config
from jointpose.data.pipeline import batch_iterator, make_dataset


def test_synthetic_batch_shapes_and_ranges(tiny_config):
    train, test = make_dataset(tiny_config.data)
    assert train.size == 16 and test.size == 8
    batch = train.get_batch(jnp.arange(4, dtype=jnp.int32))
    h, w = tiny_config.data.image_hw
    assert batch["image"].shape == (4, h, w, 3)
    assert batch["joints"].shape == (4, 9, 2)
    assert batch["visible"].shape == (4, 9)
    img = np.asarray(batch["image"])
    assert img.min() >= 0.0 and img.max() <= 1.0
    # Joints inside the frame.
    j = np.asarray(batch["joints"])
    assert (j[..., 0] >= 0).all() and (j[..., 0] <= w - 1).all()
    assert (j[..., 1] >= 0).all() and (j[..., 1] <= h - 1).all()


def test_synthetic_is_deterministic(tiny_config):
    train, _ = make_dataset(tiny_config.data)
    a = train.get_batch(jnp.asarray([3, 5], jnp.int32))
    b = train.get_batch(jnp.asarray([3, 5], jnp.int32))
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
    np.testing.assert_array_equal(np.asarray(a["joints"]), np.asarray(b["joints"]))


def test_train_test_splits_disjoint(tiny_config):
    train, test = make_dataset(tiny_config.data)
    a = train.get_batch(jnp.asarray([0], jnp.int32))
    b = test.get_batch(jnp.asarray([0], jnp.int32))
    assert not np.allclose(np.asarray(a["image"]), np.asarray(b["image"]))


def test_poses_vary_across_examples(tiny_config):
    train, _ = make_dataset(tiny_config.data)
    batch = train.get_batch(jnp.arange(8, dtype=jnp.int32))
    j = np.asarray(batch["joints"])
    # Wrist positions should differ across examples.
    assert np.std(j[:, 5, 0]) > 1.0


def test_batch_iterator_covers_epoch(tiny_config):
    train, _ = make_dataset(tiny_config.data)
    seen = []
    for idx in batch_iterator(train, batch_size=4, rng=np.random.default_rng(0)):
        assert idx.shape == (4,)
        seen.extend(np.asarray(idx).tolist())
    assert sorted(seen) == list(range(16))


def test_batch_iterator_wraps_small_split(tiny_config):
    _, test = make_dataset(tiny_config.data)
    batches = list(batch_iterator(test, batch_size=16))
    assert len(batches) == 1  # 8 examples wrap to fill one 16-batch
    assert batches[0].shape == (16,)


def test_all_presets_construct():
    for name in ["single_scale", "multires", "mrf", "joint", "eval_tta", "tiny", "flagship"]:
        cfg = get_config(name)
        assert cfg.heatmap_hw[0] * cfg.data.heatmap_stride == cfg.data.image_hw[0]
        if name in ("mrf", "joint", "eval_tta", "tiny", "flagship"):
            assert cfg.mrf is not None
            assert cfg.mrf.window[0] % 2 == 1 and cfg.mrf.window[1] % 2 == 1
