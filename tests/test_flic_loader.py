"""Real-FLIC loader test against a synthesized examples.mat (SURVEY C2).

Real FLIC is unavailable (no network), so this builds a miniature FLIC
directory — MATLAB struct annotations via scipy.io.savemat + JPEG
frames via PIL — and checks the loader's joint-column mapping, split
handling, coordinate rescaling and nose fallback.
"""

import dataclasses
import os

import numpy as np
import pytest

scipy_io = pytest.importorskip("scipy.io")
PIL_Image = pytest.importorskip("PIL.Image")

from jointpose import skeleton
from jointpose.configs import DataConfig
from jointpose.data.flic import _FLIC_COLUMNS, load_flic

SRC_W, SRC_H = 720, 480


def _make_fake_flic(root, n_train=3, n_test=2):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    examples = []
    rs = np.random.RandomState(0)
    gt = []
    for i in range(n_train + n_test):
        coords = np.full((2, 29), np.nan)
        joints = {}
        for name, col in _FLIC_COLUMNS.items():
            if name in ("leye", "reye"):
                continue
            xy = rs.uniform([60, 60], [SRC_W - 60, SRC_H - 60])
            coords[:, col - 1] = xy
            joints[name] = xy
        if i == 0:
            # Example 0: no nose -> loader must fall back to eye average.
            coords[:, _FLIC_COLUMNS["nose"] - 1] = np.nan
            le = rs.uniform([200, 100], [300, 200])
            re = le + [40.0, 0.0]
            coords[:, _FLIC_COLUMNS["leye"] - 1] = le
            coords[:, _FLIC_COLUMNS["reye"] - 1] = re
            joints["nose"] = (le + re) / 2
        fname = f"frame{i:03d}.jpg"
        img = (rs.rand(SRC_H, SRC_W, 3) * 255).astype(np.uint8)
        PIL_Image.fromarray(img).save(os.path.join(root, "images", fname))
        examples.append(
            {
                "filepath": fname,
                "coords": coords,
                "istrain": float(i < n_train),
                "istest": float(i >= n_train),
            }
        )
        gt.append(joints)
    # MATLAB struct-array layout matching scipy's squeeze_me round trip.
    dt = [("filepath", object), ("coords", object), ("istrain", object), ("istest", object)]
    arr = np.zeros((len(examples),), dtype=dt)
    for i, ex in enumerate(examples):
        arr[i] = (ex["filepath"], ex["coords"], ex["istrain"], ex["istest"])
    scipy_io.savemat(os.path.join(root, "examples.mat"), {"examples": arr})
    return gt


def test_load_flic_end_to_end(tmp_path):
    gt = _make_fake_flic(str(tmp_path))
    cfg = DataConfig(source="flic", flic_dir=str(tmp_path), image_hw=(240, 360))
    train, test = load_flic(cfg)
    assert train["image"].shape == (3, 240, 360, 3)
    assert test["image"].shape == (2, 240, 360, 3)
    assert train["joints"].shape == (3, skeleton.NUM_JOINTS, 2)
    # uint8 end-to-end: 1/4 the host RAM / transfer of fp32; every
    # consumer (model normalize, augment warp) converts on device.
    assert train["image"].dtype == np.uint8
    # Coordinates rescaled by 0.5 (720x480 -> 360x240).
    sx, sy = 360 / SRC_W, 240 / SRC_H
    for j, name in enumerate(skeleton.JOINTS):
        expected = gt[1][name] * [sx, sy]
        np.testing.assert_allclose(train["joints"][1, j], expected, atol=1e-3)
    assert train["visible"].all()


def test_load_flic_nose_fallback_to_eye_average(tmp_path):
    gt = _make_fake_flic(str(tmp_path))
    cfg = DataConfig(source="flic", flic_dir=str(tmp_path), image_hw=(240, 360))
    train, _ = load_flic(cfg)
    j = skeleton.JOINT_INDEX["nose"]
    expected = gt[0]["nose"] * [360 / SRC_W, 240 / SRC_H]
    np.testing.assert_allclose(train["joints"][0, j], expected, atol=1e-3)
    assert train["visible"][0, j] == 1.0


def test_make_dataset_flic_source(tmp_path):
    import jax.numpy as jnp

    from jointpose.data.pipeline import make_dataset

    _make_fake_flic(str(tmp_path))
    cfg = DataConfig(source="flic", flic_dir=str(tmp_path), image_hw=(240, 360))
    train, test = make_dataset(cfg)
    assert train.size == 3 and test.size == 2
    batch = train.get_batch(jnp.asarray([0, 2], jnp.int32))
    assert batch["image"].shape == (2, 240, 360, 3)


def test_flic_device_memory_is_o_batch(tmp_path):
    # Round-1 weak #7: the full split must stay in host RAM, with only
    # per-batch slices ever staged to a device.  Use a split big enough
    # (10 frames) that its shape is unambiguous among live arrays.
    import jax
    import jax.numpy as jnp

    from jointpose.data.pipeline import make_dataset

    _make_fake_flic(str(tmp_path), n_train=10, n_test=2)
    cfg = DataConfig(source="flic", flic_dir=str(tmp_path), image_hw=(240, 360))
    train, test = make_dataset(cfg)
    assert train.host_resident and test.host_resident
    batch = train.get_batch(jnp.asarray([1, 3, 5], jnp.int32))
    # Batches come back as host numpy; staging is the consumer's job
    # (shard_batch / jit transfer), so nothing split-sized is on device.
    assert isinstance(batch["image"], np.ndarray)
    split_shape = (10, 240, 360, 3)
    live = [tuple(a.shape) for a in jax.live_arrays()]
    assert split_shape not in live, "full FLIC split found in device memory"
    # Slices match direct indexing and survive a device round trip.
    direct = np.asarray(PIL_Image.open(
        os.path.join(str(tmp_path), "images", "frame003.jpg")
    ).convert("RGB").resize((360, 240), PIL_Image.BILINEAR), np.uint8)
    np.testing.assert_array_equal(batch["image"][1], direct)
    np.testing.assert_array_equal(np.asarray(jnp.asarray(batch["image"]))[1], batch["image"][1])


def test_flic_source_trains_end_to_end(tmp_path):
    # A host-resident source must drive the full staged fit loop (the
    # non-fused two-dispatch path) — shapes, sharding, eval included.
    import dataclasses as dc

    from jointpose.configs import get_config
    from jointpose.train import fit

    _make_fake_flic(str(tmp_path / "flic"), n_train=8, n_test=4)
    cfg = get_config("tiny")
    cfg = cfg.replace(
        data=dc.replace(
            cfg.data, source="flic", flic_dir=str(tmp_path / "flic"),
            image_hw=(48, 64), train_size=8, test_size=4,
        ),
        train=dc.replace(
            cfg.train, detector_steps=4, joint_steps=2, eval_every=6, log_every=2,
        ),
    )
    result = fit(cfg, str(tmp_path / "run"), eval_max_batches=1)
    assert int(result.state.step) == 6
    assert np.isfinite(result.metrics["pdj_at_05_wrist_elbow"])
