"""Tests for losses (SURVEY C8) and PDJ evaluation / flip TTA (C11)."""

import jax.numpy as jnp
import numpy as np

from jointpose import skeleton
from jointpose.data.targets import render_gaussian_heatmaps
from jointpose.evaluate import (
    flip_images,
    pdj_counts,
    torso_diameter,
    unflip_heatmaps,
)
from jointpose.losses import heatmap_ce, heatmap_mse

K = skeleton.NUM_JOINTS


def test_mse_zero_at_perfect_prediction():
    joints = jnp.asarray(np.random.RandomState(0).uniform(2, 10, (2, K, 2)), jnp.float32)
    vis = jnp.ones((2, K))
    hm = render_gaussian_heatmaps(joints, vis, (16, 16), 1.5)
    assert float(heatmap_mse(hm, hm, vis)) == 0.0
    assert float(heatmap_mse(hm * 0, hm, vis)) > 0.0


def test_mse_ignores_invisible_joints():
    joints = jnp.asarray(np.random.RandomState(0).uniform(2, 10, (1, K, 2)), jnp.float32)
    vis = np.ones((1, K), np.float32)
    hm = render_gaussian_heatmaps(joints, jnp.asarray(vis), (16, 16), 1.5)
    # Corrupt channel 0, mark it invisible: loss must be zero.
    bad = np.asarray(hm).copy()
    bad[..., 0] += 10.0
    vis[0, 0] = 0.0
    loss = heatmap_mse(jnp.asarray(bad), hm, jnp.asarray(vis))
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_ce_minimized_at_target():
    joints = jnp.asarray([[[8.0, 8.0]] * K], jnp.float32)
    vis = jnp.ones((1, K))
    target = render_gaussian_heatmaps(joints, vis, (16, 16), 1.5, normalize=True)
    # Logits proportional to log-target achieve (near) minimal CE vs a
    # shifted target.
    good_logits = jnp.log(target + 1e-9)
    shifted = render_gaussian_heatmaps(joints + 4.0, vis, (16, 16), 1.5, normalize=True)
    bad_logits = jnp.log(shifted + 1e-9)
    assert float(heatmap_ce(good_logits, target, vis)) < float(
        heatmap_ce(bad_logits, target, vis)
    )


def test_torso_diameter():
    joints = np.zeros((1, K, 2), np.float32)
    joints[0, skeleton.JOINT_INDEX["lsho"]] = [0.0, 0.0]
    joints[0, skeleton.JOINT_INDEX["rhip"]] = [3.0, 4.0]
    np.testing.assert_allclose(float(torso_diameter(jnp.asarray(joints))[0]), 5.0)


def test_pdj_counts_thresholding():
    gt = np.zeros((1, K, 2), np.float32)
    gt[0, skeleton.JOINT_INDEX["lsho"]] = [0.0, 0.0]
    gt[0, skeleton.JOINT_INDEX["rhip"]] = [0.0, 100.0]  # torso = 100 px
    pred = gt.copy()
    pred[:, :, 0] += 6.0  # all joints off by 6 px = 0.06 torso
    vis = jnp.ones((1, K))
    thr = jnp.asarray([0.05, 0.1], jnp.float32)
    detected, visible, torso = pdj_counts(jnp.asarray(pred), jnp.asarray(gt), vis, thr)
    d = np.asarray(detected)
    np.testing.assert_allclose(d[0], 0.0)  # 6px > 5px
    np.testing.assert_allclose(d[1], 1.0)  # 6px <= 10px
    np.testing.assert_allclose(np.asarray(visible), 1.0)
    np.testing.assert_allclose(float(torso), 1.0)


def test_pdj_counts_mixed_visibility():
    # Real-FLIC regime (VERDICT r1 weak #8): some joints occluded, some
    # examples torso-less.  The torso-valid count must track EXAMPLES,
    # not be inferred from per-joint visible counts.
    rs = np.random.RandomState(1)
    gt = rs.uniform(10, 90, (4, K, 2)).astype(np.float32)
    pred = gt.copy()
    vis = np.ones((4, K), np.float32)
    li = skeleton.JOINT_INDEX["lsho"]
    ri = skeleton.JOINT_INDEX["rhip"]
    # Example 0: a non-torso joint occluded -> still torso-valid.
    other = next(j for j in range(K) if j not in (li, ri))
    vis[0, other] = 0.0
    # Example 2: torso endpoint missing -> excluded entirely.
    vis[2, li] = 0.0
    thr = jnp.asarray([0.1], jnp.float32)
    detected, visible, torso = pdj_counts(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(vis), thr
    )
    assert float(torso) == 3.0  # examples 0, 1, 3
    # The occluded joint's visible count: 2 valid examples (1, 3) plus
    # none from example 0 (occluded) or 2 (torso-less).
    assert float(np.asarray(visible)[other]) == 2.0
    # Perfect predictions: detected == visible everywhere.
    np.testing.assert_allclose(np.asarray(detected)[0], np.asarray(visible))


def test_evaluate_reports_exact_torso_exclusions(tiny_config):
    # End-to-end: occlude one NON-torso joint in every test example via a
    # wrapped dataset; num_torso_excluded must stay 0 (the old
    # visible.max()-based accounting would misreport it as the full split).
    import jax
    from jointpose.data.pipeline import Dataset, make_dataset
    from jointpose.evaluate import evaluate
    from jointpose.models.pose import PoseModel

    cfg = tiny_config.replace(mrf=None)
    _, test_ds = make_dataset(cfg.data)
    occluded = next(
        j for j in range(K)
        if j not in (skeleton.JOINT_INDEX["lsho"], skeleton.JOINT_INDEX["rhip"])
    )

    def get_batch(indices):
        got = dict(test_ds.get_batch(indices))
        got["visible"] = got["visible"].at[:, occluded].set(0.0)
        return got

    ds = Dataset(size=test_ds.size, get_batch=get_batch)
    model = PoseModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *cfg.data.image_hw, 3)))
    ev = evaluate(params, ds, cfg, model.apply)
    assert ev["num_examples"] == test_ds.size
    assert ev["num_torso_excluded"] == 0.0


def test_flip_tta_roundtrip_recovers_heatmaps():
    # unflip(model(flip(x))) == model(x) for a perfectly equivariant
    # model; here simulate with ground-truth heatmaps: flipping the
    # image moves joint j to the mirrored position with label perm.
    hm_hw = (16, 24)
    joints = jnp.asarray(
        np.random.RandomState(0).uniform(3, 12, (2, K, 2)), jnp.float32
    )
    vis = jnp.ones((2, K))
    hm = render_gaussian_heatmaps(joints, vis, hm_hw, 1.0)
    # Heatmaps of the flipped scene: mirrored x, permuted labels.
    w = hm_hw[1]
    j_flipped = jnp.stack(
        [w - 1 - joints[..., 0], joints[..., 1]], axis=-1
    )[:, jnp.asarray(skeleton.FLIP_PERM)]
    hm_flipped_scene = render_gaussian_heatmaps(j_flipped, vis, hm_hw, 1.0)
    recovered = unflip_heatmaps(hm_flipped_scene)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(hm), atol=1e-5)


def test_flip_images_mirrors_width():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 2, 6, 1))
    flipped = flip_images(img)
    np.testing.assert_array_equal(
        np.asarray(flipped)[0, 0, :, 0], np.asarray(img)[0, 0, ::-1, 0]
    )


def test_evaluate_counts_each_example_once(tiny_config):
    # 8 test examples, batch 4 -> exact; batch 6 -> ragged final chunk
    # must not double-count wrapped duplicates.
    import dataclasses
    import jax
    from jointpose.data.pipeline import make_dataset
    from jointpose.evaluate import evaluate
    from jointpose.models.pose import PoseModel

    cfg = tiny_config.replace(mrf=None)
    _, test_ds = make_dataset(cfg.data)
    model = PoseModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *cfg.data.image_hw, 3)))
    for bs in (4, 6):
        c = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=bs))
        ev = evaluate(params, test_ds, c, model.apply)
        assert ev["num_examples"] == test_ds.size, (bs, ev["num_examples"])

def test_mrf_mse_peak_normalized_space():
    """mrf_loss='mse' regresses exp(log p̄ − max) against the peak-1
    target: zero at a log-space output matching the target up to a
    global log-offset, positive for a shifted peak (train.py loss_fn)."""
    from jointpose.losses import mrf_heatmap_loss

    joints = jnp.asarray(np.random.RandomState(1).uniform(3, 12, (2, K, 2)), jnp.float32)
    vis = jnp.ones((2, K))
    peak1 = render_gaussian_heatmaps(joints, vis, (16, 16), 1.5)
    targets = {"peak1": peak1, "dist": peak1 / jnp.sum(peak1, (1, 2), keepdims=True)}
    # Any global offset in log space is invariant (message-product scale).
    good = jnp.log(peak1 + 1e-20) - 37.0
    np.testing.assert_allclose(
        float(mrf_heatmap_loss("mse", good, targets, vis)), 0.0, atol=1e-9
    )
    shifted = render_gaussian_heatmaps(joints + 5.0, vis, (16, 16), 1.5)
    bad = jnp.log(shifted + 1e-20) - 37.0
    assert float(mrf_heatmap_loss("mse", bad, targets, vis)) > 1e-4
    # 'ce' dispatch unchanged vs calling heatmap_ce directly.
    np.testing.assert_allclose(
        float(mrf_heatmap_loss("ce", good, targets, vis)),
        float(heatmap_ce(good, targets["dist"], vis)),
        rtol=1e-6,
    )


def test_evaluate_uint8_ingest_scores_the_serving_contract(tiny_config):
    """--uint8-ingest (round 4, deployed-stack scoring): the split is
    fed as raw uint8 RGB — the serve.py input contract, normalized
    in-graph — and must score within quantization noise of the float
    eval (the pixels differ by at most 1/510 per channel)."""
    import jax

    from jointpose.data.pipeline import make_dataset
    from jointpose.evaluate import evaluate
    from jointpose.models.pose import PoseModel

    cfg = tiny_config.replace(mrf=None)
    _, test_ds = make_dataset(cfg.data)
    model = PoseModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *cfg.data.image_hw, 3)))
    ev_f = evaluate(params, test_ds, cfg, model.apply)
    ev_u8 = evaluate(params, test_ds, cfg, model.apply, uint8_ingest=True)
    assert ev_u8["num_examples"] == test_ds.size
    # An untrained net's PDJ is noisy, so compare the full curves with
    # slack for borderline hits flipped by the 8-bit pixel rounding.
    a = np.asarray(ev_f["pdj_curves"])
    b = np.asarray(ev_u8["pdj_curves"])
    assert np.max(np.abs(a - b)) <= 0.25, np.max(np.abs(a - b))


def test_evaluate_uint8_ingest_passes_uint8_datasets_through(tiny_config):
    """A dataset that already returns uint8 images (the materialized
    host pipeline — the real serving contract) must reach the model
    unchanged under --uint8-ingest: re-scaling uint8 by 255 would
    saturate every nonzero pixel to 255 (ADVICE r4 medium)."""
    import jax

    from jointpose.data.pipeline import Dataset, make_dataset
    from jointpose.evaluate import evaluate
    from jointpose.models.pose import PoseModel

    cfg = tiny_config.replace(mrf=None)
    _, test_ds = make_dataset(cfg.data)

    def get_u8(indices):
        got = dict(test_ds.get_batch(indices))
        got["image"] = np.round(
            np.asarray(got["image"]) * 255.0
        ).astype(np.uint8)
        return got

    u8_ds = Dataset(size=test_ds.size, get_batch=get_u8, host_resident=True)
    model = PoseModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *cfg.data.image_hw, 3)))
    # The uint8 dataset scored with and without the flag must agree
    # EXACTLY: both paths feed the identical uint8 pixels (the flag is
    # a no-op for an already-uint8 source).
    ev_u8 = evaluate(params, u8_ds, cfg, model.apply, uint8_ingest=True)
    ev_plain = evaluate(params, u8_ds, cfg, model.apply)
    np.testing.assert_array_equal(
        np.asarray(ev_u8["pdj_curves"]), np.asarray(ev_plain["pdj_curves"])
    )
    # And within 8-bit quantization noise of the float eval.
    ev_f = evaluate(params, test_ds, cfg, model.apply)
    a = np.asarray(ev_f["pdj_curves"])
    b = np.asarray(ev_u8["pdj_curves"])
    assert np.max(np.abs(a - b)) <= 0.25, np.max(np.abs(a - b))


def test_avg_pyramid_reshape_mean_matches_avg_pool():
    """The round-4 reshape-mean pyramid (detector.py) is exactly
    nn.avg_pool for the even-dims non-overlapping case every preset
    guarantees."""
    from flax import linen as nn

    from jointpose.models.detector import _avg_pyramid

    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 12, 16, 3).astype(np.float32)
    )
    want = nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2), padding="SAME")
    got = _avg_pyramid(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

