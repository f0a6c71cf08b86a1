"""Integration tests: end-to-end training on the tiny config (SURVEY §4).

The survey's mandated integration checks: config-1-style overfit on a
tiny synthetic set (loss decreases, PDJ on train approaches 1) and the
staged detector->joint transition with prior re-init.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointpose.configs import get_config
from jointpose.data.pipeline import make_dataset
from jointpose.models.pose import PoseModel
from jointpose.train import (
    create_state,
    init_mrf_from_priors,
    make_train_step,
)


# Function-scoped: the jitted train step donates its input state, so a
# state used by one test is deleted and cannot be shared.
@pytest.fixture()
def tiny_detector_setup():
    cfg = get_config("tiny").replace(mrf=None)
    # Disable augmentation for a clean overfit signal.
    cfg = cfg.replace(augment=dataclasses.replace(cfg.augment, enabled=False))
    model = PoseModel(cfg)
    state = create_state(cfg, model, jax.random.PRNGKey(0))
    train_ds, _ = make_dataset(cfg.data)
    batch = train_ds.get_batch(jnp.arange(cfg.train.batch_size, dtype=jnp.int32))
    return cfg, model, state, batch


def test_detector_overfits_fixed_batch(tiny_detector_setup):
    cfg, model, state, batch = tiny_detector_setup
    step = make_train_step(cfg, "detector")
    losses = []
    for _ in range(60):
        state, metrics = step(state, dict(batch))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert np.isfinite(losses).all()


def test_train_step_metrics_and_state(tiny_detector_setup):
    cfg, model, state, batch = tiny_detector_setup
    step = make_train_step(cfg, "detector")
    state2, metrics = step(state, dict(batch))
    assert int(state2.step) == int(state.step) + 1
    assert {"loss", "detector_loss", "grad_norm"} <= set(metrics)
    assert float(metrics["grad_norm"]) > 0


def test_joint_stage_trains_mrf(tiny_config):
    cfg = tiny_config.replace(
        augment=dataclasses.replace(tiny_config.augment, enabled=False)
    )
    model = PoseModel(cfg)
    state = create_state(cfg, model, jax.random.PRNGKey(0))
    train_ds, _ = make_dataset(cfg.data)
    batch = train_ds.get_batch(jnp.arange(cfg.train.batch_size, dtype=jnp.int32))
    step = make_train_step(cfg, "joint")
    before = np.asarray(state.params["spatial_model"]["raw_kernels"]).copy()
    losses = []
    for _ in range(20):
        state, metrics = step(state, dict(batch))
        losses.append(float(metrics["loss"]))
    after = np.asarray(state.params["spatial_model"]["raw_kernels"])
    assert not np.allclose(before, after), "MRF kernels did not train"
    assert "mrf_loss" in metrics
    assert losses[-1] < losses[0], losses


def test_augmented_step_changes_per_step(tiny_config):
    # With augmentation on, the same input batch gives different losses
    # at different step counts (rng folds in the step).
    cfg = tiny_config.replace(mrf=None)
    model = PoseModel(cfg)
    state = create_state(cfg, model, jax.random.PRNGKey(0))
    train_ds, _ = make_dataset(cfg.data)
    batch = train_ds.get_batch(jnp.arange(cfg.train.batch_size, dtype=jnp.int32))
    step = make_train_step(cfg, "detector")
    # Two independent states (the step donates its input): identical
    # params/rng, one with a bumped step counter.
    state_bumped = create_state(cfg, model, jax.random.PRNGKey(0))
    state_bumped = state_bumped.replace(step=state_bumped.step + 100)
    _, m1 = step(state, dict(batch))
    _, m2 = step(state_bumped, dict(batch))
    assert float(m1["loss"]) != float(m2["loss"])


def test_init_mrf_from_priors_swaps_kernels(tiny_config):
    model = PoseModel(tiny_config)
    state = create_state(tiny_config, model, jax.random.PRNGKey(0))
    wh, ww = tiny_config.mrf.window
    k = tiny_config.num_joints
    priors = np.random.RandomState(0).rand(wh, ww, k, k).astype(np.float32)
    priors /= priors.sum(axis=(0, 1), keepdims=True)
    state2 = init_mrf_from_priors(state, priors)
    changed = not np.allclose(
        np.asarray(state.params["spatial_model"]["raw_kernels"]),
        np.asarray(state2.params["spatial_model"]["raw_kernels"]),
    )
    assert changed
    # Detector params untouched.
    da = jax.tree.leaves(state.params["detector"])
    db = jax.tree.leaves(state2.params["detector"])
    assert all(np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(da, db))


def test_frozen_detector_in_joint_stage(tiny_config):
    # BASELINE config 3 semantics: during the joint stage with
    # freeze_detector_in_joint, detector params stay bitwise fixed while
    # the spatial model trains.
    cfg = tiny_config.replace(
        augment=dataclasses.replace(tiny_config.augment, enabled=False),
        train=dataclasses.replace(
            tiny_config.train, freeze_detector_in_joint=True
        ),
    )
    model = PoseModel(cfg)
    state = create_state(cfg, model, jax.random.PRNGKey(0))
    train_ds, _ = make_dataset(cfg.data)
    batch = train_ds.get_batch(jnp.arange(cfg.train.batch_size, dtype=jnp.int32))
    det_before = jax.tree.map(lambda x: np.asarray(x).copy(),
                              state.params["detector"])
    mrf_before = np.asarray(state.params["spatial_model"]["raw_kernels"]).copy()
    step = make_train_step(cfg, "joint")
    for _ in range(5):
        state, metrics = step(state, dict(batch))
    for a, b in zip(jax.tree.leaves(det_before),
                    jax.tree.leaves(state.params["detector"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(
        mrf_before, np.asarray(state.params["spatial_model"]["raw_kernels"])
    )


def test_mrf_lr_mult_scales_spatial_updates_only(tiny_config):
    # The spatial-model subtree's update scales by mrf_lr_mult; the
    # detector's update is bitwise unaffected by the knob.
    import optax

    from jointpose.train import make_optimizer

    cfg1 = tiny_config
    cfg2 = tiny_config.replace(
        train=dataclasses.replace(tiny_config.train, mrf_lr_mult=8.0)
    )
    model = PoseModel(cfg1)
    state = create_state(cfg1, model, jax.random.PRNGKey(0))
    grads = jax.tree.map(jnp.ones_like, state.params)

    def one_update(cfg):
        tx = make_optimizer(cfg)
        opt_state = tx.init(state.params)
        updates, _ = tx.update(grads, opt_state, state.params)
        return updates

    u1, u2 = one_update(cfg1), one_update(cfg2)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(u2["spatial_model"])[0]),
        8.0 * np.asarray(jax.tree.leaves(u1["spatial_model"])[0]),
        rtol=1e-6,
    )
    for a, b in zip(jax.tree.leaves(u1["detector"]), jax.tree.leaves(u2["detector"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multistep_scan_matches_single_steps(tiny_config):
    # K steps fused in one lax.scan dispatch must replay the exact
    # single-step sequence: the batch for step s is a pure function of
    # (seed, s) inside the step, so state after scan(K) == state after
    # K single steps (same params, same opt state, same step counter).
    from jointpose.train import make_train_multistep

    cfg = tiny_config.replace(
        train=dataclasses.replace(tiny_config.train, batch_size=2)
    )
    train_ds, _ = make_dataset(cfg.data)
    gen = train_ds.get_batch
    k = 3
    idx = jnp.arange(k * 2, dtype=jnp.int32).reshape(k, 2)

    state_a = create_state(cfg, PoseModel(cfg), jax.random.PRNGKey(0))
    single = make_train_step(cfg, "detector", get_batch=gen)
    for i in range(k):
        state_a, metrics_a = single(state_a, idx[i])

    state_b = create_state(cfg, PoseModel(cfg), jax.random.PRNGKey(0))
    multi = make_train_multistep(cfg, "detector", gen, k)
    state_b, metrics_b = multi(state_b, idx)

    assert int(state_a.step) == int(state_b.step) == k
    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-5
    )
    for pa, pb in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=2e-5, atol=1e-6)
