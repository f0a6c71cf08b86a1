"""Sharding tests on the 8-fake-CPU-device mesh (SURVEY §4).

The survey's "distributed tests without a cluster": assert the
DP-sharded train step computes the same result as the single-device
step, and that the 2-D (data, model) mesh with channel-sharded head
convs compiles and matches.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointpose.configs import MeshConfig, get_config
from jointpose.data.pipeline import make_dataset
from jointpose.models.pose import PoseModel
from jointpose.parallel.mesh import (
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from jointpose.train import create_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (fake) devices"
)


def _fresh(cfg, mesh=None):
    use_model = mesh is not None and mesh.shape["model"] > 1
    model = PoseModel(
        cfg,
        mesh=mesh if use_model else None,
        spatial=cfg.mesh.spatial and use_model,
    )
    state = create_state(cfg, model, jax.random.PRNGKey(0))
    train_ds, _ = make_dataset(cfg.data)
    batch = train_ds.get_batch(jnp.arange(8, dtype=jnp.int32))
    return state, {k: np.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def tiny_noaug():
    cfg = get_config("tiny")
    cfg = cfg.replace(
        augment=dataclasses.replace(cfg.augment, enabled=False),
        train=dataclasses.replace(cfg.train, batch_size=8),
    )
    return cfg


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=-1, model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(MeshConfig(data=8, model=1))
    assert mesh.shape == {"data": 8, "model": 1}
    # An explicit mesh smaller than the device count takes a prefix.
    mesh = make_mesh(MeshConfig(data=3, model=2))
    assert mesh.shape == {"data": 3, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(MeshConfig(data=16, model=2))


def _run_step(cfg, mesh_cfg, batch_np):
    cfg = cfg.replace(mesh=mesh_cfg)
    mesh = make_mesh(cfg.mesh, devices=jax.devices()[: mesh_cfg.data * mesh_cfg.model])
    state, _ = _fresh(cfg, mesh)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    with mesh:
        state = state.replace(params=shard_params(state.params, mesh))
        batch = shard_batch(batch, mesh)
        step = make_train_step(cfg, "joint")
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])
        params = jax.tree.map(np.asarray, jax.device_get(state.params))
    return loss, params


def test_dp_sharded_step_matches_single_device(tiny_noaug):
    _, batch_np = _fresh(tiny_noaug)
    loss_1, params_1 = _run_step(tiny_noaug, MeshConfig(data=1, model=1), batch_np)
    loss_8, params_8 = _run_step(tiny_noaug, MeshConfig(data=8, model=1), batch_np)
    assert np.isfinite(loss_1) and np.isfinite(loss_8)
    np.testing.assert_allclose(loss_1, loss_8, rtol=2e-4)
    flat_1 = jax.tree.leaves(params_1)
    flat_8 = jax.tree.leaves(params_8)
    for a, b in zip(flat_1, flat_8):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_2d_mesh_with_model_sharding_matches(tiny_noaug):
    _, batch_np = _fresh(tiny_noaug)
    loss_1, params_1 = _run_step(tiny_noaug, MeshConfig(data=1, model=1), batch_np)
    loss_42, params_42 = _run_step(tiny_noaug, MeshConfig(data=4, model=2), batch_np)
    np.testing.assert_allclose(loss_1, loss_42, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(params_1), jax.tree.leaves(params_42)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("n_model", [2, 4, 8])
def test_mrf_tp_pass_matches_unsharded(n_model):
    # Source-joint TP of the message pass (K=9 padded to a neutral
    # multiple of the model axis): results must match the unsharded pass
    # and the device-local operand shapes must actually be slices.
    import jax.lax as lax

    from jointpose.ops.mrf_xla import mrf_message_pass_xla
    from jointpose.parallel.mrf_tp import mrf_message_pass_tp

    k, hw, win, b = 9, (12, 16), (7, 9), 8
    rngs = jax.random.split(jax.random.PRNGKey(3), 3)
    p = jax.nn.softmax(
        jax.random.normal(rngs[0], (b, *hw, k)).reshape(b, -1, k), axis=1
    ).reshape(b, *hw, k)
    kernels = jax.nn.softplus(jax.random.normal(rngs[1], (*win, k, k)))
    biases = jax.nn.softplus(jax.random.normal(rngs[2], (k, k)) - 4.0)
    mesh = make_mesh(MeshConfig(data=8 // n_model, model=n_model))

    local_shapes = []

    def recording_pass(p_, k_, b_, **kw):
        local_shapes.append((p_.shape, k_.shape, b_.shape))
        return mrf_message_pass_xla(p_, k_, b_, **kw)

    want = mrf_message_pass_xla(p, kernels, biases, precision=lax.Precision.HIGHEST)
    got = mrf_message_pass_tp(
        p, kernels, biases, precision=lax.Precision.HIGHEST,
        mesh=mesh, base_pass=recording_pass,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # Device-local shapes: Kp = ceil(9/n)*n source slots split n ways.
    kp = -(-k // n_model) * n_model
    (p_shape, k_shape, b_shape) = local_shapes[0]
    assert p_shape == (b // (8 // n_model), *hw, kp // n_model)
    assert k_shape == (*win, kp // n_model, k)
    assert b_shape == (kp // n_model, k)


def test_mrf_tp_gradients_match_unsharded():
    import jax.lax as lax

    from jointpose.ops.mrf_xla import mrf_message_pass_xla
    from jointpose.parallel.mrf_tp import mrf_message_pass_tp

    k, hw, win, b = 9, (10, 12), (5, 7), 8
    rngs = jax.random.split(jax.random.PRNGKey(4), 3)
    p = jax.nn.softmax(
        jax.random.normal(rngs[0], (b, *hw, k)).reshape(b, -1, k), axis=1
    ).reshape(b, *hw, k)
    kernels = jax.nn.softplus(jax.random.normal(rngs[1], (*win, k, k)))
    biases = jax.nn.softplus(jax.random.normal(rngs[2], (k, k)) - 4.0)
    mesh = make_mesh(MeshConfig(data=4, model=2))

    def loss(fn, *args):
        return jnp.sum(jnp.tanh(fn(*args)))

    gw = jax.grad(
        lambda *a: loss(
            lambda *x: mrf_message_pass_xla(*x, precision=lax.Precision.HIGHEST), *a
        ),
        argnums=(0, 1, 2),
    )(p, kernels, biases)
    gt = jax.grad(
        lambda *a: loss(
            lambda *x: mrf_message_pass_tp(
                *x, precision=lax.Precision.HIGHEST,
                mesh=mesh, base_pass=mrf_message_pass_xla,
            ),
            *a,
        ),
        argnums=(0, 1, 2),
    )(p, kernels, biases)
    for a_, b_, name in zip(gw, gt, ("dp", "dkernels", "dbiases")):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a_), atol=1e-5, err_msg=name
        )


def test_head_conv_params_actually_sharded(tiny_noaug):
    cfg = tiny_noaug.replace(mesh=MeshConfig(data=4, model=2))
    mesh = make_mesh(cfg.mesh)
    state, _ = _fresh(cfg)
    shardings = param_shardings(state.params, mesh)
    spec = shardings["detector"]["head_wide"]["kernel"].spec
    assert spec == jax.sharding.PartitionSpec(None, None, None, "model")
    spec_in = shardings["detector"]["head_1x1_0"]["kernel"].spec
    assert spec_in == jax.sharding.PartitionSpec(None, None, "model", None)
    # Trunk stays replicated.
    assert shardings["detector"]["trunk"]["conv0"]["kernel"].spec == (
        jax.sharding.PartitionSpec()
    )


def test_spatial_sharded_step_matches_single_device(tiny_noaug):
    # SP train step: image rows sharded over 'model' through the trunk
    # (XLA halo exchanges), gathered before the head; must reproduce the
    # unsharded step.
    _, batch_np = _fresh(tiny_noaug)
    loss_1, params_1 = _run_step(tiny_noaug, MeshConfig(data=1, model=1), batch_np)
    loss_sp, params_sp = _run_step(
        tiny_noaug, MeshConfig(data=4, model=2, spatial=True), batch_np
    )
    np.testing.assert_allclose(loss_1, loss_sp, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(params_1), jax.tree.leaves(params_sp)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("n_model", [2])
def test_spatial_forward_matches_and_inserts_collectives(tiny_noaug, n_model):
    # Forward parity of the spatially-sharded detector + proof the
    # partitioner actually sharded rows: the compiled SPMD module must
    # contain a gather/permute collective (the halo exchange and/or the
    # pre-head row gather), which the unsharded program has none of.
    config = tiny_noaug
    rng = jax.random.PRNGKey(1)
    images = jax.random.uniform(rng, (8, *config.data.image_hw, 3), jnp.float32)
    base = PoseModel(config)
    params = base.init(rng, images[:1])
    ref = jax.jit(base.apply)(params, images)

    mesh = make_mesh(MeshConfig(data=8 // n_model, model=n_model))
    sp_model = PoseModel(config, mesh=mesh, spatial=True)
    fn = jax.jit(sp_model.apply)
    compiled = fn.lower(params, images).compile()
    hlo = compiled.as_text()
    assert any(op in hlo for op in ("all-gather", "collective-permute")), (
        "spatial sharding compiled to no collectives - constraint ignored?"
    )
    out = compiled(params, images)
    np.testing.assert_allclose(
        np.asarray(ref["detector_logits"]),
        np.asarray(out["detector_logits"]),
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ref["mrf_log_heatmaps"]),
        np.asarray(out["mrf_log_heatmaps"]),
        rtol=2e-4, atol=1e-5,
    )


def test_spatial_rejects_unaligned_rows(tiny_noaug):
    # 48 rows at stride-8 alignment shard over 2 but not over 4 devices
    # once multires doubles the alignment: 48 % (8*4) != 0.
    config = tiny_noaug
    mesh = make_mesh(MeshConfig(data=2, model=4))
    model = PoseModel(config, mesh=mesh, spatial=True)
    images = jnp.zeros((2, *config.data.image_hw, 3), jnp.float32)
    with pytest.raises(ValueError, match="spatial sharding"):
        model.init(jax.random.PRNGKey(0), images)


def test_dp_eval_matches_single_device(tiny_noaug):
    # evaluate(mesh=...) shards every eval batch over 'data'; the PDJ
    # curves and counts must match the unsharded evaluation exactly
    # (the (T, K) count outputs are unsharded, so XLA compiles the
    # batch reduction to an all-reduce).
    from jointpose.evaluate import evaluate
    from jointpose.data.pipeline import make_dataset

    config = tiny_noaug
    model = PoseModel(config)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((1, *config.data.image_hw, 3), jnp.float32)
    params = model.init(rng, images)
    _, test_ds = make_dataset(config.data)

    ref = evaluate(params, test_ds, config, model.apply, max_batches=2)
    mesh = make_mesh(MeshConfig(data=4, model=1))
    got = evaluate(
        params, test_ds, config, model.apply, max_batches=2, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(ref["pdj_curves"]), np.asarray(got["pdj_curves"]), atol=1e-6
    )
    assert ref["num_examples"] == got["num_examples"]
    assert ref["num_torso_excluded"] == got["num_torso_excluded"]


def test_dp_inference_matches_single_device(tiny_noaug):
    # build_predictor(mesh=...) shards the batch over 'data' and lets
    # XLA partition the forward SPMD; coords must match the unsharded
    # predictor exactly.
    from jointpose.predict import build_predictor

    config = tiny_noaug
    model = PoseModel(config)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (8, *config.data.image_hw, 3), jnp.float32)
    params = model.init(rng, images[:1])

    single = build_predictor(config, params)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    sharded = build_predictor(config, params, mesh=mesh)

    c1, p1 = single(images)
    c2, p2 = sharded(images)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    # The batch really is partitioned: each device holds 1/8 of it.
    shard_shapes = {s.data.shape for s in c2.addressable_shards} if hasattr(c2, "addressable_shards") else set()
    assert not shard_shapes or (1, 9, 2) in shard_shapes
