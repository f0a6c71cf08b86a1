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


def _fresh(cfg):
    model = PoseModel(cfg)
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
    state, _ = _fresh(cfg)
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
