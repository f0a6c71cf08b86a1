"""Tests for the numerics sanitizers (SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jointpose.debug import assert_finite_tree, checked_apply


def test_checked_apply_clean_function():
    err, out = checked_apply(lambda x: jnp.log(x + 1.0), jnp.ones((4,)))
    err.throw()  # no error
    np.testing.assert_allclose(np.asarray(out), np.log(2.0), rtol=1e-6)


def test_checked_apply_catches_nan():
    def bad(x):
        return jnp.log(x)  # log(0) and log(-1) -> -inf / nan

    err, _ = checked_apply(bad, jnp.asarray([-1.0, 0.0, 1.0]))
    with pytest.raises(Exception):
        err.throw()


def test_checked_apply_through_model(tiny_config):
    from jointpose.models.pose import PoseModel

    model = PoseModel(tiny_config)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, *tiny_config.data.image_hw, 3),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), x)
    err, out = checked_apply(model.apply, params, x)
    err.throw()
    assert "mrf_log_heatmaps" in out


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones((2,)), "b": {"c": jnp.zeros(())}})
    with pytest.raises(AssertionError, match="b/c"):
        assert_finite_tree({"a": jnp.ones((2,)), "b": {"c": jnp.asarray(np.nan)}})
