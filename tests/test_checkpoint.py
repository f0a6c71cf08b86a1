"""Checkpoint save/restore roundtrip tests (SURVEY C13, §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from jointpose.checkpoint import Checkpointer
from jointpose.models.pose import PoseModel
from jointpose.train import create_state


def _state(tiny_config, seed=0):
    model = PoseModel(tiny_config)
    return create_state(tiny_config, model, jax.random.PRNGKey(seed))


def test_roundtrip_bitwise(tiny_config, tmp_path):
    state = _state(tiny_config)
    ckpt = Checkpointer(str(tmp_path / "ck"), keep=2)
    ckpt.save(0, state)
    template = _state(tiny_config, seed=123)  # different values, same tree
    restored = ckpt.restore(template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()


def test_latest_and_best_steps(tiny_config, tmp_path):
    state = _state(tiny_config)
    ckpt = Checkpointer(str(tmp_path / "ck"), keep=3)
    ckpt.save(1, state, metrics={"pdj_at_05_wrist_elbow": 0.2})
    state = state.replace(step=state.step + 1)
    ckpt.save(2, state, metrics={"pdj_at_05_wrist_elbow": 0.9})
    state = state.replace(step=state.step + 1)
    ckpt.save(3, state, metrics={"pdj_at_05_wrist_elbow": 0.5})
    assert ckpt.latest_step() == 3
    assert ckpt.best_step() == 2
    ckpt.close()


def test_restore_specific_step(tiny_config, tmp_path):
    state = _state(tiny_config)
    ckpt = Checkpointer(str(tmp_path / "ck"), keep=3)
    ckpt.save(0, state)
    bumped = state.replace(step=state.step + 5)
    ckpt.save(5, bumped)
    restored = ckpt.restore(state, step=0)
    assert int(restored.step) == 0
    restored5 = ckpt.restore(state, step=5)
    assert int(restored5.step) == 5
    ckpt.close()


def test_latest_survives_declining_metric(tiny_config, tmp_path):
    # Regression (review finding): with a single best_fn manager, orbax
    # deletes the NEWEST checkpoint when its metric isn't among the best,
    # breaking crash-resume.  The dual-manager design must keep both the
    # latest step and the best step.
    state = _state(tiny_config)
    ckpt = Checkpointer(str(tmp_path / "ck"), keep=2)
    for step, pdj in [(1, 0.9), (2, 0.8), (3, 0.5), (4, 0.4)]:
        ckpt.save(step, state.replace(step=jnp.asarray(step)),
                  metrics={"pdj_at_05_wrist_elbow": pdj})
    assert ckpt.latest_step() == 4, "latest checkpoint was deleted"
    assert ckpt.best_step() == 1
    restored = ckpt.restore(_state(tiny_config, seed=9))
    assert int(restored.step) == 4
    best = ckpt.restore(_state(tiny_config, seed=9), step=ckpt.best_step())
    assert int(best.step) == 1
    ckpt.close()
