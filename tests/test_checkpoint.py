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


def test_run_metadata_recorded_and_reconciled(tiny_config, tmp_path):
    # Review finding: pool_mode changes behavior but not param shapes, so
    # a mismatched restore silently mis-evaluates.  The first save must
    # record the mode; restore-side reconcile adopts it over a drifted
    # preset default and rejects a contradicting CLI override.
    from jointpose.checkpoint import load_run_metadata, reconcile_config
    from jointpose.configs import with_pool_mode

    cfg = with_pool_mode(tiny_config, "stride")
    path = str(tmp_path / "ck")
    ckpt = Checkpointer(path, keep=1, config=cfg)
    ckpt.save(0, _state(cfg))
    ckpt.close()

    meta = load_run_metadata(path)
    assert meta is not None and meta["pool_mode"] == "stride"

    # Drifted preset default ('max') -> recorded mode wins.
    adopted = reconcile_config(tiny_config, path)
    assert adopted.detector.pool_mode == "stride"
    # Explicit matching override passes through.
    assert reconcile_config(tiny_config, path, "stride").detector.pool_mode == "stride"
    # Contradicting override is an error, not a silent mis-evaluation.
    import pytest

    with pytest.raises(ValueError, match="contradicts"):
        reconcile_config(tiny_config, path, "max")
    # No metadata (pre-metadata runs): override and default still work.
    assert reconcile_config(tiny_config, str(tmp_path / "nope"), "max").detector.pool_mode == "max"
    assert reconcile_config(cfg, str(tmp_path / "nope")).detector.pool_mode == "stride"


def test_resume_with_wrong_pool_mode_fails_fast(tiny_config, tmp_path):
    import pytest

    from jointpose.configs import with_pool_mode

    cfg_max = with_pool_mode(tiny_config, "max")
    path = str(tmp_path / "ck")
    ckpt = Checkpointer(path, keep=1, config=cfg_max)
    ckpt.save(0, _state(cfg_max))
    ckpt.close()
    with pytest.raises(ValueError, match="pool_mode"):
        Checkpointer(path, keep=1, config=with_pool_mode(tiny_config, "stride"))
