"""End-to-end ``fit`` integration: staged training overfits tiny synthetic
data; checkpoint/resume is step-exact (SURVEY §4 integration tests)."""

import dataclasses
import json
import os

import numpy as np

from jointpose.configs import get_config
from jointpose.train import fit


def _tiny_fit_config():
    cfg = get_config("tiny")
    return cfg.replace(
        augment=dataclasses.replace(cfg.augment, enabled=False),
        train=dataclasses.replace(
            cfg.train,
            detector_steps=40,
            joint_steps=20,
            eval_every=20,
            log_every=10,
            learning_rate=1e-3,
        ),
    )


def test_fit_runs_stages_and_logs(tmp_path):
    cfg = _tiny_fit_config()
    result = fit(cfg, str(tmp_path), eval_max_batches=1)
    assert int(result.state.step) == 60
    # Metrics JSONL written and parseable.
    lines = [
        json.loads(line)
        for line in open(os.path.join(str(tmp_path), "metrics.jsonl"))
    ]
    assert any("loss" in rec for rec in lines)
    assert any("pdj_at_05_wrist_elbow" in rec for rec in lines)
    # Both stages ran.
    stages = {rec.get("stage") for rec in lines if "stage" in rec}
    assert stages == {"detector", "joint"}
    # Checkpoints exist.
    assert os.path.isdir(os.path.join(str(tmp_path), cfg.train.checkpoint_dir))
    # Training reduced the loss substantially.
    losses = [rec["loss"] for rec in lines if "loss" in rec and rec.get("stage") == "detector"]
    assert losses[-1] < losses[0]


def test_host_fused_multistep_matches_single_step(tmp_path, monkeypatch):
    """Round 5: host-resident sources scan K steps per dispatch
    (make_train_multistep_arrays) — the staged (K, B, ...) array path
    must replay the single-dispatch-per-step sequence (same batches,
    same per-step augmentation RNG fold-ins, same prior-init stage
    boundary) up to scan-vs-unrolled fusion rounding — the same
    tolerance the index-fed multistep parity test pins
    (test_train.py::test_multistep_scan_matches_single_steps)."""
    import jax
    import jax.numpy as jnp

    from jointpose.data import pipeline as pl
    from jointpose.data.synthetic import make_synthetic_flic

    cfg = get_config("tiny")
    cfg = cfg.replace(
        augment=dataclasses.replace(cfg.augment, enabled=True),
        # device_cache_gb=0 pins the HOST-ARRAY staging path (the
        # default would promote this tiny split to the HBM cache and
        # test the index-fused path instead — covered below).
        data=dataclasses.replace(cfg.data, device_cache_gb=0.0),
        train=dataclasses.replace(
            cfg.train, detector_steps=8, joint_steps=8,
            eval_every=8, log_every=4,
        ),
    )

    # A host-resident uint8 split rendered once from the synthetic source
    # (the exact shape real FLIC takes through from_host_arrays).
    gen = make_synthetic_flic(cfg.data)
    full = gen(jnp.arange(cfg.data.train_size + cfg.data.test_size,
                          dtype=jnp.int32))
    arrays = {
        "image": np.round(np.asarray(full["image"]) * 255.0).astype(np.uint8),
        "joints": np.asarray(full["joints"]),
        "visible": np.asarray(full["visible"]),
    }
    n_train = cfg.data.train_size

    def fake_make_dataset(data_cfg):
        tr = {k: v[:n_train] for k, v in arrays.items()}
        te = {k: v[n_train:] for k, v in arrays.items()}
        return pl.from_host_arrays(tr), pl.from_host_arrays(te)

    monkeypatch.setattr("jointpose.train.make_dataset", fake_make_dataset)
    monkeypatch.setattr("jointpose.evaluate.make_dataset", fake_make_dataset, raising=False)

    def run(k, tag=""):
        c = cfg.replace(train=dataclasses.replace(cfg.train, steps_per_dispatch=k))
        wd = str(tmp_path / f"k{k}{tag}")
        return fit(c, wd, eval_max_batches=1)

    r1 = run(1)
    r4 = run(4)
    assert int(r1.state.step) == int(r4.state.step) == 16

    def assert_close(pa, pb):
        fa = jax.tree_util.tree_leaves_with_path(pa)
        fb = jax.tree_util.tree_leaves_with_path(pb)
        assert len(fa) == len(fb)
        for (path, a), (_, b) in zip(fa, fb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
                err_msg=jax.tree_util.keystr(path),
            )

    assert_close(r1.state.params, r4.state.params)

    # The HBM device cache (pipeline.device_cache): the same host split
    # promoted on-device must land on the same trained params — the
    # cache changes WHERE batches come from, never what they contain.
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, device_cache_gb=2.0))
    rc = run(4, tag="_cached")
    assert int(rc.state.step) == 16
    assert_close(r4.state.params, rc.state.params)


def test_best_checkpoint_only_ranks_full_model_scores(tmp_path):
    # Detector-stage evals score the detector-only head, but a checkpoint
    # saved then holds an uninitialized MRF: it must never enter the
    # keep-best manager, or serve.py --best would serve near-uniform MRF
    # output under a high recorded PDJ (round-1 advisor finding).
    from jointpose.checkpoint import Checkpointer

    cfg = _tiny_fit_config()  # detector_steps=40, eval_every=20
    fit(cfg, str(tmp_path), eval_max_batches=1)
    ckpt = Checkpointer(os.path.join(str(tmp_path), cfg.train.checkpoint_dir))
    best = ckpt.best_step()
    ckpt.close()
    assert best is not None and best > cfg.train.detector_steps, best
    # JSONL records which graph each eval scored.
    lines = [
        json.loads(line)
        for line in open(os.path.join(str(tmp_path), "metrics.jsonl"))
    ]
    stages = {rec["step"]: rec["eval_stage"] for rec in lines if "eval_stage" in rec}
    assert stages[20] == "detector" and stages[60] == "joint"


def test_fit_resume_continues_from_checkpoint(tmp_path):
    cfg = _tiny_fit_config()
    fit(cfg, str(tmp_path), eval_max_batches=1)
    # Extend the schedule and resume: should start from step 60.
    cfg2 = cfg.replace(
        train=dataclasses.replace(cfg.train, joint_steps=30)
    )
    result = fit(cfg2, str(tmp_path), eval_max_batches=1, resume=True)
    assert int(result.state.step) == 70
    lines = [
        json.loads(line)
        for line in open(os.path.join(str(tmp_path), "metrics.jsonl"))
    ]
    steps = [rec["step"] for rec in lines]
    assert max(steps) == 70


def test_resume_preserves_data_order(tmp_path):
    # The batch for step s is a pure function of (seed, s): a resumed run
    # must see exactly the batches an uninterrupted run would have seen,
    # so final params match bitwise.
    import jax
    import numpy as np

    cfg = _tiny_fit_config()
    full = fit(cfg, str(tmp_path / "full"))
    # Interrupted run: stop after the detector stage, then resume.
    cfg_short = cfg.replace(
        train=dataclasses.replace(cfg.train, joint_steps=0)
    )
    fit(cfg_short, str(tmp_path / "resumed"))
    resumed = fit(cfg, str(tmp_path / "resumed"), resume=True)
    for a, b in zip(
        jax.tree.leaves(full.state.params), jax.tree.leaves(resumed.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
