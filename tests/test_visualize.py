"""Smoke tests for visualization (SURVEY C12): files render headlessly."""

import os

import numpy as np

from jointpose import skeleton
from jointpose.visualize import save_heatmap_overlays, save_pdj_curves, save_prior_grid

K = skeleton.NUM_JOINTS


def test_heatmap_overlays(tmp_path):
    rs = np.random.RandomState(0)
    images = rs.rand(2, 48, 64, 3).astype(np.float32)
    heatmaps = rs.rand(2, 12, 16, K).astype(np.float32)
    joints = rs.uniform(0, 48, (2, K, 2)).astype(np.float32)
    out = save_heatmap_overlays(images, heatmaps, str(tmp_path / "hm.png"), joints)
    assert os.path.getsize(out) > 1000


def test_prior_grid(tmp_path):
    priors = np.random.RandomState(0).rand(11, 15, K, K).astype(np.float32)
    out = save_prior_grid(priors, str(tmp_path / "priors.png"))
    assert os.path.getsize(out) > 1000


def test_pdj_curves(tmp_path):
    thresholds = np.linspace(0, 0.2, 21)
    curves = np.clip(thresholds[:, None] * 5 + np.random.rand(21, K) * 0.1, 0, 1)
    metrics = {"thresholds": thresholds.tolist(), "pdj_curves": curves.tolist()}
    out = save_pdj_curves(metrics, str(tmp_path / "pdj.png"))
    assert os.path.getsize(out) > 1000
