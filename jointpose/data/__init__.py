"""Data layer: FLIC loading, synthetic source, augmentation, targets.

Rebuilds SURVEY.md components C2 (FLIC loader), C3 (augmentation) and
C4 (Gaussian heatmap target generation) TPU-first: augmentation and
target rendering run on-device inside jit (vmapped XLA), so the host
never touches per-pixel work in the hot loop.
"""

from jointpose.data.targets import render_gaussian_heatmaps  # noqa: F401
from jointpose.data.augment import augment_batch, random_augment_params  # noqa: F401
from jointpose.data.synthetic import make_synthetic_flic  # noqa: F401
from jointpose.data.pipeline import Dataset, make_dataset, batch_iterator  # noqa: F401
