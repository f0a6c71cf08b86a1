"""jointpose — TPU-native joint CNN+MRF human pose estimation.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
reference `max-andr/joint-cnn-mrf` (TensorFlow-1.x implementation of
Tompson et al., "Joint Training of a Convolutional Network and a
Graphical Model for Human Pose Estimation", NeurIPS 2014,
arXiv:1406.2984).  See SURVEY.md for the reference's layer map and
component inventory; this package rebuilds every component TPU-first:

- ``jointpose.data``      — FLIC loader, synthetic-FLIC source, on-device
                            crop/scale/rotate/flip augmentation and Gaussian
                            heatmap target rendering (SURVEY C2-C4).
- ``jointpose.models``    — single-scale & multi-resolution fully-conv part
                            detector (flax) and the MRF spatial model
                            (SURVEY C5-C7).
- ``jointpose.ops``       — XLA + fused-Pallas implementations of the
                            log-space MRF message pass and heatmap decode.
- ``jointpose.parallel``  — mesh/sharding helpers: data-parallel batch
                            sharding plus model-axis sharding of the K^2
                            pairwise MRF channels (SURVEY §2 parallelism).
- ``jointpose.priors``    — empirical pairwise displacement histograms used
                            to initialize the MRF kernels (SURVEY C9).
- ``jointpose.train``     — staged training: detector pretrain -> MRF init
                            from priors -> joint fine-tune (SURVEY C10).
- ``jointpose.evaluate``  — PDJ/PCK curves with flip-averaged TTA
                            (SURVEY C11).
"""

__version__ = "0.1.0"

from jointpose import skeleton  # noqa: F401
from jointpose.configs import Config, get_config, PRESETS  # noqa: F401
