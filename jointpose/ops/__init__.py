"""TPU compute ops: MRF message pass (XLA + fused Pallas), heatmap utils.

This package is the TPU-native replacement for what the reference
delegates to TensorFlow's native runtime (SURVEY §2 "Native components"):
the performance-critical kernels live here, with a pure-XLA reference
implementation kept as the correctness oracle for every Pallas kernel.
"""

from jointpose.ops.heatmaps import spatial_log_softmax, spatial_softmax  # noqa: F401
from jointpose.ops.mrf_xla import mrf_message_pass_xla  # noqa: F401
