"""Model layer: part detector, MRF spatial model, joint composition.

Rebuilds SURVEY.md components C5 (single-scale detector), C6
(multi-resolution fusion) and C7 (MRF spatial model) as flax modules
over XLA/Pallas ops.
"""

from jointpose.models.detector import Detector  # noqa: F401
from jointpose.models.mrf import SpatialModel  # noqa: F401
from jointpose.models.pose import PoseModel  # noqa: F401
