"""Parallelism layer: device mesh, shardings, distributed init.

The reference has no parallelism (SURVEY §2: single process, single
GPU).  This package is the TPU-native scaling story: a 2-D
('data', 'model') mesh where the batch shards over 'data' (gradient
psum compiled by XLA over ICI) and the MRF's K^2 pairwise channels —
the model's one embarrassingly-parallel tensor axis — shard over
'model'.  Multi-host wiring goes through jax.distributed over DCN.
"""

from jointpose.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)
