"""Device mesh and sharding rules (SURVEY §2 parallelism plan).

Design (scaling-book recipe): pick a mesh, annotate input/param
shardings, let XLA insert the collectives.

- ``data`` axis: batch dimension of every batch array; the train step's
  gradient mean becomes an XLA allreduce over ICI.
- ``model`` axis: the detector head's wide conv shards its OUTPUT
  channels and the following 1x1 its INPUT channels (classic conv TP,
  see ``param_shardings``); the MRF message pass shards its
  *source-joint* axis at the activation level instead (shard_map +
  psum, parallel/mrf_tp.py) because K=9 divides no even axis, so its
  pairwise params stay replicated.  For a ~1M-param CNN this axis
  exists to prove out the sharding machinery (SURVEY §2: TP
  "optional"), and composes with DP on a 2-D mesh.

No NCCL/MPI analog exists or is needed: collectives are compiled by
XLA (ICI intra-slice; DCN across hosts via ``init_distributed``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jointpose.configs import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build the ('data', 'model') mesh over available devices."""
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = cfg.model if cfg.model > 0 else 1
    data = cfg.data if cfg.data > 0 else n // model
    assert data * model <= n and data * model >= 1, (
        f"mesh {data}x{model} needs more than the {n} available devices"
    )
    devices = devices[: data * model]
    import numpy as np

    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def _batch_axis(mesh: Mesh, batch: int):
    """DATA_AXIS if the trace-time batch can shard over it, else None.

    Model init traces with batch 1; constraining dim 0 to 'data' there
    would demand divisibility the array cannot satisfy, so small batches
    stay replicated on the batch dim (rows still shard over 'model').
    """
    return DATA_AXIS if batch % mesh.shape[DATA_AXIS] == 0 else None


def spatial_image_sharding(mesh: Mesh, batch: int) -> NamedSharding:
    """(B, H, W, C) sharding with image ROWS split over the 'model' axis.

    Spatial parallelism (SP) for the detector trunk: annotating the
    trunk activations with this spec makes XLA's SPMD partitioner run
    every trunk conv on an H-shard per device and insert the halo
    exchanges (edge-row ppermutes over ICI) that SAME-padded convs and
    2x2 pools need at shard boundaries — the scaling-book recipe, no
    hand-written collectives.  The full-resolution trunk maps are the
    paper topology's dominant HBM term, so SP divides that traffic (and
    the trunk activation footprint) by the 'model' axis size where
    channel TP cannot (the trunk is only 3-128 channels wide).
    """
    return NamedSharding(mesh, P(_batch_axis(mesh, batch), MODEL_AXIS))


def spatial_gather_sharding(mesh: Mesh, batch: int) -> NamedSharding:
    """Row-gathered (batch-only) sharding matching `spatial_image_sharding`."""
    return NamedSharding(mesh, P(_batch_axis(mesh, batch)))


def _path_keys(path: tuple) -> list:
    return [getattr(p, "key", getattr(p, "name", None)) for p in path]


def param_shardings(params, mesh: Mesh):
    """Sharding tree for a param pytree — the framework's tensor axis.

    Over the 'model' axis:
    - the detector head's wide conv shards its OUTPUT channels
      (kernel (kh, kw, in, out) -> P(..., 'model'); bias -> P('model')),
      and the following 1x1 convs shard their INPUT channels — classic
      channel-wise conv TP; XLA inserts the reduce at the 1x1 contraction;
    - the MRF pairwise kernels stay replicated HERE (K=9 divides no even
      axis); their TP is activation-level instead: the message pass
      shards its source-joint axis in-graph via shard_map + psum with
      neutral padding (parallel/mrf_tp.py), engaged through
      ``PoseModel(mesh=...)``.

    Everything else (trunk convs, small biases) is replicated; the batch
    axis of activations carries the 'data' sharding.
    """
    model_size = mesh.shape[MODEL_AXIS]

    def rule(path, x):
        keys = _path_keys(path)
        if model_size > 1:
            if "head_wide" in keys:
                if keys[-1] == "kernel" and x.shape[-1] % model_size == 0:
                    return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
                if keys[-1] == "bias" and x.shape[-1] % model_size == 0:
                    return NamedSharding(mesh, P(MODEL_AXIS))
            if "head_1x1_0" in keys and keys[-1] == "kernel" and x.shape[-2] % model_size == 0:
                return NamedSharding(mesh, P(None, None, MODEL_AXIS, None))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_state(state, mesh: Mesh):
    """Place a whole TrainState on the (global) mesh.

    The ``param_shardings`` rule keys on path names ('head_wide',
    'kernel', ...), and optax's Adam moments mirror the params tree
    path-for-path — so applying the same rule to the ENTIRE state tree
    gives mu/nu the same TP shardings as their params and replicates
    everything else (step, count, base_rng).  Multi-process runs need
    this for every leaf, not just params: a restored/updated state with
    locally-committed opt_state cannot enter a jit with global arrays.
    """
    rule_shardings = param_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, rule_shardings)


def init_distributed() -> None:
    """Multi-host init over DCN (coordinator discovery via env vars).

    No-op on a single host; call before any jax API in multi-host runs
    (SURVEY §5 'Distributed communication backend').  jax reads
    JAX_COORDINATOR_ADDRESS itself but autodetects process count/index
    only under a cluster scheduler (SLURM/GKE); a plain N-process
    launch additionally sets JAX_NUM_PROCESSES and JAX_PROCESS_ID and
    we pass them through explicitly (exercised for real by
    tests/test_multihost.py's two-process run).
    """
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        kwargs = {}
        n, pid = os.environ.get("JAX_NUM_PROCESSES"), os.environ.get("JAX_PROCESS_ID")
        if n is not None and pid is not None:
            kwargs = {"num_processes": int(n), "process_id": int(pid)}
        # The shutdown barrier defaults to 300 s: processes skewed by
        # more than that at exit (process 0 runs extra lead-only work —
        # metrics, figures, metadata — and CI hosts can be one
        # oversubscribed core) turn a clean exit into a barrier
        # timeout that retroactively FAILS the finished run.
        to = os.environ.get("JOINTPOSE_SHUTDOWN_TIMEOUT")
        if to is not None:
            kwargs["shutdown_timeout_seconds"] = int(to)
        jax.distributed.initialize(**kwargs)
