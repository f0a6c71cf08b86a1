"""Model-axis tensor parallelism for the MRF message pass (SURVEY §2 TP).

The message pass is a sum over source joints of per-source log-messages:

    out[..., a] = Σ_v log( k_{a|v} ⊛ p_v + b_{v,a} )

so the natural tensor axis is the SOURCE-JOINT axis v: each model shard
computes the messages from its v-slice (a grouped conv / Fourier pass
with Kv_local = Kp / n_shards source channels) and one ``psum`` over the
'model' mesh axis combines the log-sums.  K = 9 never divides an even
axis, so the v axis is padded to the next multiple with NEUTRAL slots:
zero kernels + unit bias make a padded source contribute
log(0 + 1) = 0 to every target joint exactly.

This runs as ``shard_map`` (manual SPMD) because the per-shard pass may
be a Pallas kernel, which XLA's automatic partitioner cannot split.
Verified against the unsharded pass on a fake-8-device CPU mesh
(tests/test_parallel.py), including that the device-local operand
shapes actually differ from the global ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jointpose.parallel.mesh import DATA_AXIS, MODEL_AXIS


def pad_source_axis(
    p: jnp.ndarray, kernels: jnp.ndarray, biases: jnp.ndarray, n_shards: int
):
    """Pad the source-joint axis to a multiple of n_shards, neutrally."""
    k = p.shape[-1]
    kp = -(-k // n_shards) * n_shards
    pad = kp - k
    if pad:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, 0), (0, pad)))
        kernels = jnp.pad(kernels, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # Unit bias: the padded source's response is 0 + 1 everywhere,
        # contributing log(1) = 0 to the sum.
        biases = jnp.pad(biases, ((0, pad), (0, 0)), constant_values=1.0)
    return p, kernels, biases


def mrf_message_pass_tp(
    p: jnp.ndarray,
    kernels: jnp.ndarray,
    biases: jnp.ndarray,
    eps: float = 1e-6,
    precision=None,
    *,
    mesh: Mesh,
    base_pass,
) -> jnp.ndarray:
    """Shard ``base_pass`` over the mesh 'model' axis by source joint.

    Same (p, kernels, biases, eps, precision) contract as the unsharded
    passes; ``base_pass`` is any of them (xla / pallas / fft / fused).
    The batch axis additionally rides the 'data' axis when divisible
    (train/eval); odd batches (e.g. ``model.init`` with B=1) replicate.
    """
    n_model = mesh.shape[MODEL_AXIS]
    if n_model == 1:
        return base_pass(p, kernels, biases, eps=eps, precision=precision)
    p, kernels, biases = pad_source_axis(p, kernels, biases, n_model)
    n_data = mesh.shape[DATA_AXIS]
    batch_spec = DATA_AXIS if p.shape[0] % n_data == 0 else None

    def local_pass(p_l, k_l, b_l):
        out = base_pass(p_l, k_l, b_l, eps=eps, precision=precision)
        return jax.lax.psum(out, MODEL_AXIS)

    return jax.shard_map(
        local_pass,
        mesh=mesh,
        in_specs=(
            P(batch_spec, None, None, MODEL_AXIS),
            P(None, None, MODEL_AXIS, None),
            P(MODEL_AXIS, None),
        ),
        out_specs=P(batch_spec),
    )(p, kernels, biases)
