"""MRF spatial model module (SURVEY C7; arXiv:1406.2984 §3.2).

Wraps the log-space message-pass op with softplus-parameterized kernels
and biases (positivity by construction — the paper's SoftPlus trick)
and exposes prior-based initialization: the raw kernel parameters are
set to softplus^-1(prior) so the first forward pass reproduces the
empirical pairwise-displacement priors exactly (SURVEY C9 -> C7 edge).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from jointpose.configs import MRFConfig
from jointpose.ops.mrf_xla import mrf_message_pass_xla


def inverse_softplus(y: np.ndarray | jnp.ndarray, floor: float = 1e-8):
    """x such that softplus(x) = y (y > 0); numpy-compatible, fp32-safe.

    Two regimes: log(expm1(y)) is exact for small y (where the naive
    y + log1p(-exp(-y)) cancels catastrophically in fp32), while for
    large y expm1 overflows and x ≈ y to machine precision.
    """
    y = jnp.maximum(jnp.asarray(y, jnp.float32), floor)
    small = jnp.log(jnp.expm1(jnp.minimum(y, 15.0)))
    return jnp.where(y < 15.0, small, y)


def uniform_kernel_init(window: tuple[int, int], num_joints: int) -> jnp.ndarray:
    """Raw-parameter init giving a uniform positive kernel (pre-softplus)."""
    wh, ww = window
    val = inverse_softplus(jnp.asarray(1.0 / (wh * ww)))
    return jnp.full((wh, ww, num_joints, num_joints), val, jnp.float32)


def priors_to_raw_kernels(priors: jnp.ndarray, blend: float = 0.5) -> jnp.ndarray:
    """Convert normalized prior maps (wh, ww, K, K) to raw kernel params.

    The paper initializes the spatial-model kernels from the empirical
    displacement priors blended with a small uniform floor so no
    displacement starts at exactly zero probability (which would have
    zero gradient through softplus^-1).
    """
    wh, ww = priors.shape[0], priors.shape[1]
    uniform = 1.0 / (wh * ww)
    mixed = blend * priors + (1.0 - blend) * uniform
    return inverse_softplus(mixed)


# Below this tap count the direct grouped conv beats the Fourier path's
# fixed transform cost (forward/inverse DFT matmuls of 9 + 81 planes).
_FFT_MIN_TAPS = 512


def select_impl(config: MRFConfig) -> str:
    """Resolve MRFConfig.impl='auto' to a concrete message-pass impl.

    The Fourier path pays off for the stride-1 large-window regime
    (paper presets: 45x67 = 3015 taps, where XLA's dense rewrite of the
    grouped conv costs ~24x the Fourier matmuls); the coarse stride>1
    grids and small test windows stay on the direct conv.

    Direct-conv regime: 'auto' runs the plain XLA epilogue, not the
    Pallas one — measured on the chip at BOTH production geometries,
    XLA fuses the log/Σ into the conv's consumer cheaper than the
    separate Pallas kernel + its pad/slice traffic (flagship coarse
    30x40/(17,25): 1.101 vs 1.403 ms/batch-128; paper 60x80/(45,67):
    32.1 vs 35.1 — results/kernels/{mrf_coarse_times,kernel_times}.json).
    ``use_pallas`` still selects the FUSED Fourier tail in the fft
    regime, where the Pallas kernel wins 9x (1.85 vs 16.8 ms);
    ``impl='pallas'`` keeps the epilogue kernel reachable explicitly.
    """
    if config.impl != "auto":
        assert config.impl in ("xla", "pallas", "fft"), config.impl
        return config.impl
    wh, ww = config.window
    if config.stride == 1 and wh * ww >= _FFT_MIN_TAPS:
        return "fft"
    return "xla"


class SpatialModel(nn.Module):
    """Learned MRF over joint heatmaps.

    Input:  (B, Hm, Wm, K) normalized unary heatmaps p (distributions
            per channel; the PoseModel spatial-softmaxes detector logits).
    Output: (B, Hm, Wm, K) unnormalized log p̄ in fp32.
    """

    config: MRFConfig
    num_joints: int
    dtype: Any = jnp.float32
    # Optional initializer returning raw (pre-softplus) kernels
    # (wh, ww, K, K); defaults to the uniform kernel.
    raw_kernel_init: Callable[..., jnp.ndarray] | None = None
    message_pass: Callable[..., jnp.ndarray] | None = None
    # Device mesh for model-axis TP of the message pass (source-joint
    # sharding + psum, parallel/mrf_tp.py); None or model-size-1 meshes
    # run unsharded.  Params are identical either way.
    mesh: Any = None

    @nn.compact
    def __call__(self, p: jnp.ndarray) -> jnp.ndarray:
        k = self.num_joints
        wh, ww = self.config.window

        def default_kernel_init(key, shape, dtype=jnp.float32):
            del key
            assert tuple(shape) == (wh, ww, k, k), shape
            return uniform_kernel_init((wh, ww), k).astype(dtype)

        kernel_init = self.raw_kernel_init or default_kernel_init
        raw_kernels = self.param("raw_kernels", kernel_init, (wh, ww, k, k))
        raw_bias = self.param(
            "raw_bias",
            lambda key, shape, dtype=jnp.float32: jnp.full(
                shape, inverse_softplus(jnp.asarray(1e-4)), dtype
            ),
            (k, k),
        )
        kernels = jax.nn.softplus(raw_kernels.astype(jnp.float32))
        biases = jax.nn.softplus(raw_bias.astype(jnp.float32))
        # Thread the configured matmul precision into every pass impl
        # (None -> the op's own default, HIGH).  'default' halves or
        # better the fused kernel's device time (measured round 3).
        prec = {"high": None, "default": jax.lax.Precision.DEFAULT}[
            self.config.precision
        ]
        pass_fn = self.message_pass
        if pass_fn is None:
            impl = select_impl(self.config)
            if impl == "fft":
                if self.config.use_pallas:
                    # Forward DFTs (XLA) + single fused Pallas kernel for
                    # pointwise ⊙ + inverse DFT + bias + log + Σ_v.
                    from jointpose.ops.mrf_fft_pallas import (
                        mrf_message_pass_fft_fused,
                    )

                    pass_fn = mrf_message_pass_fft_fused
                else:
                    import functools

                    from jointpose.ops.mrf_fft import mrf_message_pass_fft

                    pass_fn = functools.partial(
                        mrf_message_pass_fft, use_pallas_epilogue=False
                    )
            elif impl == "pallas":
                from jointpose.ops.mrf_pallas import mrf_message_pass_pallas

                pass_fn = mrf_message_pass_pallas
            else:
                pass_fn = mrf_message_pass_xla
        if self.mesh is not None and self.mesh.shape.get("model", 1) > 1:
            import functools

            from jointpose.parallel.mrf_tp import mrf_message_pass_tp

            pass_fn = functools.partial(
                mrf_message_pass_tp, mesh=self.mesh, base_pass=pass_fn
            )
        if self.config.stride > 1:
            from jointpose.ops.mrf_xla import mrf_message_pass_coarse

            return mrf_message_pass_coarse(
                p.astype(self.dtype),
                kernels.astype(self.dtype),
                biases,
                eps=self.config.eps,
                stride=self.config.stride,
                precision=prec,
                message_pass=pass_fn,
            )
        return pass_fn(
            p.astype(self.dtype), kernels.astype(self.dtype), biases,
            eps=self.config.eps, precision=prec,
        )
