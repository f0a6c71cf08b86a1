"""Fused Pallas epilogue for the MRF message pass (SURVEY §7 step 8).

The message pass factorizes into (a) the K^2 pairwise convolutions —
which XLA lowers onto the MXU as one dense conv, the right call on TPU
(measured: the dense rewrite trades 9x FLOPs for 9x better systolic
N-utilization) — and (b) the elementwise/reduction epilogue

    out[..., a] = Σ_v log( max(resp[..., v, a] + bias[v, a], eps) )

This module fuses (b) into a single Pallas kernel with a custom VJP so
the (B, H, W, K^2) response tensor is consumed in VMEM tile-by-tile:
one read of resp produces the K-channel output directly, instead of
round-tripping intermediate log/Σ tensors through HBM.  A pure-XLA
fallback (jointpose.ops.mrf_xla) remains the correctness oracle; parity
is enforced by tests/test_mrf_pallas.py in interpreter mode on CPU and
compiled on TPU.

Layout: the kernel flattens (B, H, W) into rows and keeps the K^2 pair
axis as lanes (81 for K=9; Pallas pads to the 128-lane tile).  The v
reduction runs as K unrolled contiguous lane slices — Mosaic cannot
shape-cast the lane axis to (rows, K, K).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jointpose.ops.mrf_xla import pairwise_conv
from jointpose.ops.pallas_env import use_interpret as _use_interpret

_ROWS = 512  # rows (pixels) per grid step; 512*81*4B = 166 KB of VMEM


def _fwd_kernel(resp_ref, bias_ref, out_ref, *, kv: int, ka: int, eps: float):
    x = resp_ref[:].astype(jnp.float32) + bias_ref[:]  # (rows, Kv*Ka) + (1, Kv*Ka)
    y = jnp.log(jnp.maximum(x, eps))
    # Σ over source v via unrolled lane slices: Mosaic cannot shape-cast
    # the lane axis to (rows, Kv, Ka), but contiguous lane slices are fine.
    acc = y[:, 0:ka]
    for v in range(1, kv):
        acc = acc + y[:, v * ka : (v + 1) * ka]
    out_ref[:] = acc


def _bwd_kernel(resp_ref, bias_ref, g_ref, dresp_ref, dbias_ref, *, kv: int, ka: int, eps: float):
    x = resp_ref[:].astype(jnp.float32) + bias_ref[:]  # (rows, Kv*Ka)
    # d log(max(x, eps))/dx = 1/x where x > eps else 0.
    inv = jnp.where(x > eps, 1.0 / jnp.maximum(x, eps), 0.0)
    g = g_ref[:].astype(jnp.float32)  # (rows, Ka)
    gb = jnp.tile(g, (1, kv))  # column v*Ka+a holds g[:, a]
    dresp = gb * inv
    dresp_ref[:] = dresp.astype(dresp_ref.dtype)
    # Bias gradient: accumulate across the (sequential) TPU grid into one
    # (1, K*K) block — per-step partial outputs would need 8-divisible
    # block rows, which (grid, 81) can't satisfy.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dbias_ref[0, :] += jnp.sum(dresp, axis=0)


def _pad_rows(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """Zero-pad the leading (row) axis to a _ROWS multiple.

    Padded rows must be zeros, not garbage: the backward kernel reduces
    over rows for the bias gradient, and zero rows contribute exactly
    zero there (g is padded with zeros too).
    """
    if n_pad == x.shape[0]:
        return x
    return jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))


def _epilogue_fwd_impl(resp2d: jnp.ndarray, biases: jnp.ndarray, eps: float, kv: int, ka: int):
    n = resp2d.shape[0]
    grid = pl.cdiv(n, _ROWS)
    resp2d = _pad_rows(resp2d, grid * _ROWS)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, kv=kv, ka=ka, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, kv * ka), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv * ka), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ka), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * _ROWS, ka), jnp.float32),
        interpret=_use_interpret(),
    )(resp2d, biases.reshape(1, kv * ka).astype(jnp.float32))
    return out[:n]


def _epilogue_bwd_impl(resp2d, biases, g2d, eps: float, kv: int, ka: int):
    n = resp2d.shape[0]
    grid = pl.cdiv(n, _ROWS)
    resp2d = _pad_rows(resp2d, grid * _ROWS)
    g2d = _pad_rows(g2d, grid * _ROWS)
    dresp, dbias_parts = pl.pallas_call(
        functools.partial(_bwd_kernel, kv=kv, ka=ka, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, kv * ka), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv * ka), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, ka), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROWS, kv * ka), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv * ka), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid * _ROWS, kv * ka), resp2d.dtype),
            jax.ShapeDtypeStruct((1, kv * ka), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(resp2d, biases.reshape(1, kv * ka).astype(jnp.float32), g2d)
    return dresp[:n], dbias_parts.reshape(kv, ka)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mrf_epilogue_pallas(resp: jnp.ndarray, biases: jnp.ndarray, eps: float = 1e-6):
    """Fused Σ_v log(resp + bias) over (B, H, W, Kv, Ka) -> (B, H, W, Ka)."""
    b, h, w, kv, ka = resp.shape
    out2d = _epilogue_fwd_impl(resp.reshape(b * h * w, kv * ka), biases, eps, kv, ka)
    return out2d.reshape(b, h, w, ka)


def _vjp_fwd(resp, biases, eps):
    return mrf_epilogue_pallas(resp, biases, eps), (resp, biases)


def _vjp_bwd(eps, residuals, g):
    resp, biases = residuals
    b, h, w, kv, ka = resp.shape
    dresp2d, dbias = _epilogue_bwd_impl(
        resp.reshape(b * h * w, kv * ka),
        biases,
        g.reshape(b * h * w, ka).astype(jnp.float32),
        eps,
        kv,
        ka,
    )
    return dresp2d.reshape(resp.shape), dbias


mrf_epilogue_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def mrf_message_pass_pallas(
    p: jnp.ndarray,
    kernels: jnp.ndarray,
    biases: jnp.ndarray,
    eps: float = 1e-6,
    precision=None,
) -> jnp.ndarray:
    """Full message pass: MXU pairwise conv + fused Pallas epilogue.

    Drop-in replacement for mrf_message_pass_xla (same signature/semantics).
    """
    resp = pairwise_conv(p, kernels, precision=precision)  # (B, H, W, K, K)
    return mrf_epilogue_pallas(resp, biases, eps)
