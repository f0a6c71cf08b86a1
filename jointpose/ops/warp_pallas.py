"""Gather-free affine image warp: two shear passes of in-VMEM hat matmuls.

The gather-based warp (``jax.scipy.ndimage.map_coordinates``, see
``data/augment.py:_warp_images``) lowers to one-hot contractions that
cost a measured ~0.8 GB/img of HBM traffic — the single largest term
of the training step's 2.15 GB/img (results/train_throughput).  The
reference does this resampling on the host in Python (SURVEY §3.1);
here the TPU-native answer is to make the resample a *matmul problem*:

Any inverse affine ``src = A dst + b`` factors (LU, a11 != 0) into
  1. an x-resample at fixed source row y:   u*(xo; y) = α1 xo + s1 y + o1
       α1 = det(A)/a11,  s1 = a01/a11,  o1 = b0 − a01 b1 / a11
  2. a y-resample at fixed output column:   v*(yo; xo) = a11 yo + a10 xo + b1
so each pass is a 1-D linear resample whose weights form a 2-banded
"hat" matrix  W[s_out, s_in] = max(0, 1 − |s_in − pos(s_out)|).  The
kernel builds W from ``broadcasted_iota`` directly in VMEM (it never
touches HBM) and applies it as one MXU matmul per row — total traffic
is the image in + out (~2 MB/img fp32), a ~300x reduction, for ~0.4
GFLOP/img of matmul work.

Semantics: this is the classic two-pass (Catmull–Smith) resampling of
the same affine — NOT bitwise equal to single-pass bilinear when the
map has shear/rotation (it IS exactly equal for axis-aligned maps:
scale/translate/flip, which the parity tests pin).  Out-of-frame
samples get zero weight, matching ``map_coordinates(mode='constant')``.
a11 = cosθ·scale·zoom stays well away from 0 for the augmentation
ranges this framework draws (|θ| ≤ ~30°); the factorization would
degenerate only toward 90° rotations, which no preset uses.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jointpose.ops.pallas_env import use_interpret as _use_interpret


def _row_block(n: int) -> int:
    """Rows per grid step: few enough unrolled hat-builds to keep the
    Mosaic program small.  Must be a multiple of 8 — it lands as the
    output block's sublane dim and Mosaic requires 8|sublane (callers
    pad ``n`` to 8 first)."""
    return 16 if n % 16 == 0 else 8


def _resample_kernel(src_ref, par_ref, out_ref, *, t: int, s_in: int,
                     s_out: int):
    """One shear pass: for each of the block's T rows, build the hat
    operator for pos = α·iota + s·row + o and apply it as a matmul.

    src_ref: (1, T, S_in, C) — T source rows (pass 1) or columns of the
      intermediate (pass 2).
    par_ref: (B, 3) SMEM, whole array — (α, shear, offset) per image
      (Mosaic requires SMEM blocks to cover the full array; indexing by
      program_id here costs nothing).
    out_ref: (1, S_out, T, C).
    """
    ib = pl.program_id(0)
    alpha = par_ref[ib, 0]
    shear = par_ref[ib, 1]
    off = par_ref[ib, 2]
    r0 = pl.program_id(1) * t
    # (S_out, S_in) index grids; W is built transposed so the apply is
    # a plain (S_out, S_in) @ (S_in, C) dot.  The row-independent part
    # of the sample position (u − α·o) is hoisted out of the row loop:
    # per row the build is one subtract + abs + relu over S_out×S_in.
    # Mosaic's tpu.iota is integer-only; build i32 and cast.
    o2 = lax.broadcasted_iota(jnp.int32, (s_out, s_in), 0).astype(jnp.float32)
    u2 = lax.broadcasted_iota(jnp.int32, (s_out, s_in), 1).astype(jnp.float32)
    base = u2 - alpha * o2
    for r in range(t):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(base - (shear * (r0 + r) + off)))
        # DEFAULT precision: on TPU the MXU runs this as single-pass
        # bf16×bf16→fp32 (6× faster than HIGHEST's 6-pass fp32); hat
        # weights live in [0, 1] so bf16 quantization is ≤2⁻⁹ relative —
        # augmentation-grade resampling, and the coordinate math above
        # stays fp32.  CPU interpret (the parity tests) is exact fp32.
        out_ref[0, :, r, :] = lax.dot_general(
            w, src_ref[0, r],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.DEFAULT,
        )


def _pass_call(src, pars, s_out: int):
    b, n, s_in, c = src.shape
    # Pad the row axis to a multiple of 8 (Mosaic sublane rule for the
    # output block); the junk output rows are sliced off below.  Images
    # here are multiples of 8 in both axes, so this is normally a no-op.
    n_pad = (-n) % 8
    if n_pad:
        src = jnp.pad(src, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
        n += n_pad
    t = _row_block(n)
    out = pl.pallas_call(
        functools.partial(_resample_kernel, t=t, s_in=s_in, s_out=s_out),
        grid=(b, n // t),
        in_specs=[
            pl.BlockSpec((1, t, s_in, c), lambda ib, ir: (ib, ir, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 3), lambda ib, ir: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, s_out, t, c), lambda ib, ir: (ib, 0, ir, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_out, n, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * n * s_in * s_out * c),
            bytes_accessed=int(4 * b * n * c * (s_in + s_out)),
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(src, pars)
    return out[:, :, : n - n_pad] if n_pad else out


def _pass_params(a_inv: jnp.ndarray, b_inv: jnp.ndarray):
    """(B,3) (α, shear, offset) vectors for the two passes (fp32,
    elementwise — coordinate math must not round through bf16 dots)."""
    a00, a01 = a_inv[:, 0, 0], a_inv[:, 0, 1]
    a10, a11 = a_inv[:, 1, 0], a_inv[:, 1, 1]
    b0, b1 = b_inv[:, 0], b_inv[:, 1]
    det = a00 * a11 - a01 * a10
    p1 = jnp.stack([det / a11, a01 / a11, b0 - a01 * b1 / a11], -1)
    p2 = jnp.stack([a11, a10, b1], -1)
    return p1.astype(jnp.float32), p2.astype(jnp.float32)


def shear_warp_rowmajor(images: jnp.ndarray, a_inv: jnp.ndarray,
                        b_inv: jnp.ndarray) -> jnp.ndarray:
    """Warp (B, H, W, C) float images by src = A_inv dst + b_inv.

    Original (rounds 3–4) operand orientation: per-row matmuls
    (S_out, S_in) @ (S_in, C) with C=3 — transpose-free, but only 3 of
    128 MXU output lanes do work.  Kept as the cross-orientation parity
    oracle for :func:`shear_warp` (tests/test_warp_pallas.py) and for
    wide-C callers where the lane argument flips.
    """
    bsz, h, w, c = images.shape
    p1, p2 = _pass_params(a_inv, b_inv)
    # Pass 1 consumes source rows y, emits t1[b, xo, y, c];
    # pass 2 consumes t1's xo-rows, emits out[b, yo, xo, c] — both land
    # in their consumer's natural layout, no transposes anywhere.
    t1 = _pass_call(images.astype(jnp.float32), p1, s_out=w)
    return _pass_call(t1, p2, s_out=h)


def _resample_kernel_csub(src_ref, par_ref, out_ref, *, t: int, s_in: int,
                          s_out: int):
    """Channel-in-sublane variant of one shear pass (round 5).

    The production kernel's per-row matmul is (S_out, S_in) @ (S_in, C)
    with C=3 — 3 of 128 MXU output lanes do work.  Swapping operand
    orientation to (C, S_in) @ (S_in, S_out) puts the full resample
    axis in lanes and only pays C=3 of 8 sublanes: ~16x better MXU
    occupancy for identical math (same hat weights, same fp32
    accumulation).  The price is spatial-transposed operand layouts,
    handled by XLA transposes around the two passes (timed as part of
    the variant in results/kernels/trainpipe_variants.py).

    src_ref: (1, T, C, S_in) — T rows (pass 1) / xo-columns (pass 2).
    out_ref: (1, T, C, S_out).
    """
    ib = pl.program_id(0)
    alpha = par_ref[ib, 0]
    shear = par_ref[ib, 1]
    off = par_ref[ib, 2]
    r0 = pl.program_id(1) * t
    o2 = lax.broadcasted_iota(jnp.int32, (s_in, s_out), 1).astype(jnp.float32)
    u2 = lax.broadcasted_iota(jnp.int32, (s_in, s_out), 0).astype(jnp.float32)
    # W^T[s_in, s_out] = hat(u - pos(o)); the row-constant part hoisted.
    base = u2 - alpha * o2
    for r in range(t):
        w_t = jnp.maximum(0.0, 1.0 - jnp.abs(base - (shear * (r0 + r) + off)))
        out_ref[0, r] = lax.dot_general(
            src_ref[0, r], w_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.DEFAULT,
        )


def _pass_call_csub(src, pars, s_out: int):
    """One C-in-sublane pass over src (B, N, C, S_in) -> (B, N, C, S_out)."""
    b, n, c, s_in = src.shape
    n_pad = (-n) % 8
    if n_pad:
        src = jnp.pad(src, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
        n += n_pad
    t = _row_block(n)
    out = pl.pallas_call(
        functools.partial(_resample_kernel_csub, t=t, s_in=s_in, s_out=s_out),
        grid=(b, n // t),
        in_specs=[
            pl.BlockSpec((1, t, c, s_in), lambda ib, ir: (ib, ir, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 3), lambda ib, ir: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c, s_out), lambda ib, ir: (ib, ir, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c, s_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * n * s_in * s_out * c),
            bytes_accessed=int(4 * b * n * c * (s_in + s_out)),
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(src, pars)
    return out[:, : n - n_pad] if n_pad else out


def shear_warp(images: jnp.ndarray, a_inv: jnp.ndarray,
               b_inv: jnp.ndarray) -> jnp.ndarray:
    """Warp (B, H, W, C) float images by src = A_inv dst + b_inv.

    PRODUCTION orientation (round 5): channel-in-sublane — same
    two-pass math as :func:`shear_warp_rowmajor`, operands transposed
    so the full resample axis lands in MXU lanes ((C, S_in) @
    (S_in, S_out) per row instead of (S_out, S_in) @ (S_in, C=3)).
    Measured at the training shape (B=32, 240x360x3): 1.60 ms vs the
    row-major kernel's 12.67 ms, XLA boundary transposes included
    (results/kernels/trainpipe_variants.json).  Parity vs row-major is
    fp32-noise (atol 2e-6, tests/test_warp_pallas.py) — identical hat
    weights and fp32 accumulation, so the training stream is unchanged.
    Layout chain (XLA transposes between):
      NHWC (B,H,W,C) -> (B,H,C,W) -> pass1 -> (B,H,C,Xo)
        -> (B,Xo,C,H) -> pass2 -> (B,Xo,C,Yo) -> NHWC (B,Yo,Xo,C).
    """
    bsz, h, w, c = images.shape
    p1, p2 = _pass_params(a_inv, b_inv)
    x = jnp.transpose(images.astype(jnp.float32), (0, 1, 3, 2))  # (B,H,C,W)
    t1 = _pass_call_csub(x, p1, s_out=w)        # (B, H, C, Xo)
    t1 = jnp.transpose(t1, (0, 3, 2, 1))        # (B, Xo, C, H)
    t2 = _pass_call_csub(t1, p2, s_out=h)       # (B, Xo, C, Yo)
    return jnp.transpose(t2, (0, 3, 1, 2))      # (B, Yo, Xo, C)


def shear_warp_reference(images, a_inv, b_inv):
    """Plain-jnp mirror of the two-pass math (test oracle; O(N^2)
    dense hats, never used in production)."""
    bsz, h, w, c = images.shape
    p1, p2 = _pass_params(a_inv, b_inv)

    # einsum keeps (rows, s_out, c); pass 2 rows are xo, s_out is yo ->
    # (Xo, Yo, C) — transpose to (Yo, Xo, C).
    def one(img, q1, q2):
        def resample(src, par, s_out):
            n, s_in, _ = src.shape
            rows = jnp.arange(n, dtype=jnp.float32)
            outs = jnp.arange(s_out, dtype=jnp.float32)
            ins = jnp.arange(s_in, dtype=jnp.float32)
            pos = par[0] * outs[None, :] + par[1] * rows[:, None] + par[2]
            wmat = jnp.maximum(0.0, 1.0 - jnp.abs(ins[None, None, :] - pos[..., None]))
            # HIGHEST: on TPU the default einsum precision is bf16,
            # which would put ~7e-3 of rounding in the ORACLE.
            return jnp.einsum(
                "noi,nic->noc", wmat, src, precision=lax.Precision.HIGHEST
            )

        t1 = resample(img, q1, w)  # rows y -> (Y, Xo, C)
        out = resample(t1.transpose(1, 0, 2), q2, h)  # rows xo -> (Xo, Yo, C)
        return out.transpose(1, 0, 2)

    return jax.vmap(one)(images.astype(jnp.float32), p1, p2)
