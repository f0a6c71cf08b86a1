"""Generic SAME conv2d as Fourier-space matmuls (SURVEY C5 head conv).

The paper's "fully-connected-equivalent" detector head is a 9x9x512
conv over the 60x90 heatmap grid — 57.3 GFLOP/img, ~78% of the whole
paper-preset inference budget once the MRF runs in Fourier space
(round-2 frontier measurement).  The same DFT-as-matmul machinery that
rebuilt the MRF pass (ops/mrf_fft.py) applies to any large-kernel conv:

    X_f = F x            forward 2-D DFT per input channel   (MXU)
    R_f = sum_ci conj(K_f) . X_f   complex matmul over c_in
          at every frequency bin                              (MXU)
    y   = Re{ F^-1 R_f }  inverse DFT per output channel, the
          SAME-crop folded into the operator                  (MXU)

FLOP model (per image, real FLOPs; P* = H + k* - 1 padded extents):

    direct   2 H W kh kw Ci Co
    fourier  Ci (4 Ph H W + 8 Ph W Pw)         forward transforms
           + 8 Ph Pw Ci Co                     pointwise complex matmul
           + Co (8 H Ph Pw + 4 H Pw W)         inverse transforms

For the paper head (60x90, 9x9, 128->512): 57.3 -> 7.0 GFLOP (8.2x).

The catch is HBM traffic: the Fourier path materializes complex
intermediates at every stage and reads a (Ci, Co, Ph, Pw) complex
kernel spectrum per step (3.5 GB fp32 at the paper head — amortized
over the batch).  Two mitigations are built in:

1. **Bin-leading layouts**: every einsum is written so dot_general's
   natural result order IS the next stage's operand order — (g, f)
   frequency bins lead through the pointwise stage, so XLA inserts no
   whole-tensor transposes (first-cut measurement: transposes roughly
   doubled traffic).
2. **Roofline-aware 'auto'**: ``use_fourier`` models FLOPs AND bytes
   for both impls and picks the one with the higher min(MXU, HBM)
   roofline at the actual batch size — a FLOP win is rejected when it
   would turn a compute-bound conv into a worse bandwidth-bound one
   (e.g. the flagship 5x5 head stays direct).

Numerics: each einsum accumulates in fp32 (``preferred_element_type``);
intermediates round to the input's compute dtype (bf16 on TPU — the
same rounding budget as the direct bf16 conv it replaces, verified by
tests/test_fft_conv.py's drift bound).  fp32 inputs stay fp32
throughout, where parity with ``lax.conv`` is ~1e-6 relative.

Convention: cross-correlation (no kernel flip), SAME padding, NHWC/HWIO
— exactly ``flax.linen.Conv``; the FFTConv module below is param-layout
compatible with nn.Conv (same 'kernel'/'bias' names and shapes), so
checkpoints restore interchangeably across impls.
"""

from __future__ import annotations

import functools
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from jointpose.ops.mrf_fft import _dft_consts
from jointpose.perf import ASSUMED_MXU_UTIL, HBM_BYTES_PER_SEC, PEAK_BF16_FLOPS


def fourier_conv_flops(
    hw: tuple[int, int], kernel: tuple[int, int], cin: int, cout: int
) -> tuple[float, float]:
    """(direct, fourier) per-image FLOP counts for one SAME conv2d.

    The Fourier terms use the half column spectrum (G = Pw//2 + 1 bins,
    Hermitian symmetry of real inputs) the implementation computes.
    """
    (h, w), (kh, kw) = hw, kernel
    ph, pw = h + kh - 1, w + kw - 1
    g = pw // 2 + 1
    direct = 2.0 * h * w * kh * kw * cin * cout
    fourier = (
        cin * (4.0 * ph * h * w + 8.0 * ph * w * g)
        + 8.0 * ph * g * cin * cout
        + cout * (8.0 * h * ph * g + 4.0 * h * g * w)
    )
    return direct, fourier


# Measured ratio of cost_analysis bytes to the naive write+read model
# for the Fourier path (paper head, bf16, batch 128): ~2.75.
_XLA_TRAFFIC_OVERHEAD = 2.75


def _conv_bytes(
    hw: tuple[int, int],
    kernel: tuple[int, int],
    cin: int,
    cout: int,
    batch: int,
    itemsize: int,
) -> tuple[float, float]:
    """(direct, fourier) per-image HBM byte models.

    Every intermediate is charged one write + one read; the kernel
    spectrum (the Fourier path's big fixed cost) is charged once per
    step and amortized over the batch.  ``_XLA_TRAFFIC_OVERHEAD``
    calibrates the Fourier terms against measured cost_analysis bytes
    (XLA re-reads fusion parameters for the complex re/im pairs and
    keeps layout copies; measured 157 MB/img for the paper head vs a
    57 MB naive model — see git history for the measurement).
    """
    (h, w), (kh, kw) = hw, kernel
    ph, pw = h + kh - 1, w + kw - 1
    g = pw // 2 + 1
    direct = itemsize * (h * w * cin + h * w * cout) + (
        itemsize * kh * kw * cin * cout / max(batch, 1)
    )
    inter = (
        2 * (ph * w * cin)  # row-DFT output (complex)
        + 2 * (ph * g * cin)  # X_f
        + 2 * (ph * g * cout)  # R_f
        + 2 * (h * g * cout)  # row-inverse output
    )
    fourier = (
        itemsize * (h * w * cin + h * w * cout)
        + _XLA_TRAFFIC_OVERHEAD * 2 * itemsize * inter  # write + read each
        + _XLA_TRAFFIC_OVERHEAD
        * 2 * 2 * itemsize * ph * g * cin * cout / max(batch, 1)  # K_f w+r
    )
    return direct, fourier


def conv_rooflines(
    hw: tuple[int, int],
    kernel: tuple[int, int],
    cin: int,
    cout: int,
    batch: int,
    itemsize: int = 2,
) -> dict[str, float]:
    """Model-derived img/s bounds for both impls of one conv."""
    fl_direct, fl_fourier = fourier_conv_flops(hw, kernel, cin, cout)
    by_direct, by_fourier = _conv_bytes(hw, kernel, cin, cout, batch, itemsize)
    mxu = PEAK_BF16_FLOPS * ASSUMED_MXU_UTIL
    hbm = HBM_BYTES_PER_SEC * 0.8
    return {
        "direct": min(mxu / fl_direct, hbm / by_direct),
        "fourier": min(mxu / fl_fourier, hbm / by_fourier),
    }


def use_fourier(
    hw: tuple[int, int],
    kernel: tuple[int, int],
    cin: int,
    cout: int,
    batch: int = 128,
    margin: float = 1.15,
) -> bool:
    """True when the Fourier path's min(MXU, HBM) roofline beats the
    direct conv's by at least ``margin`` (hysteresis so marginal
    geometries keep the simpler impl)."""
    r = conv_rooflines(hw, kernel, cin, cout, batch)
    return r["fourier"] > margin * r["direct"]


def fft_conv2d(x: jnp.ndarray, kernel: jnp.ndarray, precision=None) -> jnp.ndarray:
    """SAME cross-correlation conv via DFT matmuls.

    Args:
      x: (B, H, W, Ci); bf16 or fp32 — intermediates round to x.dtype
        with fp32 accumulation inside every contraction.
      kernel: (kh, kw, Ci, Co), any float dtype.
    Returns:
      (B, H, W, Co) in the compute dtype (bf16 for bf16 inputs, else
      fp32); every contraction accumulates fp32 internally.

    Layout discipline: each einsum below is chosen so dot_general's
    natural result order (batch dims, lhs free, rhs free) equals the
    next einsum's expected operand order — no whole-tensor transposes
    until the final (x, y, b, o) -> (b, y, x, o) output permute.
    """
    b, h, w, cin = x.shape
    kh, kw, cin2, cout = kernel.shape
    assert cin2 == cin, (x.shape, kernel.shape)
    # The SAME-crop operators assume the odd-kernel centering lax uses;
    # even kernels pad asymmetrically and are not needed here.
    assert kh % 2 == 1 and kw % 2 == 1, (kh, kw)
    # Half column spectrum (rfft): real inputs make column bins beyond
    # Pw//2 redundant; the sliced/weighted operators halve X_f, K_f, R
    # and the pointwise matmul exactly (see _dft_consts docstring).
    consts = _dft_consts((h, w), (kh, kw), real_cols=True)
    dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    t = {k: jnp.asarray(v, dt) for k, v in consts.items()}
    # Intermediate dots output the compute dtype directly: a bf16 dot
    # already accumulates fp32 inside the MXU and rounds once — forcing
    # fp32 dot outputs + separate converts tripled the measured HBM
    # traffic (413 MB/img for this conv alone) for identical numerics.
    em = functools.partial(jnp.einsum, precision=precision)

    # Forward DFT of the input, bin-leading: rows then cols.
    xc = x.astype(dt)  # (b, y, x, i)
    ar = em("fy,byxi->fbxi", t["fr_re"], xc)
    ai = em("fy,byxi->fbxi", t["fr_im"], xc)
    xr = em("gx,fbxi->gfbi", t["fc_re"], ar) - em("gx,fbxi->gfbi", t["fc_im"], ai)
    xi = em("gx,fbxi->gfbi", t["fc_im"], ar) + em("gx,fbxi->gfbi", t["fc_re"], ai)

    # Kernel DFT, same (g, f) bin-leading layout (amortized over batch;
    # constant-folded when the kernel is a literal).
    kc = kernel.astype(dt)  # (y, x, i, o)
    br_ = em("fy,yxio->fxio", t["gr_re"], kc)
    bi_ = em("fy,yxio->fxio", t["gr_im"], kc)
    kr = em("gx,fxio->gfio", t["gc_re"], br_) - em("gx,fxio->gfio", t["gc_im"], bi_)
    ki = em("gx,fxio->gfio", t["gc_im"], br_) + em("gx,fxio->gfio", t["gc_re"], bi_)

    # Cross-correlation product summed over Ci — a complex matmul at
    # every (g, f) bin with bins as dot_general batch dims in BOTH
    # operands (no transposes): R = conj(K_f) . X_f.
    rr = em("gfbi,gfio->gfbo", xr, kr) + em("gfbi,gfio->gfbo", xi, ki)
    ri = em("gfbi,gfio->gfbo", xi, kr) - em("gfbi,gfio->gfbo", xr, ki)

    # Inverse DFT (SAME-crop folded into the operators): rows (complex),
    # then cols keeping only the real part (the conjugate-pair weights
    # live in the sliced ic tables).
    tr = em("yf,gfbo->ygbo", t["ir_re"], rr) - em("yf,gfbo->ygbo", t["ir_im"], ri)
    ti = em("yf,gfbo->ygbo", t["ir_re"], ri) + em("yf,gfbo->ygbo", t["ir_im"], rr)
    out = em("xg,ygbo->xybo", t["ic_re"], tr) - em("xg,ygbo->xybo", t["ic_im"], ti)
    return out.transpose(2, 1, 0, 3)  # (b, y, x, o) in the compute dtype


class FFTConv(nn.Module):
    """Drop-in for ``nn.Conv(features, kernel_size, padding='SAME')``.

    Identical parameter layout ('kernel' (kh, kw, Ci, Co), 'bias' (Co,))
    so checkpoints restore across impls; output dtype follows ``dtype``
    like nn.Conv.
    """

    features: int
    kernel_size: tuple[int, int]
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype
        )
        y = fft_conv2d(x.astype(self.dtype), kernel)
        return (y + bias.astype(y.dtype)).astype(self.dtype)
