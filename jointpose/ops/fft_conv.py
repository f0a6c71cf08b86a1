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
intermediates at every stage, and the full kernel spectrum K_f is
(G, Ph, Ci, Co) complex — 891 MB/step bf16 at the paper head,
recomputed every step because the kernel is a parameter.  Three
mitigations are built in:

1. **Bin-leading layouts**: every einsum is written so dot_general's
   natural result order IS the next stage's operand order — (g, f)
   frequency bins lead through the pointwise stage, so XLA inserts no
   whole-tensor transposes (first-cut measurement: transposes roughly
   doubled traffic).
2. **kdft fused tail** (the production path): the Pallas tail receives
   only the column-DFT half ``a`` (G, Kh, Ci, Co — Kh/Ph ≈ 7.5×
   smaller) and finishes the row DFT to its K_f block IN KERNEL (a
   K=Kh matmul, ~0.2 GFLOP/img at the paper head), so neither K_f nor
   the response spectrum R ever reaches HBM.  Measured: paper head
   126 → 78 MB/img.
3. **Roofline-aware 'auto'**: ``use_fourier`` models FLOPs AND bytes
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
import hashlib
import json
import os
from typing import Any

import jax
import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jointpose.ops.mrf_fft import _dft_consts
from jointpose.ops.pallas_env import use_interpret as _use_interpret
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
    # The byte model must describe the tail that will ACTUALLY run for
    # this geometry: the kdft fused tail keeps both the R spectrum and
    # the full kernel spectrum K_f in VMEM, while the XLA-tail fallback
    # pays both in HBM — an order-of-magnitude traffic difference at
    # the paper head (78 vs ~290 MB/img), which would flip 'auto'
    # decisions the wrong way if modeled unconditionally.
    ph8 = -(-ph // 8) * 8  # fused tails pad the row transform to 8
    fused = _tail_tiles(ph8, h, batch, cin, cout, itemsize, kdft_kh=kh)
    inter = (
        2 * (ph * w * cin)  # row-DFT output (complex)
        + 2 * (ph * g * cin)  # X_f
        + 2 * (h * g * cout)  # tail output
    )
    if fused is not None:
        # kdft fused tail: only the Kh-deep half-transformed kernel `a`
        # round-trips per step.  Validated vs the measured paper head:
        # model 73 MB/img vs cost_analysis 78.2.
        kbytes = 2 * 2 * itemsize * g * kh * cin * cout
    else:
        # XLA tail: the full K_f spectrum round-trips, and the R
        # spectrum is materialized too.
        inter += 2 * (ph * g * cout)  # R_f
        kbytes = 2 * 2 * itemsize * g * ph * cin * cout
    fourier = (
        itemsize * (h * w * cin + h * w * cout)
        + _XLA_TRAFFIC_OVERHEAD * 2 * itemsize * inter  # write + read each
        + _XLA_TRAFFIC_OVERHEAD * kbytes / max(batch, 1)
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


def _tail_tiles(
    ph: int, h: int, b: int, ci: int, co: int, itemsize: int, kdft_kh: int = 0
) -> tuple[int, int, int] | None:
    """(TB, CoT, FB) block sizes for the fused tail, or None if nothing
    fits the VMEM budget (then the XLA tail runs instead).

    Mosaic constrains only the LAST TWO block dims (divisible by 8/128
    or equal to the array dim), so TB and CoT come from the constrained
    candidate sets while the f (row-bin) axis is freely blocked and
    accumulated across grid steps.  Preference order: full-MXU TB/CoT
    first (pointwise matmul M/N utilization), then the largest FB.
    """
    tb_cands = [v for v in (128, 64, 32, 16, 8) if b % v == 0] or [b]
    # CoT stays at 128 lanes: larger tiles multiply the fp32 partial-sum
    # temporaries (h * TB * CoT * 8 bytes live during the row inverse) —
    # a (32, 512, 8) tiling measured 17.1 MB scoped VMEM and failed to
    # compile where (TB, 128, 8) shapes fit.
    cot_cands = [128] if co % 128 == 0 else [co]
    # The f-axis appears as the second-to-last dim of the (transposed)
    # row-table block, so it must be 8-aligned (or the full Ph).
    fb_cands = sorted(
        (v for v in range(1, ph + 1) if ph % v == 0 and (v % 8 == 0 or v == ph)),
        reverse=True,
    )
    # Empirically anchored against Mosaic's scoped-VMEM accounting (16 MB
    # limit): the (128, 128, 8) paper-head tiling models at 18.3 MB here
    # yet compiles (the scheduler overlaps buffer lifetimes the model
    # charges separately), while the failing (32, 512, 8) models at 20.4.
    budget = 19 * 2**20
    for tb in tb_cands:
        for cot in cot_cands:
            for fb in fb_cands:
                # Kernel-operand blocks: the full K_f row block for the
                # plain tail, or the Kh-deep half-transformed `a` block
                # (+ a tiny (fb, kh) table slice, whose re+im pair is
                # covered by the outer x2) for the kdft variant.
                kblk = (kdft_kh or fb) * ci * cot + fb * (kdft_kh or 0)
                blocks = itemsize * 2 * (  # re+im array pairs
                    fb * tb * ci + kblk + h * tb * cot
                ) + itemsize * 2 * h * fb  # inverse-row table slices
                # fp32 temporaries: R re/im after the pointwise matmul,
                # the fp32 scratch accumulators for the cross-f-step
                # partial row-inverse sums (the += fuses into the dot's
                # accumulation, so scratch replaces — not adds to — the
                # former pre-cast temporaries), plus the in-kernel K_f
                # rows for the kdft variant.
                temps = 4 * 2 * fb * tb * cot + 4 * 2 * h * tb * cot
                if kdft_kh:
                    temps += 4 * 2 * fb * ci * cot
                vmem = 2 * blocks + temps  # 2x: double buffering
                if vmem <= budget:
                    return tb, cot, fb
    return None


def _tail_body(xr, xi, kr, ki, irr_ref, iri_ref, acc_r, acc_i, precision):
    """Shared back half of both tail kernels: pointwise complex matmul
    over Ci (batched over the FB row bins) + partial complex inverse row
    DFT accumulated into the fp32 scratch accumulator — the R spectrum
    lives only in VMEM temporaries.  Accumulating across the ph//fb
    f-steps in fp32 scratch (not the bf16 output block) avoids repeated
    bf16 rounding of partial sums when VMEM pressure forces FB < Ph
    (round-2 advisor finding); the single cast to the output dtype
    happens at the last f step in the caller kernel."""
    dn = (((2,), (1,)), ((0,), (0,)))  # contract Ci, batch over FB
    bdot = functools.partial(
        lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=precision,
    )
    rre = bdot(xr, kr) + bdot(xi, ki)  # (FB, TB, CoT) fp32
    rim = bdot(xi, kr) - bdot(xr, ki)
    fb, tb, cot = rre.shape
    # Row tables arrive TRANSPOSED, (FB, H) — the f axis must sit in the
    # sublane (second-to-last) position for TPU tiling — so the partial
    # inverse contracts dim 0 of both operands: out[y, n] = Σ_f T[f, y] R[f, n].
    irr, iri = irr_ref[:], iri_ref[:]  # (FB, H)
    h = irr.shape[1]
    mm = functools.partial(
        lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    r2 = rre.reshape(fb, tb * cot).astype(xr.dtype)
    i2 = rim.reshape(fb, tb * cot).astype(xr.dtype)
    tre = mm(irr, r2) - mm(iri, i2)  # (H, TB*CoT) fp32 partial sum
    tim = mm(irr, i2) + mm(iri, r2)
    acc_r[:] += tre.reshape(h, tb, cot)
    acc_i[:] += tim.reshape(h, tb, cot)


def _tail_kernel(
    xr_ref, xi_ref, kr_ref, ki_ref, irr_ref, iri_ref, t_ref,
    acc_r, acc_i, *, precision, nf
):
    """Tail step with the kernel spectrum K_f read from HBM blocks."""
    f = pl.program_id(3)

    @pl.when(f == 0)
    def _():
        acc_r[:] = jnp.zeros_like(acc_r)
        acc_i[:] = jnp.zeros_like(acc_i)

    _tail_body(
        xr_ref[0], xi_ref[0], kr_ref[0], ki_ref[0],
        irr_ref, iri_ref, acc_r, acc_i, precision,
    )

    @pl.when(f == nf - 1)
    def _():
        t_ref[:, 0, 0] = acc_r[:].astype(t_ref.dtype)
        t_ref[:, 1, 0] = acc_i[:].astype(t_ref.dtype)


def _tail_kdft_kernel(
    xr_ref, xi_ref, ar_ref, ai_ref, grr_ref, gri_ref, irr_ref, iri_ref,
    t_ref, acc_r, acc_i, *, precision, nf
):
    """Tail step that builds its K_f block IN KERNEL from the half-
    transformed kernel ``a`` (column DFT only, (1, KH, Ci, CoT) block).

    The full kernel spectrum K_f is (G, Ph, Ci, Co) complex — 891 MB per
    step for the paper head — and the plain tail pays its HBM write +
    read every step (the kernel is a parameter, so XLA cannot constant-
    fold it).  ``a`` is Kh/Ph times smaller; the row DFT to K_f is a
    K=Kh matmul against the (FB, KH) table block, a negligible ~0.2
    GFLOP/img for the paper head.
    """
    f = pl.program_id(3)

    @pl.when(f == 0)
    def _():
        acc_r[:] = jnp.zeros_like(acc_r)
        acc_i[:] = jnp.zeros_like(acc_i)

    ar = ar_ref[0]  # (KH, Ci, CoT)
    ai = ai_ref[0]
    grr = grr_ref[:]  # (FB, KH)
    gri = gri_ref[:]
    kh, ci, cot = ar.shape
    fb = grr.shape[0]
    a_r2 = ar.reshape(kh, ci * cot)
    a_i2 = ai.reshape(kh, ci * cot)
    mmk = functools.partial(
        lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    # Complex row DFT: K_f = Σ_y gr[f, y] · a[y] (a already complex).
    kr = (mmk(grr, a_r2) - mmk(gri, a_i2)).reshape(fb, ci, cot).astype(ar.dtype)
    ki = (mmk(grr, a_i2) + mmk(gri, a_r2)).reshape(fb, ci, cot).astype(ar.dtype)
    _tail_body(
        xr_ref[0], xi_ref[0], kr, ki, irr_ref, iri_ref, acc_r, acc_i, precision
    )

    @pl.when(f == nf - 1)
    def _():
        t_ref[:, 0, 0] = acc_r[:].astype(t_ref.dtype)
        t_ref[:, 1, 0] = acc_i[:].astype(t_ref.dtype)


def _tail_call(xr, xi, kr, ki, irr_t, iri_t, *, h: int, tb: int, cot: int,
               fb: int, prec):
    """The pallas_call itself, tiling fixed — see _pallas_tail."""
    g, ph, b, ci = xr.shape
    co = kr.shape[-1]
    # f innermost so the output block stays resident while its partial
    # row-inverse sums accumulate.
    grid = (b // tb, g, co // cot, ph // fb)

    def x_spec():
        return pl.BlockSpec(
            (1, fb, tb, ci), lambda ib, gg, o, f: (gg, f, ib, 0),
            memory_space=pltpu.VMEM,
        )

    def k_spec():
        return pl.BlockSpec(
            (1, fb, ci, cot), lambda ib, gg, o, f: (gg, f, 0, o),
            memory_space=pltpu.VMEM,
        )

    def c_spec():
        # (FB, H) block of the transposed row table: H (full) in lanes,
        # the 8-aligned FB slice in sublanes.
        return pl.BlockSpec(
            (fb, h), lambda ib, gg, o, f: (f, 0), memory_space=pltpu.VMEM
        )

    def t_spec():
        # Single (h, 2, g, b, co) output: re at [:, 0], im at [:, 1] —
        # reshaped by the caller to (h, 2g, b, co) so the inverse column
        # DFT is ONE einsum against the concatenated [ic_re; -ic_im]
        # table (the separate-array epilogue cost a measured 2.2 ms
        # layout copy + an extra 1.8 GB dot at the paper head).
        return pl.BlockSpec(
            (h, 2, 1, tb, cot), lambda ib, gg, o, f: (0, 0, gg, ib, o),
            memory_space=pltpu.VMEM,
        )

    flops = int(
        b * g * (8 * ph * ci * co)  # pointwise complex matmul
        + b * g * (8 * h * ph * co)  # complex inverse row DFT
    )
    return pl.pallas_call(
        functools.partial(_tail_kernel, precision=prec, nf=ph // fb),
        grid=grid,
        in_specs=[x_spec(), x_spec(), k_spec(), k_spec(), c_spec(), c_spec()],
        out_specs=[t_spec()],
        out_shape=[jax.ShapeDtypeStruct((h, 2, g, b, co), xr.dtype)],
        scratch_shapes=[pltpu.VMEM((h, tb, cot), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                2 * xr.size * xr.dtype.itemsize * (co // cot)
                + 2 * kr.size * kr.dtype.itemsize * (b // tb)
                + 2 * h * g * b * co * xr.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(xr, xi, kr, ki, irr_t, iri_t)[0]


# Row-bin chunk for the in-kernel K_f build: divides every Ph the
# fused tail sees (row_pad_to=8) and bounds the build's fp32 slabs to
# 3 * 4*8*Ci*CoT bytes (~1.5 MiB at the paper head).
_KF_BUILD_CHUNK = 8


def _tail_tiles_resident(
    ph: int, h: int, b: int, ci: int, co: int, itemsize: int, kh: int
) -> list[tuple[int, int]]:
    """VMEM-feasible (TB, CoT) candidates for the resident-K_f tail,
    fewest grid steps first (empty when none fit).

    The f-blocked tail's inverse row DFT contracts only FB row bins per
    grid step — FB=8 at the paper head, i.e. a K=8 matmul that leaves
    ~94% of the MXU's 128-deep contraction idle and was measured as the
    dominant term of the 10.7 ms tail (results/frontier, round 3).
    This variant keeps the WHOLE row-bin axis in one step (K=Ph
    contraction, no cross-step accumulator) and makes the batch axis
    the innermost grid dim, with the (Ph, Ci, CoT) K_f block built once
    per (g, co-tile) into VMEM scratch and reused across batch blocks.
    """
    # Preference = fewest grid steps, then largest batch tile: the
    # round-4b sweep (results/kernels/tail_sweep.json) measured time
    # tracking step count within this kernel family (TB=32: 800 steps,
    # 5.85 ms; TB=16: 1600, 6.80; TB=8: 3200, 9.41 at the paper head),
    # and larger TB also lifts the pointwise matmul's M-utilization.
    # Larger CoT still halves the x-spectrum re-read (944 -> 472 MB at
    # the paper head) — it enters through the step count.
    cots = [v for v in (256, 128) if co % v == 0] or [co]
    out = []
    for cot in cots:
        for tb in [v for v in (128, 64, 32, 16, 8) if b % v == 0] or [b]:
            blocks = itemsize * 2 * (
                ph * tb * ci + kh * ci * cot + h * tb * cot
            ) + itemsize * 2 * (ph * kh + ph * h)  # resident DFT tables
            scratch = itemsize * 2 * ph * ci * cot  # resident K_f (re+im)
            # fp32 temporaries on the main path: R after the pointwise
            # matmul (+ its bf16 recast) and T before the output cast.
            temps = (
                (8 + 2 * itemsize) * ph * tb * cot + 8 * h * tb * cot
                # K_f chunk build: two fp32 mmk outputs + the combined
                # result per (chunk, Ci*CoT) slab (see the kernel).
                + 3 * 4 * _KF_BUILD_CHUNK * ci * cot
            )
            # Budget re-anchored to Mosaic probe outcomes (round-4b
            # sweep, results/kernels/tail_sweep.json): at the paper
            # head (TB=32, CoT=128) models 17.3 MiB here yet COMPILES
            # and measures 5.85 ms vs TB=16's 6.80 (fewer, bigger grid
            # steps — step overhead dominates at this size), while
            # (TB=64, CoT=128) models 27.1 MiB and fails.  The model's
            # double-buffer term overcharges blocks Mosaic schedules
            # with overlapping lifetimes, so the cut sits between the
            # measured compile/fail points; _tail_compile_ok probes
            # (disk-cached) remain the final guard per geometry.
            if 2 * blocks + scratch + temps <= 18 * 2**20:
                out.append((tb, cot))
    out.sort(key=lambda tc: ((co // tc[1]) * (b // tc[0]), -tc[0]))
    return out


def _tail_kdft_resident_kernel(
    xr_ref, xi_ref, ar_ref, ai_ref, grr_ref, gri_ref, irr_ref, iri_ref,
    t_ref, kfr, kfi, *, precision
):
    """Resident-K_f tail step: full-Ph pointwise + inverse row DFT in
    one shot (K=Ph contraction), K_f built into VMEM scratch at the
    first batch block of each (g, co-tile) and reused for the rest."""
    ib = pl.program_id(2)

    @pl.when(ib == 0)
    def _():
        ar = ar_ref[0]  # (KH, Ci, CoT)
        ai = ai_ref[0]
        kh, ci, cot = ar.shape
        a_r2 = ar.reshape(kh, ci * cot)
        a_i2 = ai.reshape(kh, ci * cot)
        mmk = functools.partial(
            lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        ph = grr_ref.shape[0]
        # Chunked over row bins: a full-Ph build holds several fp32
        # (Ph, Ci*CoT) slabs at once — 4.7 MB each at the paper head —
        # which overflowed the 16 MiB scoped-vmem stack (probe, round
        # 3).  Per-chunk slabs are CHUNK/Ph of that and the loop is
        # unrolled at trace time (ph is static, a multiple of 8 by
        # row_pad_to).
        step = _KF_BUILD_CHUNK
        for p0 in range(0, ph, step):
            grr = grr_ref[p0:p0 + step]  # (step, KH)
            gri = gri_ref[p0:p0 + step]
            kfr[p0:p0 + step] = (mmk(grr, a_r2) - mmk(gri, a_i2)).reshape(
                step, ci, cot
            ).astype(kfr.dtype)
            kfi[p0:p0 + step] = (mmk(grr, a_i2) + mmk(gri, a_r2)).reshape(
                step, ci, cot
            ).astype(kfi.dtype)

    xr = xr_ref[0]  # (Ph, TB, Ci)
    xi = xi_ref[0]
    kr = kfr[:]
    ki = kfi[:]
    dn = (((2,), (1,)), ((0,), (0,)))  # contract Ci, batch over Ph
    bdot = functools.partial(
        lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=precision,
    )
    rre = bdot(xr, kr) + bdot(xi, ki)  # (Ph, TB, CoT) fp32
    rim = bdot(xi, kr) - bdot(xr, ki)
    ph, tb, cot = rre.shape
    irr, iri = irr_ref[:], iri_ref[:]  # (Ph, H)
    h = irr.shape[1]
    mm = functools.partial(
        lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    r2 = rre.reshape(ph, tb * cot).astype(xr.dtype)
    i2 = rim.reshape(ph, tb * cot).astype(xr.dtype)
    tre = mm(irr, r2) - mm(iri, i2)  # (H, TB*CoT) fp32
    tim = mm(irr, i2) + mm(iri, r2)
    t_ref[:, 0, 0] = tre.reshape(h, tb, cot).astype(t_ref.dtype)
    t_ref[:, 1, 0] = tim.reshape(h, tb, cot).astype(t_ref.dtype)


def _tail_call_kdft_resident(xr, xi, ar, ai, grr, gri, irr_t, iri_t, *,
                             h: int, tb: int, cot: int, prec):
    """pallas_call for the resident-K_f tail — grid (G, Co/CoT, B/TB),
    batch innermost so the K_f scratch survives across batch blocks."""
    g, ph, b, ci = xr.shape
    kh, co = ar.shape[1], ar.shape[-1]
    grid = (g, co // cot, b // tb)

    flops = int(
        b * g * (8 * ph * ci * co)  # pointwise complex matmul
        + b * g * (8 * h * ph * co)  # complex inverse row DFT
        + g * (co // cot) * (8 * ph * kh * ci * cot)  # K_f once per (g, o)
    )
    return pl.pallas_call(
        functools.partial(_tail_kdft_resident_kernel, precision=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ph, tb, ci), lambda gg, o, ib: (gg, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ph, tb, ci), lambda gg, o, ib: (gg, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, ci, cot), lambda gg, o, ib: (gg, 0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, ci, cot), lambda gg, o, ib: (gg, 0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, kh), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, kh), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, h), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, h), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # Concatenated re/im output — see _tail_call.t_spec.
            pl.BlockSpec((h, 2, 1, tb, cot), lambda gg, o, ib: (0, 0, gg, ib, o),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((h, 2, g, b, co), xr.dtype)],
        scratch_shapes=[pltpu.VMEM((ph, ci, cot), xr.dtype)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                2 * xr.size * xr.dtype.itemsize * (co // cot)
                + 2 * ar.size * ar.dtype.itemsize
                + 2 * h * g * b * co * xr.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(xr, xi, ar, ai, grr, gri, irr_t, iri_t)[0]


def _tail_call_kdft(xr, xi, ar, ai, grr, gri, irr_t, iri_t, *, h: int,
                    tb: int, cot: int, fb: int, prec):
    """The kdft pallas_call: K_f built in kernel — see _tail_kdft_kernel."""
    g, ph, b, ci = xr.shape
    kh, co = ar.shape[1], ar.shape[-1]
    grid = (b // tb, g, co // cot, ph // fb)

    def x_spec():
        return pl.BlockSpec(
            (1, fb, tb, ci), lambda ib, gg, o, f: (gg, f, ib, 0),
            memory_space=pltpu.VMEM,
        )

    def a_spec():
        return pl.BlockSpec(
            (1, kh, ci, cot), lambda ib, gg, o, f: (gg, 0, 0, o),
            memory_space=pltpu.VMEM,
        )

    def g_spec():
        # (FB, KH) block of the kernel row-DFT table: KH (9, full dim)
        # in lanes, the 8-aligned FB slice in sublanes.
        return pl.BlockSpec(
            (fb, kh), lambda ib, gg, o, f: (f, 0), memory_space=pltpu.VMEM
        )

    def c_spec():
        return pl.BlockSpec(
            (fb, h), lambda ib, gg, o, f: (f, 0), memory_space=pltpu.VMEM
        )

    def t_spec():
        # Concatenated re/im output — see _tail_call.t_spec.
        return pl.BlockSpec(
            (h, 2, 1, tb, cot), lambda ib, gg, o, f: (0, 0, gg, ib, o),
            memory_space=pltpu.VMEM,
        )

    flops = int(
        b * g * (8 * ph * ci * co)  # pointwise complex matmul
        + b * g * (8 * h * ph * co)  # complex inverse row DFT
        + (b // tb) * g * ph * (8 * kh * ci * co)  # in-kernel K_f rows
    )
    return pl.pallas_call(
        functools.partial(_tail_kdft_kernel, precision=prec, nf=ph // fb),
        grid=grid,
        in_specs=[x_spec(), x_spec(), a_spec(), a_spec(), g_spec(), g_spec(),
                  c_spec(), c_spec()],
        out_specs=[t_spec()],
        out_shape=[jax.ShapeDtypeStruct((h, 2, g, b, co), xr.dtype)],
        scratch_shapes=[pltpu.VMEM((h, tb, cot), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                2 * xr.size * xr.dtype.itemsize * (co // cot)
                + 2 * ar.size * ar.dtype.itemsize * (b // tb)
                + 2 * h * g * b * co * xr.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(xr, xi, ar, ai, grr, gri, irr_t, iri_t)[0]


def _probe_cache_path() -> str:
    return os.path.join(
        os.environ.get("JOINTPOSE_CACHE_DIR", os.path.expanduser("~/.cache/jointpose")),
        "tail_probe_cache.json",
    )


@functools.lru_cache(maxsize=1)
def _probe_cache_load() -> dict:
    try:
        with open(_probe_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _probe_cache_store(key: str, ok: bool) -> None:
    # Best-effort: losing a write (or the whole file) only costs the
    # next process one re-probe.
    try:
        path = _probe_cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # Mutate the memoized load snapshot in place so successive
        # stores within one process accumulate instead of each
        # rewriting the file from the stale first-load snapshot
        # (which dropped every key stored earlier in the process).
        cache = _probe_cache_load()
        cache[key] = ok
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f)
        os.replace(tmp, path)
    except Exception:
        pass


@functools.lru_cache(maxsize=1)
def _source_fingerprint() -> str:
    # Probe verdicts are only reusable while the kernels that were
    # probed are byte-identical; any edit to this module invalidates.
    with open(__file__, "rb") as f:
        return hashlib.sha1(f.read()).hexdigest()[:16]


@functools.lru_cache(maxsize=None)
def _tail_compile_ok(
    g: int, ph: int, b: int, ci: int, co: int, h: int, dtype_name: str,
    tb: int, cot: int, fb: int, prec, kdft_kh: int = 0,
    resident: bool = False,
) -> bool:
    """One-time AOT probe that the fused tail actually compiles.

    ``_tail_tiles`` models Mosaic's scoped-VMEM accounting against an
    empirically anchored budget; near the 16 MB boundary the model can
    accept a tiling the real compiler rejects, and a Mosaic compile
    error inside the user's jit would crash training/serving with no
    way to catch it there.  Probing the bare pallas_call once per
    geometry turns that crash into a clean XLA-tail fallback.  Verdicts
    are memoized in-process AND on disk (keyed by geometry + a hash of
    this file): on the remote-compile rig each probe costs 10-30 s, so
    bench/serve/train re-probing identical geometries every process was
    the dominant startup cost (round 3).
    """
    if _use_interpret():
        return True
    key = "|".join(map(str, (
        _source_fingerprint(), jax.default_backend(), g, ph, b, ci, co, h,
        dtype_name, tb, cot, fb, prec, kdft_kh, resident,
    )))
    cached = _probe_cache_load().get(key)
    if cached is not None:
        return cached
    dt = jnp.dtype(dtype_name)
    x_sh = jax.ShapeDtypeStruct((g, ph, b, ci), dt)
    tab = jax.ShapeDtypeStruct((ph, h), dt)
    if kdft_kh:
        shapes = [
            x_sh, x_sh,
            jax.ShapeDtypeStruct((g, kdft_kh, ci, co), dt),
            jax.ShapeDtypeStruct((g, kdft_kh, ci, co), dt),
            jax.ShapeDtypeStruct((ph, kdft_kh), dt),
            jax.ShapeDtypeStruct((ph, kdft_kh), dt),
            tab, tab,
        ]
        if resident:
            fn = functools.partial(
                _tail_call_kdft_resident, h=h, tb=tb, cot=cot, prec=prec
            )
        else:
            fn = functools.partial(
                _tail_call_kdft, h=h, tb=tb, cot=cot, fb=fb, prec=prec
            )
    else:
        shapes = [
            x_sh, x_sh,
            jax.ShapeDtypeStruct((g, ph, ci, co), dt),
            jax.ShapeDtypeStruct((g, ph, ci, co), dt),
            tab, tab,
        ]
        fn = functools.partial(_tail_call, h=h, tb=tb, cot=cot, fb=fb, prec=prec)
    try:
        jax.jit(fn).lower(*shapes).compile()
        ok = True
    except Exception:
        ok = False
    _probe_cache_store(key, ok)
    return ok


def _pallas_tail(xr, xi, kr, ki, t, h: int, precision):
    """Fused pointwise + inverse-row pass: (G,Ph,B,Ci) spectra ->
    (H,G,B,Co) row-inverted responses, R never materialized in HBM.
    Returns None (caller falls back to the XLA tail) when no tiling
    fits VMEM or the probe compile fails."""
    g, ph, b, ci = xr.shape
    co = kr.shape[-1]
    tiles = _tail_tiles(ph, h, b, ci, co, xr.dtype.itemsize)
    if tiles is None:
        return None
    tb, cot, fb = tiles
    prec = _round_prec(precision)
    if not _tail_compile_ok(g, ph, b, ci, co, h, str(xr.dtype), tb, cot, fb, prec):
        return None
    return _tail_call(
        xr, xi, kr, ki, t["ir_re"].T, t["ir_im"].T,
        h=h, tb=tb, cot=cot, fb=fb, prec=prec,
    )


def _round_prec(precision):
    # Mosaic's dot knows DEFAULT and HIGHEST; round bf16x3 (HIGH) up.
    if precision in (lax.Precision.HIGH, lax.Precision.HIGHEST):
        return lax.Precision.HIGHEST
    return lax.Precision.DEFAULT


def _pallas_tail_kdft(xr, xi, a_re, a_im, t, h: int, precision):
    """Preferred fused tail: like _pallas_tail, but the kernel spectrum
    K_f is built in kernel from the column-DFT-only ``a`` — the full
    (G, Ph, Ci, Co) complex spectrum (891 MB/step for the paper head)
    never touches HBM.  Returns None to fall back (plain tail or XLA)."""
    g, ph, b, ci = xr.shape
    kh, co = a_re.shape[1], a_re.shape[-1]
    prec = _round_prec(precision)
    # Round-4 NEGATIVE RESULT (results/kernels/tail_staged_experiment
    # .json): a "staged" variant — f-blocked pointwise at full (TB=64,
    # CoT=128) MXU tiles parking R in VMEM scratch, then ONE K=Ph row
    # inverse — measured 9.7 ms (FB=8) / 7.6 ms (FB=24) on the paper
    # head vs the resident tail's 6.7, despite fixing both earlier
    # kernels' MXU-utilization flaws on paper.  Per-grid-step overhead
    # dominates at this problem size (~2.7 µs/step × 3600 steps), and
    # every larger-tile shape that would amortize it (TB=128, or
    # FB=Ph with the X block resident) either crashes the Mosaic
    # compile helper or exceeds the 16 MiB scoped-VMEM budget.  The
    # resident variant below remains the measured best.
    # Resident-K_f variant first: full-Ph inverse contraction (the
    # f-blocked kernel's K=FB=8 inverse matmul ran the MXU at ~6% and
    # dominated the measured tail time — round 3, results/frontier).
    for tb, cot in _tail_tiles_resident(
        ph, h, b, ci, co, xr.dtype.itemsize, kh
    ):
        if _tail_compile_ok(
            g, ph, b, ci, co, h, str(xr.dtype), tb, cot, ph, prec,
            kdft_kh=kh, resident=True,
        ):
            return _tail_call_kdft_resident(
                xr, xi, a_re, a_im, t["gr_re"], t["gr_im"],
                t["ir_re"].T, t["ir_im"].T, h=h, tb=tb, cot=cot, prec=prec,
            )
    tiles = _tail_tiles(ph, h, b, ci, co, xr.dtype.itemsize, kdft_kh=kh)
    if tiles is None:
        return None
    tb, cot, fb = tiles
    if not _tail_compile_ok(
        g, ph, b, ci, co, h, str(xr.dtype), tb, cot, fb, prec, kdft_kh=kh
    ):
        return None
    return _tail_call_kdft(
        xr, xi, a_re, a_im, t["gr_re"], t["gr_im"], t["ir_re"].T, t["ir_im"].T,
        h=h, tb=tb, cot=cot, fb=fb, prec=prec,
    )


def _fft_conv2d_impl(
    x: jnp.ndarray, kernel: jnp.ndarray, precision, pallas_tail: bool
) -> jnp.ndarray:
    """Shared body; see fft_conv2d for the contract.

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
    # The fused tail blocks the row-bin axis, which needs 8-aligned
    # slices — pad the row transform size up (still exact).
    consts = _dft_consts(
        (h, w), (kh, kw), real_cols=True, row_pad_to=8 if pallas_tail else 1
    )
    dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    t = {k: jnp.asarray(v, dt) for k, v in consts.items()}
    # Intermediate dots output the compute dtype directly: a bf16 dot
    # already accumulates fp32 inside the MXU and rounds once — forcing
    # fp32 dot outputs + separate converts tripled the measured HBM
    # traffic (413 MB/img for this conv alone) for identical numerics.
    em = functools.partial(jnp.einsum, precision=precision)

    # Forward DFT of the input, bin-leading: rows then cols.
    xc = x.astype(dt)  # (b, y, x, i)
    # (Stacking the fr tables into one dot was tried round 3 and LOST
    # ~1 ms: XLA materializes the re/im slices of the stacked result as
    # an 849 MB copy fusion.  Two dots re-reading the input is cheaper.)
    ar = em("fy,byxi->fbxi", t["fr_re"], xc)
    ai = em("fy,byxi->fbxi", t["fr_im"], xc)
    xr = em("gx,fbxi->gfbi", t["fc_re"], ar) - em("gx,fbxi->gfbi", t["fc_im"], ai)
    xi = em("gx,fbxi->gfbi", t["fc_im"], ar) + em("gx,fbxi->gfbi", t["fc_re"], ai)

    # Kernel transforms.  Column DFT only first: ``a`` is (g, kh, i, o)
    # complex — Kh/Ph times smaller than the full spectrum K_f.  The
    # preferred fused tail finishes the row DFT IN KERNEL, so K_f (891
    # MB/step at the paper head; recomputed every step because the
    # kernel is a parameter) never reaches HBM.
    kc = kernel.astype(dt)  # (y, x, i, o)
    a_re = em("gx,yxio->gyio", t["gc_re"], kc)
    a_im = em("gx,yxio->gyio", t["gc_im"], kc)

    tail = _pallas_tail_kdft(xr, xi, a_re, a_im, t, h, precision) if pallas_tail else None
    kr = ki = None
    if tail is None:
        # Fallbacks need the full spectrum: finish the row DFT in XLA
        # (same math, different summation order than round-2's
        # row-then-column — fp-tolerance identical).
        kr = em("fy,gyio->gfio", t["gr_re"], a_re) - em("fy,gyio->gfio", t["gr_im"], a_im)
        ki = em("fy,gyio->gfio", t["gr_re"], a_im) + em("fy,gyio->gfio", t["gr_im"], a_re)
        if pallas_tail:
            tail = _pallas_tail(xr, xi, kr, ki, t, h, precision)
    if tail is None:
        # Cross-correlation product summed over Ci — a complex matmul at
        # every (g, f) bin with bins as dot_general batch dims in BOTH
        # operands (no transposes): R = conj(K_f) . X_f.
        rr = em("gfbi,gfio->gfbo", xr, kr) + em("gfbi,gfio->gfbo", xi, ki)
        ri = em("gfbi,gfio->gfbo", xi, kr) - em("gfbi,gfio->gfbo", xr, ki)
        # Inverse row DFT (complex; SAME-crop folded into the operator).
        tr = em("yf,gfbo->ygbo", t["ir_re"], rr) - em("yf,gfbo->ygbo", t["ir_im"], ri)
        ti = em("yf,gfbo->ygbo", t["ir_re"], ri) + em("yf,gfbo->ygbo", t["ir_im"], rr)
        tcat = jnp.concatenate([tr, ti], axis=1)  # (y, 2g, b, o)
    else:
        # Fused tails emit (y, 2, g, b, o) with re at [:, 0] / im at
        # [:, 1]; the reshape to (y, 2g, b, o) is layout-free.
        tcat = tail.reshape(tail.shape[0], -1, *tail.shape[3:])
    # Inverse column DFT keeping only the real part (the conjugate-pair
    # weights live in the sliced ic tables).  Re(T)·ic_re − Im(T)·ic_im
    # as ONE dot against the concatenated [ic_re; −ic_im] table: the
    # two-einsum + subtract form cost a measured 2.2 ms layout copy and
    # an extra pass over T at the paper head (round-3 trace).
    wcat = jnp.concatenate([t["ic_re"], -t["ic_im"]], axis=1)  # (x, 2g)
    out = em("xG,yGbo->xybo", wcat, tcat)
    return out.transpose(2, 1, 0, 3)  # (b, y, x, o) in the compute dtype


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fft_conv2d_fused(x, kernel, precision):
    return _fft_conv2d_impl(x, kernel, precision, pallas_tail=True)


def _fused_fwd(x, kernel, precision):
    return _fft_conv2d_fused(x, kernel, precision), (x, kernel)


def _fused_bwd(precision, residuals, g):
    # The fused tail is mathematically identical to the XLA tail;
    # differentiate that (recompute-in-backward, residuals stay tiny).
    x, kernel = residuals
    _, vjp = jax.vjp(
        lambda x_, k_: _fft_conv2d_impl(x_, k_, precision, pallas_tail=False),
        x, kernel,
    )
    return vjp(g)


_fft_conv2d_fused.defvjp(_fused_fwd, _fused_bwd)


def fft_conv2d(
    x: jnp.ndarray, kernel: jnp.ndarray, precision=None, pallas_tail: bool = True
) -> jnp.ndarray:
    """SAME cross-correlation conv via DFT matmuls.

    Args:
      x: (B, H, W, Ci); bf16 or fp32 — intermediates round to x.dtype
        with fp32 accumulation inside every contraction.
      kernel: (kh, kw, Ci, Co), any float dtype.
      pallas_tail: fuse the pointwise product + inverse row DFT in one
        Pallas kernel so the R spectrum never reaches HBM (the largest
        single traffic term); falls back to the pure-XLA tail when the
        tiling doesn't fit VMEM.  Gradients recompute through the XLA
        tail (custom VJP).
    Returns:
      (B, H, W, Co) in the compute dtype (bf16 for bf16 inputs, else
      fp32); every contraction accumulates fp32 internally.
    """
    if pallas_tail:
        ph = -(-(x.shape[1] + kernel.shape[0] - 1) // 8) * 8  # row-padded
        itemsize = 2 if x.dtype == jnp.bfloat16 else 4
        if (
            _tail_tiles(
                ph, x.shape[1], x.shape[0], x.shape[-1], kernel.shape[-1], itemsize
            )
            is not None
        ):
            return _fft_conv2d_fused(x, kernel, precision)
    return _fft_conv2d_impl(x, kernel, precision, pallas_tail=False)


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
