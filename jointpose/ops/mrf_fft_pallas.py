"""Fused Pallas kernel: Fourier-space MRF inverse transform + epilogue.

The pure-XLA Fourier path (ops/mrf_fft.py) cut the message-pass FLOPs
~15x but materializes the complex Fourier responses R = conj(K_f)⊙P_f
for all K^2 joint pairs — ~135 MB/img of HBM traffic at the paper
geometry, which becomes the new bottleneck.  This kernel fuses the
whole back half of the pass in VMEM:

    for each (batch-tile, source joint v):              <- Pallas grid
      for each target joint a:                          <- unrolled
        R       = conj(K_f[v,a]) ⊙ P_f[:,v]             (VPU)
        U       = R @ Ic         (inverse column DFT,   MXU)
        o       = Re{ Ir @ U }   (inverse row DFT+crop, MXU)
        out[:,a] += log(max(o + bias[v,a], eps))        (VPU)

so only the forward transforms' outputs (P_f: ~1.2 MB/img, K_f:
amortized over the batch tile) ever cross HBM, and the (B,H,W,K^2)
response tensor never exists.  This is the north-star "single fused
Pallas kernel for the MRF message pass" (BASELINE.json:4): conv
(Fourier matmuls) + bias + log + Σ_v in one kernel.

Gradients: the backward pass recomputes the mathematically identical
pure-XLA tail under ``jax.vjp`` (residuals are just the inputs — cheap;
training throughput is not the north-star metric, inference is).
Parity vs the XLA oracle is enforced in interpret mode on CPU
(tests/test_mrf_fft.py) and compiled on the real chip (bench.py).
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jointpose.ops.mrf_fft import forward_ffts, mrf_message_pass_fft
from jointpose.ops.pallas_env import use_interpret as _use_interpret


def _batch_tile(b: int) -> int:
    for tb in (8, 4, 2):
        if b % tb == 0:
            return tb
    return 1


def _fused_kernel(
    pf_re_ref, pf_im_ref, kf_re_ref, kf_im_ref,
    ir_re_ref, ir_im_ref, ic_re_ref, ic_im_ref,
    bias_ref, out_ref, *, ka: int, eps: float, precision,
):
    v = pl.program_id(1)  # source joint of this grid step

    @pl.when(v == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pfr = pf_re_ref[:, 0]  # (TB, Ph, Pw)
    pfi = pf_im_ref[:, 0]
    icr, ici = ic_re_ref[:], ic_im_ref[:]  # (Pw, W)
    irr, iri = ir_re_ref[:], ir_im_ref[:]  # (H, Ph)
    tb, ph, pw = pfr.shape
    h = irr.shape[0]
    irr_b = jnp.broadcast_to(irr, (tb, *irr.shape))
    iri_b = jnp.broadcast_to(iri, (tb, *iri.shape))
    dn = (((2,), (1,)), ((0,), (0,)))  # batch over TB, contract Ph
    # Mosaic's dot defaults to single-pass bf16; the log epilogue
    # amplifies absolute conv error where responses are small, so the
    # in-kernel matmuls must run at the pass's requested precision.
    mm = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=precision
    )
    bmm = functools.partial(
        lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=precision,
    )

    for a in range(ka):
        kfr = kf_re_ref[0, a]  # (Ph, Pw)
        kfi = kf_im_ref[0, a]
        # Pointwise cross-correlation product R = conj(K_f) ⊙ P_f.
        rre = (kfr * pfr + kfi * pfi).reshape(tb * ph, pw)
        rim = (kfr * pfi - kfi * pfr).reshape(tb * ph, pw)
        # Inverse column DFT (complex @ complex) as two big matmuls per
        # part — (TB*Ph, Pw) @ (Pw, W) keeps the MXU M-axis full.
        ure = (mm(rre, icr) - mm(rim, ici)).reshape(tb, ph, -1)
        uim = (mm(rre, ici) + mm(rim, icr)).reshape(tb, ph, -1)
        # Inverse row DFT keeping only the real part (the output is
        # real by symmetry; the imaginary part is pure roundoff).
        o = bmm(irr_b, ure) - bmm(iri_b, uim)
        out_ref[:, a] += jnp.log(jnp.maximum(o + bias_ref[v, a], eps))


def _fused_inverse_epilogue(pf, kf, tables, biases, hw, eps, precision):
    """Pallas call wrapper: ((B,K,Ph,Pw) ffts, ...) -> (B, Ka, H, W)."""
    pf_re, pf_im = pf
    kf_re, kf_im = kf
    b, kv, ph, pw = pf_re.shape
    ka = kf_re.shape[1]
    h, w = hw
    tb = _batch_tile(b)
    grid = (b // tb, kv)  # v innermost: out[b-tile] accumulates in VMEM
    # Mosaic's dot lowering knows only DEFAULT and HIGHEST; round the
    # pass's HIGH (bf16x3) request up to exact fp32 inside the kernel.
    if precision in (lax.Precision.HIGH, lax.Precision.HIGHEST):
        precision = lax.Precision.HIGHEST
    else:
        precision = lax.Precision.DEFAULT

    def pf_spec():
        return pl.BlockSpec(
            (tb, 1, ph, pw), lambda i, v: (i, v, 0, 0), memory_space=pltpu.VMEM
        )

    def kf_spec():
        return pl.BlockSpec(
            (1, ka, ph, pw), lambda i, v: (v, 0, 0, 0), memory_space=pltpu.VMEM
        )

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, v: (0, 0), memory_space=pltpu.VMEM)

    flops_per_pair = 4 * 2 * ph * pw * w + 2 * 2 * h * ph * w
    out = pl.pallas_call(
        functools.partial(_fused_kernel, ka=ka, eps=eps, precision=precision),
        grid=grid,
        in_specs=[
            pf_spec(), pf_spec(), kf_spec(), kf_spec(),
            const_spec((h, ph)), const_spec((h, ph)),
            const_spec((pw, w)), const_spec((pw, w)),
            # Full (Kv, Ka) bias table in SMEM, indexed [v, a] in-kernel
            # ((1, Ka) VMEM blocks of a (9, 9) array are not tileable).
            pl.BlockSpec(
                (kv, ka), lambda i, v: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tb, ka, h, w), lambda i, v: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, ka, h, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * kv * ka * flops_per_pair + b * kv * ka * ph * pw * 6,
            bytes_accessed=(
                2 * pf_re.size * 4 + 2 * kf_re.size * 4 * (b // tb)
                + b * ka * h * w * 4
            ),
            transcendentals=b * kv * ka * h * w,
        ),
        interpret=_use_interpret(),
    )(
        pf_re, pf_im, kf_re, kf_im,
        tables["ir_re"], tables["ir_im"],
        # The column tables are stored (W, Pw) for the einsum path; the
        # kernel right-multiplies, so hand it (Pw, W).
        tables["ic_re"].T, tables["ic_im"].T,
        biases.astype(jnp.float32),
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mrf_message_pass_fft_fused(
    p: jnp.ndarray,
    kernels: jnp.ndarray,
    biases: jnp.ndarray,
    eps: float = 1e-6,
    precision=None,
) -> jnp.ndarray:
    """Full log-space message pass: XLA forward DFTs + fused Pallas tail.

    Drop-in for :func:`jointpose.ops.mrf_xla.mrf_message_pass_xla`
    (same signature/semantics, (B, H, W, K) fp32 out).
    """
    precision = lax.Precision.HIGH if precision is None else precision
    b, h, w, k = p.shape
    pf, kf, tables = forward_ffts(p, kernels, precision)
    out = _fused_inverse_epilogue(pf, kf, tables, biases, (h, w), eps, precision)
    return out.transpose(0, 2, 3, 1)  # (B, H, W, Ka)


def _vjp_fwd(p, kernels, biases, eps, precision):
    return mrf_message_pass_fft_fused(p, kernels, biases, eps, precision), (
        p, kernels, biases,
    )


def _vjp_bwd(eps, precision, residuals, g):
    # The fused kernel is mathematically identical to the pure-XLA tail;
    # differentiate that (recompute-in-backward — residuals stay tiny).
    p, kernels, biases = residuals
    _, vjp = jax.vjp(
        lambda p_, k_, b_: mrf_message_pass_fft(
            p_, k_, b_, eps=eps, precision=precision, use_pallas_epilogue=False
        ),
        p, kernels, biases,
    )
    return vjp(g)


mrf_message_pass_fft_fused.defvjp(_vjp_fwd, _vjp_bwd)
