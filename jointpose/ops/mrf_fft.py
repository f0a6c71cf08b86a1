"""MRF pairwise convolution in Fourier space via DFT matmuls (SURVEY C7).

The stride-1 message pass convolves K unary heatmaps with K^2 large
pairwise kernels (window ~ heatmap extent).  Direct convolution costs
2*H*W*taps*K^2 FLOPs and XLA additionally rewrites the grouped conv to
DENSE (9x that, round-1 finding); the paper's own answer is FFT
convolution (arXiv:1406.2984 §3.2), and the TPU-native form of an FFT
over 60x90 grids is the DFT **as a matmul**: every transform lands on
the MXU as a dense (P, N) x (N, M) product, the pointwise complex
multiply is VPU work, and the inverse transform folds the SAME-padding
crop into its own matmul.  Cost (H=60, W=90, window 45x67, K=9):

    direct grouped   2.6 GFLOP/img
    XLA dense rewrite 23.7 GFLOP/img   <- what the round-1 path paid
    DFT matmuls       ~1.9 GFLOP/img  (forward 9 planes + pointwise +
                                       inverse 81 planes + kernel DFT
                                       amortized over the batch)

Numerics: everything fp32 with ``lax.Precision.HIGH`` (bf16x3 passes —
near-fp32 accuracy at 3x bf16 cost) by default; heatmaps and kernels
are near-distributions (mass ~1) so the transforms are well
conditioned, and the small negative roundoff FFT can produce near zero
is absorbed by the positive bias + eps floor of the log epilogue.

Correlation convention matches :func:`jointpose.ops.mrf_xla.pairwise_conv`
(lax SAME cross-correlation); parity is enforced by tests/test_mrf_fft.py
and on real hardware by bench.py's parity block.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _dft_consts(
    hm: tuple[int, int],
    window: tuple[int, int],
    real_cols: bool = False,
    row_pad_to: int = 1,
) -> dict[str, np.ndarray]:
    """Real/imag DFT operator tables for one (heatmap, window) geometry.

    Linear correlation needs circular transforms of size >= H + wh - 1;
    the forward operators contract over only the nonzero (unpadded)
    rows/cols, and the inverse operators evaluate exactly the SAME-crop
    output positions ((y - wh//2) mod Ph — the mod is free because the
    DFT basis is periodic).  All fp32 host constants, embedded into the
    jitted graph once per geometry.

    ``real_cols=True`` exploits Hermitian symmetry of real inputs along
    the column axis (rfft): the column operators keep only the
    G = Pw//2 + 1 independent bins, and the inverse column operator
    carries the conjugate-pair weights (2 for interior bins, 1 for the
    DC and — when Pw is even — Nyquist bins), so the half-spectrum
    reconstruction is EXACT while every bin-indexed tensor and the
    pointwise product shrink ~2x.  Valid because rows-then-cols
    transforms of real data satisfy X[-f,-g] = conj(X[f,g]), products
    of Hermitian fields stay Hermitian, and after the full row inverse
    T[y, Pw-g] = conj(T[y, g]) holds per output row.

    ``row_pad_to`` rounds the row transform size up to a multiple (a
    larger circular size keeps linear correlation exact); kernels that
    block the row-bin axis need it 8-aligned for TPU sublane tiling.
    """
    (h, w), (wh, ww) = hm, window
    ph, pw = h + wh - 1, w + ww - 1
    ph = -(-ph // row_pad_to) * row_pad_to
    ch, cw = (wh - 1) // 2, (ww - 1) // 2
    ncols = pw // 2 + 1 if real_cols else pw

    def fwd(p: int, n: int) -> tuple[np.ndarray, np.ndarray]:
        # (p, n): X_f = F @ x for length-n data zero-padded to p.
        f = np.arange(p)[:, None] * np.arange(n)[None, :]
        ang = -2.0 * np.pi * f / p
        return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    def inv(n_out: int, p: int, shift: int) -> tuple[np.ndarray, np.ndarray]:
        # (n_out, p): x[y] = (1/p) Σ_f exp(+2πi f (y - shift)/p) X_f[f].
        f = (np.arange(n_out)[:, None] - shift) * np.arange(p)[None, :]
        ang = 2.0 * np.pi * f / p
        return (
            (np.cos(ang) / p).astype(np.float32),
            (np.sin(ang) / p).astype(np.float32),
        )

    fr = fwd(ph, h)
    fc = fwd(pw, w)
    gr = fwd(ph, wh)
    gc = fwd(pw, ww)
    ir = inv(h, ph, ch)
    ic = inv(w, pw, cw)
    if real_cols:
        # Keep the G independent column bins; weight the inverse by the
        # conjugate-pair multiplicity so the half sum equals the full
        # sum's real part exactly.
        alpha = np.full((ncols,), 2.0, np.float32)
        alpha[0] = 1.0
        if pw % 2 == 0:
            alpha[-1] = 1.0
        fc = (fc[0][:ncols], fc[1][:ncols])
        gc = (gc[0][:ncols], gc[1][:ncols])
        ic = (ic[0][:, :ncols] * alpha, ic[1][:, :ncols] * alpha)
    return {
        "fr_re": fr[0], "fr_im": fr[1],
        "fc_re": fc[0], "fc_im": fc[1],
        "gr_re": gr[0], "gr_im": gr[1],
        "gc_re": gc[0], "gc_im": gc[1],
        "ir_re": ir[0], "ir_im": ir[1],
        "ic_re": ic[0], "ic_im": ic[1],
    }


def _transform2d(x, row_re, row_im, col_re, col_im, precision):
    """Complex 2-D DFT of REAL planes x (..., n_rows, n_cols).

    Rows first (real data -> 2 matmuls), then columns (complex data ->
    4 matmuls); returns (re, im) with shape (..., P_rows, P_cols).
    """
    em = functools.partial(jnp.einsum, precision=precision)
    a_re = em("fy,...yx->...fx", row_re, x)
    a_im = em("fy,...yx->...fx", row_im, x)
    re = em("...fx,gx->...fg", a_re, col_re) - em("...fx,gx->...fg", a_im, col_im)
    im = em("...fx,gx->...fg", a_re, col_im) + em("...fx,gx->...fg", a_im, col_re)
    return re, im


def forward_ffts(p: jnp.ndarray, kernels: jnp.ndarray, precision):
    """Forward DFTs of unaries and kernels (the shared front half).

    Returns ((pf_re, pf_im) (B, K, Ph, Pw), (kf_re, kf_im)
    (Kv, Ka, Ph, Pw), tables dict of jnp operators).
    """
    b, h, w, k = p.shape
    wh, ww, kv, ka = kernels.shape
    # Kv == Ka in the unsharded model; under model-axis TP each shard
    # carries a source-joint slice (Kv < Ka).
    assert kv == k, (kernels.shape, p.shape)
    # Half column spectrum (Hermitian symmetry of the real unaries and
    # kernels): the sliced forward operators and pair-weighted inverse
    # operators halve every bin-indexed tensor and the pointwise
    # product, exactly — see _dft_consts.
    c = _dft_consts((h, w), (wh, ww), real_cols=True)
    tables = {n: jnp.asarray(v) for n, v in c.items()}

    # Forward DFT of the unaries: (B, K, Ph, Pw) complex.
    planes = p.astype(jnp.float32).transpose(0, 3, 1, 2)  # (B, K, H, W)
    pf = _transform2d(
        planes, tables["fr_re"], tables["fr_im"], tables["fc_re"], tables["fc_im"],
        precision,
    )

    # Forward DFT of the kernels: (Kv, Ka, Ph, Pw) complex — shared
    # across the batch (and constant-foldable when kernels are literals).
    kplanes = kernels.astype(jnp.float32).transpose(2, 3, 0, 1)  # (Kv, Ka, wh, ww)
    kf = _transform2d(
        kplanes, tables["gr_re"], tables["gr_im"], tables["gc_re"], tables["gc_im"],
        precision,
    )
    return pf, kf, tables


def fft_pairwise_conv(
    p: jnp.ndarray, kernels: jnp.ndarray, precision=None
) -> jnp.ndarray:
    """All K^2 SAME pairwise correlations via Fourier-space matmuls.

    Drop-in for :func:`jointpose.ops.mrf_xla.pairwise_conv`:

    Args:
      p: (B, H, W, K) unary heatmaps.
      kernels: (wh, ww, K, K) positive kernels ([..., v, a]).
      precision: matmul precision; None -> ``lax.Precision.HIGH``
        (bf16x3, near-fp32 — the module's numerics contract).
    Returns:
      (B, H, W, K, K) fp32 responses, axis -2 = v (source), -1 = a.
    """
    precision = lax.Precision.HIGH if precision is None else precision
    (pf_re, pf_im), (kf_re, kf_im), tables = forward_ffts(p, kernels, precision)

    # Cross-correlation theorem: R = conj(K_f) ⊙ P_f, broadcast P_f[v]
    # against K_f[v, a] -> (B, Kv, Ka, Ph, Pw).
    r_re = kf_re[None] * pf_re[:, :, None] + kf_im[None] * pf_im[:, :, None]
    r_im = kf_re[None] * pf_im[:, :, None] - kf_im[None] * pf_re[:, :, None]

    # Inverse DFT with the SAME-crop folded into the operators; only the
    # real part of the final column stage is computed (2 matmuls).
    em = functools.partial(jnp.einsum, precision=precision)
    t_re = em("yf,...fg->...yg", tables["ir_re"], r_re) - em(
        "yf,...fg->...yg", tables["ir_im"], r_im
    )
    t_im = em("yf,...fg->...yg", tables["ir_re"], r_im) + em(
        "yf,...fg->...yg", tables["ir_im"], r_re
    )
    resp = em("...yg,xg->...yx", t_re, tables["ic_re"]) - em(
        "...yg,xg->...yx", t_im, tables["ic_im"]
    )
    return resp.transpose(0, 3, 4, 1, 2)  # (B, H, W, Kv, Ka)


def mrf_message_pass_fft(
    p: jnp.ndarray,
    kernels: jnp.ndarray,
    biases: jnp.ndarray,
    eps: float = 1e-6,
    precision=None,
    use_pallas_epilogue: bool = True,
) -> jnp.ndarray:
    """Log-space message pass with the Fourier-space pairwise conv.

    Same signature/semantics as
    :func:`jointpose.ops.mrf_xla.mrf_message_pass_xla`; the bias+log+Σ_v
    epilogue reuses the fused Pallas kernel (custom VJP) so the
    (B, H, W, K^2) response tensor is consumed tile-by-tile in VMEM.
    """
    resp = fft_pairwise_conv(p, kernels, precision=precision)
    if use_pallas_epilogue:
        from jointpose.ops.mrf_pallas import mrf_epilogue_pallas

        return mrf_epilogue_pallas(resp, biases, eps)
    resp = resp + biases.astype(jnp.float32)
    return jnp.sum(jnp.log(jnp.maximum(resp, eps)), axis=-2)
