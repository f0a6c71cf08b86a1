"""MRF log-space message pass — XLA reference implementation (SURVEY C7).

One sum-product-style message pass over the star graph, computed as
convolution (arXiv:1406.2984 §3.2, eq. "SpatialModel"):

    log p̄_A = Σ_{v ∈ joints} log( k_{A|v} ⊛ p_v + b_{v→A} )

where k_{A|v} is the (positive) learned pairwise-displacement kernel of
joint A given joint v, p_v the (normalized) unary heatmap of v, and
b_{v→A} a small positive bias that keeps the product from being zeroed
by a single missing part.  Positivity of kernels/biases is handled by
the caller (the SpatialModel module softplus-parameterizes them).

TPU mapping: all K^2 pairwise convolutions run as ONE grouped
convolution (``feature_group_count=K``) so XLA tiles the whole pass
onto the MXU in a single op; the log/Σ epilogue is elementwise fp32
(bf16-safe — SURVEY §7 hard-parts #2).  Convention: the kernel tap at
center offset (dy, dx) weights evidence for "A sits at (dy, dx)
relative to v" — i.e. lax correlation semantics with the kernel indexed
by -(displacement); ``jointpose.priors`` builds its histograms in this
same convention (tested against each other).
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _grouped_conv(p, kern, groups, precision, out_dtype):
    return lax.conv_general_dilated(
        p,
        kern,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=out_dtype,
    )


# jax 0.9's conv transpose rule rejects the widened cotangent when
# preferred_element_type differs from the operand dtype (fp32 cotangent
# vs bf16 operands -> "requires arguments to have the same dtypes"), so
# the fused fp32-out conv gets a custom VJP.  The backward is also
# hand-written (round-4b): XLA dense-rewrites the FORWARD grouped conv
# onto the MXU (34 TFLOP/s traced on the flagship's coarse pass) but
# lowers autodiff's GROUPED transpose convs without that rewrite —
# 0.42 TFLOP/s, 92 ms of the 498 ms flagship train dispatch
# (results/train_throughput/train_ops_flagship.json).  The fix:
# differentiate through the ZERO-EMBEDDED DENSE-EQUIVALENT conv — the
# exact form XLA's forward rewrite builds — so both cotangent convs go
# through XLA's efficient dense conv transposes:
#
#   K_dense[dy, dx, v, v'·Ka + a] = k[dy, dx, v, a] · δ(v, v')
#   conv_dense(p, K_dense) == conv_grouped(p, k)   (zeros add exactly)
#   dL/dp    = vjp_dense's lhs cotangent            (exact)
#   dL/dk    = diag_v blocks of vjp_dense's K_dense cotangent
#
# The Kv× FLOP overcharge of the dense form is the same one the
# forward already pays for its MXU win.  Two earlier hand-written
# variants measured WORSE and were replaced by this one: a grouped
# dL/dp conv (XLA does not dense-rewrite the in-per-group=Ka form;
# 0.56 TFLOP/s) and a conv_general_dilated_patches + dense-dot dL/dk
# (the patches op itself dense-rewrote into a 9,351 GFLOP conv at 28%
# MXU plus 26 GB of fp32 patch traffic — 166 ms/dispatch, measured
# 2026-08-19).
def _dense_embed(kern, groups):
    wh, ww, _, vo = kern.shape
    ka = vo // groups
    k4 = kern.reshape(wh, ww, groups, ka)
    eye = jnp.eye(groups, dtype=kern.dtype)
    # (wh, ww, v, v', a): k4[..., v, a] on the v == v' diagonal.
    kd = k4[:, :, :, None, :] * eye[None, None, :, :, None]
    return kd.reshape(wh, ww, groups, vo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grouped_conv_f32(p, kern, groups, precision):
    return _grouped_conv(p, kern, groups, precision, jnp.float32)


def _grouped_conv_f32_fwd(p, kern, groups, precision):
    return _grouped_conv_f32(p, kern, groups, precision), (p, kern)


def _dp_s2d(g, kern, groups, precision, p_dtype):
    """dL/dp as a width space-to-depth-x8 dense conv.

    The straightforward dense transpose conv for dL/dp has only
    Kv output channels — 9 of the MXU's 128 lanes at the flagship
    geometry, measured 2.94 ms vs the forward's 0.58 ms for identical
    FLOPs (results/kernels/mrf_bwd_variants.json; it was the single
    largest op of the round-5 train dispatch, 29x its floor in
    train_ceiling.json).  Packing S=8 width-shifted outputs into the
    lane dimension gives S*Kv lanes at an ~S*ceil((ww-1)/S+1)/ww tap
    overcharge (1.28x at ww=25): measured 0.48 ms — 6.1x faster.

    Math: with x = S*Xo + ro and dx = S*q + r - ro,

        dp[b, y, x, v] = sum_{dy,dx,c} kd_t[dy, dx, c, v]
                                       * g_pad[b, y+dy, x+dx, c]
      = conv_VALID(g2, k2)[b, y, Xo, ro*Kv + v]

    where g2 packs width into lanes ([X, r*Cin + c]) and
    k2[dy, q, r*Cin + c, ro*Kv + v] = kd_t[dy, S*q + r - ro, c, v]
    (zero outside [0, ww)).  Exact for odd windows (SAME padding is
    symmetric); callers fall back to the dense vjp otherwise.
    """
    wh, ww, _, vo = kern.shape
    kv = groups
    b, h, w, cin = g.shape
    s = 8
    ph, pw = wh // 2, ww // 2
    kd = _dense_embed(kern, groups)  # (wh, ww, kv, kv*ka)
    kd_t = jnp.flip(kd, axis=(0, 1)).transpose(0, 1, 3, 2)  # (wh,ww,cin,kv)
    nq = (ww - 1 + s - 1) // s + 1
    q = jnp.arange(nq)[:, None, None]
    r = jnp.arange(s)[None, :, None]
    ro = jnp.arange(s)[None, None, :]
    dx = s * q + r - ro  # (nq, s, s)
    valid = (dx >= 0) & (dx < ww)
    kd_g = kd_t[:, jnp.clip(dx, 0, ww - 1)]  # (wh, nq, s, s, cin, kv)
    kd_g = jnp.where(valid[None, ..., None, None], kd_g, 0)
    k2 = kd_g.transpose(0, 1, 2, 4, 3, 5).reshape(wh, nq, s * cin, s * kv)
    wblocks = -(-w // s)
    wpad = s * (wblocks + nq - 1)
    gp = jnp.pad(g, ((0, 0), (ph, ph), (pw, wpad - w - pw), (0, 0)))
    g2 = gp.reshape(b, h + wh - 1, wpad // s, s * cin)
    out = lax.conv_general_dilated(
        g2.astype(p_dtype), k2.astype(p_dtype), (1, 1), "VALID",
        dimension_numbers=_DIMNUMS, precision=precision,
        preferred_element_type=jnp.float32,
    )  # (b, h, wblocks, s*kv)
    dp = out.reshape(b, h, wblocks * s, kv)[:, :, :w]
    return dp.astype(p_dtype)


def _grouped_conv_f32_bwd(groups, precision, res, g):
    p, kern = res
    wh, ww, _, vo = kern.shape
    ka = vo // groups

    def dense_k(kd_):
        out = lax.conv_general_dilated(
            p, kd_, window_strides=(1, 1), padding="SAME",
            dimension_numbers=_DIMNUMS, precision=precision,
        )
        return out.astype(jnp.float32)

    # dL/dk: XLA's dense weight-grad transpose runs at the forward's
    # MXU rate (0.43 ms/step at flagship geometry); keep only the
    # v == v' diagonal of the dense-kernel cotangent (the off-diagonal
    # entries are gradients w.r.t. the structural zeros).
    _, vjp_k = jax.vjp(dense_k, _dense_embed(kern, groups))
    (dkd,) = vjp_k(g)
    d5 = dkd.reshape(wh, ww, groups, groups, ka)
    # jnp.diagonal appends the diagonal axis last: (wh, ww, Ka, Kv).
    dk = jnp.diagonal(d5, axis1=2, axis2=3).transpose(0, 1, 3, 2)

    # dL/dp: the s2d-packed conv where it applies (odd windows, few
    # source joints — the lane-starved case); dense transpose otherwise.
    if wh % 2 == 1 and ww % 2 == 1 and groups <= 32:
        dp = _dp_s2d(g, kern, groups, precision, p.dtype)
    else:
        kd = _dense_embed(kern, groups)
        kd_t = jnp.flip(kd, axis=(0, 1)).transpose(0, 1, 3, 2)
        dp = lax.conv_general_dilated(
            g.astype(p.dtype), kd_t.astype(p.dtype), (1, 1), "SAME",
            dimension_numbers=_DIMNUMS, precision=precision,
            preferred_element_type=jnp.float32,
        ).astype(p.dtype)
    return dp, dk.reshape(wh, ww, 1, vo).astype(kern.dtype)


_grouped_conv_f32.defvjp(_grouped_conv_f32_fwd, _grouped_conv_f32_bwd)


def pairwise_conv(
    p: jnp.ndarray, kernels: jnp.ndarray, precision=None, out_dtype=None
) -> jnp.ndarray:
    """All Kv*Ka pairwise convolutions as one grouped conv.

    Args:
      p: (B, H, W, Kv) unary heatmaps.
      kernels: (wh, ww, Kv, Ka) positive kernels; kernels[:, :, v, a] is
        k_{a|v} (input joint v -> target joint a).  Kv == Ka == K in the
        unsharded model; under model-axis TP each shard holds a slice of
        the source-joint axis (Kv = K/shards).
      precision: lax.Precision for the conv; None = backend default
        (bf16-class on TPU — right for the model), HIGHEST for tests.
    Returns:
      (B, H, W, Kv, Ka) responses, axis -2 = v (source), axis -1 = a.
    """
    wh, ww, kv, ka = kernels.shape
    assert p.shape[-1] == kv, (p.shape, kernels.shape)
    # Grouped conv: out channel v*Ka + a uses input channel v and kernel
    # slice [..., 0, v*Ka + a]; reshaping (wh, ww, v, a) row-major gives
    # exactly that layout.
    kern = kernels.reshape(wh, ww, 1, kv * ka).astype(p.dtype)
    # out_dtype=fp32 lets the MXU's fp32 accumulator flow straight into
    # the log epilogue — the separate convert_element_type op cost a
    # measured 0.185 ms/batch-128 in the flagship graph.  The widening
    # path goes through _grouped_conv_f32 (custom VJP) so bf16 training
    # differentiates correctly under jax 0.9's conv transpose rule.
    if out_dtype == jnp.float32 and p.dtype != jnp.float32:
        resp = _grouped_conv_f32(p, kern, kv, precision)
    else:
        resp = _grouped_conv(p, kern, kv, precision, out_dtype)
    b, h, w, _ = resp.shape
    return resp.reshape(b, h, w, kv, ka)


def mrf_message_pass_xla(
    p: jnp.ndarray,
    kernels: jnp.ndarray,
    biases: jnp.ndarray,
    eps: float = 1e-6,
    precision=None,
) -> jnp.ndarray:
    """Log-space message pass; returns unnormalized log p̄ (B, H, W, K).

    Args:
      p: (B, H, W, K) unary heatmaps (nonnegative; normalized per channel
        by the caller).
      kernels: (wh, ww, K, K) positive pairwise kernels ([..., v, a]).
      biases: (K, K) positive biases (biases[v, a] = b_{v→a}).
      eps: log floor, keeps bf16/fp32 gradients finite where priors
        vanish (SURVEY §7 hard-parts #2).
    """
    resp = pairwise_conv(
        p, kernels, precision=precision, out_dtype=jnp.float32
    )  # (B, H, W, K, K) fp32 straight from the conv accumulator
    resp = resp + biases.astype(jnp.float32)
    logs = jnp.log(jnp.maximum(resp, eps))
    return jnp.sum(logs, axis=-2)  # sum over source joints v -> (B,H,W,K)


def mrf_message_pass_coarse(
    p: jnp.ndarray,
    kernels: jnp.ndarray,
    biases: jnp.ndarray,
    eps: float = 1e-6,
    stride: int = 2,
    precision=None,
    message_pass=None,
) -> jnp.ndarray:
    """TPU-native coarse message pass (MRFConfig.stride > 1).

    The pairwise displacement priors are smooth at multi-pixel scale, so
    the expensive K^2 large-window convolution runs on ``stride``-pooled
    unaries (same physical extent, taps / stride^2, and XLA's
    dense-rewritten conv shrinks by stride^4 in FLOPs).  The coarse
    log-messages are bilinearly upsampled back and the full-resolution
    log-unary is added, keeping argmax localization at heatmap precision:

        log p̄_A = log p_A  +  up( Σ_v log( k_{A|v} ⊛ pool(p)_v + b ) )

    Returns (B, H, W, K) fp32.
    """
    b, h, w, k = p.shape
    assert h % stride == 0 and w % stride == 0, (p.shape, stride)
    # Sum-pool to the coarse grid (preserves each channel's total mass).
    pc = p.reshape(b, h // stride, stride, w // stride, stride, k).sum(axis=(2, 4))
    pass_fn = message_pass or mrf_message_pass_xla
    coarse = pass_fn(pc, kernels, biases, eps=eps, precision=precision)
    import jax

    up = jax.image.resize(
        coarse, (b, h, w, k), method="bilinear"
    )
    unary = jnp.log(jnp.maximum(p.astype(jnp.float32), eps))
    return unary + up


def mrf_message_pass_direct(
    p: jnp.ndarray,
    kernels: jnp.ndarray,
    biases: jnp.ndarray,
    eps: float = 1e-6,
    precision=None,
) -> jnp.ndarray:
    """Direct-space oracle: log Π_v (k⊛p_v + b), used only in tests.

    Mathematically identical to :func:`mrf_message_pass_xla`; numerically
    it underflows for large K which is exactly why the model computes in
    log space (the test asserts agreement where the product stays
    representable).
    """
    resp = pairwise_conv(p, kernels, precision=precision).astype(jnp.float32)
    prod = jnp.prod(jnp.maximum(resp + biases.astype(jnp.float32), eps), axis=-2)
    return jnp.log(prod)
