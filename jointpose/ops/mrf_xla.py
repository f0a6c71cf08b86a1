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
# hand-written where it pays (round-4b): XLA dense-rewrites the FORWARD
# grouped conv onto the MXU (34 TFLOP/s traced on the flagship's coarse
# pass) but lowers autodiff's grouped transpose convs without that
# rewrite — 0.42 TFLOP/s, 92 ms of the 498 ms flagship train dispatch
# (results/train_throughput/train_ops_flagship.json).  Here:
#   dL/dp — a SAME grouped conv of the cotangent against the spatially
#     flipped, (v, a)-transposed kernels: the exact same op class as the
#     forward, so it gets the same dense rewrite.
#   dL/dk — window patches of p (lax.conv_general_dilated_patches) and
#     ONE dense (Kv·taps, BHW) @ (BHW, Kv·Ka) matmul whose v-diagonal
#     blocks are the gradient (the off-diagonal (v, v') cross products
#     are computed and discarded — a Kv× FLOP overcharge that is still
#     orders cheaper than the unrewritten grouped conv).  Gated by
#     patch size: the stride-1 paper window (45x67 taps over the whole
#     map) would materialize GBs, so big geometries keep autodiff's
#     conv (they train through the Fourier pass anyway).
_DK_PATCHES_LIMIT = 512 * 2**20


def _bwd_dp(g, kern, groups, precision, out_dtype):
    wh, ww, one, vo = kern.shape
    ka = vo // groups
    k4 = kern.reshape(wh, ww, groups, ka)
    kt = jnp.flip(k4, axis=(0, 1)).transpose(0, 1, 3, 2)  # (wh,ww,Ka,Kv)
    return lax.conv_general_dilated(
        g.astype(kern.dtype),
        kt,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        precision=precision,
    ).astype(out_dtype)


def _bwd_dk(p, g, kern_shape, groups, precision, out_dtype):
    wh, ww, _, vo = kern_shape
    ka = vo // groups
    b, h, w, kv = p.shape
    taps = wh * ww
    # (B, H, W, Kv*taps): conv_general_dilated_patches orders the
    # feature dim channel-major (channel v's taps are contiguous),
    # matching the reshape below — pinned by test_mrf.py's grad parity.
    patches = lax.conv_general_dilated_patches(
        p, filter_shape=(wh, ww), window_strides=(1, 1), padding="SAME",
        dimension_numbers=_DIMNUMS,
    )
    lhs = patches.reshape(b * h * w, kv * taps)
    rhs = g.astype(p.dtype).reshape(b * h * w, vo)
    full = lax.dot_general(
        lhs, rhs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (Kv*taps, Kv*Ka)
    d = full.reshape(kv, taps, kv, ka)
    dk = d[jnp.arange(kv), :, jnp.arange(kv), :]  # (Kv, taps, Ka)
    return dk.transpose(1, 0, 2).reshape(wh, ww, 1, kv * ka).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grouped_conv_f32(p, kern, groups, precision):
    return _grouped_conv(p, kern, groups, precision, jnp.float32)


def _grouped_conv_f32_fwd(p, kern, groups, precision):
    return _grouped_conv_f32(p, kern, groups, precision), (p, kern)


def _grouped_conv_f32_bwd(groups, precision, res, g):
    p, kern = res
    wh, ww, _, vo = kern.shape
    patch_bytes = p.size * wh * ww * p.dtype.itemsize
    # The flip trick for dL/dp assumes SAME padding is symmetric, which
    # holds exactly for odd windows (all MRF presets; priors are
    # centered) — even windows take the autodiff fallback.
    if wh % 2 and ww % 2 and patch_bytes <= _DK_PATCHES_LIMIT:
        return (
            _bwd_dp(g, kern, groups, precision, p.dtype),
            _bwd_dk(p, g, kern.shape, groups, precision, kern.dtype),
        )

    # Large geometries: autodiff through the mathematically identical
    # same-dtype conv + fp32 cast (the cast is linear, so these are
    # exactly the gradients the transpose rule would have produced).
    def unfused(p_, kern_):
        out = _grouped_conv(p_, kern_, groups, precision, None)
        return out.astype(jnp.float32)

    _, vjp = jax.vjp(unfused, p, kern)
    return vjp(g)


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
