"""Tests for the MRF spatial model (SURVEY C7, test strategy §4).

Covers: grouped-conv pairwise response correctness vs a naive per-pair
loop, uniform-kernel reduction to a constant field, delta-kernel
displacement semantics (the convention priors.py must match), log-space
vs direct-space agreement, and the flax module's softplus/prior-init
plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jointpose.configs import MRFConfig
from jointpose.models.mrf import (
    SpatialModel,
    inverse_softplus,
    priors_to_raw_kernels,
    uniform_kernel_init,
)
from jointpose.ops.mrf_xla import (
    mrf_message_pass_direct,
    mrf_message_pass_xla,
    pairwise_conv,
)

H, W, K = 12, 16, 3
WIN = (7, 9)


def _rand_heatmaps(batch=2, seed=0):
    p = np.random.RandomState(seed).rand(batch, H, W, K).astype(np.float32)
    p /= p.sum(axis=(1, 2), keepdims=True)
    return jnp.asarray(p)


def _rand_kernels(seed=1):
    k = np.random.RandomState(seed).rand(*WIN, K, K).astype(np.float32) * 0.1
    return jnp.asarray(k)


def test_pairwise_conv_matches_naive_loop():
    import jax.lax as lax

    p = _rand_heatmaps()
    kernels = _rand_kernels()
    resp = np.asarray(pairwise_conv(p, kernels))  # (B, H, W, K, K)
    for v in range(K):
        for a in range(K):
            ref = lax.conv_general_dilated(
                p[..., v : v + 1],
                kernels[:, :, v, a][:, :, None, None],
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            np.testing.assert_allclose(
                resp[..., v, a], np.asarray(ref)[..., 0], rtol=2e-5, atol=2e-6,
                err_msg=f"pair (v={v}, a={a})",
            )


def test_uniform_kernels_give_uniform_field():
    # With kernels covering the full extent and uniform weights, each
    # response is a constant (a fraction of the unary mass), so log p̄ is
    # spatially constant.
    p = _rand_heatmaps(batch=1)
    full_win = (2 * H - 1, 2 * W - 1)
    kernels = jnp.full((*full_win, K, K), 1.0 / (H * W), jnp.float32)
    biases = jnp.full((K, K), 1e-4, jnp.float32)
    import jax.lax as lax

    out = np.asarray(mrf_message_pass_xla(p, kernels, biases,
                                          precision=lax.Precision.HIGHEST))
    # Every spatial position sees the full unary mass => constant field.
    np.testing.assert_allclose(
        out, np.broadcast_to(out[:, :1, :1, :], out.shape), rtol=1e-5, atol=1e-4
    )


def test_delta_kernel_shifts_peak():
    # Kernel with a single tap at center offset (dy, dx) must move joint
    # v's peak by (dy, dx) when scoring joint a: the tap at offset d
    # weights "a sits at d relative to v" (correlation indexed by -d).
    b = 1
    p = np.zeros((b, H, W, 2), np.float32)
    p[0, 4, 5, 0] = 1.0  # joint v=0 peaked at (y=4, x=5)
    p[0, 0, 0, 1] = 1.0
    dy, dx = 2, 3
    wh, ww = WIN
    kernels = np.zeros((wh, ww, 2, 2), np.float32)
    # Correlation semantics: response(o) = sum_t k[t] p(o + t - c);
    # peak lands at o = peak_v - (t - c). Tap at (c_y - dy, c_x - dx)
    # puts the response peak at peak_v + (dy, dx).
    cy, cx = wh // 2, ww // 2
    kernels[cy - dy, cx - dx, 0, 1] = 1.0
    # All other pairs uniform so they don't affect the argmax over space.
    for v in range(2):
        for a in range(2):
            if (v, a) != (0, 1):
                kernels[:, :, v, a] = 1.0 / (wh * ww)
    out = np.asarray(
        mrf_message_pass_xla(jnp.asarray(p), jnp.asarray(kernels),
                             jnp.full((2, 2), 1e-4, jnp.float32))
    )
    peak = np.unravel_index(out[0, :, :, 1].argmax(), (H, W))
    assert peak == (4 + dy, 5 + dx), peak


def test_log_space_matches_direct_space():
    p = _rand_heatmaps(batch=1)
    kernels = _rand_kernels() + 0.05  # keep products well away from underflow
    biases = jnp.full((K, K), 0.01, jnp.float32)
    log_impl = np.asarray(mrf_message_pass_xla(p, kernels, biases))
    direct = np.asarray(mrf_message_pass_direct(p, kernels, biases))
    np.testing.assert_allclose(log_impl, direct, rtol=1e-4, atol=1e-5)


def test_inverse_softplus_roundtrip():
    y = jnp.asarray([1e-6, 1e-3, 0.1, 1.0, 20.0], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jax.nn.softplus(inverse_softplus(y))), np.asarray(y),
        rtol=1e-3, atol=1e-6,  # fp32: ~5% rel error at the 1e-6 floor is fine
    )


def test_spatial_model_prior_init_reproduces_priors():
    # raw_kernels = softplus^-1(mixed prior) => effective kernels equal
    # the blended priors on the first forward pass.
    priors = np.random.RandomState(0).rand(*WIN, K, K).astype(np.float32)
    priors /= priors.sum(axis=(0, 1), keepdims=True)
    raw = priors_to_raw_kernels(jnp.asarray(priors), blend=0.5)
    eff = np.asarray(jax.nn.softplus(raw))
    expected = 0.5 * priors + 0.5 / (WIN[0] * WIN[1])
    np.testing.assert_allclose(eff, expected, rtol=1e-3, atol=1e-5)


def test_spatial_model_module_forward():
    cfg = MRFConfig(window=WIN, use_pallas=False)
    model = SpatialModel(cfg, num_joints=K)
    p = _rand_heatmaps()
    params = model.init(jax.random.PRNGKey(0), p)
    out = model.apply(params, p)
    assert out.shape == (2, H, W, K)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    # The module (softplus-parameterized) must equal the raw op evaluated
    # at the softplus of its parameters.
    sm = params["params"]
    expected = mrf_message_pass_xla(
        p,
        jax.nn.softplus(sm["raw_kernels"]),
        jax.nn.softplus(sm["raw_bias"]),
        eps=cfg.eps,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5
    )


def test_uniform_kernel_init_is_uniform():
    raw = uniform_kernel_init(WIN, K)
    eff = np.asarray(jax.nn.softplus(raw))
    np.testing.assert_allclose(eff, 1.0 / (WIN[0] * WIN[1]), rtol=1e-4)


def test_mrf_gradients_are_finite_at_sparse_unaries():
    # Near-delta unaries + tiny biases: the log floor must keep grads finite.
    p = np.full((1, H, W, K), 1e-9, np.float32)
    p[0, 3, 3, :] = 1.0
    kernels = jnp.asarray(
        np.random.RandomState(0).rand(*WIN, K, K).astype(np.float32) * 1e-3
    )
    biases = jnp.full((K, K), 1e-6, jnp.float32)

    def loss(kern):
        return jnp.sum(mrf_message_pass_xla(jnp.asarray(p), kern, biases))

    g = np.asarray(jax.grad(loss)(kernels))
    assert np.isfinite(g).all()


def test_bf16_unaries_differentiate_and_match_unfused_grads():
    # Regression: jax 0.9's conv transpose rule rejects the fp32 cotangent
    # against bf16 operands when the forward used preferred_element_type
    # (TypeError "requires arguments to have the same dtypes") — the exact
    # crash that killed a bf16 joint-stage training run.  pairwise_conv's
    # widening path carries a custom VJP; its grads must equal those of
    # the unfused same-dtype conv + fp32 cast graph.
    import jax.lax as lax

    p16 = _rand_heatmaps().astype(jnp.bfloat16)
    kernels = _rand_kernels()
    biases = jnp.full((K, K), 1e-2, jnp.float32)

    def loss(kern):
        return jnp.sum(mrf_message_pass_xla(p16, kern, biases) ** 2)

    g = jax.grad(loss)(kernels)  # must not raise
    assert g.dtype == jnp.float32
    assert np.isfinite(np.asarray(g)).all()

    def loss_unfused(kern):
        kf = kern.reshape(*WIN, 1, K * K).astype(p16.dtype)
        resp = lax.conv_general_dilated(
            p16, kf, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=K,
        ).astype(jnp.float32)
        resp = resp.reshape(*p16.shape[:3], K, K) + biases
        logs = jnp.log(jnp.maximum(resp, 1e-6))
        return jnp.sum(jnp.sum(logs, axis=-2) ** 2)

    g_ref = jax.grad(loss_unfused)(kernels)
    # Identical linearization; only the fused forward's fp32 accumulator
    # (vs bf16-rounded primal) can move the evaluation point.
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=0.05, atol=0.05)

    gp = jax.grad(lambda q: jnp.sum(mrf_message_pass_xla(q, kernels, biases)))(p16)
    assert gp.dtype == jnp.bfloat16


def test_custom_grouped_conv_grads_match_autodiff():
    """Round-4b dense-embedded backward (mrf_xla._grouped_conv_f32_bwd)
    must equal autodiff's gradients, including the TP-sharded
    Kv != Ka case."""
    from jointpose.ops import mrf_xla as m

    rng = np.random.RandomState(7)
    # (6, 6, 11, 15) exercises the round-5 s2d dL/dp path at nq > 2
    # width blocks and a non-multiple-of-8 width.
    for kv, ka, wh, ww in ((3, 5, 7, 5), (4, 4, 5, 5), (6, 6, 11, 15)):
        p = jnp.asarray(rng.rand(2, 10, 14, kv).astype(np.float32))
        kern = jnp.asarray(rng.rand(wh, ww, 1, kv * ka).astype(np.float32) * 0.1)
        gc = jax.grad(
            lambda a, b: jnp.sum(jnp.sin(m._grouped_conv_f32(a, b, kv, None))),
            argnums=(0, 1),
        )(p, kern)
        go = jax.grad(
            lambda a, b: jnp.sum(jnp.sin(
                m._grouped_conv(a, b, kv, None, None).astype(jnp.float32))),
            argnums=(0, 1),
        )(p, kern)
        for a, b in zip(gc, go):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
