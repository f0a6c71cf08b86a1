"""Parity tests for the Fourier-space head conv (ops/fft_conv.py).

SURVEY §4 numerics/parity: the Fourier impl must match lax's direct
SAME cross-correlation to fp32 tolerance, the flax module must be
parameter-compatible with nn.Conv, gradients must flow, and the bf16
drift must stay within the same budget as the direct bf16 conv.
"""

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from jointpose.ops.fft_conv import (
    FFTConv,
    fft_conv2d,
    fourier_conv_flops,
    use_fourier,
)


def direct_conv(x, kernel):
    return lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel.astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )


@pytest.mark.parametrize(
    "hw,kernel_hw,cin,cout",
    [((12, 16), (5, 5), 4, 8), ((9, 13), (7, 9), 3, 5), ((16, 12), (3, 3), 2, 2)],
)
def test_fft_conv2d_matches_lax_fp32(hw, kernel_hw, cin, cout):
    rngs = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(rngs[0], (2, *hw, cin), jnp.float32)
    k = jax.random.normal(rngs[1], (*kernel_hw, cin, cout), jnp.float32)
    want = direct_conv(x, k)
    got = fft_conv2d(x, k, precision=lax.Precision.HIGHEST)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5 * scale)


def test_fftconv_module_param_compatible_with_nn_conv():
    # Same param names/shapes; with copied params the outputs agree.
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 14, 6), jnp.float32)
    ref = nn.Conv(8, (5, 5), padding="SAME", dtype=jnp.float32)
    mod = FFTConv(8, (5, 5), dtype=jnp.float32)
    pref = ref.init(jax.random.PRNGKey(2), x)
    want = ref.apply(pref, x)
    got = mod.apply(pref, x)  # nn.Conv's params, FFTConv's math
    assert jax.tree.structure(mod.init(jax.random.PRNGKey(0), x)) == jax.tree.structure(pref)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5 * scale)


def test_fft_conv_bf16_drift_within_direct_bf16_budget():
    # bf16 Fourier conv drifts from the fp32 oracle by no more than ~3x
    # the direct bf16 conv's own drift (same rounding budget class).
    rngs = jax.random.split(jax.random.PRNGKey(3), 2)
    x = jax.random.normal(rngs[0], (2, 20, 24, 16), jnp.float32)
    k = jax.random.normal(rngs[1], (9, 9, 16, 24), jnp.float32) / 9.0
    want = direct_conv(x, k)
    scale = float(jnp.max(jnp.abs(want)))
    direct_bf16 = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    drift_direct = float(jnp.max(jnp.abs(direct_bf16 - want))) / scale
    got = fft_conv2d(x.astype(jnp.bfloat16), k)
    drift_fft = float(jnp.max(jnp.abs(got - want))) / scale
    assert drift_fft < max(3.0 * drift_direct, 5e-2), (drift_fft, drift_direct)


def test_fft_conv_gradients_flow():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 10, 3), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(5), (5, 5, 3, 4), jnp.float32)

    def loss(k_):
        return jnp.sum(fft_conv2d(x, k_, precision=lax.Precision.HIGHEST) ** 2)

    g = jax.grad(loss)(k)
    assert np.isfinite(np.asarray(g)).all()
    # Finite-difference check on one coordinate.
    eps = 1e-3
    dk = jnp.zeros_like(k).at[2, 2, 1, 1].set(eps)
    num = (loss(k + dk) - loss(k - dk)) / (2 * eps)
    np.testing.assert_allclose(float(g[2, 2, 1, 1]), float(num), rtol=2e-2)


def test_use_fourier_auto_rule():
    # Paper head: 9x9x(128->512) over 60x90 — 8x FLOP cut dominates the
    # bandwidth hit at a production batch.
    assert use_fourier((60, 90), (9, 9), 128, 512, batch=128)
    direct, fourier = fourier_conv_flops((60, 90), (9, 9), 128, 512)
    assert direct / fourier > 6.0
    # Flagship head 5x5x(96->128): the direct conv is compute-cheap and
    # the Fourier intermediates would make it bandwidth-bound — direct.
    assert not use_fourier((60, 90), (5, 5), 96, 128, batch=128)
    # Tiny geometry at tiny batch: the per-step kernel spectrum is not
    # amortized — direct.
    assert not use_fourier((12, 16), (5, 5), 3, 8, batch=4)
    # 3x3 convs never pay off.
    assert not use_fourier((60, 90), (3, 3), 128, 128, batch=128)


def test_detector_head_impls_agree():
    # Same params through 'direct' and 'fft' heads -> same logits (fp32).
    from jointpose.configs import DetectorConfig
    from jointpose.models.detector import Detector

    images = jax.random.uniform(jax.random.PRNGKey(6), (1, 32, 48, 3))
    base = DetectorConfig(
        trunk_features=(8, 8),
        trunk_pool=(True, True),
        head_features=(16, 8),
        head_kernel=5,
        multires=False,
    )
    det_direct = Detector(
        config=DetectorConfig(**{**base.__dict__, "head_conv_impl": "direct"}),
        num_joints=9,
    )
    det_fft = Detector(
        config=DetectorConfig(**{**base.__dict__, "head_conv_impl": "fft"}),
        num_joints=9,
    )
    params = det_direct.init(jax.random.PRNGKey(7), images)
    want = det_direct.apply(params, images)
    got = det_fft.apply(params, images)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4 * scale)


def test_pallas_tail_matches_xla_tail():
    # The fused pointwise+inverse-row kernel is bit-for-math identical
    # to the XLA tail (fp32, HIGHEST).
    rngs = jax.random.split(jax.random.PRNGKey(9), 2)
    x = jax.random.normal(rngs[0], (4, 20, 24, 16), jnp.float32)
    k = jax.random.normal(rngs[1], (9, 9, 16, 32), jnp.float32)
    a = fft_conv2d(x, k, precision=lax.Precision.HIGHEST, pallas_tail=True)
    b = fft_conv2d(x, k, precision=lax.Precision.HIGHEST, pallas_tail=False)
    scale = float(jnp.max(jnp.abs(b)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5 * scale)


def test_pallas_tail_gradients_match_xla_tail():
    rngs = jax.random.split(jax.random.PRNGKey(10), 3)
    x = jax.random.normal(rngs[0], (2, 12, 16, 8), jnp.float32)
    k = jax.random.normal(rngs[1], (5, 5, 8, 8), jnp.float32)
    g = jax.random.normal(rngs[2], (2, 12, 16, 8), jnp.float32)

    def loss(tail):
        def f(x_, k_):
            return jnp.sum(
                fft_conv2d(x_, k_, precision=lax.Precision.HIGHEST,
                           pallas_tail=tail) * g
            )
        return jax.grad(f, argnums=(0, 1))(x, k)

    ga, gb = loss(True), loss(False)
    for a, b in zip(ga, gb):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4 * scale)


def test_failed_tail_compile_probe_falls_back_to_xla(monkeypatch):
    # Review finding: the VMEM-budget model can accept a tiling Mosaic
    # rejects, and a compile error inside the user's jit is uncatchable
    # there.  When the one-time compile probe reports failure, fft_conv2d
    # must run the XLA tail (same math) instead of crashing.
    from jointpose.ops import fft_conv as mod

    monkeypatch.setattr(mod, "_tail_compile_ok",
                        lambda *a, **kw: False)
    rngs = jax.random.split(jax.random.PRNGKey(3), 2)
    x = jax.random.normal(rngs[0], (4, 20, 24, 16), jnp.float32)
    k = jax.random.normal(rngs[1], (9, 9, 16, 32), jnp.float32)
    a = mod.fft_conv2d(x, k, precision=lax.Precision.HIGHEST, pallas_tail=True)
    b = mod.fft_conv2d(x, k, precision=lax.Precision.HIGHEST, pallas_tail=False)
    scale = float(jnp.max(jnp.abs(b)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5 * scale)


def test_resident_tail_matches_fblocked_tail():
    """Both kdft tail variants (resident-K_f batch-innermost vs the
    f-blocked accumulator kernel) compute identical math; pin their
    parity directly so whichever _pallas_tail_kdft selects, the other
    stays covered."""
    from jointpose.ops import fft_conv as mod

    rngs = jax.random.split(jax.random.PRNGKey(11), 2)
    x = jax.random.normal(rngs[0], (4, 20, 24, 16), jnp.float32)
    k = jax.random.normal(rngs[1], (9, 9, 16, 32), jnp.float32)

    real = mod._tail_tiles_resident
    try:
        # Force the f-blocked path by making the resident tiling fail.
        mod._tail_tiles_resident = lambda *a, **kw: []
        fblocked = mod.fft_conv2d(
            x, k, precision=lax.Precision.HIGHEST, pallas_tail=True
        )
    finally:
        mod._tail_tiles_resident = real
    assert real(32, 20, 4, 16, 32, 4, 9)  # resident must engage (ph=32 here)
    resident = mod.fft_conv2d(
        x, k, precision=lax.Precision.HIGHEST, pallas_tail=True
    )
    scale = float(jnp.max(jnp.abs(fblocked)))
    np.testing.assert_allclose(
        np.asarray(resident), np.asarray(fblocked), atol=2e-5 * scale
    )


def test_tail_tiles_resident_ordering():
    """Candidates order by grid-step count then larger batch tile — the
    round-4b sweep measured time tracking step count in this family
    (results/kernels/tail_sweep.json: TB=32 5.85 ms / TB=16 6.80 /
    TB=8 9.41 at the paper head)."""
    from jointpose.ops.fft_conv import _tail_tiles_resident

    # Paper-head geometry: (32, 128) must lead (it measured fastest and
    # compiles despite modeling over the old 14 MiB budget).
    cands = _tail_tiles_resident(72, 60, 128, 128, 512, 2, 9)
    assert cands[0] == (32, 128), cands
    co = 512
    steps = [(co // cot) * (128 // tb) for tb, cot in cands]
    assert steps == sorted(steps), cands
    # The measured compile-fail point stays excluded.
    assert (64, 128) not in cands and (128, 128) not in cands, cands
