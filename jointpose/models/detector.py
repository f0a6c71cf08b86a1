"""Fully-convolutional part detector (SURVEY C5/C6; arXiv:1406.2984 §3.1).

Topology follows the paper's sliding-window-equivalent network:

- a trunk of (conv kxk -> ReLU -> optional 2x2 maxpool) stages; the
  number of pools fixes the heatmap stride (stride 4 for two pools);
- the "fully-connected equivalent" head: one wide conv (paper: 9x9)
  followed by 1x1 convs down to K per-joint heatmap logits;
- optionally a second half-resolution Gaussian-pyramid branch whose
  trunk shares the full-res filter banks (paper §3.1: the same banks
  applied to each pyramid level); its features are upsampled 2x and
  summed with the full-res features before the head (SURVEY C6).

TPU mapping: all convs are NHWC/HWIO lowered by XLA onto the MXU;
activations run in ``compute_dtype`` (bf16 on TPU) while parameters and
the returned logits stay fp32 (SURVEY §7 build step 3).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from jointpose.configs import DetectorConfig


def resolve_head_conv_impl(
    cfg: DetectorConfig, image_hw: tuple[int, int], batch: int
) -> str:
    """Resolve ``head_conv_impl='auto'`` to 'direct' | 'fft' for a
    geometry + batch.

    'auto' is a per-trace decision (the roofline model depends on batch
    size), so the same checkpoint could run the direct conv at the
    training/eval batch and the FFT conv at the serving batch, with
    slightly different bf16 numerics between the evaluated and the
    served model (round-2 advisor finding).  Callers that persist or
    reconcile the choice (checkpoint metadata, predict/serve) use this
    single resolution point; explicit 'direct'/'fft' pass through.
    """
    if cfg.head_conv_impl != "auto":
        return cfg.head_conv_impl
    from jointpose.ops.fft_conv import use_fourier

    stride = Detector.stride(cfg)
    hm_hw = (image_hw[0] // stride, image_hw[1] // stride)
    return (
        "fft"
        if use_fourier(
            hm_hw,
            (cfg.head_kernel, cfg.head_kernel),
            cfg.trunk_features[-1],
            cfg.head_features[0],
            batch=batch,
        )
        else "direct"
    )


def _pool2x2(x: jnp.ndarray) -> jnp.ndarray:
    # Round-4b NEGATIVE RESULT: rewriting this as the reshape-max
    # analog of _avg_pyramid (exact for the even-dims non-overlapping
    # case) measured ~1% SLOWER on every maxpool preset (mrf row
    # 35.77 -> 36.05 ms/batch-128; flagship bit-identical across runs,
    # so the delta is real).  Unlike the pyramid's avg case, the pool
    # cannot fuse into the producing conv custom-call either way, and
    # XLA's reduce_window emission already reads at ~714 GB/s — the
    # reshape form only changed the fusion shape for the worse.  Keep
    # reduce_window.
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="SAME")


def _avg_pyramid(x: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution Gaussian-pyramid level (2x2 average pooling).

    Written as a reshape-mean, not ``nn.avg_pool``: mathematically
    identical for the even-dims non-overlapping case (guaranteed by the
    Detector's divisibility check), but XLA fuses elementwise producers
    into a plain reduce while ``reduce_window`` forces its input to
    materialize — the avg_pool form cost 0.30 ms/batch-128 in the
    round-4 flagship trace (a 59 MB normalize materialization at
    detector.py:134 + an 83 MB window read at 366 GB/s) for an op whose
    fused floor is ~0.06 ms.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:  # SAME-padded fallback (never hit by presets)
        return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2), padding="SAME")
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.mean(x, axis=(2, 4), dtype=x.dtype)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x spatial upsample — a reshape/broadcast, cheap on TPU."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Trunk(nn.Module):
    """Conv/pool feature trunk, reused across pyramid levels."""

    config: DetectorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        assert cfg.pool_mode in ("max", "stride"), cfg.pool_mode
        stride_conv = cfg.pool_mode == "stride"
        for i, feats in enumerate(cfg.trunk_features):
            pooled = cfg.trunk_pool[i]
            x = nn.Conv(
                feats,
                (cfg.trunk_kernel, cfg.trunk_kernel),
                strides=(2, 2) if (pooled and stride_conv) else (1, 1),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            if pooled and not stride_conv:
                x = _pool2x2(x)
        return x


class Detector(nn.Module):
    """Multi-resolution fully-convolutional part detector.

    Input:  (B, H, W, 3) images in [0, 1].
    Output: (B, H/stride, W/stride, K) float32 heatmap logits, where
            stride = 2 ** (#pooling stages).
    """

    config: DetectorConfig
    num_joints: int
    dtype: Any = jnp.float32
    # Spatial parallelism: with a ('data', 'model') mesh here, the trunk
    # runs with image rows sharded over 'model' (XLA SPMD inserts the
    # conv/pool halo exchanges) and the rows are re-gathered before the
    # head, whose wide conv prefers channel TP (parallel/mesh.py).
    spatial_mesh: Any = None

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        stride = Detector.stride(cfg)
        need = stride * 2 if cfg.multires else stride
        h, w = images.shape[1], images.shape[2]
        if h % need or w % need:
            raise ValueError(
                f"input {h}x{w} must be divisible by {need} "
                f"(heatmap stride {stride}{', multires' if cfg.multires else ''})"
            )
        x = (images.astype(self.dtype) - 0.5) * 2.0
        if self.spatial_mesh is not None:
            import jax

            from jointpose.parallel.mesh import (
                MODEL_AXIS, spatial_gather_sharding, spatial_image_sharding,
            )

            sp = self.spatial_mesh.shape[MODEL_AXIS]
            if h % (need * sp):
                raise ValueError(
                    f"spatial sharding needs rows {h} divisible by "
                    f"{need * sp} (stride alignment x {sp} shards)"
                )
            x = jax.lax.with_sharding_constraint(
                x, spatial_image_sharding(self.spatial_mesh, x.shape[0])
            )

        if cfg.share_trunk:
            trunk = Trunk(cfg, dtype=self.dtype, name="trunk")
            full = trunk(x)
            if cfg.multires:
                half = trunk(_avg_pyramid(x))
        else:
            full = Trunk(cfg, dtype=self.dtype, name="trunk_full")(x)
            if cfg.multires:
                half = Trunk(cfg, dtype=self.dtype, name="trunk_half")(_avg_pyramid(x))

        if cfg.multires:
            # Half-res features live at 2x the stride; upsample and fuse
            # by summation before the shared head (SURVEY C6).
            full = full + _upsample2x(half)

        if self.spatial_mesh is not None:
            # Row-gather the fused trunk features (an all-gather over
            # 'model'): the head's wide conv is channel-TP territory and
            # the MRF's Fourier pass contracts full columns.  At heatmap
            # stride the gathered tensor is 1/stride^2 of the image, so
            # the collective rides ICI on a small map.
            full = jax.lax.with_sharding_constraint(
                full, spatial_gather_sharding(self.spatial_mesh, full.shape[0])
            )

        # The wide "FC-equivalent" head conv dominates paper-preset FLOPs
        # (9x9x512 at 60x90 = 57.3 GFLOP/img direct); the Fourier-matmul
        # impl (ops/fft_conv.py) computes it ~14x cheaper with the same
        # parameter layout.  'auto' picks the impl with the higher
        # modeled min(MXU, HBM) roofline for this geometry and batch.
        impl = resolve_head_conv_impl(cfg, (h, w), full.shape[0])
        if impl == "fft":
            from jointpose.ops.fft_conv import FFTConv

            head_wide = FFTConv(
                cfg.head_features[0],
                (cfg.head_kernel, cfg.head_kernel),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="head_wide",
            )
        else:
            assert impl == "direct", cfg.head_conv_impl
            head_wide = nn.Conv(
                cfg.head_features[0],
                (cfg.head_kernel, cfg.head_kernel),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="head_wide",
            )
        y = head_wide(full)
        y = nn.relu(y)
        for i, feats in enumerate(cfg.head_features[1:]):
            y = nn.Conv(
                feats,
                (1, 1),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"head_1x1_{i}",
            )(y)
            y = nn.relu(y)
        logits = nn.Conv(
            self.num_joints,
            (1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="head_out",
        )(y)
        return logits.astype(jnp.float32)

    @staticmethod
    def stride(config: DetectorConfig) -> int:
        return 2 ** sum(config.trunk_pool)
