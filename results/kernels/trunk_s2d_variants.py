"""Space-to-depth reparam of the lane-starved stride-2 trunk convs.

train_ceiling.json (round 5) shows the full-res trunk convs 4-5.6x over
their HBM byte floors: conv0 consumes C=3 channels (3 of the TPU's
packed lanes) and conv1 C=24 — both force padded activation tiles.  A
5x5/stride-2 conv is EXACTLY reparameterizable over a 2x2
space-to-depth input: taps dy = 2q + r scatter into a 3x3 kernel over
4C channels (the (q=1, r=1) tap row/col is structurally zero).  Same
math, 1.44x nominal tap overcharge, 4x the input lanes, half the
spatial extent.

This harness times fwd and fwd+bwd of both forms at flagship geometry.

Usage: python results/kernels/trunk_s2d_variants.py
Writes results/kernels/trunk_s2d_variants.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from jointpose.devtime import measure_device_time
from jointpose.perf import aot_compile

B = 32
DN = ("NHWC", "HWIO", "NHWC")


def conv_plain(x, k):
    return lax.conv_general_dilated(
        x, k, (2, 2), "SAME", dimension_numbers=DN)


def s2d_kernel(k):
    """(5, 5, C, F) stride-2 kernel -> (3, 3, 4C, F) over 2x2 blocks.

    SAME padding for 5x5/stride-2 at even sizes pads 2 before: source
    center of output Y is 2Y, taps at 2Y + dy - 2, dy in [0, 5).  In
    block coords 2Y + dy - 2 = 2(Y + q - 1) + r with dy = 2q + r,
    q in [0, 3), r in [0, 2) — dy = 2q + r covers 0..4 at (q, r) in
    {(0,0),(0,1),(1,0),(1,1),(2,0)}; (2,1) is zero.  The 3x3 conv over
    the s2d grid then needs pad 1 before/after (VALID after explicit
    pad below keeps it unambiguous)."""
    kh, kw, c, f = k.shape
    assert kh == 5 and kw == 5
    k2 = jnp.zeros((3, 2, 3, 2, c, f), k.dtype)
    for qy in range(3):
        for ry in range(2):
            dy = 2 * qy + ry
            if dy >= 5:
                continue
            for qx in range(3):
                for rx in range(2):
                    dx = 2 * qx + rx
                    if dx >= 5:
                        continue
                    k2 = k2.at[qy, ry, qx, rx].set(k[dy, dx])
    # block channel layout: (ry, rx, c) row-major == s2d reshape below
    return k2.transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 4 * c, f)


def conv_s2d(x, k):
    b, h, w, c = x.shape
    # SAME for 5x5/stride-2 at even input pads 3 total = 1 before, 2
    # after ((out-1)*2+5-in = 3); output Y taps padded rows 2Y..2Y+4 of
    # an explicit 1-before pad, so with pad (1, 3) the 2x2 blocks of the
    # padded tensor align blocks Y..Y+2 with the 3x3 s2d kernel (the
    # trailing (q=2, r=1) sub-tap is the structural zero; the extra
    # trailing pad row is never read by a valid output).
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))  # (B, h+4, w+4, C)
    hb, wb = (h + 4) // 2, (w + 4) // 2
    x2 = xp.reshape(b, hb, 2, wb, 2, c).transpose(0, 1, 3, 2, 4, 5)
    x2 = x2.reshape(b, hb, wb, 4 * c)
    k2 = s2d_kernel(k)
    return lax.conv_general_dilated(
        x2, k2, (1, 1), "VALID", dimension_numbers=DN)


def time_fn(name, fn, *args):
    compiled, cost = aot_compile(jax.jit(fn), *args)
    t = measure_device_time(compiled, *args, iters=8, warmup=2)
    assert t is not None
    row = {"name": name, "device_ms": round(t.median_run_s * 1e3, 3),
           "cost_gflop": round(cost["flops"] / 1e9, 2),
           "cost_mb": round(cost["bytes"] / 1e6, 1)}
    print(json.dumps(row), flush=True)
    return row, compiled(*args)


def main():
    assert jax.default_backend() != "cpu"
    rng = np.random.RandomState(0)
    rows = []
    for cname, (h, w, c, f) in {
        "conv0_fullres": (240, 320, 3, 24),
        "conv0_halfres": (120, 160, 3, 24),
        "conv1": (120, 160, 24, 48),
    }.items():
        x = jnp.asarray(rng.rand(B, h, w, c), jnp.bfloat16)
        k = jnp.asarray(rng.rand(5, 5, c, f) * 0.1, jnp.bfloat16)

        r_plain, out_p = time_fn(f"{cname}_plain", conv_plain, x, k)
        r_s2d, out_s = time_fn(f"{cname}_s2d", conv_s2d, x, k)
        err = float(jnp.max(jnp.abs(out_p.astype(jnp.float32) - out_s.astype(jnp.float32))))
        r_s2d["max_abs_err_vs_plain"] = round(err, 6)

        # plain bf16 convs as the production trunk runs them (flax Conv
        # dtype=bf16; the MXU accumulates fp32 internally either way)
        def loss_plain(x_, k_):
            return jnp.sum(conv_plain(x_, k_).astype(jnp.float32) ** 2)

        def loss_s2d(x_, k_):
            return jnp.sum(conv_s2d(x_, k_).astype(jnp.float32) ** 2)

        r_pg, _ = time_fn(f"{cname}_plain_fwdbwd",
                          jax.grad(loss_plain, argnums=(0, 1)), x, k)
        r_sg, _ = time_fn(f"{cname}_s2d_fwdbwd",
                          jax.grad(loss_s2d, argnums=(0, 1)), x, k)
        rows += [r_plain, r_s2d, r_pg, r_sg]

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "trunk_s2d_variants.json"), "w") as f:
        json.dump({"batch": B, "rows": rows}, f, indent=1)
        f.write("\n")
    print("wrote trunk_s2d_variants.json")


if __name__ == "__main__":
    main()
