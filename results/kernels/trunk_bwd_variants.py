"""Phase-split dL/dx for the stride-2 trunk convs.

train_ceiling.json (round 5) puts the stride-2 trunk convs' BACKWARD
ops 3.5-5.6x over their floors (e.g. conv1 dL/dx 5.63 ms vs 1.01):
XLA lowers dL/dx of a strided conv as an input-dilated (transposed)
conv — the gradient grid is zero-stuffed 2x2, so 3/4 of the MXU MACs
multiply structural zeros and the dilated operand costs real traffic.

The phase split removes the dilation exactly: input pixel i of a
5x5/stride-2 SAME conv (pad 1 before) receives kernel taps of one
parity class only, so dL/dx decomposes into FOUR stride-1 correlations
over the *undilated* dy grid with parity sub-kernels (3 or 2 taps per
dim).  Merging the four phases along output channels gives ONE dense
3x3 stride-1 conv dy:(B,H/2,W/2,F) x Kb:(3,3,F,4C) -> (B,H/2,W/2,4C)
followed by a depth-to-space interleave — 4C output lanes (96 for
conv1) instead of a dilated conv over C=24, at a 9/6.25 = 1.44x
nominal tap overcharge (structural-zero taps padded into the 3x3).

This harness times the isolated dL/dx and the end-to-end fwd+bwd
(custom_vjp with the phase-split pullback; dL/dW left to XLA) at the
flagship training geometries, with exact parity checks.

Usage: python results/kernels/trunk_bwd_variants.py
Writes results/kernels/trunk_bwd_variants.json.
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


def phase_kernel(k):
    """(5, 5, C, F) stride-2 kernel -> dL/dx kernel (3, 3, F, 4C).

    SAME for 5x5/stride-2 at even input pads 1 before: y[p] = sum_d
    k[d] x[2p + d - 1].  dL/dx[2m + r] = sum_d k[d] dy[(2m + r + 1 -
    d) / 2] over d with d ≡ r+1 (mod 2); writing the contributing dy
    index as m + j - 1 (j in [0, 3)) gives per-phase taps
      r=0: j=0 -> k[3], j=1 -> k[1], j=2 -> structural zero
      r=1: j=0 -> k[4], j=1 -> k[2], j=2 -> k[0]
    i.e. each phase is a 3-tap stride-1 correlation over dy.  Output
    channel blocks are laid out (ry, rx, c) row-major to match the
    depth-to-space reshape in phase_dldx."""
    kh, kw, c, f = k.shape
    assert kh == 5 and kw == 5
    tap = {(0, 0): 3, (0, 1): 1, (1, 0): 4, (1, 1): 2, (1, 2): 0}
    kb = jnp.zeros((3, 3, 2, 2, c, f), k.dtype)
    for ry in range(2):
        for rx in range(2):
            for jy in range(3):
                for jx in range(3):
                    dy_ = tap.get((ry, jy))
                    dx_ = tap.get((rx, jx))
                    if dy_ is None or dx_ is None:
                        continue
                    kb = kb.at[jy, jx, ry, rx].set(k[dy_, dx_])
    # (3, 3, ry, rx, C, F) -> (3, 3, F, ry*rx*C)
    return kb.transpose(0, 1, 5, 2, 3, 4).reshape(3, 3, f, 4 * c)


def phase_dldx(ct, kb, c):
    """dL/dx via one dense 3x3 stride-1 conv + depth-to-space."""
    b, hb, wb, _f = ct.shape
    out = lax.conv_general_dilated(
        ct, kb, (1, 1), "SAME", dimension_numbers=DN)
    out = out.reshape(b, hb, wb, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, 2 * hb, 2 * wb, c)


def xla_dldx(ct, x, k):
    """XLA's native pullback w.r.t. x (lhs-dilated transposed conv)."""
    return jax.vjp(lambda xx: conv_plain(xx, k), x)[1](ct)[0]


def make_phase_conv():
    """conv_plain with a custom_vjp that phase-splits dL/dx only."""

    @jax.custom_vjp
    def conv(x, k):
        return conv_plain(x, k)

    def fwd(x, k):
        return conv_plain(x, k), (x, k)

    def bwd(res, ct):
        x, k = res
        kb = phase_kernel(k)
        dx = phase_dldx(ct, kb, x.shape[-1])
        dk = jax.vjp(lambda kk: conv_plain(x, kk), k)[1](ct)[0]
        return dx, dk

    conv.defvjp(fwd, bwd)
    return conv


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
    phase_conv = make_phase_conv()
    rows = []
    # (h, w, c, f): input geometry of each stride-2 trunk conv at the
    # flagship training shapes (240x360 images, multires).  conv0's
    # dL/dx never materializes in training (the image has no grad) but
    # conv0 halfres is included as the small-C extreme.
    for cname, (h, w, c, f) in {
        "conv1_fullres": (120, 180, 24, 48),
        "conv1_halfres": (60, 90, 24, 48),
        "conv0_fullres": (240, 360, 3, 24),
    }.items():
        x = jnp.asarray(rng.rand(B, h, w, c), jnp.bfloat16)
        k = jnp.asarray(rng.rand(5, 5, c, f) * 0.1, jnp.bfloat16)
        ct = jnp.asarray(rng.rand(B, h // 2, w // 2, f), jnp.bfloat16)

        def rel_err(a, b):
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
            scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-6)
            return float(jnp.max(jnp.abs(a - b)) / scale)

        r_x, out_x = time_fn(f"{cname}_dldx_xla", xla_dldx, ct, x, k)
        kb = phase_kernel(k)
        r_p, out_p = time_fn(
            f"{cname}_dldx_phase",
            lambda ct_, kb_: phase_dldx(ct_, kb_, c), ct, kb)
        r_p["max_rel_err_vs_xla"] = round(rel_err(out_x, out_p), 8)
        rows += [r_x, r_p]

        # end-to-end fwd+bwd as training runs it (includes dL/dW and
        # the phase-kernel build, which the compiler hoists per step)
        def loss_plain(x_, k_):
            return jnp.sum(conv_plain(x_, k_).astype(jnp.float32) ** 2)

        def loss_phase(x_, k_):
            return jnp.sum(phase_conv(x_, k_).astype(jnp.float32) ** 2)

        r_pg, g_p = time_fn(f"{cname}_plain_fwdbwd",
                            jax.grad(loss_plain, argnums=(0, 1)), x, k)
        r_sg, g_s = time_fn(f"{cname}_phase_fwdbwd",
                            jax.grad(loss_phase, argnums=(0, 1)), x, k)
        r_sg["max_rel_err_vs_plain"] = round(
            max(rel_err(g_p[0], g_s[0]), rel_err(g_p[1], g_s[1])), 8)
        rows += [r_pg, r_sg]

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "trunk_bwd_variants.json"), "w") as f:
        json.dump({"batch": B, "rows": rows}, f, indent=1)
        f.write("\n")
    print("wrote trunk_bwd_variants.json")


if __name__ == "__main__":
    main()
