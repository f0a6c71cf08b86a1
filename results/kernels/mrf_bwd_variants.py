"""Which cotangent of the MRF grouped conv costs 31.8 ms/dispatch?

train_ceiling.json (round 5) names one op at mrf_xla.py:146 as the
single largest term of the flagship train dispatch: 31.8 ms, 29x its
MXU floor.  The custom VJP differentiates the zero-embedded DENSE conv
(ops/mrf_xla.py:_grouped_conv_f32_bwd), which emits two transpose
convs — dL/dp (a dense conv, same shape class as the forward) and
dL/dK_dense (a weight-grad conv, batch*space contracted).  This
harness times them separately at the exact flagship training geometry
(B=32, coarse 30x40, window 17x25, K=9, bf16 p / fp32 g) and measures
alternative formulations for whichever is slow.

Usage: python results/kernels/mrf_bwd_variants.py
Writes results/kernels/mrf_bwd_variants.json.
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
from jointpose.ops.mrf_xla import _DIMNUMS, _dense_embed
from jointpose.perf import aot_compile

B, HC, WC, K = 32, 30, 40, 9
WH, WW = 17, 25
STEPS = 10  # the fused dispatch runs 10 train steps


def make_inputs(seed=0):
    r = np.random.RandomState(seed)
    p = jnp.asarray(r.rand(B, HC, WC, K), jnp.bfloat16)
    kern = jnp.asarray(r.rand(WH, WW, 1, K * K), jnp.bfloat16)
    g = jnp.asarray(r.rand(B, HC, WC, K * K), jnp.float32)
    return p, kern, g


def dense(p_, kd_):
    out = lax.conv_general_dilated(
        p_, kd_, window_strides=(1, 1), padding="SAME",
        dimension_numbers=_DIMNUMS, precision=None,
    )
    return out.astype(jnp.float32)


def bwd_current(p, kern, g):
    _, vjp = jax.vjp(dense, p, _dense_embed(kern, K))
    return vjp(g)


def bwd_dp_only(p, kern, g):
    kd = _dense_embed(kern, K)
    _, vjp = jax.vjp(lambda p_: dense(p_, kd), p)
    return vjp(g)


def bwd_dk_only(p, kern, g):
    _, vjp = jax.vjp(lambda kd_: dense(p, kd_), _dense_embed(kern, K))
    return vjp(g)


# --- alternative dL/dk formulations (exact math, no dense embed) ----------
# dk[dy, dx, v, a] = sum_{b,y,x} p_pad[b, y+dy, x+dx, v] * g[b, y, x, v*K+a]
# with p padded by SAME-padding of the (WH, WW) window.


def _pad(p):
    ph, pw = WH // 2, WW // 2
    return jnp.pad(p, ((0, 0), (ph, ph), (pw, pw), (0, 0)))


def _dp_manual(p, kern, g, g_dtype):
    """dL/dp as an explicit dense conv: correlate g with the spatially
    flipped, io-transposed dense kernel (stride-1 SAME with odd windows
    is self-adjoint up to the flip).  g_dtype tests whether the fp32
    cotangent is what forces the slow conv."""
    kd = _dense_embed(kern, K)  # (WH, WW, K, K*K)
    kd_t = jnp.flip(kd, axis=(0, 1)).transpose(0, 1, 3, 2)  # (WH,WW,K*K,K)
    return lax.conv_general_dilated(
        g.astype(g_dtype), kd_t.astype(g_dtype), (1, 1), "SAME",
        dimension_numbers=_DIMNUMS, preferred_element_type=jnp.float32)


def dp_manual_bf16(p, kern, g):
    return _dp_manual(p, kern, g, jnp.bfloat16)


def dp_manual_f32(p, kern, g):
    return _dp_manual(p, kern, g, jnp.float32)


def dp_s2d_w8(p, kern, g):
    """dL/dp with width space-to-depth x8: the dense dp conv has only
    K=9 output channels (9/128 MXU lanes).  Packing 8 width-shifted
    outputs into lanes gives 72/128 occupancy at a 4*8/25 = 1.28x tap
    overcharge.  Width geometry: pad SAME (pw=12) then to 64 = 8x8
    blocks; output x = 8*Xo + ro comes from block columns Xo..Xo+3."""
    S = 8
    ph, pw = WH // 2, WW // 2
    kd = _dense_embed(kern, K)  # (WH, WW, K, K*K)
    kd_t = jnp.flip(kd, axis=(0, 1)).transpose(0, 1, 3, 2)  # (WH,WW,81,9)
    c_in = K * K
    # K2[dy, q, r*c_in + c, ro*K + v] = kd_t[dy, 8q + r - ro, c, v]
    q = jnp.arange(4)[:, None, None]          # block offset
    r = jnp.arange(S)[None, :, None]          # lane-in sub-position
    ro = jnp.arange(S)[None, None, :]         # output sub-position
    dx = S * q + r - ro                       # (4, S, S)
    valid = (dx >= 0) & (dx < WW)
    kd_g = kd_t[:, jnp.clip(dx, 0, WW - 1)]   # (WH, 4, S, S, 81, 9)
    kd_g = jnp.where(valid[None, ..., None, None], kd_g, 0)
    k2 = kd_g.transpose(0, 1, 2, 4, 3, 5).reshape(WH, 4, S * c_in, S * K)
    gp = jnp.pad(g, ((0, 0), (ph, ph), (pw, pw + (S - (WC + 2 * pw) % S) % S),
                     (0, 0)))
    wpad = gp.shape[2]
    g2 = gp.reshape(B, HC + WH - 1, wpad // S, S * c_in)
    out = lax.conv_general_dilated(
        g2.astype(jnp.bfloat16), k2.astype(jnp.bfloat16), (1, 1), "VALID",
        dimension_numbers=_DIMNUMS, preferred_element_type=jnp.float32)
    # out: (B, HC, wpad/S - 3, S*K); first WC//S... reshape to width
    out = out[:, :, : WC // S + (1 if WC % S else 0)]
    dp = out.reshape(B, HC, -1, S, K).reshape(B, HC, -1, K)[:, :, :WC]
    return dp


def dk_vmap_weightgrad(p, kern, g):
    """Per-source-joint dense weight-grad conv, vmapped over v.

    lhs = p_v transposed to (channels=B); rhs = g_v as kernel
    (Hc, Wc, B, K); out (1, WH, WW, K) per v."""
    pp = _pad(p)  # (B, HC+WH-1, WC+WW-1, K)

    def per_v(pv, gv):
        # pv: (Hp, Wp, B) after vmap slicing; gv: (HC, WC, B, K) kernel
        lhs = pv[None]
        rhs = gv.astype(pv.dtype)
        out = lax.conv_general_dilated(
            lhs, rhs, (1, 1), "VALID", dimension_numbers=_DIMNUMS,
            preferred_element_type=jnp.float32)
        return out[0]  # (WH, WW, K)

    pp_v = pp.transpose(3, 1, 2, 0)  # (K, Hp, Wp, B)
    g_v = g.reshape(B, HC, WC, K, K).transpose(3, 1, 2, 0, 4)  # (K,HC,WC,B,K)
    dk = jax.vmap(per_v, in_axes=(0, 0), out_axes=2)(pp_v, g_v)
    return dk.reshape(WH, WW, 1, K * K)


def dk_taps_dot(p, kern, g):
    """Tap-loop: one (WH*WW)-step scan of tiny einsums (true grouped
    FLOPs, no patch materialization)."""
    pp = _pad(p)
    g5 = g.reshape(B, HC, WC, K, K)

    def body(_, tap):
        dy, dx = tap // WW, tap % WW
        sl = lax.dynamic_slice(pp, (0, dy, dx, 0), (B, HC, WC, K))
        return None, jnp.einsum(
            "bhwv,bhwva->va", sl.astype(jnp.float32), g5,
            precision=lax.Precision.DEFAULT)

    _, dk = lax.scan(body, None, jnp.arange(WH * WW))
    return dk.reshape(WH, WW, 1, K * K)


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    p, kern, g = make_inputs()

    rows = []
    outs = {}

    def rec(name, fn, check_vs=None):
        try:
            compiled, cost = aot_compile(jax.jit(fn), p, kern, g)
            t = measure_device_time(compiled, p, kern, g, iters=8, warmup=2)
            assert t is not None, "no device events"
            out = compiled(p, kern, g)
        except Exception as e:  # noqa: BLE001
            rows.append({"name": name, "error": str(e)[:200]})
            print(f"{name:28s} FAILED {str(e)[:160]}", flush=True)
            return None
        ms = t.median_run_s * 1e3
        row = {"name": name, "device_ms_per_step": round(ms, 3),
               "ms_per_dispatch_k10": round(ms * STEPS, 2),
               "cost_gflop": round(cost["flops"] / 1e9, 2)}
        if check_vs is not None:
            ref = np.asarray(check_vs, np.float32)
            got = np.asarray(out if not isinstance(out, tuple) else out[-1],
                             np.float32).reshape(ref.shape)
            err = float(np.max(np.abs(got - ref) / (np.abs(ref) + 1e-3)))
            row["max_rel_err_vs_dense_vjp"] = round(err, 6)
        rows.append(row)
        print(json.dumps(row), flush=True)
        return out

    full = rec("bwd_current_dense_vjp", bwd_current)
    dp_ref = np.asarray(full[0], np.float32)
    rec("bwd_dp_only", bwd_dp_only)
    dk_ref = rec("bwd_dk_only", bwd_dk_only)
    rec("dp_manual_bf16", dp_manual_bf16, check_vs=dp_ref)
    rec("dp_manual_f32", dp_manual_f32, check_vs=dp_ref)
    rec("dp_s2d_w8", dp_s2d_w8, check_vs=dp_ref)
    # reference dk for parity: diagonal blocks of the dense cotangent
    kd_cot = np.asarray(dk_ref[0], np.float32).reshape(WH, WW, K, K, K)
    dk_diag = np.diagonal(kd_cot, axis1=2, axis2=3).transpose(0, 1, 3, 2)
    dk_ref_flat = dk_diag.reshape(WH, WW, 1, K * K)
    rec("dk_vmap_weightgrad", dk_vmap_weightgrad, check_vs=dk_ref_flat)
    rec("dk_taps_dot", dk_taps_dot, check_vs=dk_ref_flat)

    out = {
        "backend": jax.default_backend(),
        "geometry": {"batch": B, "hw": [HC, WC], "window": [WH, WW], "k": K,
                     "p_dtype": "bfloat16", "g_dtype": "float32"},
        "note": ("profiler-trace device ms per single backward; the "
                 "train_ceiling trace charges the combined backward "
                 "31.8+4.4 ms per K=10 dispatch"),
        "rows": rows,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "mrf_bwd_variants.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote mrf_bwd_variants.json")


if __name__ == "__main__":
    main()
