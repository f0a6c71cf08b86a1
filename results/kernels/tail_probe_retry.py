"""Retry the two Mosaic compile failures from round 4b (verdict #9).

`tail_variants.json` recorded `dma0_copy_same_specs` and
`bmaj_kernel_only` failing with an HTTP 500 from the remote Mosaic
compile helper (no diagnostic), and `tail_sweep.json` recorded TB=64 at
the production tail failing the same way — possibly transient service
errors, possibly deterministic Mosaic limits.  This probes each
COMPILE-ONLY (lower().compile() exercises the helper without touching
the chip, so it can run while training holds the TPU), twice per
candidate, and records whether the failure reproduces and with what
error text — turning "best known-achievable" into a root-caused note.

Usage: python results/kernels/tail_probe_retry.py
Writes results/kernels/tail_probe_retry.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from jointpose.ops import fft_conv as fc
import tail_variants as tv


def shapes(dt=jnp.bfloat16):
    g_ = tv.GEOM
    b, h, w, ci, co, kh, kw = (g_[k] for k in ("b", "h", "w", "ci", "co", "kh", "kw"))
    ph = -(-(h + kh - 1) // 8) * 8
    g = (w + kw - 1) // 2 + 1
    S = jax.ShapeDtypeStruct
    return dict(
        xr=S((g, ph, b, ci), dt), xi=S((g, ph, b, ci), dt),
        ar=S((g, kh, ci, co), dt), ai=S((g, kh, ci, co), dt),
        grr=S((ph, kh), dt), gri=S((ph, kh), dt),
        irr=S((ph, h), dt), iri=S((ph, h), dt),
        x_merged=S((g, ph, b, 2 * ci), dt),
        xbm=S((g, b, ph, 2 * ci), dt),
    )


def compile_probe(name, fn, args, attempts=2):
    out = []
    for i in range(attempts):
        t0 = time.time()
        try:
            jax.jit(fn).lower(*args).compile()
            out.append({"attempt": i, "ok": True,
                        "compile_s": round(time.time() - t0, 1)})
            print(f"{name}[{i}]: OK ({out[-1]['compile_s']}s)", flush=True)
            break  # one success settles it
        except Exception as e:
            msg = f"{type(e).__name__}: {str(e)[:300]}"
            out.append({"attempt": i, "ok": False, "error": msg,
                        "compile_s": round(time.time() - t0, 1)})
            print(f"{name}[{i}]: FAILED {msg[:120]}", flush=True)
    return out


def main():
    s = shapes()
    h = tv.GEOM["h"]
    prec = fc._round_prec(None)
    rows = {}

    rows["production_resident_tb64_cot128"] = compile_probe(
        "production_resident_tb64_cot128",
        functools.partial(fc._tail_call_kdft_resident, h=h, tb=64, cot=128,
                          prec=prec),
        (s["xr"], s["xi"], s["ar"], s["ai"], s["grr"], s["gri"],
         s["irr"], s["iri"]),
    )
    rows["dma0_copy_same_specs"] = compile_probe(
        "dma0_copy_same_specs",
        functools.partial(tv.dma0, tb=16, cot=128, h=h),
        (s["xr"], s["xi"], s["ar"], s["ai"]),
    )
    rows["bmaj_kernel_only"] = compile_probe(
        "bmaj_kernel_only",
        functools.partial(tv.bmaj, tb=16, cot=128, h=h),
        (s["xbm"], s["ar"], s["ai"], s["grr"], s["gri"],
         s["irr"], s["iri"]),
    )

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "tail_probe_retry.json"), "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print("wrote tail_probe_retry.json", flush=True)


if __name__ == "__main__":
    main()
