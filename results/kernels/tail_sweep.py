"""Sweep resident-tail tilings at the paper-head geometry (round 3).

The selected (TB=16, CoT=128) resident tail measures ~6.7 ms at the
paper head — 27% effective HBM with ~4 us/grid-step, i.e. step-overhead
bound, not bandwidth bound.  This times every tiling that compiles so
the VMEM model's preference order can follow measurements instead of
block-size heuristics.

Usage: python results/kernels/tail_sweep.py
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from jointpose.devtime import measure_device_time
from jointpose.ops import fft_conv as fc


def main():
    b, h, w, ci, co, kh, kw = 128, 60, 90, 128, 512, 9, 9
    ph = -(-(h + kh - 1) // 8) * 8
    pw = w + kw - 1
    g = pw // 2 + 1
    prec = fc._round_prec(None)
    r = jax.random.split(jax.random.PRNGKey(0), 8)
    dt = jnp.bfloat16
    xr = (jax.random.normal(r[0], (g, ph, b, ci)) * 0.1).astype(dt)
    xi = (jax.random.normal(r[1], (g, ph, b, ci)) * 0.1).astype(dt)
    ar = (jax.random.normal(r[2], (g, kh, ci, co)) * 0.05).astype(dt)
    ai = (jax.random.normal(r[3], (g, kh, ci, co)) * 0.05).astype(dt)
    grr = jax.random.normal(r[4], (ph, kh)).astype(dt)
    gri = jax.random.normal(r[5], (ph, kh)).astype(dt)
    irr = jax.random.normal(r[6], (ph, h)).astype(dt)
    iri = jax.random.normal(r[7], (ph, h)).astype(dt)

    rows = []
    for cot in (256, 128, 64):
        if co % cot:
            continue
        for tb in (128, 64, 32, 16, 8):
            if b % tb:
                continue
            ok = fc._tail_compile_ok(
                g, ph, b, ci, co, h, jnp.dtype(dt).name, tb, cot, ph, prec,
                kdft_kh=kh, resident=True,
            )
            if not ok:
                rows.append({"tb": tb, "cot": cot, "ok": False})
                print(json.dumps(rows[-1]), flush=True)
                continue
            call = functools.partial(
                fc._tail_call_kdft_resident, h=h, tb=tb, cot=cot, prec=prec
            )

            def bench_fn(*a):
                return call(*a)

            t = measure_device_time(
                jax.jit(bench_fn), xr, xi, ar, ai, grr, gri, irr, iri,
                iters=6, warmup=2, program_name="bench_fn",
            )
            ms = None if t is None else round(t.median_run_s * 1e3, 3)
            steps = g * (co // cot) * (b // tb)
            rows.append({"tb": tb, "cot": cot, "ok": True, "device_ms": ms,
                         "grid_steps": steps,
                         "us_per_step": None if ms is None else round(ms * 1e3 / steps, 2),
                         "in_model": (tb, cot) in fc._tail_tiles_resident(
                             ph, h, b, ci, co, 2, kh)})
            print(json.dumps(rows[-1]), flush=True)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "tail_sweep.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote tail_sweep.json")


if __name__ == "__main__":
    main()
