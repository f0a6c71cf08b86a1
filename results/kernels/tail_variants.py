"""Round-4b experiments on the resident-K_f fused tail (paper head).

The production resident tail (TB=16, CoT=128) measures ~6.7 ms at the
paper-head geometry while moving 1.85 GB/batch — ~274 GB/s effective,
far below the chip's HBM peak — and the round-4 staged experiment
showed per-step overhead matters (results/kernels/
tail_staged_experiment.json).  This script separates the candidate
explanations by measurement:

  dma0    a compute-free copy kernel with EXACTLY the production
          block specs and grid: its time is the pure DMA cost of the
          production access pattern.  If dma0 ~ production time, the
          kernel is DMA-bound and layout is the lever; if dma0 is
          small, per-step overhead / compute is the lever.
  merged  production kernel but X re/im as ONE (g, ph, b, 2ci) ref:
          halves the X DMA descriptor count per step, same bytes.
  bmaj    X in batch-major (g, b, ph, ci) layout so each grid step
          fetches ONE fully contiguous 295 KB X block (the production
          (g, ph, b, ci) layout scatters the block over ph strides).
          Timed with and without the XLA-side transpose that would
          produce this layout from the forward DFTs' natural order.

Usage: python results/kernels/tail_variants.py [--quick]
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jointpose.devtime import measure_device_time
from jointpose.ops import fft_conv as fc

GEOM = dict(b=128, h=60, w=90, ci=128, co=512, kh=9, kw=9)


def _inputs(dt=jnp.bfloat16):
    b, h, w, ci, co, kh, kw = (GEOM[k] for k in ("b", "h", "w", "ci", "co", "kh", "kw"))
    ph = -(-(h + kh - 1) // 8) * 8
    g = (w + kw - 1) // 2 + 1
    r = jax.random.split(jax.random.PRNGKey(0), 8)
    xr = (jax.random.normal(r[0], (g, ph, b, ci)) * 0.1).astype(dt)
    xi = (jax.random.normal(r[1], (g, ph, b, ci)) * 0.1).astype(dt)
    ar = (jax.random.normal(r[2], (g, kh, ci, co)) * 0.05).astype(dt)
    ai = (jax.random.normal(r[3], (g, kh, ci, co)) * 0.05).astype(dt)
    grr = jax.random.normal(r[4], (ph, kh)).astype(dt)
    gri = jax.random.normal(r[5], (ph, kh)).astype(dt)
    irr = jax.random.normal(r[6], (ph, h)).astype(dt)
    iri = jax.random.normal(r[7], (ph, h)).astype(dt)
    return dict(xr=xr, xi=xi, ar=ar, ai=ai, grr=grr, gri=gri, irr=irr, iri=iri,
                g=g, ph=ph)


# ---------------------------------------------------------------- dma0

def _copy_kernel(xr_ref, xi_ref, ar_ref, ai_ref, t_ref):
    """Touch every input block, write the out block — no matmuls."""
    # A cheap VPU reduction so Mosaic cannot elide the input fetches.
    s = (xr_ref[0, 0, 0, 0] + xi_ref[0, 0, 0, 0]
         + ar_ref[0, 0, 0, 0] + ai_ref[0, 0, 0, 0]).astype(t_ref.dtype)
    t_ref[:] = jnp.full_like(t_ref, s)


def dma0(xr, xi, ar, ai, *, tb=16, cot=128, h=60):
    g, ph, b, ci = xr.shape
    kh, co = ar.shape[1], ar.shape[-1]
    grid = (g, co // cot, b // tb)
    return pl.pallas_call(
        _copy_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ph, tb, ci), lambda gg, o, ib: (gg, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ph, tb, ci), lambda gg, o, ib: (gg, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, ci, cot), lambda gg, o, ib: (gg, 0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, ci, cot), lambda gg, o, ib: (gg, 0, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((h, 2, 1, tb, cot), lambda gg, o, ib: (0, 0, gg, ib, o),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((h, 2, g, b, co), xr.dtype)],
        interpret=fc._use_interpret(),
    )(xr, xi, ar, ai)[0]


# -------------------------------------------------------------- merged

def _merged_kernel(x_ref, ar_ref, ai_ref, grr_ref, gri_ref, irr_ref, iri_ref,
                   t_ref, kfr, kfi, *, precision, ci):
    ib = pl.program_id(2)

    @pl.when(ib == 0)
    def _():
        ar = ar_ref[0]
        ai = ai_ref[0]
        kh, _, cot = ar.shape
        a_r2 = ar.reshape(kh, ci * cot)
        a_i2 = ai.reshape(kh, ci * cot)
        mmk = functools.partial(
            lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ph = grr_ref.shape[0]
        step = 8
        for p0 in range(0, ph, step):
            grr = grr_ref[p0:p0 + step]
            gri = gri_ref[p0:p0 + step]
            kfr[p0:p0 + step] = (mmk(grr, a_r2) - mmk(gri, a_i2)).reshape(
                step, ci, cot).astype(kfr.dtype)
            kfi[p0:p0 + step] = (mmk(grr, a_i2) + mmk(gri, a_r2)).reshape(
                step, ci, cot).astype(kfi.dtype)

    x = x_ref[0]  # (Ph, TB, 2*Ci) — re in [:ci], im in [ci:]
    xr = x[:, :, :ci]
    xi = x[:, :, ci:]
    kr, ki = kfr[:], kfi[:]
    dn = (((2,), (1,)), ((0,), (0,)))
    bdot = functools.partial(
        lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=precision,
    )
    rre = bdot(xr, kr) + bdot(xi, ki)
    rim = bdot(xi, kr) - bdot(xr, ki)
    ph, tb, cot = rre.shape
    irr, iri = irr_ref[:], iri_ref[:]
    h = irr.shape[1]
    mm = functools.partial(
        lax.dot_general, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    r2 = rre.reshape(ph, tb * cot).astype(x.dtype)
    i2 = rim.reshape(ph, tb * cot).astype(x.dtype)
    tre = mm(irr, r2) - mm(iri, i2)
    tim = mm(irr, i2) + mm(iri, r2)
    t_ref[:, 0, 0] = tre.reshape(h, tb, cot).astype(t_ref.dtype)
    t_ref[:, 1, 0] = tim.reshape(h, tb, cot).astype(t_ref.dtype)


def merged(x, ar, ai, grr, gri, irr, iri, *, tb=16, cot=128, h=60, prec=None):
    g, ph, b, ci2 = x.shape
    ci = ci2 // 2
    kh, co = ar.shape[1], ar.shape[-1]
    prec = fc._round_prec(prec)
    grid = (g, co // cot, b // tb)
    return pl.pallas_call(
        functools.partial(_merged_kernel, precision=prec, ci=ci),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ph, tb, 2 * ci), lambda gg, o, ib: (gg, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, ci, cot), lambda gg, o, ib: (gg, 0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, ci, cot), lambda gg, o, ib: (gg, 0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, kh), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, kh), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, h), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, h), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((h, 2, 1, tb, cot), lambda gg, o, ib: (0, 0, gg, ib, o),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((h, 2, g, b, co), x.dtype)],
        scratch_shapes=[pltpu.VMEM((ph, ci, cot), x.dtype)] * 2,
        interpret=fc._use_interpret(),
    )(x, ar, ai, grr, gri, irr, iri)[0]


# ---------------------------------------------------------------- bmaj

def _bmaj_kernel(x_ref, ar_ref, ai_ref, grr_ref, gri_ref, irr_ref, iri_ref,
                 t_ref, kfr, kfi, *, precision, ci):
    ib = pl.program_id(2)

    @pl.when(ib == 0)
    def _():
        ar = ar_ref[0]
        ai = ai_ref[0]
        kh, _, cot = ar.shape
        a_r2 = ar.reshape(kh, ci * cot)
        a_i2 = ai.reshape(kh, ci * cot)
        mmk = functools.partial(
            lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ph = grr_ref.shape[0]
        step = 8
        for p0 in range(0, ph, step):
            grr = grr_ref[p0:p0 + step]
            gri = gri_ref[p0:p0 + step]
            kfr[p0:p0 + step] = (mmk(grr, a_r2) - mmk(gri, a_i2)).reshape(
                step, ci, cot).astype(kfr.dtype)
            kfi[p0:p0 + step] = (mmk(grr, a_i2) + mmk(gri, a_r2)).reshape(
                step, ci, cot).astype(kfi.dtype)

    x = x_ref[0]  # (TB, Ph, 2*Ci) — batch-major block
    xr = x[:, :, :ci]
    xi = x[:, :, ci:]
    kr, ki = kfr[:], kfi[:]
    # Contract Ci, batch over Ph — Ph is dim 1 of x here, dim 0 of K_f.
    dn = (((2,), (1,)), ((1,), (0,)))
    bdot = functools.partial(
        lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=precision,
    )
    rre = bdot(xr, kr) + bdot(xi, ki)  # (Ph, TB, CoT)
    rim = bdot(xi, kr) - bdot(xr, ki)
    ph, tb, cot = rre.shape
    irr, iri = irr_ref[:], iri_ref[:]
    h = irr.shape[1]
    mm = functools.partial(
        lax.dot_general, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    r2 = rre.reshape(ph, tb * cot).astype(x.dtype)
    i2 = rim.reshape(ph, tb * cot).astype(x.dtype)
    tre = mm(irr, r2) - mm(iri, i2)
    tim = mm(irr, i2) + mm(iri, r2)
    t_ref[:, 0, 0] = tre.reshape(h, tb, cot).astype(t_ref.dtype)
    t_ref[:, 1, 0] = tim.reshape(h, tb, cot).astype(t_ref.dtype)


def bmaj(xbm, ar, ai, grr, gri, irr, iri, *, tb=16, cot=128, h=60, prec=None):
    g, b, ph, ci2 = xbm.shape
    ci = ci2 // 2
    kh, co = ar.shape[1], ar.shape[-1]
    prec = fc._round_prec(prec)
    grid = (g, co // cot, b // tb)
    return pl.pallas_call(
        functools.partial(_bmaj_kernel, precision=prec, ci=ci),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, ph, 2 * ci), lambda gg, o, ib: (gg, ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, ci, cot), lambda gg, o, ib: (gg, 0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, ci, cot), lambda gg, o, ib: (gg, 0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, kh), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, kh), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, h), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, h), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((h, 2, 1, tb, cot), lambda gg, o, ib: (0, 0, gg, ib, o),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((h, 2, g, b, co), xbm.dtype)],
        scratch_shapes=[pltpu.VMEM((ph, ci, cot), xbm.dtype)] * 2,
        interpret=fc._use_interpret(),
    )(xbm, ar, ai, grr, gri, irr, iri)[0]


def check_cpu():
    """Interpret-mode numerics check of the variants at reduced geometry."""
    import numpy as np
    GEOM.update(b=16, h=16, w=24, ci=128, co=128, kh=9, kw=9)
    i = _inputs()
    h = GEOM["h"]
    prec = fc._round_prec(None)
    ref = fc._tail_call_kdft_resident(
        i["xr"], i["xi"], i["ar"], i["ai"], i["grr"], i["gri"],
        i["irr"], i["iri"], h=h, tb=8, cot=128, prec=prec)
    x_merged = jnp.concatenate([i["xr"], i["xi"]], axis=-1)
    rest = (i["ar"], i["ai"], i["grr"], i["gri"], i["irr"], i["iri"])
    m = merged(x_merged, *rest, tb=8, cot=128, h=h)
    xbm = jnp.concatenate(
        [i["xr"].transpose(0, 2, 1, 3), i["xi"].transpose(0, 2, 1, 3)], axis=-1)
    bm = bmaj(xbm, *rest, tb=8, cot=128, h=h)
    ct = contig(x_merged, *rest, tb=8, cot=128, h=h)
    # (no, g, b, h, 2, cot) -> (h, 2, g, b, no*cot)
    ct = ct.transpose(3, 4, 1, 2, 0, 5).reshape(ref.shape)
    for name, got in (("merged", m), ("bmaj", bm), ("contig", ct)):
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
        print(f"{name}: max abs err {err:.3e} (scale {scale:.3e})")
        assert err <= 1e-2 * scale + 1e-4, (name, err, scale)
    print("check_cpu OK")


# ------------------------------------------------------------ contig

def _contig_kernel(x_ref, ar_ref, ai_ref, grr_ref, gri_ref, irr_ref, iri_ref,
                   t_ref, kfr, kfi, *, precision, ci):
    """Merged-X kernel but the output block is (TB, H, 2, CoT) inside a
    (Co/CoT, G, B, H, 2, CoT) array — every sliced dim (o, g, b) sits
    above every full dim, so the whole 983 KB out block is ONE
    contiguous HBM range instead of 120 scattered 4 KB tiles.  Costs an
    in-kernel (H, TB) -> (TB, H) relayout; this measures whether the
    DMA win pays for the VPU shuffle."""
    ib = pl.program_id(2)

    @pl.when(ib == 0)
    def _():
        ar = ar_ref[0]
        ai = ai_ref[0]
        kh, _, cot = ar.shape
        a_r2 = ar.reshape(kh, ci * cot)
        a_i2 = ai.reshape(kh, ci * cot)
        mmk = functools.partial(
            lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ph = grr_ref.shape[0]
        step = 8
        for p0 in range(0, ph, step):
            grr = grr_ref[p0:p0 + step]
            gri = gri_ref[p0:p0 + step]
            kfr[p0:p0 + step] = (mmk(grr, a_r2) - mmk(gri, a_i2)).reshape(
                step, ci, cot).astype(kfr.dtype)
            kfi[p0:p0 + step] = (mmk(grr, a_i2) + mmk(gri, a_r2)).reshape(
                step, ci, cot).astype(kfi.dtype)

    x = x_ref[0]
    xr = x[:, :, :ci]
    xi = x[:, :, ci:]
    kr, ki = kfr[:], kfi[:]
    dn = (((2,), (1,)), ((0,), (0,)))
    bdot = functools.partial(
        lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=precision,
    )
    rre = bdot(xr, kr) + bdot(xi, ki)
    rim = bdot(xi, kr) - bdot(xr, ki)
    ph, tb, cot = rre.shape
    irr, iri = irr_ref[:], iri_ref[:]
    h = irr.shape[1]
    mm = functools.partial(
        lax.dot_general, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    r2 = rre.reshape(ph, tb * cot).astype(x.dtype)
    i2 = rim.reshape(ph, tb * cot).astype(x.dtype)
    tre = mm(irr, r2) - mm(iri, i2)   # (H, TB*CoT) fp32
    tim = mm(irr, i2) + mm(iri, r2)
    tre = tre.reshape(h, tb, cot).transpose(1, 0, 2)  # (TB, H, CoT)
    tim = tim.reshape(h, tb, cot).transpose(1, 0, 2)
    t_ref[0, 0, :, :, 0] = tre.astype(t_ref.dtype)
    t_ref[0, 0, :, :, 1] = tim.astype(t_ref.dtype)


def contig(x, ar, ai, grr, gri, irr, iri, *, tb=16, cot=128, h=60, prec=None):
    g, ph, b, ci2 = x.shape
    ci = ci2 // 2
    kh, co = ar.shape[1], ar.shape[-1]
    prec = fc._round_prec(prec)
    grid = (g, co // cot, b // tb)
    return pl.pallas_call(
        functools.partial(_contig_kernel, precision=prec, ci=ci),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ph, tb, 2 * ci), lambda gg, o, ib: (gg, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, ci, cot), lambda gg, o, ib: (gg, 0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, ci, cot), lambda gg, o, ib: (gg, 0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, kh), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, kh), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, h), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, h), lambda gg, o, ib: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tb, h, 2, cot),
                         lambda gg, o, ib: (o, gg, ib, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((co // cot, g, b, h, 2, cot), x.dtype)],
        scratch_shapes=[pltpu.VMEM((ph, ci, cot), x.dtype)] * 2,
        interpret=fc._use_interpret(),
    )(x, ar, ai, grr, gri, irr, iri)[0]


def main():
    i = _inputs()
    h = GEOM["h"]
    rows = {}

    def time_it(name, fn, *args):
        def bench_fn(*a):
            return fn(*a)

        try:
            t = measure_device_time(jax.jit(bench_fn), *args, iters=6,
                                    warmup=2, program_name="bench_fn")
        except Exception as e:  # compile crash etc. — record, keep going
            rows[name] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
            print(f"{name}: {rows[name]}", flush=True)
            return
        ms = None if t is None else round(t.median_run_s * 1e3, 3)
        rows[name] = ms
        print(f"{name}: {ms} ms", flush=True)

    # Production baseline (library code path) at both batch tiles.
    prec = fc._round_prec(None)
    for tb in (16, 32):
        time_it(f"production_resident_tb{tb}_cot128",
                functools.partial(fc._tail_call_kdft_resident, h=h, tb=tb,
                                  cot=128, prec=prec),
                i["xr"], i["xi"], i["ar"], i["ai"], i["grr"], i["gri"],
                i["irr"], i["iri"])

    # Pure-DMA cost of the same access pattern.
    time_it("dma0_copy_same_specs", functools.partial(dma0, tb=16, cot=128, h=h),
            i["xr"], i["xi"], i["ar"], i["ai"])

    x_merged = jax.block_until_ready(
        jnp.concatenate([i["xr"], i["xi"]], axis=-1))

    # Merged re/im X operand, both batch tiles.
    for tb in (16, 32):
        time_it(f"merged_reim_x_tb{tb}",
                functools.partial(merged, tb=tb, cot=128, h=h),
                x_merged, i["ar"], i["ai"], i["grr"], i["gri"],
                i["irr"], i["iri"])

    # Contiguous-output layout (in-kernel relayout cost included).
    for tb in (16, 32):
        time_it(f"contig_out_tb{tb}", functools.partial(contig, tb=tb, cot=128, h=h),
                x_merged, i["ar"], i["ai"], i["grr"], i["gri"],
                i["irr"], i["iri"])

    # Batch-major X last: its block shape crashed the Mosaic compile
    # helper once (see tail_variants.json history) — keep it from
    # blocking the other measurements.
    xbm = jnp.concatenate(
        [i["xr"].transpose(0, 2, 1, 3), i["xi"].transpose(0, 2, 1, 3)], axis=-1
    )
    xbm = jax.block_until_ready(xbm)
    time_it("bmaj_kernel_only", functools.partial(bmaj, tb=16, cot=128, h=h),
            xbm, i["ar"], i["ai"], i["grr"], i["gri"], i["irr"], i["iri"])

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "tail_variants.json"), "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print("wrote tail_variants.json")


if __name__ == "__main__":
    if "--check" in sys.argv:
        import jax as _j
        _j.config.update("jax_platforms", "cpu")
        os.environ["JOINTPOSE_PALLAS_INTERPRET"] = "1"
        check_cpu()
    else:
        main()
