"""Regenerate the C12 figures from the CURRENT headline models
(round-4 verdict weak #6: the only committed figures were round-1).

Produces, under results/figures_r5/:
  - heatmaps_flagship_shear_r4.png — input + MRF heatmap overlays from
    the deployed flagship checkpoint (runs/flagship_shear_r4, keep-best)
  - priors_flagship_shear_r4.png — the TRAINED pairwise kernels
    (softplus of the spatial_model params — what the joint stage
    actually learned, not just the histogram initialization)
  - pdj_flagship_shear_r4.png — per-joint PDJ curves of the fp32
    refine eval (results/flagship_shear_r4/eval_refine.json)
  - pdj_fp32_vs_int8.png — fp32 vs int8 deployment on one axes
    (refine + TTA pairs, full 1016-example split, both measured on the
    real chip in round 4)

Forward passes run on CPU (--platform semantics: figures need one
batch, not throughput); the PDJ curves come from the committed
full-split on-chip evals.

Usage: python results/figures_r5/make_figures.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
CKPT = os.path.join(REPO, "runs", "flagship_shear_r4", "checkpoints")


def heatmaps_and_priors():
    from jointpose.checkpoint import reconcile_config
    from jointpose.configs import get_config
    from jointpose.data.pipeline import make_dataset
    from jointpose.models.pose import PoseModel
    from jointpose.ops.heatmaps import model_probs
    from jointpose.predict import restore_params
    from jointpose.visualize import save_heatmap_overlays, save_prior_grid

    config = reconcile_config(get_config("flagship"), CKPT, None)
    params, step = restore_params(config, CKPT, None, best=True)
    print(f"flagship_shear_r4 checkpoint step {step}", flush=True)

    _, test_ds = make_dataset(config.data)
    batch = test_ds.get_batch(jnp.arange(4, dtype=jnp.int32))
    model = PoseModel(config)
    probs = model_probs(jax.jit(model.apply)(params, batch["image"]))
    save_heatmap_overlays(
        np.asarray(batch["image"]),
        np.asarray(probs),
        os.path.join(HERE, "heatmaps_flagship_shear_r4.png"),
        joints_xy=np.asarray(batch["joints"]),
    )
    print("wrote heatmaps_flagship_shear_r4.png", flush=True)

    # The LEARNED pairwise kernels: softplus of the spatial-model
    # parameters, (wh, ww, Kv, Ka) — k[..., v, a] = prior of joint a's
    # position given v (models/mrf.py parameterization).
    kern_raw = params["params"]["spatial_model"]["raw_kernels"]
    kernels = np.asarray(jax.nn.softplus(kern_raw))
    save_prior_grid(
        kernels, os.path.join(HERE, "priors_flagship_shear_r4.png")
    )
    print("wrote priors_flagship_shear_r4.png", flush=True)


def pdj_figures():
    from jointpose.visualize import save_pdj_curves

    with open(os.path.join(REPO, "results/flagship_shear_r4/eval_refine.json")) as f:
        fp32_refine = json.load(f)
    save_pdj_curves(
        fp32_refine, os.path.join(HERE, "pdj_flagship_shear_r4.png")
    )
    print("wrote pdj_flagship_shear_r4.png", flush=True)

    # fp32 vs int8 on one axes: wrist+elbow mean (the headline metric)
    # and the all-joint mean, refine and TTA variants.
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from jointpose import skeleton

    headline_idx = [skeleton.JOINTS.index(n) for n in skeleton.HEADLINE_JOINTS]
    series = [
        ("fp32 refine", "results/flagship_shear_r4/eval_refine.json", "-", "C0"),
        ("fp32 TTA", "results/flagship_shear_r4/eval_tta.json", "--", "C0"),
        ("int8 refine", "results/quant_r4/int8_full_split_tpu.json", "-", "C3"),
        ("int8 TTA", "results/quant_r4/int8_full_split_tta_tpu.json", "--", "C3"),
    ]
    fig, ax = plt.subplots(figsize=(6, 4))
    for label, path, style, color in series:
        with open(os.path.join(REPO, path)) as f:
            ev = json.load(f)
        t = np.asarray(ev["thresholds"])
        c = np.asarray(ev["pdj_curves"])[:, headline_idx].mean(axis=1)
        ax.plot(t, c, style, color=color, label=f"{label} "
                f"(PDJ@0.05 {ev['pdj_at_05_wrist_elbow']:.4f})", linewidth=1.4)
    ax.axvline(0.05, color="gray", linewidth=0.6)
    ax.set_xlabel("threshold (fraction of torso diameter)")
    ax.set_ylabel("PDJ (wrist+elbow mean)")
    ax.set_ylim(0.5, 1.005)
    ax.legend(fontsize=8, loc="lower right")
    ax.set_title("flagship_shear_r4: fp32 vs int8 deployment (full split)")
    fig.tight_layout()
    out = os.path.join(HERE, "pdj_fp32_vs_int8.png")
    fig.savefig(out, dpi=110)
    plt.close(fig)
    print("wrote pdj_fp32_vs_int8.png", flush=True)


if __name__ == "__main__":
    heatmaps_and_priors()
    pdj_figures()
