"""Full-size FLIC-shaped smoke: uint8 host pipeline at real scale.

Round-2 verdict weak #5 / next-round #6: the FLIC path stored fp32 host
arrays (~4.1 GB for the train split) and had only ever been exercised
on miniature synthesized .mat files.  This script synthesizes a
FULL-SIZE FLIC directory (3987 train + 1016 test examples.mat entries +
720x480 JPEG frames), loads it through the real loader (uint8
end-to-end after round 3), runs a short detector training stage on the
host-resident path, and records peak host RSS.

Expected: host RSS ~1.5 GB (uint8 splits: 3987*240*360*3 = 1.0 GB train
+ 0.26 GB test) instead of ~5 GB fp32.

Usage: python results/flic_fullsize/make_and_train.py [root_dir] [platform]

The optional second arg forces the JAX platform ('cpu' keeps the TPU
free for concurrent measurement jobs; the smoke's subject is the HOST
pipeline, not device speed).
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def synthesize_flic(root: str, n_train: int = 3987, n_test: int = 1016) -> None:
    import scipy.io
    from PIL import Image

    from jointpose.data.flic import _FLIC_COLUMNS

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rs = np.random.RandomState(0)
    n = n_train + n_test
    examples = []
    # Smooth low-frequency frames (cheap to JPEG-encode, realistic size);
    # one 64x96 noise field upsampled per image, plus per-image offset.
    base = rs.randint(0, 255, (64, 96, 3), np.uint8)
    t0 = time.time()
    for i in range(n):
        coords = np.full((2, 29), np.nan)
        for name, col in _FLIC_COLUMNS.items():
            if name in ("leye", "reye"):
                continue
            coords[:, col - 1] = rs.uniform([60, 60], [720 - 60, 480 - 60])
        fname = f"frame{i:05d}.jpg"
        img = np.asarray(
            Image.fromarray(np.roll(base, i % 64, axis=0)).resize((720, 480))
        )
        Image.fromarray(img).save(os.path.join(root, "images", fname), quality=60)
        examples.append((fname, coords, float(i < n_train), float(i >= n_train)))
        if i % 1000 == 0:
            print(f"  frame {i}/{n} ({time.time()-t0:.0f}s)", flush=True)
    dt = [("filepath", object), ("coords", object), ("istrain", object), ("istest", object)]
    arr = np.zeros((len(examples),), dtype=dt)
    for i, ex in enumerate(examples):
        arr[i] = ex
    scipy.io.savemat(os.path.join(root, "examples.mat"), {"examples": arr})
    print(f"synthesized {n} examples in {time.time()-t0:.0f}s", flush=True)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flic_fullsize"
    if len(sys.argv) > 2:
        from jointpose.cli import apply_platform

        apply_platform(sys.argv[2])
    if not os.path.exists(os.path.join(root, "examples.mat")):
        synthesize_flic(root)

    import dataclasses
    import subprocess

    from jointpose.configs import get_config
    from jointpose.train import fit

    # The PIPELINE's own footprint, isolated: a child process that only
    # parses examples.mat, decodes/resizes all 5003 JPEGs, and holds
    # both uint8 splits.  (Measuring it inside the training process
    # conflates it with XLA's host-side buffers — on platform=cpu the
    # "device" arena alone is many GB and says nothing about the
    # loader; round-4 finding.)
    load_probe = subprocess.run(
        [sys.executable, "-c", (
            "import resource, sys, dataclasses\n"
            "sys.path.insert(0, %r)\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from jointpose.configs import get_config\n"
            "from jointpose.data.pipeline import make_dataset\n"
            "cfg = dataclasses.replace(get_config('single_scale').data, "
            "source='flic', flic_dir=%r)\n"
            "train, test = make_dataset(cfg)\n"
            "assert train.host_resident and test.host_resident\n"
            "vmrss = [l for l in open('/proc/self/status') "
            "if l.startswith('VmRSS')][0].split()[1]\n"
            "print(train.size, test.size, "
            "resource.getrusage(resource.RUSAGE_SELF).ru_maxrss, vmrss)\n"
        ) % (os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), root)],
        capture_output=True, text=True, check=True,
    )
    n_train, n_test, loader_rss_kb, loader_res_kb = load_probe.stdout.split()[-4:]

    config = get_config("single_scale")
    config = config.replace(
        data=dataclasses.replace(config.data, source="flic", flic_dir=root),
        train=dataclasses.replace(
            config.train, detector_steps=30, joint_steps=0,
            eval_every=30, log_every=10, batch_size=32,
        ),
    )
    t0 = time.time()
    result = fit(config, workdir=os.path.join(root, "run"), eval_max_batches=4)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {
        "train_split": int(n_train),
        "test_split": int(n_test),
        "steps": 30,
        "seconds": round(time.time() - t0, 1),
        "loader_only_peak_rss_gb": round(int(loader_rss_kb) / 1e6, 2),
        "loader_only_resident_rss_gb": round(int(loader_res_kb) / 1e6, 2),
        "peak_host_rss_gb": round(rss_gb, 2),
        "rss_note": "loader peak includes the transient np.stack copy "
                    "(per-image list + stacked array both live); resident "
                    "is the held uint8 splits (~1.3 GB vs ~5 GB fp32). "
                    "peak_host_rss is the full training process incl. "
                    "XLA host buffers (platform-dependent).",
        "final_loss": float(result.metrics.get("pdj_at_05_wrist_elbow", -1)),
    }
    print(json.dumps(out), flush=True)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "fullsize_smoke.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
