"""Synthesize a LEARNABLE full-size FLIC directory (round-5 verdict #3).

`make_and_train.py`'s directory proved the loader's scale/RSS story but
draws joint labels independently of the frames — unlearnable by
construction (a round-5 hostdata training run on it converged to PDJ
0.001, as it must).  For the data-path parity proof we need the SAME
examples the in-graph stream trains on, shaped as real FLIC: this
renders the synthetic generator's skeleton frames (indices 0..5002 —
exactly the train/test examples every in-graph flagship run uses) at
2x into 720x480 JPEGs + a FLIC-convention examples.mat, so
load_flic's resize returns ~the original frames and the annotations
actually describe the pixels.

The only differences a hostdata run then sees vs the in-graph stream
are the production data-path semantics themselves: JPEG encode/decode,
the 2x down-resample, uint8 quantization, and host staging.

Usage: python results/flic_fullsize/make_learnable.py [root] [quality]
Defaults: /tmp/flic_learnable, JPEG quality 92.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flic_learnable"
    quality = int(sys.argv[2]) if len(sys.argv) > 2 else 92
    import scipy.io
    from PIL import Image

    from jointpose import skeleton
    from jointpose.configs import get_config
    from jointpose.data.flic import _FLIC_COLUMNS
    from jointpose.data.synthetic import make_synthetic_flic

    cfg = get_config("flagship").data
    n_train, n_test = cfg.train_size, cfg.test_size
    n = n_train + n_test
    gen = make_synthetic_flic(cfg)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    examples = []
    t0 = time.time()
    for i0 in range(0, n, 64):
        idx = jnp.arange(i0, min(i0 + 64, n), dtype=jnp.int32)
        batch = gen(idx)
        imgs = np.asarray(batch["image"])          # (b, 240, 360, 3) [0,1]
        joints = np.asarray(batch["joints"])       # (b, 9, 2) xy @ 240x360
        visible = np.asarray(batch["visible"])     # (b, 9)
        for k in range(imgs.shape[0]):
            i = i0 + k
            u8 = np.round(np.clip(imgs[k], 0, 1) * 255.0).astype(np.uint8)
            im = Image.fromarray(u8).resize((720, 480), Image.BILINEAR)
            fname = f"frame{i:05d}.jpg"
            im.save(os.path.join(root, "images", fname), quality=quality)
            coords = np.full((2, 29), np.nan)
            for j, name in enumerate(skeleton.JOINTS):
                if visible[k, j] <= 0:
                    continue
                col = _FLIC_COLUMNS[name] - 1
                coords[0, col] = joints[k, j, 0] * 2.0  # x @ 720
                coords[1, col] = joints[k, j, 1] * 2.0  # y @ 480
            examples.append(
                (fname, coords, float(i < n_train), float(i >= n_train))
            )
        if i0 % 1024 == 0:
            print(f"  {i0}/{n} ({time.time()-t0:.0f}s)", flush=True)

    dt = [("filepath", object), ("coords", object),
          ("istrain", object), ("istest", object)]
    arr = np.zeros((len(examples),), dtype=dt)
    for i, ex in enumerate(examples):
        arr[i] = ex
    scipy.io.savemat(os.path.join(root, "examples.mat"), {"examples": arr})
    print(f"synthesized {n} learnable examples in {time.time()-t0:.0f}s "
          f"(quality {quality}) at {root}", flush=True)


if __name__ == "__main__":
    main()
