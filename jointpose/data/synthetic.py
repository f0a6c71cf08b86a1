"""Deterministic synthetic-FLIC source (SURVEY §7 environment facts).

Real FLIC is not on disk and there is no network, so the framework ships
a synthetic source with FLIC's exact geometry (720x480 frames scaled to
the configured input size, 9 upper-body joints, 3987/1016 split) that
generates images *on device inside jit* from integer example indices:

- a pose is sampled deterministically per (seed, index) with plausible
  articulated kinematics (shoulder girdle, elbows/wrists by angle),
- the person is rendered as soft anti-aliased limb capsules plus a head
  blob over a smooth random background — pure elementwise XLA over the
  pixel grid (no host work, no storage, no gathers),

so the input pipeline can never bottleneck the TPU and every config is
runnable/testable today; real FLIC drops in via ``jointpose.data.flic``
(SURVEY §7 hard-parts #4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jointpose import skeleton
from jointpose.configs import DataConfig

# numpy on purpose: module-scope jnp.asarray would initialize the
# backend at IMPORT time, before the CLIs' --platform flag can apply.
_LIMB_IDX = np.asarray(
    [[skeleton.JOINT_INDEX[a], skeleton.JOINT_INDEX[b]] for a, b in skeleton.LIMBS],
    dtype=np.int32,
)

# Per-limb RGB so limbs are visually distinguishable (helps the detector
# break left/right symmetry, like clothing/context does in real FLIC).
_LIMB_COLORS = np.asarray(
    [
        [0.9, 0.4, 0.3],
        [0.3, 0.9, 0.4],
        [0.8, 0.8, 0.2],
        [0.2, 0.5, 0.9],
        [0.9, 0.2, 0.8],
        [0.2, 0.9, 0.9],
        [0.9, 0.6, 0.1],
        [0.5, 0.3, 0.9],
        [0.4, 0.9, 0.6],
        [0.7, 0.7, 0.7],
    ],
    dtype=np.float32,
)


def sample_pose(rng: jax.Array, image_hw: tuple[int, int]) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample one plausible upper-body pose.

    Returns (joints_xy (K, 2) in image pixels, visible (K,) float mask).
    All joints are visible in the synthetic source.
    """
    h, w = float(image_hw[0]), float(image_hw[1])
    ks = jax.random.split(rng, 8)
    # Body scale: shoulder half-width in pixels.
    s = jax.random.uniform(ks[0], (), minval=0.07, maxval=0.13) * w
    cx = jax.random.uniform(ks[1], (), minval=0.3, maxval=0.7) * w
    cy = jax.random.uniform(ks[2], (), minval=0.3, maxval=0.55) * h
    lean = jax.random.uniform(ks[3], (), minval=-0.3, maxval=0.3)  # torso lean, rad

    def rot(px: jnp.ndarray, py: jnp.ndarray, ang: jnp.ndarray):
        return px * jnp.cos(ang) - py * jnp.sin(ang), px * jnp.sin(ang) + py * jnp.cos(ang)

    # Shoulders and hips around the torso center (y grows downward).
    lsho = jnp.stack(rot(-s, jnp.zeros_like(s), lean))
    rsho = jnp.stack(rot(s, jnp.zeros_like(s), lean))
    torso_len = 1.9 * s
    lhip = jnp.stack(rot(-0.75 * s, torso_len, lean))
    rhip = jnp.stack(rot(0.75 * s, torso_len, lean))
    nose = jnp.stack(rot(jnp.zeros_like(s), -0.9 * s, lean))

    # Arms: upper-arm and forearm angles (measured from straight down).
    arm_len = 1.15 * s
    ua = jax.random.uniform(ks[4], (2,), minval=-2.2, maxval=2.2)  # l, r upper
    fa = jax.random.uniform(ks[5], (2,), minval=-2.4, maxval=2.4)  # l, r fore

    def arm(sho: jnp.ndarray, upper_ang: jnp.ndarray, fore_ang: jnp.ndarray, side: float):
        # angle 0 = hanging down; positive rotates outward from the body.
        a1 = upper_ang * side
        elb = sho + arm_len * jnp.stack([jnp.sin(a1), jnp.cos(a1)])
        a2 = a1 + fore_ang * side
        wri = elb + arm_len * jnp.stack([jnp.sin(a2), jnp.cos(a2)])
        return elb, wri

    lelb, lwri = arm(lsho, ua[0], fa[0], -1.0)
    relb, rwri = arm(rsho, ua[1], fa[1], 1.0)

    local = {
        "nose": nose,
        "lsho": lsho,
        "rsho": rsho,
        "lelb": lelb,
        "relb": relb,
        "lwri": lwri,
        "rwri": rwri,
        "lhip": lhip,
        "rhip": rhip,
    }
    joints = jnp.stack([local[name] for name in skeleton.JOINTS])  # (K, 2) = (x, y)
    joints = joints + jnp.stack([cx, cy])
    # Keep inside the frame with a small margin so all joints stay visible.
    margin = 4.0
    joints = jnp.stack(
        [
            jnp.clip(joints[:, 0], margin, w - 1 - margin),
            jnp.clip(joints[:, 1], margin, h - 1 - margin),
        ],
        axis=-1,
    )
    visible = jnp.ones((skeleton.NUM_JOINTS,), jnp.float32)
    return joints.astype(jnp.float32), visible


def render_person(
    rng: jax.Array, joints_xy: jnp.ndarray, image_hw: tuple[int, int]
) -> jnp.ndarray:
    """Render one (H, W, 3) image of the stick person over a random background."""
    h, w = image_hw
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)

    k_bg, k_noise = jax.random.split(rng)
    # Smooth background: random low-frequency color gradient.
    c = jax.random.uniform(k_bg, (3, 3), minval=-0.15, maxval=0.15)
    base = jax.random.uniform(k_bg, (3,), minval=0.25, maxval=0.75)
    bg = (
        base[None, None, :]
        + c[None, None, 0, :] * (gx / w)[..., None]
        + c[None, None, 1, :] * (gy / h)[..., None]
        + c[None, None, 2, :] * (gx * gy / (w * h))[..., None]
    )

    limb_w = 0.018 * w  # capsule half-width in px

    p = joints_xy[_LIMB_IDX[:, 0]]  # (L, 2)
    q = joints_xy[_LIMB_IDX[:, 1]]  # (L, 2)

    def limb_mask(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
        dx, dy = p2[0] - p1[0], p2[1] - p1[1]
        len2 = jnp.maximum(dx * dx + dy * dy, 1e-6)
        t = jnp.clip(((gx - p1[0]) * dx + (gy - p1[1]) * dy) / len2, 0.0, 1.0)
        px, py = p1[0] + t * dx, p1[1] + t * dy
        d2 = (gx - px) ** 2 + (gy - py) ** 2
        return jnp.exp(-d2 / (2.0 * limb_w * limb_w))  # (H, W)

    masks = jax.vmap(limb_mask)(p, q)  # (L, H, W)
    limb_rgb = jnp.einsum("lhw,lc->hwc", masks, _LIMB_COLORS)
    alpha = jnp.clip(jnp.sum(masks, axis=0), 0.0, 1.0)[..., None]

    # Head: round blob at the nose.
    nose = joints_xy[skeleton.JOINT_INDEX["nose"]]
    head_r = 0.035 * w
    d2 = (gx - nose[0]) ** 2 + (gy - nose[1]) ** 2
    head = jnp.exp(-d2 / (2.0 * head_r * head_r))[..., None]

    img = bg * (1 - alpha) + limb_rgb + head * jnp.asarray([0.95, 0.85, 0.7])
    noise = 0.02 * jax.random.normal(k_noise, (h, w, 3))
    return jnp.clip(img + noise, 0.0, 1.0).astype(jnp.float32)


def make_example(
    seed: int, index: jnp.ndarray, image_hw: tuple[int, int]
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministically generate example ``index``: (image, joints_xy, visible)."""
    rng = jax.random.fold_in(jax.random.PRNGKey(seed), index)
    k_pose, k_render = jax.random.split(rng)
    joints, visible = sample_pose(k_pose, image_hw)
    image = render_person(k_render, joints, image_hw)
    return image, joints, visible


def make_synthetic_flic(cfg: DataConfig):
    """Build jitted batch generators for the synthetic source.

    Returns a function ``get_batch(indices) -> dict`` usable for both
    splits: train indices live in [0, train_size), test indices are
    offset by ``train_size`` so the splits are disjoint.
    """
    image_hw = cfg.image_hw
    seed = cfg.seed

    @jax.jit
    def get_batch(indices: jnp.ndarray):
        image, joints, visible = jax.vmap(lambda i: make_example(seed, i, image_hw))(indices)
        return {"image": image, "joints": joints, "visible": visible}

    return get_batch
