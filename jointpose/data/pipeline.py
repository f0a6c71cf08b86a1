"""Batched input pipeline over pluggable sources (SURVEY C2/C10).

Unifies the on-device synthetic source and the host-array FLIC source
behind one interface: a ``Dataset`` hands out batches keyed by integer
example indices, so shuffling is an O(N) host-side permutation of int32
indices and all per-pixel work stays on device.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator

import jax.numpy as jnp
import numpy as np

from jointpose.configs import DataConfig


@dataclasses.dataclass
class Dataset:
    """A split: ``get_batch(indices (B,) int32) -> dict`` of device arrays.

    Batch dict keys: image (B,H,W,3) f32 in [0,1]; joints (B,K,2) (x,y)
    image px; visible (B,K) f32.
    """

    size: int
    get_batch: Callable[[jnp.ndarray], dict]


def make_dataset(cfg: DataConfig) -> tuple[Dataset, Dataset]:
    """Build (train, test) datasets for the configured source."""
    if cfg.source == "synthetic":
        from jointpose.data.synthetic import make_synthetic_flic

        gen = make_synthetic_flic(cfg)
        train = Dataset(size=cfg.train_size, get_batch=gen)
        # Test indices offset past the train range => disjoint examples.
        offset = cfg.train_size

        def get_test(indices: jnp.ndarray):
            return gen(indices + offset)

        test = Dataset(size=cfg.test_size, get_batch=get_test)
        return train, test

    if cfg.source == "flic":
        from jointpose.data.flic import load_flic

        train_arrays, test_arrays = load_flic(cfg)

        def from_arrays(arrays: dict) -> Dataset:
            image = jnp.asarray(arrays["image"])
            joints = jnp.asarray(arrays["joints"])
            visible = jnp.asarray(arrays["visible"])

            def get_batch(indices: jnp.ndarray):
                return {
                    "image": image[indices],
                    "joints": joints[indices],
                    "visible": visible[indices],
                }

            return Dataset(size=int(image.shape[0]), get_batch=get_batch)

        return from_arrays(train_arrays), from_arrays(test_arrays)

    raise ValueError(f"unknown data source {cfg.source!r}")


def epoch_order(
    n: int, batch_size: int, rng: np.random.Generator | None = None
) -> np.ndarray:
    """One epoch's example order, wrapped up to at least one batch.

    When the split is smaller than a batch, indices wrap (sampling with
    replacement within the epoch) so tiny test configs still train.
    """
    order = np.arange(max(n, batch_size), dtype=np.int32) % n
    if rng is not None:
        rng.shuffle(order)
    return order


def batch_iterator(
    dataset: Dataset,
    batch_size: int,
    rng: np.random.Generator | None = None,
    drop_remainder: bool = True,
) -> Iterator[jnp.ndarray]:
    """Yield index arrays for one epoch (shuffled when ``rng`` is given)."""
    order = epoch_order(dataset.size, batch_size, rng)
    end = len(order) if drop_remainder else len(order) + batch_size - 1
    for start in range(0, end - batch_size + 1, batch_size):
        yield jnp.asarray(order[start : start + batch_size])


def epoch_steps(dataset: Dataset, batch_size: int) -> int:
    return max(dataset.size, batch_size) // batch_size
