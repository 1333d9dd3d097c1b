"""Pallas slab-DMA crop kernel (`ops/pallas/crop_resize.py`) — float
parity with the XLA gather formulation, run in interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from marie_tpu.ops.pallas.crop_resize import crop_resize_pallas
from marie_tpu.preprocess.ops import crop_resize_pages


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_crop_matches_gather(seed):
    rng = np.random.default_rng(seed)
    p, h, w = 2, 256, 384
    pages = jnp.asarray(rng.integers(0, 255, (p, h, w), dtype=np.uint8))
    n = 8
    x0 = rng.uniform(0, w - 80, n)
    y0 = rng.uniform(0, h - 30, n)
    boxes = jnp.asarray(
        np.stack(
            [x0, y0, x0 + rng.uniform(20, 80, n), y0 + rng.uniform(10, 28, n)],
            axis=-1,
        ),
        jnp.float32,
    )
    pidx = jnp.asarray(rng.integers(0, p, n), jnp.int32)
    a, ea = crop_resize_pallas(
        pages, pidx, boxes, 32, 128, window=64, interpret=True
    )
    b, eb = crop_resize_pages(pages, pidx, boxes, 32, 128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert np.array_equal(np.asarray(ea), np.asarray(eb))


def test_pallas_crop_page_edges():
    """Boxes hugging page borders: clipping semantics match the gather
    path (top row / bottom row / right edge)."""
    rng = np.random.default_rng(7)
    pages = jnp.asarray(rng.integers(0, 255, (1, 128, 256), dtype=np.uint8))
    boxes = jnp.asarray(
        [
            [0.0, 0.0, 60.0, 18.0],  # top-left corner
            [200.0, 110.0, 256.0, 128.0],  # bottom-right corner
            [10.0, 120.0, 80.0, 127.5],  # fractional bottom edge
        ],
        jnp.float32,
    )
    pidx = jnp.zeros((3,), jnp.int32)
    a, _ = crop_resize_pallas(pages, pidx, boxes, 32, 128, window=64, interpret=True)
    b, _ = crop_resize_pages(pages, pidx, boxes, 32, 128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
