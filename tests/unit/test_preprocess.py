import numpy as np

import jax.numpy as jnp

from marie_tpu.preprocess import (
    CROP_WIDTH_BUCKETS,
    BucketSpec,
    bucket_for,
    crop_resize,
    group_by_bucket,
    otsu_binarize,
    pad_to,
    prepare_page,
    to_grayscale,
)
from marie_tpu.preprocess.buckets import pad_batch, width_bucket


def test_bucket_selection():
    assert bucket_for(700, 500) == (768, 576)
    assert bucket_for(800, 500) == (1024, 768)
    assert bucket_for(5000, 5000) == (2048, 1536)  # largest


def test_fit_with_scale():
    spec = BucketSpec()
    (bh, bw), scale = spec.fit_with_scale(4096, 3072)
    assert (bh, bw) == (2048, 1536)
    assert scale == 0.5


def test_pad_to():
    img = np.zeros((10, 20, 3), np.uint8)
    out = pad_to(img, 16, 32)
    assert out.shape == (16, 32, 3)
    assert (out[10:, :, :] == 255).all()


def test_width_bucket_and_grouping():
    assert width_bucket(50) == 64
    assert width_bucket(65) == 128
    assert width_bucket(9999) == CROP_WIDTH_BUCKETS[-1]
    groups = group_by_bucket([50, 60, 100, 300])
    assert sorted(groups) == [64, 128, 320]
    assert groups[64] == [0, 1]


def test_pad_batch():
    assert pad_batch(3) == 8
    assert pad_batch(65) == 128
    assert pad_batch(300) == 512


def test_grayscale_and_otsu():
    # black text on white page
    img = np.full((64, 64, 3), 255, np.uint8)
    img[20:30, 10:50] = 0
    rgb = jnp.asarray(img, jnp.float32) / 255.0
    gray = to_grayscale(rgb)
    assert gray.shape == (64, 64)
    ink = np.asarray(otsu_binarize(gray))
    assert ink[25, 30]  # text is ink
    assert not ink[5, 5]  # background is not


def test_crop_resize_exact_content():
    # page with a distinct constant block; crop it and check content + padding
    page = np.full((100, 200, 3), 1.0, np.float32)
    page[40:56, 20:52] = 0.25  # box h=16 w=32
    boxes = jnp.array([[20.0, 40.0, 52.0, 56.0]])
    crops, eff_w = crop_resize(jnp.asarray(page), boxes, out_h=16, out_w=64)
    assert crops.shape == (1, 16, 64, 3)
    assert int(eff_w[0]) == 32  # scale=1 -> width preserved
    got = np.asarray(crops[0])
    # interior of the crop is the block value; after eff_w it's white padding
    assert abs(got[8, 8, 0] - 0.25) < 1e-5
    assert (got[:, 33:, :] == 1.0).all()


def test_crop_resize_aspect_scaling():
    # 32-high box resized to 16 -> width halves
    page = np.full((100, 200, 3), 1.0, np.float32)
    boxes = jnp.array([[10.0, 10.0, 90.0, 42.0]])  # h=32, w=80
    crops, eff_w = crop_resize(jnp.asarray(page), boxes, out_h=16, out_w=64)
    assert int(eff_w[0]) == 40


def test_prepare_page():
    img = np.full((128, 96, 3), 255, np.uint8)
    img[50:60, 30:60] = 0
    out = prepare_page(jnp.asarray(img), 128, 96)
    assert out["rgb"].shape == (128, 96, 3)
    assert out["gray"].shape == (128, 96)
    assert bool(out["ink"][55, 45])


def test_crop_resize_squeezes_overflow_width():
    # A box whose aspect-preserved width exceeds out_w must SQUEEZE to
    # fit (training-render semantics) — not truncate its tail.  Dark ink
    # at the box's right edge must survive into the crop.
    page = np.full((100, 200, 3), 1.0, np.float32)
    page[40:48, 10:170] = 0.8           # box h=8 w=160
    page[40:48, 160:170] = 0.0          # black tail marker
    boxes = jnp.array([[10.0, 40.0, 170.0, 48.0]])
    # scale = 16/8 = 2 -> aspect width 320 > out_w 64 -> squeeze
    crops, eff_w = crop_resize(jnp.asarray(page), boxes, out_h=16, out_w=64)
    got = np.asarray(crops[0])
    assert int(eff_w[0]) == 64
    # tail marker lands in the last ~6% of columns and is dark
    assert got[8, 62, 0] < 0.2, got[8, 55:64, 0]
    # and the page-variant keeps identical semantics
    from marie_tpu.preprocess.ops import crop_resize_pages

    page_u8 = (page * 255).astype(np.uint8)
    crops2, eff_w2 = crop_resize_pages(
        jnp.asarray(page_u8)[None], jnp.zeros((1,), jnp.int32),
        boxes, 16, 64,
    )
    got2 = np.asarray(crops2[0])
    assert int(eff_w2[0]) == 64
    assert got2[8, 62, 0] < 0.2
