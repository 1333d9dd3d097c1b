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
