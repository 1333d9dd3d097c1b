"""TextFuseNet-analog fusion detector: model machinery + processor.

Reference behavior spec: multi-path fuse module aggregates features of
char instances contained in each word (inter_area/char_area > 0.9) plus
a global seg context (/root/reference/marie/models/textfusenet/
detectron2/modeling/roi_heads/mutil_path_fuse_module.py:83-108)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from marie_tpu.models.textfusenet import TextFuseNet, TextFuseNetConfig

CFG = TextFuseNetConfig(max_words=8, max_chars=16, channels=16,
                        backbone_widths=(8, 16, 32))


@pytest.fixture(scope="module")
def model_and_vars():
    model = TextFuseNet(CFG)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, method="init_probe")
    return model, variables


def test_dense_branch_shapes(model_and_vars):
    model, variables = model_and_vars
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, imgs)
    assert out["word"].shape == (2, 16, 16, 2)
    assert out["char"].shape == (2, 16, 16, 1)
    assert out["seg_logits"].shape == (2, 16, 16, 1)
    assert out["seg_feat"].shape == (2, 16, 16, CFG.channels)
    # sigmoid branches live in [0, 1]
    assert float(out["word"].min()) >= 0.0 and float(out["word"].max()) <= 1.0


def test_fuse_containment_matches_reference_predicate(model_and_vars):
    """Chars fully inside a word (inter/char_area > 0.9) feed its char
    context; chars outside do not — verified by perturbation: moving an
    OUTSIDE char's box never changes the word's fused score, moving an
    INSIDE char's box does."""
    model, variables = model_and_vars
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = model.apply(variables, imgs)
    p3, segf = out["p3"][0], out["seg_feat"][0]

    word = jnp.tile(jnp.asarray([[2.0, 2.0, 12.0, 6.0]]), (CFG.max_words, 1))
    wvalid = jnp.zeros((CFG.max_words,), bool).at[0].set(True)
    chars = jnp.tile(jnp.asarray([[40.0, 40.0, 40.5, 40.5]]),
                     (CFG.max_chars, 1))
    # char 0 inside word 0; char 1 far outside
    chars = chars.at[0].set(jnp.asarray([3.0, 3.0, 5.0, 5.0]))
    chars = chars.at[1].set(jnp.asarray([30.0, 30.0, 34.0, 34.0]))
    cvalid = jnp.zeros((CFG.max_chars,), bool).at[0].set(True).at[1].set(True)

    s_base, _ = model.apply(variables, p3, segf, word, wvalid, chars, cvalid,
                            method=TextFuseNet.fuse)

    moved_out = chars.at[1].set(jnp.asarray([50.0, 50.0, 54.0, 54.0]))
    s_out, _ = model.apply(variables, p3, segf, word, wvalid, moved_out,
                           cvalid, method=TextFuseNet.fuse)
    assert np.allclose(float(s_base[0]), float(s_out[0]), atol=1e-6)

    moved_in = chars.at[0].set(jnp.asarray([6.0, 3.0, 9.0, 5.0]))
    s_in, _ = model.apply(variables, p3, segf, word, wvalid, moved_in,
                          cvalid, method=TextFuseNet.fuse)
    assert abs(float(s_base[0]) - float(s_in[0])) > 1e-7


def test_fuse_refined_boxes_stay_near_candidates(model_and_vars):
    model, variables = model_and_vars
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    out = model.apply(variables, imgs)
    word = jnp.tile(jnp.asarray([[2.0, 2.0, 12.0, 6.0]]), (CFG.max_words, 1))
    score, refined = model.apply(
        variables, out["p3"][0], out["seg_feat"][0], word,
        jnp.ones((CFG.max_words,), bool),
        jnp.zeros((CFG.max_chars, 4)), jnp.zeros((CFG.max_chars,), bool),
        method=TextFuseNet.fuse,
    )
    assert score.shape == (CFG.max_words,)
    assert refined.shape == (CFG.max_words, 4)
    # exp-clipped deltas keep the refined box within 8x of the candidate
    bw = refined[:, 2] - refined[:, 0]
    assert float(bw.min()) > 0.0
    assert float(bw.max()) < 10.0 * 8.0


def test_processor_one_program(tmp_path):
    """The processor's jit program runs end-to-end at a tiny bucket."""
    from marie_tpu.boxes.textfusenet_box_processor import (
        BoxProcessorTextFuseNet,
    )
    from marie_tpu.preprocess import BucketSpec

    proc = BoxProcessorTextFuseNet(
        work_dir=str(tmp_path),
        config=CFG,
        page_hw=(64, 64),
        bucket_spec=BucketSpec(shapes=((64, 64),)),
        fuse_threshold=0.0,
        min_area=0,
        word_threshold=0.0,
        low_text=0.99,  # random weights: keep the mask tiny
    )
    page = (np.random.default_rng(0).random((60, 60, 3)) * 255).astype(
        np.uint8
    )
    boxes, scores = proc.detect_words(page)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert len(boxes) == len(scores)


def test_trained_checkpoint_detects_words():
    """The shipped textfusenet-synth checkpoint localizes words on a
    held-out page (recall/precision measured at 0.787/0.917 on TPU —
    scripts/check_quality.py detector/textfusenet row)."""
    from marie_tpu.registry.zoo import zoo_checkpoint

    if zoo_checkpoint("textfusenet-synth") is None:
        pytest.skip("textfusenet ckpt not trained")
    from marie_tpu.boxes.textfusenet_box_processor import (
        BoxProcessorTextFuseNet,
    )
    from marie_tpu.preprocess import BucketSpec
    from marie_tpu.train.textfusenet import render_page_tfn

    proc = BoxProcessorTextFuseNet(
        page_hw=(256, 192), bucket_spec=BucketSpec(shapes=((256, 192),))
    )
    rng = np.random.default_rng(123)
    page, _, wb, wv, _, _ = render_page_tfn(rng, (256, 192))
    boxes, scores = proc.detect_words(page)
    n_gt = int(wv.sum())
    # on CPU at a small bucket: detects a solid majority of the words
    assert len(boxes) >= n_gt * 0.5
    assert (scores > 0.5).mean() > 0.5


def test_renderer_char_supervision():
    from marie_tpu.train.textfusenet import render_page_tfn

    rng = np.random.default_rng(0)
    page, targets, wb, wv, cb, cv = render_page_tfn(rng, (128, 128),
                                                    max_words=64,
                                                    max_chars=256)
    assert page.shape == (128, 128, 3)
    assert targets.shape == (64, 64, 4)
    assert wv.any() and cv.any()
    # every char box sits inside some word box (the fuse supervision)
    wbv, cbv = wb[wv], cb[cv]
    lt = np.maximum(wbv[:, None, :2], cbv[None, :, :2])
    rb = np.minimum(wbv[:, None, 2:], cbv[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    carea = np.clip(
        (cbv[:, 2] - cbv[:, 0]) * (cbv[:, 3] - cbv[:, 1]), 1e-6, None
    )
    contained = (inter / carea[None]) > 0.9
    assert contained.any(axis=0).mean() > 0.95


S2_CFG = TextFuseNetConfig(max_words=8, max_chars=16, channels=16,
                           backbone_widths=(8, 16, 32), head_stride=2)


def test_s2_dense_maps_are_stride2():
    """The sub-pixel head doubles the word/char map resolution while the
    seg branch and P3 features stay at stride 4."""
    model = TextFuseNet(S2_CFG)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, method="init_probe")
    out = model.apply(variables, imgs)
    assert out["word"].shape == (1, 32, 32, 2)
    assert out["char"].shape == (1, 32, 32, 1)
    assert out["seg_logits"].shape == (1, 16, 16, 1)
    assert out["p3"].shape[1:3] == (16, 16)


def test_s2_processor_boxes_in_page_pixels(tmp_path):
    """Stride-2 components must come back in the SAME page-pixel units
    as the stride-4 head (the jit converts to stride-4 grid coords
    before fusion; detect_words multiplies by 4)."""
    from marie_tpu.boxes.textfusenet_box_processor import (
        BoxProcessorTextFuseNet,
    )
    from marie_tpu.preprocess import BucketSpec

    proc = BoxProcessorTextFuseNet(
        work_dir=str(tmp_path),
        config=S2_CFG,
        page_hw=(64, 64),
        bucket_spec=BucketSpec(shapes=((64, 64),)),
        fuse_threshold=0.0,
        min_area=0,
        word_threshold=0.0,
        low_text=0.99,
    )
    page = (np.random.default_rng(0).random((60, 60, 3)) * 255).astype(
        np.uint8
    )
    boxes, scores = proc.detect_words(page)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    # everything stays inside the page in pixel units
    if len(boxes):
        assert (boxes[:, 0] + boxes[:, 2] <= 60 + 1e-3).all()
        assert (boxes[:, 1] + boxes[:, 3] <= 60 + 1e-3).all()


def test_s2_zoo_ladder_prefers_s2_checkpoint():
    """When the stride-2 slot is trained the processor defaults to it
    (and must construct with the matching head_stride config)."""
    from marie_tpu.registry.zoo import zoo_checkpoint

    if zoo_checkpoint("textfusenet-s2-synth") is None:
        pytest.skip("textfusenet-s2 ckpt not trained")
    from marie_tpu.boxes.textfusenet_box_processor import (
        BoxProcessorTextFuseNet,
    )
    from marie_tpu.preprocess import BucketSpec

    proc = BoxProcessorTextFuseNet(
        page_hw=(256, 192), bucket_spec=BucketSpec(shapes=((256, 192),))
    )
    assert proc.config.head_stride == 2
