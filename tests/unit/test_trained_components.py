"""The round-2 trained checkpoints load by default and do their jobs
(overlay cleanup, boundary registration, splitter, DiT detection).

Each test skips when its checkpoint is absent (fresh clones before
scripts/train_*.py run), and exercises REAL quality when present."""

import numpy as np
import pytest

from marie_tpu.registry.zoo import zoo_checkpoint


def _render_page(hw, seed=3):
    from marie_tpu.train.craft import render_page_with_targets

    rng = np.random.default_rng(seed)
    return render_page_with_targets(rng, hw)[0]


@pytest.mark.skipif(
    zoo_checkpoint("pix2pix-synth") is None, reason="overlay ckpt not trained"
)
def test_overlay_processor_removes_form_lines():
    from marie_tpu.overlay import OverlayProcessor
    from marie_tpu.train.overlay import render_overlay_pair

    rng = np.random.default_rng(5)
    clean, dirty, mask = render_overlay_pair(rng, (256, 192))
    proc = OverlayProcessor()
    assert proc.trained
    _, pred_mask, blended = proc.segment_frame("t", dirty)
    true_overlay = mask > 0
    # most true overlay pixels are detected as changed
    hit = (pred_mask[true_overlay] > 0).mean()
    assert hit > 0.5
    # the cleaned page is much closer to the clean target than the dirty one
    err_dirty = np.abs(
        dirty.astype(np.float32) - clean.astype(np.float32)
    ).mean()
    err_clean = np.abs(
        blended.astype(np.float32) - clean.astype(np.float32)
    ).mean()
    assert err_clean < err_dirty * 0.5


@pytest.mark.skipif(
    zoo_checkpoint("pix2pix-synth") is None, reason="overlay ckpt not trained"
)
def test_overlay_segment_batch_matches_per_frame():
    """segment_batch (the pipeline's batched dispatch) must agree with the
    per-frame segment_frame path to within device channel-mean rounding,
    including the mixed-shape fallback."""
    from marie_tpu.overlay import OverlayProcessor
    from marie_tpu.train.overlay import render_overlay_pair

    rng = np.random.default_rng(7)
    frames = [
        render_overlay_pair(rng, (256, 192))[1] for _ in range(3)
    ]
    proc = OverlayProcessor()
    ref = [proc.segment_frame(f"t{i}", f)[2] for i, f in enumerate(frames)]
    out = proc.segment_batch(frames, chunk=2)
    assert len(out) == len(frames)
    for r, o in zip(ref, out):
        assert r.shape == o.shape
        assert np.abs(r.astype(int) - o.astype(int)).max() <= 1
    # mixed shapes fall back to the per-frame path (bit-identical)
    mixed = [frames[0], frames[1][:128, :96]]
    mref = [proc.segment_frame(f"m{i}", f)[2] for i, f in enumerate(mixed)]
    mout = proc.segment_batch(mixed)
    for r, o in zip(mref, mout):
        assert np.array_equal(r, o)


@pytest.mark.skipif(
    zoo_checkpoint("boundary-synth") is None, reason="boundary ckpt not trained"
)
def test_boundary_registration_fit_to_page():
    import jax
    import jax.numpy as jnp

    from marie_tpu.components.document_registration.boundary import (
        DocumentBoundaryRegistration,
    )
    from marie_tpu.models.boundary import composite_scan

    doc = _render_page((192, 256))
    # place the page into a skewed quad on a dark canvas
    quad = jnp.asarray(
        [[40.0, 25.0], [225.0, 40.0], [215.0, 175.0], [30.0, 160.0]]
    )
    noise = jax.random.uniform(jax.random.PRNGKey(0), (192, 256), minval=-10, maxval=10)
    scan = np.asarray(composite_scan(jnp.asarray(doc), quad, (192, 256), 40.0, noise))

    reg = DocumentBoundaryRegistration()
    assert reg.model is not None
    pred = reg.register(scan)
    assert pred.detected
    # aligned page should be mostly bright (document), unlike the scan
    assert pred.aligned.mean() > scan.mean() + 30
    # the model found a quad near the truth
    box = pred.box
    assert abs(box[0] - 30) < 25 and abs(box[1] - 25) < 25


def test_boundary_edge_refinement_snaps_to_silhouette():
    """The mask-extreme-point refinement recovers sub-pixel corners on a
    high-contrast scan even when the CNN prior is tens of px off (the
    OOD scale>0.88 regime that made fit_to_page HURT CER in round 3)."""
    import jax
    import jax.numpy as jnp

    from marie_tpu.components.document_registration.boundary import (
        refine_quad_corners,
    )
    from marie_tpu.models.boundary import composite_scan

    doc = _render_page((192, 256))
    quad = jnp.asarray(
        [[18.0, 12.0], [240.0, 20.0], [232.0, 180.0], [10.0, 172.0]]
    )
    noise = jax.random.uniform(
        jax.random.PRNGKey(1), (192, 256), minval=-10, maxval=10
    )
    scan = np.asarray(
        composite_scan(jnp.asarray(doc), quad, (192, 256), 40.0, noise)
    )
    true_q = np.asarray(quad)
    bad_prior = true_q + np.asarray(
        [[25.0, -18.0], [-30.0, 22.0], [28.0, 15.0], [-20.0, -25.0]]
    )
    refined = refine_quad_corners(scan, bad_prior.astype(np.float32))
    assert np.abs(refined - true_q).max() < 3.0
    # corners further than max_shift from the prior are left untouched
    far_prior = true_q + 300.0
    kept = refine_quad_corners(scan, far_prior.astype(np.float32))
    np.testing.assert_allclose(kept, far_prior)
    # degenerate input (no bright region) falls back to the prior
    dark = np.full((64, 64, 3), 30, np.uint8)
    p = np.asarray([[5.0, 5.0], [60.0, 5.0], [60.0, 60.0], [5.0, 60.0]])
    np.testing.assert_allclose(refine_quad_corners(dark, p), p)


@pytest.mark.skipif(
    zoo_checkpoint("layout-splitter-synth") is None, reason="splitter ckpt not trained"
)
def test_splitter_separates_documents():
    from marie_tpu.components.base import PageInput
    from marie_tpu.components.document_splitter import LayoutDocumentSplitter
    from marie_tpu.train.layout import synth_split_page

    rng = np.random.default_rng(17)
    pages, truth = [], []
    for _ in range(2):  # two documents of 1 boundary + 2 continuations
        for p in range(3):
            words, boxes = synth_split_page(rng, p == 0)
            pages.append(PageInput(words, boxes, None))
            truth.append(p == 0)
    splitter = LayoutDocumentSplitter()
    results = splitter.split(pages)
    got = [r["is_boundary"] for r in results]
    assert got == truth
    docs = LayoutDocumentSplitter.to_documents(results)
    assert docs == [[0, 1, 2], [3, 4, 5]]


@pytest.mark.skipif(
    zoo_checkpoint("dit-synth") is None, reason="dit ckpt not trained"
)
def test_dit_detector_finds_words():
    from marie_tpu.boxes.dit_box_processor import BoxProcessorUlimDit

    page = _render_page((512, 384))
    proc = BoxProcessorUlimDit()
    assert proc.config.image_size == (512, 384)
    boxes, scores = proc.detect_words(page)
    assert len(boxes) >= 20  # a full text page yields many word boxes
    assert (scores > proc.text_threshold).all()
    # boxes lie within the page
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 1] >= 0).all()
    assert (boxes[:, 0] + boxes[:, 2] <= 384 + 1).all()
