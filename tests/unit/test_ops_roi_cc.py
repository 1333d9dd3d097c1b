import numpy as np
import pytest

import jax.numpy as jnp

from marie_tpu.ops import (
    component_boxes,
    connected_components,
    ctc_greedy_decode,
    deform_conv2d,
    roi_align,
    roi_align_rotated,
)


def test_roi_align_constant_map():
    # constant feature map -> every bin equals the constant
    feat = jnp.full((1, 3, 16, 16), 7.0)
    rois = jnp.array([[0, 2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feat, rois, output_size=4, sampling_ratio=2)
    assert out.shape == (1, 3, 4, 4)
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


def test_roi_align_linear_gradient():
    # f(x, y) = x: bilinear sampling is exact for linear functions, so each
    # bin average equals the bin-center x coordinate.
    h = w = 32
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (h, w))
    feat = xs[None, None]  # [1,1,H,W]
    x0, x1 = 4.0, 12.0
    rois = jnp.array([[0, x0, 8.0, x1, 16.0]])
    p = 4
    out = np.asarray(roi_align(feat, rois, output_size=p, sampling_ratio=4))
    bin_w = (x1 - x0) / p
    want = x0 - 0.5 + (np.arange(p) + 0.5) * bin_w
    np.testing.assert_allclose(out[0, 0, 0], want, atol=1e-4)


def test_roi_align_rotated_angle_zero_matches_plain():
    rng = np.random.default_rng(3)
    feat = jnp.array(rng.standard_normal((1, 2, 24, 24)), jnp.float32)
    # plain roi (x0,y0,x1,y1) = (4,6,16,14)
    plain = roi_align(feat, jnp.array([[0, 4.0, 6.0, 16.0, 14.0]]), output_size=4)
    rot = roi_align_rotated(
        feat, jnp.array([[0, 10.0, 10.0, 12.0, 8.0, 0.0]]), output_size=4
    )
    np.testing.assert_allclose(np.asarray(plain), np.asarray(rot), atol=1e-4)


def test_connected_components_matches_scipy():
    from scipy import ndimage

    rng = np.random.default_rng(4)
    mask = rng.random((48, 64)) > 0.7
    got = np.asarray(connected_components(jnp.array(mask), num_iters=64))
    want, n_want = ndimage.label(mask, structure=np.ones((3, 3)))
    # same partition: bijection between label sets
    got_ids = got[mask]
    want_ids = want[mask]
    pairs = set(zip(got_ids.tolist(), want_ids.tolist()))
    assert len(pairs) == n_want  # one got-label per scipy-label
    assert len({g for g, _ in pairs}) == n_want
    assert len({w for _, w in pairs}) == n_want
    assert (got[~mask] == -1).all()


def test_component_boxes():
    mask = np.zeros((32, 32), bool)
    mask[2:6, 3:9] = True  # box (3,2,9,6)
    mask[20:25, 20:30] = True  # box (20,20,30,25)
    scores = np.zeros((32, 32), np.float32)
    scores[2:6, 3:9] = 0.9
    scores[20:25, 20:30] = 0.5
    labels = connected_components(jnp.array(mask), num_iters=8)
    out = component_boxes(labels, jnp.array(scores), max_components=8)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 2
    boxes = np.asarray(out["boxes"])[valid]
    np.testing.assert_allclose(boxes[0], [3, 2, 9, 6])
    np.testing.assert_allclose(boxes[1], [20, 20, 30, 25])
    np.testing.assert_allclose(np.asarray(out["scores"])[valid], [0.9, 0.5])
    np.testing.assert_allclose(np.asarray(out["areas"])[valid], [24, 50])


def test_component_boxes_reduce_matches_sort():
    """The sort-free variants must be output-identical to the sort-based
    one on random blob masks (incl. the >max_components drop rule)."""
    from marie_tpu.ops import (
        component_boxes_reduce,
        component_boxes_reduce2,
        component_boxes_runs,
    )

    rng = np.random.default_rng(11)
    mask = np.zeros((64, 96), bool)
    for _ in range(30):
        y, x = rng.integers(0, 58), rng.integers(0, 88)
        mask[y : y + rng.integers(2, 6), x : x + rng.integers(2, 8)] = True
    scores = (rng.random((64, 96)) * mask).astype(np.float32)
    labels = connected_components(jnp.array(mask))
    for k in (8, 64):  # k=8 forces the drop-by-label-order path
        a = component_boxes(labels, jnp.array(scores), max_components=k)
        b = component_boxes_reduce(labels, jnp.array(scores), max_components=k)
        c = component_boxes_reduce2(labels, jnp.array(scores), max_components=k)
        d = component_boxes_runs(labels, jnp.array(scores), max_components=k)
        for field in ("boxes", "areas", "scores", "valid"):
            np.testing.assert_allclose(
                np.asarray(a[field]), np.asarray(b[field]), atol=1e-6,
                err_msg=field,
            )
            np.testing.assert_allclose(
                np.asarray(a[field]), np.asarray(c[field]), atol=1e-6,
                err_msg="reduce2/" + field,
            )
            np.testing.assert_allclose(
                np.asarray(a[field]), np.asarray(d[field]), atol=1e-6,
                err_msg="runs/" + field,
            )


def test_component_boxes_runs_tight_budget():
    """The runs kernel stays exact at a per-row budget equal to the
    actual run count, and at a single-run budget degrades by dropping
    the RIGHTMOST runs of over-budget rows (never corrupting kept ones)."""
    from marie_tpu.ops import component_boxes_reduce2, component_boxes_runs

    mask = np.zeros((8, 64), bool)
    # 4 runs on every row: worst case for the budget
    for i in range(4):
        mask[:, i * 16 + 2 : i * 16 + 9] = True
    mask[3, :] = False  # a gap row splits each stripe into two components
    scores = (np.random.default_rng(0).random((8, 64)) * mask).astype(
        np.float32
    )
    labels = connected_components(jnp.array(mask))
    want = component_boxes_reduce2(labels, jnp.array(scores), max_components=16)
    got = component_boxes_runs(
        labels, jnp.array(scores), max_components=16, max_runs_per_row=4
    )
    for field in ("boxes", "areas", "scores", "valid"):
        np.testing.assert_allclose(
            np.asarray(want[field]), np.asarray(got[field]), atol=1e-6,
            err_msg=field,
        )
    # budget 1: only the leftmost run of each row survives; the first
    # component keeps its exact box, later ones lose area but stay valid
    tight = component_boxes_runs(
        labels, jnp.array(scores), max_components=16, max_runs_per_row=1
    )
    wv = np.asarray(want["valid"])
    np.testing.assert_allclose(
        np.asarray(tight["boxes"])[0], np.asarray(want["boxes"])[0]
    )
    assert (np.asarray(tight["valid"]) == wv).all()


def test_ctc_greedy_decode():
    # V=4, blank=0; frames: [1 1 0 2 2 2 0 1] -> [1, 2, 1]
    t = 8
    ids = [1, 1, 0, 2, 2, 2, 0, 1]
    logits = np.full((1, t, 4), -10.0, np.float32)
    for i, k in enumerate(ids):
        logits[0, i, k] = 10.0
    tokens, lengths, conf = ctc_greedy_decode(jnp.array(logits), blank_id=0)
    assert int(lengths[0]) == 3
    assert np.asarray(tokens)[0, :3].tolist() == [1, 2, 1]
    assert float(conf[0]) > 0.99


def test_deform_conv_zero_offsets_matches_conv():
    import jax

    rng = np.random.default_rng(5)
    x = jnp.array(rng.standard_normal((2, 3, 12, 12)), jnp.float32)
    w = jnp.array(rng.standard_normal((4, 3, 3, 3)), jnp.float32)
    offsets = jnp.zeros((2, 2 * 9, 12, 12), jnp.float32)
    got = deform_conv2d(x, offsets, w, stride=1, padding=1)
    want = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_deform_conv_v2_mask():
    rng = np.random.default_rng(6)
    x = jnp.array(rng.standard_normal((1, 2, 8, 8)), jnp.float32)
    w = jnp.array(rng.standard_normal((2, 2, 3, 3)), jnp.float32)
    offsets = jnp.zeros((1, 18, 8, 8), jnp.float32)
    mask_half = jnp.full((1, 9, 8, 8), 0.5, jnp.float32)
    full = deform_conv2d(x, offsets, w, padding=1)
    halved = deform_conv2d(x, offsets, w, mask=mask_half, padding=1)
    np.testing.assert_allclose(np.asarray(halved), np.asarray(full) * 0.5, atol=1e-4)


def test_component_boxes_runs_cc_matches_pixel_path():
    """The run-domain CC+stats kernel (mask in, no pixel labels) must be
    output-identical to connected_components + component_boxes on random
    blob masks — including diagonal-only connections, single-pixel
    components, and the >max_components drop-by-label-order rule."""
    from marie_tpu.ops import component_boxes_runs_cc

    rng = np.random.default_rng(23)
    for trial in range(6):
        mask = np.zeros((64, 96), bool)
        for _ in range(25):
            y, x = rng.integers(0, 58), rng.integers(0, 86)
            mask[y : y + rng.integers(1, 6), x : x + rng.integers(1, 9)] = True
        # add diagonal-touch pairs (8-connectivity edge case)
        for _ in range(5):
            y, x = rng.integers(1, 60), rng.integers(1, 90)
            mask[y, x] = True
            mask[y + 1, x + 1] = True
        scores = (rng.random((64, 96)) * mask).astype(np.float32)
        labels = connected_components(jnp.array(mask))
        for k in (8, 64):
            a = component_boxes(labels, jnp.array(scores), max_components=k)
            b = component_boxes_runs_cc(
                jnp.array(mask), jnp.array(scores), max_components=k
            )
            for field in ("boxes", "areas", "scores", "valid"):
                np.testing.assert_allclose(
                    np.asarray(a[field]), np.asarray(b[field]), atol=1e-6,
                    err_msg=f"trial{trial}/k{k}/{field}",
                )


def test_component_boxes_runs_cc_empty_and_full():
    from marie_tpu.ops import component_boxes_runs_cc

    empty = component_boxes_runs_cc(jnp.zeros((16, 32), bool), None, 8)
    assert not bool(np.asarray(empty["valid"]).any())
    full = component_boxes_runs_cc(jnp.ones((16, 32), bool), None, 8)
    got = np.asarray(full["boxes"][0])
    np.testing.assert_allclose(got, [0, 0, 32, 16])
    assert int(np.asarray(full["areas"])[0]) == 16 * 32


def test_component_boxes_runs_cc_adversarial_shapes():
    """Propagation must converge on shapes far from text blobs: a tall
    1-px bar (~116-row run chain), L and U bends, and a serpentine whose
    min label must traverse ~60 rows of zig-zag."""
    from marie_tpu.ops import component_boxes_runs_cc

    mask = np.zeros((128, 128), bool)
    mask[4:120, 8] = True
    mask[10:60, 20:24] = True
    mask[56:60, 20:50] = True
    mask[80:84, 30:70] = True
    mask[80:120, 66:70] = True
    mask[116:120, 30:70] = True
    y = 5
    for i in range(10):
        mask[y:y + 2, 40 + 6 * i:48 + 6 * i] = True
        mask[y:y + 8, 46 + 6 * i] = True
        y += 6
    scores = (
        np.random.default_rng(5).random(mask.shape) * mask
    ).astype(np.float32)
    labels = connected_components(jnp.array(mask))
    a = component_boxes(labels, jnp.array(scores), max_components=16)
    b = component_boxes_runs_cc(
        jnp.array(mask), jnp.array(scores), max_components=16
    )
    for f in ("boxes", "areas", "scores", "valid"):
        np.testing.assert_allclose(
            np.asarray(a[f]), np.asarray(b[f]), atol=1e-6, err_msg=f
        )
