"""CRAFT box processor — detection forward + post-processing in ONE
compiled device program per page bucket.

Behaviour parity with the reference's ``BoxProcessorCraft``
(``/root/reference/marie/boxes/craft_box_processor.py:244`` +
``getDetBoxes``/``adjustResultCoordinates`` in
``marie/models/craft/craft_utils.py:257,268``): region/affinity heatmaps
are thresholded, connected components become word boxes (coordinates
scaled ×2 back to page space), components are kept when their peak region
score passes ``text_threshold``.  Unlike the reference (OpenCV on host),
thresholding + CC + box stats run on the TPU; only the final fixed-size
stats arrays come back to host.
"""

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.boxes.box_processor import BoxProcessor
from marie_tpu.models.configs import CraftConfig
from marie_tpu.models.craft import CRAFT
from marie_tpu.ops import (
    component_boxes,
    component_boxes_reduce,
    component_boxes_reduce2,
    component_boxes_runs,
    component_boxes_runs_cc,
    connected_components,
)
from marie_tpu.preprocess import BucketSpec, pad_to
from marie_tpu.preprocess.ops import normalize_page


def _cc_stats_fn():
    """Selected component-stats kernel (all variants produce identical
    outputs — parity pinned by ``test_ops_roi_cc.py``; ``runs`` is
    identical whenever rows hold <= its per-row run budget, which a
    48-slot budget guarantees for document layouts).

    ``MARIE_CC_STATS``: ``runs_cc`` (default — labels AND stats computed
    in the run domain; the pixel label grid is never materialised, so
    the iterative pixel propagation (~1.8 ms/page of the fused program
    at the 512x384 grid) disappears entirely), ``runs`` (pixel-label CC
    + per-row run compaction stats; probe_cc at 512x384 K=384 batch-16:
    0.93 ms/page stats), ``reduce2`` (row/col-projection stats, 2.06
    ms/page), ``reduce`` ([N, K] masked broadcast-reductions, 2.88), or
    ``sort`` (full-pixel 4-operand sort + segmented scans, 23.75; wins
    only for huge K).
    """
    import os

    name = os.environ.get("MARIE_CC_STATS", _CC_STATS_DEFAULT)
    return {
        "reduce": component_boxes_reduce,
        "reduce2": component_boxes_reduce2,
        "runs": component_boxes_runs,
        "runs_cc": component_boxes_runs_cc,
        "sort": component_boxes,
    }.get(name, component_boxes_runs_cc)


_CC_STATS_DEFAULT = "runs_cc"


def _detect_core(
    model: CRAFT,
    variables,
    pages_u8: jnp.ndarray,  # [B, H, W, 3] uint8 (same bucket)
    text_threshold: float,
    low_text: float,
    link_threshold: float,
    max_components: int,
    box_source: str = "heatmap",
):
    """Batched pages -> fixed-size per-page component stats, on device.

    BATCH-NATIVE ON PURPOSE: the CRAFT forward runs ONCE on the [B, ...]
    batch; only the elementwise/scan post-processing (mask, CC, box
    stats) is vmapped per page.  Putting the conv forward itself under
    ``vmap`` (the obvious ``vmap(single_page_detect)``) lowers the convs
    through the batching rule and was measured 4-5x slower for the whole
    detect program (44.5 -> 10.9 ms/page on a v5e at B=16) — never wrap
    conv models in vmap when the batch dim already exists.

    ``box_source='heatmap'`` is the production path (thresholded CRAFT
    region/affinity maps).  ``box_source='ink'`` runs the identical CRAFT
    forward (same compute graph, same cost) but takes the CC mask from the
    page's binarised ink with horizontal closing — deterministic boxes for
    benchmarking and CI where no trained weights exist.
    """
    if pages_u8.ndim == 3:
        # grayscale [B, H, W] pages — expand channels on device
        pages_u8 = jnp.repeat(pages_u8[..., None], 3, axis=-1)
    rgb = jax.vmap(normalize_page)(pages_u8)  # [B, H, W, 3] f32
    vdt = jax.tree_util.tree_leaves(variables)[0].dtype
    heat = model.apply(variables, rgb.astype(vdt)).astype(jnp.float32)
    region = heat[..., 0]
    affinity = heat[..., 1]
    if box_source == "ink":
        from marie_tpu.preprocess.ops import otsu_binarize, to_grayscale

        def page_mask(rgb_p, region_p):
            gray = to_grayscale(rgb_p)
            ink = otsu_binarize(gray)
            # downsample to a 4× coarse grid (CC cost is dominated by
            # serial row/col scans — half the grid edge halves every
            # scan) and join characters horizontally into word blobs
            ink4 = jax.lax.reduce_window(
                ink.astype(jnp.float32), -jnp.inf, jax.lax.max,
                (4, 4), (4, 4), "VALID",
            )
            region4 = jax.lax.reduce_window(
                region_p, -jnp.inf, jax.lax.max, (2, 2), (2, 2), "VALID"
            )
            joined = jax.lax.reduce_window(
                ink4, -jnp.inf, jax.lax.max, (1, 3), (1, 1), "SAME"
            )
            mask_p = (joined > 0) | (region4 > 2.0)  # keep heat dep alive
            scores_p = jnp.maximum(ink4, region4 * 0.0) + 1e-3
            return mask_p, scores_p

        mask, scores = jax.vmap(page_mask)(rgb, region)
        stride = 4
    else:
        # CC at the native heatmap grid: pooling a stride-2 heatmap to
        # stride 4 merges adjacent words (recall 0.99 -> 0.74), but a
        # model TRAINED at stride 4 (s2d stem, CraftConfig.fast_s2)
        # keeps the shrunk-region separation in its own grid.
        #
        # REGION-ONLY mask by default (round 5): this repo's region
        # target is the whole shrunk WORD box (craft.py trainer), not
        # the reference's per-character gaussians — words are single
        # components without any affinity help.  Including affinity in
        # the mask adds one band component per inter-word gap, DOUBLING
        # component count: a 555-word dense page emits ~1100 components,
        # overflows the 768 budget, and the min-linear-index top-k then
        # truncates the BOTTOM of the page (measured ood_dense recall
        # 0.767 with zero merges/zero framing errors — pure truncation).
        # MARIE_CC_MASK=region+affinity restores the old mask (the HLO
        # differs, so compile-cache entries never cross).
        import os as _os

        if _os.environ.get("MARIE_CC_MASK") == "region+affinity":
            mask = (region > low_text) | (affinity > link_threshold)
        else:
            mask = region > low_text
        scores = region
        stride = model.cfg.out_stride
    # sort-free box stats: top_k reps + masked reductions beat the
    # 4-operand full-pixel sort at the production K (<=1024 slots on a
    # 512x384 grid); outputs identical (test_ops_roi_cc.py parity test);
    # kernel variant selectable via MARIE_CC_STATS (_cc_stats_fn)
    cc_stats = _cc_stats_fn()
    if cc_stats is component_boxes_runs_cc:
        # run-domain CC+stats: no pixel label grid at all.  Stage-1 cost
        # is linear in the per-row run budget; MARIE_CC_RUNS trims it
        # when the workload's layout is known (bench pages peak ~11
        # words/row, the dense oracle at 15 — 48 is the conservative
        # library default, identity holds whenever rows stay under it)
        import os as _os

        runs_budget = int(_os.environ.get("MARIE_CC_RUNS", "48"))
        stats = jax.vmap(
            lambda m, s: cc_stats(
                m, s, max_components=max_components,
                max_runs_per_row=runs_budget,
            )
        )(mask, scores)
    else:
        labels = jax.vmap(connected_components)(mask)
        stats = jax.vmap(
            lambda l, s: cc_stats(l, s, max_components=max_components)
        )(labels, scores)
    stats["stride"] = jnp.full((pages_u8.shape[0],), stride, jnp.int32)
    return stats


@partial(jax.jit, static_argnames=("model", "text_threshold", "low_text",
                                   "link_threshold", "max_components",
                                   "box_source"))
def _detect_jit(
    model: CRAFT,
    variables,
    page_u8: jnp.ndarray,  # [H, W, 3] uint8 (bucket-padded)
    text_threshold: float,
    low_text: float,
    link_threshold: float,
    max_components: int,
    box_source: str = "heatmap",
):
    """Single page -> component stats (batch-of-one through the core)."""
    stats = _detect_core(
        model, variables, page_u8[None], text_threshold, low_text,
        link_threshold, max_components, box_source,
    )
    return {k: v[0] for k, v in stats.items()}


@partial(jax.jit, static_argnames=("model", "text_threshold", "low_text",
                                   "link_threshold", "max_components",
                                   "box_source"))
def _detect_batch_jit(
    model: CRAFT,
    variables,
    pages_u8: jnp.ndarray,  # [B, H, W, 3] uint8 (same bucket)
    text_threshold: float,
    low_text: float,
    link_threshold: float,
    max_components: int,
    box_source: str = "heatmap",
):
    """Multi-page detection in ONE program, batch-native (see
    :func:`_detect_core`)."""
    return _detect_core(
        model, variables, pages_u8, text_threshold, low_text,
        link_threshold, max_components, box_source,
    )


class BoxProcessorCraft(BoxProcessor):
    """Word detector over the flax CRAFT model."""

    def __init__(
        self,
        work_dir: str = "/tmp/boxes",
        models_dir: str = "",
        config: Optional[CraftConfig] = None,
        variables=None,
        text_threshold: float = 0.7,
        low_text: float = 0.4,
        link_threshold: float = 0.4,
        min_area: int = 10,
        max_components: int = 1024,
        bucket_spec: Optional[BucketSpec] = None,
        box_source: str = "heatmap",
        box_expand: float = 0.14,
        param_dtype: str = "float32",
        **kwargs,
    ):
        super().__init__(work_dir, models_dir, **kwargs)
        self.config = config or CraftConfig.base()
        self.model = CRAFT(self.config)
        self.text_threshold = text_threshold
        self.low_text = low_text
        self.link_threshold = link_threshold
        self.min_area = min_area
        self.max_components = max_components
        self.box_source = box_source
        # heatmap-mode dilation: CRAFT region targets are trained shrunk
        # (reference getDetBoxes dilates likewise); ink boxes are exact
        self.box_expand = box_expand if box_source == "heatmap" else 0.0
        self.buckets = bucket_spec or BucketSpec()
        if variables is None:
            # random init (weights are loaded via the model registry in
            # deployment; tests run with random weights)
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            variables = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy)
        if param_dtype == "bfloat16":
            from marie_tpu.utils.dtype import cast_floats

            variables = cast_floats(variables, jnp.bfloat16)
        # commit weights to device ONCE: checkpoint loaders return host
        # (numpy) arrays, and a numpy leaf passed as a jit argument is
        # re-uploaded on EVERY call — measured 4x on the fused program
        # through the device relay (1.8s -> 0.44s per 16-page batch)
        self.variables = jax.device_put(variables)

    def detect_words(self, image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        boxes, scores, _, _ = self.detect_with_page(image)
        return boxes, scores

    def detect_with_page(self, image: np.ndarray):
        """Detect AND keep the page on device for fused recognition.

        Returns (boxes_xywh [N,4] original coords, scores [N],
        page_u8_device [bh,bw,3] jnp.uint8 bucket-padded, scale) — the
        recogniser crops straight from ``page_u8_device`` so word pixels
        never make a host round trip (BASELINE north star).
        """
        handle = self.detect_dispatch(image)
        boxes, scores = self.detect_collect(handle)
        return boxes, scores, handle[1], handle[2]

    def prep_page(self, image: np.ndarray):
        """Bucket-fit + pad a page for detection: (padded_np, scale, (h, w))."""
        h, w = image.shape[:2]
        (bh, bw), scale = self.buckets.fit_with_scale(h, w)
        if scale < 1.0:
            import cv2

            image = cv2.resize(
                image, (int(w * scale), int(h * scale)), interpolation=cv2.INTER_AREA
            )
        return pad_to(image, bh, bw), scale, (h, w)

    def detect_dispatch(self, image: np.ndarray):
        """Phase 1: upload the page + launch detection WITHOUT waiting.

        Returns an opaque handle; multiple pages can be in flight so host
        round-trip latency overlaps across pages (software pipelining)."""
        padded, scale, (h, w) = self.prep_page(image)
        page_dev = jnp.asarray(padded)  # ONE upload per page (uint8)

        stats = _detect_jit(
            self.model,
            self.variables,
            page_dev,
            self.text_threshold,
            self.low_text,
            self.link_threshold,
            self.max_components,
            self.box_source,
        )
        return (stats, page_dev, scale, (h, w))

    def detect_dispatch_many(self, images, page_batch: int = 4):
        """Dispatch detection for many pages, batching same-bucket pages
        into single device programs (up to ``page_batch`` per dispatch)."""
        import cv2

        preps = []
        for image in images:
            h, w = image.shape[:2]
            (bh, bw), scale = self.buckets.fit_with_scale(h, w)
            work = image
            if scale < 1.0:
                work = cv2.resize(
                    image, (int(w * scale), int(h * scale)),
                    interpolation=cv2.INTER_AREA,
                )
            preps.append((pad_to(work, bh, bw), scale, (h, w), (bh, bw)))

        handles = [None] * len(images)
        i = 0
        while i < len(preps):
            j = i
            bucket = preps[i][3]
            group = []
            while j < len(preps) and preps[j][3] == bucket and len(group) < page_batch:
                group.append(j)
                j += 1
            batch = jnp.asarray(np.stack([preps[k][0] for k in group]))
            stats = _detect_batch_jit(
                self.model, self.variables, batch,
                self.text_threshold, self.low_text, self.link_threshold,
                self.max_components, self.box_source,
            )
            for slot, k in enumerate(group):
                per_page = {f: stats[f][slot] for f in stats}
                handles[k] = (per_page, batch[slot], preps[k][1], preps[k][2])
            i = j
        return handles

    def detect_collect(self, handle, stats=None, return_rows: bool = False):
        """Phase 2: wait for a dispatched detection, filter on host.

        ``stats`` may be pre-fetched host arrays (batched multi-page fetch
        — see the engine's fused path); otherwise ONE device→host transfer
        covers all stats fields.

        ``return_rows``: also return each surviving box's rank within the
        kept set (ascending slot order) — the single-program fused path
        decodes boxes in exactly this order on device, so the rank is the
        decoded-row index (``ocr/fused.py``).
        """
        stats_dev, _page_dev, scale, (h, w) = handle
        if stats is None:
            stats = jax.device_get(stats_dev)
        boxes = stats["boxes"]  # heatmap coords (stride 2)
        scores = stats["scores"]
        areas = stats["areas"]
        valid = stats["valid"]

        stride = float(np.asarray(stats.get("stride", 2)))
        score_floor = 0.0 if self.box_source == "ink" else self.text_threshold
        min_area = self.min_area / (stride / 2.0) ** 2  # area is in grid cells
        keep = valid & (scores >= score_floor) & (areas >= min_area)
        rows = np.arange(int(keep.sum()))  # rank within kept, slot order
        boxes = boxes[keep] * stride / scale  # grid -> padded page -> original
        if self.box_expand > 0 and len(boxes):
            bw = boxes[:, 2] - boxes[:, 0]
            bh = boxes[:, 3] - boxes[:, 1]
            boxes = boxes + np.stack(
                [-bw * self.box_expand, -bh * self.box_expand,
                 bw * self.box_expand, bh * self.box_expand], axis=-1,
            )
        scores = scores[keep]

        # clip to original page, convert to xywh
        boxes[:, 0] = np.clip(boxes[:, 0], 0, w)
        boxes[:, 1] = np.clip(boxes[:, 1], 0, h)
        boxes[:, 2] = np.clip(boxes[:, 2], 0, w)
        boxes[:, 3] = np.clip(boxes[:, 3], 0, h)
        xywh = np.stack(
            [
                boxes[:, 0],
                boxes[:, 1],
                boxes[:, 2] - boxes[:, 0],
                boxes[:, 3] - boxes[:, 1],
            ],
            axis=-1,
        )
        nonempty = (xywh[:, 2] > 0) & (xywh[:, 3] > 0)
        if return_rows:
            return xywh[nonempty], scores[nonempty], rows[nonempty]
        return xywh[nonempty], scores[nonempty]
