"""OcrEngine — composition of a BoxProcessor (detection) and an
OcrProcessor (recognition) over pages and regions.

Behaviour parity with the reference
(``/root/reference/marie/ocr/ocr_engine.py:28`` — full-page vs region
extraction, per-page meta with ``lines``/``lines_bboxes``/``format``,
xywh→xyxy conversion on request).
"""

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from marie_tpu.boxes.box_processor import BoxProcessor
from marie_tpu.document.ocr_processor import OcrProcessor
from marie_tpu.enums import CoordinateFormat, PSMode
from marie_tpu.logging_core import MarieLogger


class OcrEngine(ABC):
    """Extracts text from frames (full page) or regions."""

    def __init__(self, **kwargs):
        self.logger = MarieLogger(type(self).__name__)

    @abstractmethod
    def extract(
        self,
        frames: Union[np.ndarray, List[np.ndarray]],
        pms_mode: PSMode = PSMode.SPARSE,
        coordinate_format: CoordinateFormat = CoordinateFormat.XYWH,
        regions: Optional[List[Dict[str, Any]]] = None,
        queue_id: str = "",
        **kwargs,
    ) -> List[Dict[str, Any]]:
        """Returns one result dict per page (reference schema:
        meta/words/lines with meta.page, meta.lines, meta.lines_bboxes,
        meta.format)."""


class PipelineOcrEngine(OcrEngine):
    """Concrete engine over a (box_processor, ocr_processor) pair."""

    def __init__(
        self,
        box_processor: BoxProcessor,
        ocr_processor: OcrProcessor,
        single_program: bool = True,
        page_fuse_batch: int = 16,
        rec_slots: int = 256,
        compact_slots: int = 192,
        upload_format: str = "u8",
        mesh=None,
        classifier=None,
        indexer=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.box_processor = box_processor
        self.ocr_processor = ocr_processor
        # "u4": pack grayscale pages to 4 bits/pixel before device_put
        # (native packer) — halves the host->device bytes on bandwidth-
        # limited links at <= 8/255 per-pixel quantization error
        self.upload_format = upload_format
        # optional jax.sharding.Mesh: page groups shard over every mesh
        # device (slice-scale serving — the TPU-native analog of the
        # reference's replica-per-GPU pinning, config/service/marie.yml:199);
        # mesh="local" builds a 1-D mesh over all local devices
        if mesh == "local":
            import jax as _jax
            from jax.sharding import Mesh as _Mesh

            devs = _jax.local_devices()
            mesh = _Mesh(np.asarray(devs), ("pages",)) if len(devs) > 1 else None
        self.mesh = mesh
        # both set: run the LayoutLM classification + NER heads INSIDE the
        # fused program (ocr/fused_chain.py) — a page never leaves the
        # device between detect, recognize, classify and extract
        # (reference runs these as separate host stages,
        # /root/reference/marie/pipe/base_pipeline.py:66)
        self.classifier = classifier
        self.indexer = indexer
        # detect+crop+decode in ONE XLA program per page (ocr/fused.py);
        # falls back automatically when the processor pair doesn't qualify.
        # page_fuse_batch stacks same-bucket pages into one execution —
        # measured 0.41 -> 1.79 pages/s (pb 1 -> 8) through the relay, and
        # pb=16 beat pb=8 again on 16-page batches; quality identical.
        # compact_slots: per-page share of the GROUP's global recognition
        # budget (cross-page crop compaction — pages borrow unused slots
        # from each other; overflow recognised in a tail dispatch).
        self.single_program = single_program
        self.page_fuse_batch = page_fuse_batch
        self.rec_slots = rec_slots
        self.compact_slots = compact_slots

    #: consumers (ExtractPipeline) may pass ``on_result_group`` /
    #: ``group_size`` to :meth:`extract` — the flag lets them feature-test
    #: without isinstance checks against this module
    supports_result_stream = True

    def extract(
        self,
        frames,
        pms_mode: PSMode = PSMode.SPARSE,
        coordinate_format: CoordinateFormat = CoordinateFormat.XYWH,
        regions=None,
        queue_id: str = "",
        **kwargs,
    ) -> List[Dict[str, Any]]:
        frames = _as_frame_list(frames)
        if regions:
            return self._extract_regions(
                frames, pms_mode, coordinate_format, regions, queue_id, **kwargs
            )
        return self._extract_fullpage(
            frames, pms_mode, coordinate_format, queue_id, **kwargs
        )

    # ------------------------------------------------------------------
    def _extract_fullpage(
        self, frames, pms_mode, coordinate_format, queue_id, **kwargs
    ):
        """Detect every page first, then recognise in one batched pass.

        Fused path (when detector exposes ``detect_with_page`` and the
        recogniser ``recognize_from_page``, SPARSE/LINE modes): the page is
        uploaded once, crops are cut+decoded on device — word pixels never
        cross the host↔device link.  Fallback: host fragments, batched
        across pages to fill the fixed-size decode buckets."""
        from marie_tpu.document.ocr_processor import assemble_page_result

        checksum = kwargs.get("checksum", "")
        fused = (
            pms_mode in (PSMode.SPARSE, PSMode.LINE)
            and hasattr(self.box_processor, "detect_with_page")
            and hasattr(self.ocr_processor, "recognize_from_page")
        )

        if fused and getattr(self, "single_program", True):
            from marie_tpu.ocr.fused import (
                fused_collect_many,
                fused_dispatch_stream,
                supports_fused_page,
            )

            if supports_fused_page(self.box_processor, self.ocr_processor):
                from marie_tpu.ocr.fused import handle_page_count

                # ONE program per page (or per page-batch group): detect +
                # box select + crop + decode in a single dispatch.  The
                # stream yields each group handle as its program goes in
                # flight, so the host postprocessing of group i
                # (organize_boxes + token decode, ~16 ms/page of Python)
                # overlaps BOTH the device executing groups i+1.. and the
                # uploader thread shipping them — a 3-stage software
                # pipeline: upload | compute | collect.
                #
                # ``on_result_group`` (ExtractPipeline streaming): each
                # group's ASSEMBLED results are handed over as soon as
                # they exist, so CPU-bound renderers run while the device
                # executes later groups.  ``group_size`` shrinks the page
                # group for this call only (a 16-page bundle at the
                # engine's pb=16 is ONE group — nothing to stream).
                on_result_group = kwargs.get("on_result_group")
                group_size = kwargs.get("group_size") or getattr(
                    self, "page_fuse_batch", 1
                )
                results = []
                for handle in fused_dispatch_stream(
                    self.box_processor,
                    self.ocr_processor,
                    frames,
                    rec_slots=getattr(self, "rec_slots", 256),
                    page_batch=group_size,
                    compact_slots=getattr(self, "compact_slots", 192),
                    upload_format=getattr(self, "upload_format", "u8"),
                    mesh=getattr(self, "mesh", None),
                    chain=(
                        (self.classifier, self.indexer)
                        if getattr(self, "classifier", None) is not None
                        and getattr(self, "indexer", None) is not None
                        else None
                    ),
                ):
                    n = handle_page_count(handle)
                    start = len(results)
                    group_pages = fused_collect_many(
                        self.box_processor,
                        self.ocr_processor,
                        [handle],
                        [pms_mode] * n,
                    )
                    for j, page in enumerate(group_pages):
                        results.append(
                            self._assemble_fused_result(
                                frames[start + j], start + j, page,
                                coordinate_format,
                            )
                        )
                    if on_result_group is not None:
                        on_result_group(results[start:], start)
                return results

        per_page = []
        all_fragments = []
        word_results = []
        if fused:
            # software pipeline: dispatch every page's detection first (all
            # uploads + detect programs go out back-to-back), then collect
            # and recognise — host round trips overlap with device work.
            can_pipeline = hasattr(self.box_processor, "detect_dispatch")
            if can_pipeline:
                # NOTE: detect_dispatch_many (vmapped page-batch detection)
                # exists but is disabled by default — the batched while_loop
                # in connected components runs every page to the worst-case
                # iteration count and measured slower end-to-end; per-page
                # dispatch pipelines better.
                handles = [
                    self.box_processor.detect_dispatch(_ensure_rgb_np(f))
                    for f in frames
                ]
            deep_pipeline = can_pipeline and hasattr(
                self.ocr_processor, "recognize_dispatch"
            )
            # batched stats fetch: stack every page's fixed-size stats on
            # device, transfer each field ONCE for the whole frame list
            stats_host = None
            if can_pipeline and len(handles) > 1:
                import jax
                import jax.numpy as _jnp

                stacked = {
                    k: _jnp.stack([h[0][k] for h in handles])
                    for k in handles[0][0]
                }
                fetched = jax.device_get(stacked)
                stats_host = [
                    {k: fetched[k][i] for k in fetched}
                    for i in range(len(handles))
                ]
            rec_futures = []
            for i, frame in enumerate(frames):
                if can_pipeline:
                    handle = handles[i]
                    raw_boxes, scores = self.box_processor.detect_collect(
                        handle,
                        stats=None if stats_host is None else stats_host[i],
                    )
                    page_dev, scale = handle[1], handle[2]
                else:
                    raw_boxes, scores, page_dev, scale = (
                        self.box_processor.detect_with_page(_ensure_rgb_np(frame))
                    )
                boxes, scores, lines, line_bboxes = (
                    self.box_processor.organize_boxes(
                        raw_boxes, scores, frame.shape[:2], pms_mode
                    )
                )
                per_page.append((frame, boxes, lines, line_bboxes, len(boxes)))
                if deep_pipeline:
                    rec_futures.append(
                        self.ocr_processor.recognize_dispatch(
                            page_dev, boxes, scale
                        )
                    )
                else:
                    word_results.extend(
                        self.ocr_processor.recognize_from_page(
                            page_dev, boxes, scale
                        )
                    )
            if deep_pipeline:
                if hasattr(self.ocr_processor, "recognize_collect_many"):
                    for page_words in self.ocr_processor.recognize_collect_many(
                        rec_futures
                    ):
                        word_results.extend(page_words)
                else:
                    for futures in rec_futures:
                        word_results.extend(
                            self.ocr_processor.recognize_collect(futures)
                        )
        else:
            for frame in frames:
                boxes, fragments, lines, _, line_bboxes = (
                    self.box_processor.extract_bounding_boxes(
                        queue_id, checksum, frame, pms_mode
                    )
                )
                per_page.append((frame, boxes, lines, line_bboxes, len(fragments)))
                all_fragments.extend(fragments)
            word_results = (
                self.ocr_processor.recognize_from_fragments(all_fragments)
                if all_fragments
                else []
            )

        results = []
        offset = 0
        for i, (frame, boxes, lines, line_bboxes, n) in enumerate(per_page):
            page_words = word_results[offset : offset + n]
            offset += n
            result = assemble_page_result(
                (frame.shape[0], frame.shape[1]), boxes, lines, page_words
            )
            if coordinate_format == CoordinateFormat.XYXY:
                for word in result["words"]:
                    x, y, w, h = word["box"]
                    word["box"] = [x, y, x + w, y + h]
            result["meta"]["page"] = i
            result["meta"]["lines"] = _tolist(lines)
            result["meta"]["lines_bboxes"] = _tolist(line_bboxes)
            result["meta"]["format"] = coordinate_format.name.lower()
            results.append(result)
        return results

    def _assemble_fused_result(
        self, frame, index: int, page, coordinate_format: CoordinateFormat
    ) -> Dict[str, Any]:
        """One fused-path page tuple -> the reference result schema."""
        from marie_tpu.document.ocr_processor import assemble_page_result

        boxes, scores, lines, line_bboxes, words, extra = page
        result = assemble_page_result(
            (frame.shape[0], frame.shape[1]), boxes, lines, words
        )
        if coordinate_format == CoordinateFormat.XYXY:
            for word in result["words"]:
                x, y, w, h = word["box"]
                word["box"] = [x, y, x + w, y + h]
        result["meta"]["page"] = index
        result["meta"]["lines"] = _tolist(lines)
        result["meta"]["lines_bboxes"] = _tolist(line_bboxes)
        result["meta"]["format"] = coordinate_format.name.lower()
        if extra is not None and "classification" in extra:
            cls = dict(extra["classification"])
            labels = getattr(self.classifier, "labels", None)
            if labels and cls["label_id"] < len(labels):
                cls["label"] = labels[cls["label_id"]]
            result["classification"] = cls
            ner_labels = getattr(self.indexer, "labels", None)
            if ner_labels:
                for word in result["words"]:
                    lid = word.get("ner_label_id")
                    if lid is not None and lid < len(ner_labels):
                        word["ner_label"] = ner_labels[lid]
        return result

    def _extract_regions(
        self, frames, pms_mode, coordinate_format, regions, queue_id, **kwargs
    ):
        """Region extraction: each region is cut out and recognised with
        its own PSMode (region['mode'] overrides), results keyed by id."""
        output = []
        for region in regions:
            missing = {"id", "pageIndex", "x", "y", "w", "h"} - set(region)
            if missing:
                raise ValueError(f"Required key missing in region: {region}")
            page_idx = int(region["pageIndex"])
            if page_idx >= len(frames):
                raise ValueError(f"region pageIndex {page_idx} out of range")
            frame = frames[page_idx]
            x, y, w, h = (int(region[k]) for k in ("x", "y", "w", "h"))
            x0, y0 = max(x, 0), max(y, 0)
            snippet = frame[y0 : y + h, x0 : x + w]
            mode = PSMode.from_value(region.get("mode", "raw_line"))
            page_result = self._extract_fullpage(
                [snippet], mode, coordinate_format, queue_id, **kwargs
            )[0]
            text = " ".join(wd["text"] for wd in page_result["words"])
            conf = (
                float(np.mean([wd["confidence"] for wd in page_result["words"]]))
                if page_result["words"]
                else 0.0
            )
            output.append(
                {
                    "id": region["id"],
                    "text": text,
                    "confidence": round(conf, 4),
                    "words": page_result["words"],
                }
            )
        return output


def _as_frame_list(frames) -> List[np.ndarray]:
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        return [frames]
    return list(frames)


def _ensure_rgb_np(image: np.ndarray) -> np.ndarray:
    if image.ndim == 2:
        return np.stack([image] * 3, axis=-1)
    if image.shape[-1] == 4:
        return image[..., :3]
    return image


def _tolist(arr):
    if isinstance(arr, np.ndarray):
        return arr.tolist()
    return list(arr)
