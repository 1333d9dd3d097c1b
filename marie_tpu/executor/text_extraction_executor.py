"""TextExtractionExecutor — the OCR workload endpoint.

Parity with the reference
(``/root/reference/marie/executor/text/text_extraction_executor.py:30`` —
``/document/extract`` endpoint: loads frames from docs/assets, runs the
extract pipeline, returns {status, runtime_info, metadata}; plus the
shipped ``TextExtractionExecutorMock:308`` used by the stock config).
"""

import time
from typing import Any, Dict, Optional

import numpy as np

from marie_tpu.enums import CoordinateFormat, PSMode
from marie_tpu.executor.storage import StorageMixin
from marie_tpu.logging_core import MDC
from marie_tpu.serve.executors import BaseExecutor
from marie_tpu.serve.executors.decorators import requests, safely_encoded
from marie_tpu.types.docs import DocumentArray


def _frames_from_docs_or_assets(docs: DocumentArray):
    from marie_tpu.utils.docs import frames_from_docs, frames_from_file

    frames = []
    for doc in docs:
        if doc.tensor is not None:
            arr = np.asarray(doc.tensor).astype(np.uint8)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, -1)
            frames.append(arr)
        elif doc.uri:
            frames.extend(frames_from_file(doc.uri))
        elif doc.tags.get("asset_key"):
            frames.extend(frames_from_file(doc.tags["asset_key"]))
    return frames


class TextExtractionExecutor(StorageMixin, BaseExecutor):
    def __init__(
        self,
        pipeline=None,
        ocr_engine: Optional[str] = "default",
        work_dir: str = "/tmp/generators",
        storage_enabled: bool = False,
        storage_conf: Optional[Dict[str, Any]] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        # result persistence (reference text_extraction_executor.py:123
        # wires StorageMixin.setup_storage from the `storage` config key)
        self.setup_storage(storage_enabled, storage_conf,
                           silence_exceptions=True)
        if pipeline is None:
            from marie_tpu.ocr.util import get_known_ocr_engines
            from marie_tpu.pipe.extract_pipeline import ExtractPipeline

            engine = get_known_ocr_engines(engine=ocr_engine)[ocr_engine]
            # overlay cleanup is a standard stage of the reference's
            # extract flow (marie/pipe/components.py:110) — wire the
            # trained GAN when the zoo checkpoint exists; the pipeline's
            # page_cleaner feature flag (default on) gates it per request
            overlay = None
            try:
                from marie_tpu.overlay import OverlayProcessor

                cand = OverlayProcessor()
                overlay = cand if cand.trained else None
            except Exception:  # noqa: BLE001 — cleanup is optional
                overlay = None
            pipeline = ExtractPipeline(
                ocr_engine=engine, work_dir=work_dir,
                overlay_processor=overlay,
            )
        self.pipeline = pipeline

    @requests(on="/document/extract")
    @safely_encoded
    def extract(self, docs: DocumentArray, parameters: Dict[str, Any], **kwargs):
        job_id = str(parameters.get("job_id", ""))
        MDC.put("request_id", job_id)
        try:
            frames = _frames_from_docs_or_assets(docs)
            if not frames:
                return {"status": "failed", "error": "no frames in request"}
            pms_mode = PSMode.from_value(str(parameters.get("mode", "sparse")))
            coord = CoordinateFormat(
                str(parameters.get("output_format", "xywh")).lower()
            )
            regions = parameters.get("regions") or None
            t0 = time.time()
            metadata = self.pipeline.execute(
                ref_id=str(parameters.get("ref_id", docs[0].id if len(docs) else "")),
                ref_type=str(parameters.get("ref_type", "doc")),
                frames=frames,
                pms_mode=pms_mode,
                coordinate_format=coord,
                regions=regions,
                job_id=job_id,
                runtime_conf=parameters.get("features", {}) or {},
            )
            if self.storage_enabled:
                # persist per-request results (reference
                # text_extraction_executor.py:291-303 — one StorageDoc
                # with the extract metadata, store_mode="content")
                from marie_tpu.api.docs import StorageDoc
                from marie_tpu.utils.image_utils import hash_frames_fast

                ref_id = str(parameters.get(
                    "ref_id", docs[0].id if len(docs) else ""))
                self.store(
                    ref_id=ref_id,
                    ref_type=str(parameters.get("ref_type", "doc")),
                    store_mode="content",
                    docs=[StorageDoc(
                        content=metadata,
                        tags={
                            "action": "extract",
                            "index": -1,
                            "type": "extract_results",
                            "ttl": 48 * 60,
                            "checksum": hash_frames_fast(frames),
                        },
                    )],
                )
            return {
                "status": "succeeded",
                "runtime_info": {
                    "elapsed": round(time.time() - t0, 3),
                    "pages": len(frames),
                },
                "metadata": metadata,
            }
        except Exception as ex:  # noqa: BLE001 — reported in the envelope
            self.logger.error(f"extract failed: {ex!r}")
            return {"status": "failed", "error": repr(ex)}
        finally:
            MDC.remove("request_id")

    @requests(on="/document/status")
    def info(self, docs, **kwargs):
        from marie_tpu.helper import get_full_version

        return {"status": "OK", "runtime_info": get_full_version()}


class TextExtractionExecutorMock(BaseExecutor):
    """Mock used by stock configs and tests (reference :308)."""

    @requests(on="/document/extract")
    @safely_encoded
    def extract(self, docs: DocumentArray, parameters: Dict[str, Any], **kwargs):
        from marie_tpu.ocr.mock_ocr_engine import MockOcrEngine

        frames = _frames_from_docs_or_assets(docs)
        if not frames:
            frames = [np.full((64, 64, 3), 255, np.uint8)]
        results = MockOcrEngine().extract(frames)
        return {
            "status": "succeeded",
            "runtime_info": {"mock": True, "pages": len(frames)},
            "metadata": {"ocr": results},
        }
