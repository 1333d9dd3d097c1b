"""Document classification demo — usage parity with the reference's
``examples/document_classifier.py``, re-based on the TPU-native chained
engine: detection, recognition, LayoutLM classification and NER run in
ONE compiled program per page group (``marie_tpu/ocr/fused_chain.py``;
the reference classifies in a separate host stage after OCR).

    python examples/document_classifier.py <input_dir>

Requires the in-repo trained checkpoints (model_zoo/ — present in this
repository); falls back to host-side classification when the chain heads
are absent.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marie_tpu.utils.platform import honor_jax_platforms  # noqa: E402

honor_jax_platforms()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input_dir")
    args = ap.parse_args()

    from marie_tpu.components.document_classifier import (
        LayoutDocumentClassifier,
    )
    from marie_tpu.components.document_indexer import LayoutDocumentIndexer
    from marie_tpu.ocr.ocr_engine import PipelineOcrEngine
    from marie_tpu.ocr.util import _craft_box_processor, _trocr_processor
    from marie_tpu.utils.docs import frames_from_file

    classifier = LayoutDocumentClassifier.from_zoo_chain()
    indexer = LayoutDocumentIndexer.from_zoo_chain()
    engine = PipelineOcrEngine(
        _craft_box_processor(),
        _trocr_processor(beam_size=1),
        classifier=classifier,
        indexer=indexer,
    )

    exts = (".tif", ".tiff", ".png", ".jpg", ".jpeg")
    docs = sorted(
        f for f in os.listdir(args.input_dir) if f.lower().endswith(exts)
    )
    for name in docs:
        frames = frames_from_file(os.path.join(args.input_dir, name))
        results = engine.extract(frames)
        for page_i, res in enumerate(results):
            out = {
                "doc": name,
                "page": page_i,
                "classification": res.get("classification"),
                "words": len(res["words"]),
                "entities": [
                    {"text": w["text"], "label": w["ner_label"]}
                    for w in res["words"]
                    if w.get("ner_label", "O") != "O"
                ][:10],
            }
            print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
