"""Batch document OCR — usage parity with the reference's
``examples/batch_document_ocr.py``: run the extract pipeline over a
directory of TIFF/PNG documents and write per-document artifacts.

    python examples/batch_document_ocr.py <input_dir> [output_dir]

Without trained weights installed, pass ``--engine mock`` (default here)
to exercise the full pipeline with canned recognition; with weights in
the model registry use ``--engine default``.
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
    ap.add_argument("output_dir", nargs="?", default="/tmp/marie/ocr-out")
    ap.add_argument("--engine", default="mock", choices=["mock", "default", "best"])
    args = ap.parse_args()

    from marie_tpu.ocr.util import get_known_ocr_engines
    from marie_tpu.pipe.extract_pipeline import ExtractPipeline
    from marie_tpu.utils.docs import frames_from_file

    engine = get_known_ocr_engines(engine=args.engine)[args.engine]
    pipeline = ExtractPipeline(ocr_engine=engine, work_dir=args.output_dir)

    exts = (".tif", ".tiff", ".png", ".jpg", ".jpeg")
    docs = sorted(
        f for f in os.listdir(args.input_dir) if f.lower().endswith(exts)
    )
    if not docs:
        print(f"no documents in {args.input_dir}")
        return 1

    for name in docs:
        path = os.path.join(args.input_dir, name)
        frames = frames_from_file(path)
        meta = pipeline.execute(
            ref_id=name, ref_type="batch", frames=frames, job_id=name
        )
        out_json = os.path.join(args.output_dir, f"{name}.meta.json")
        with open(out_json, "w") as fp:
            json.dump(meta, fp, indent=1, default=str)
        words = sum(len(p["words"]) for p in meta["ocr"])
        print(f"{name}: {meta['pages']} pages, {words} words -> {out_json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
