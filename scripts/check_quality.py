"""Quality oracle — the reference's check_* harness pattern
(tests/integration/check_extract_pipeline.py): run the real engines over
ground-truth pages on the TPU and print detection/recognition quality.

    python scripts/check_quality.py [--engine default|best] [--pages 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="default", choices=["default", "best"])
    ap.add_argument("--pages", type=int, default=4)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import PAGE_H, PAGE_W, make_pages
    from marie_tpu.check import compare_results
    from marie_tpu.ocr.util import get_known_ocr_engines

    engine = get_known_ocr_engines(engine=args.engine)[args.engine]
    pages, truths = make_pages(args.pages, seed=args.seed, with_truth=True)
    results = engine.extract(pages)
    golden = [
        {
            "meta": {"imageSize": {"width": PAGE_W, "height": PAGE_H}},
            "words": [
                {"id": i, "text": t, "box": b, "confidence": 1.0, "line": 1}
                for i, (t, b) in enumerate(truth)
            ],
            "lines": [],
        }
        for truth in truths
    ]
    report = compare_results(golden, results, iou_threshold=0.4)
    report["engine"] = args.engine
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
