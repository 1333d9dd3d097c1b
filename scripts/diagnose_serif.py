#!/usr/bin/env python
"""Isolate the serif-page CER gap (VERDICT r2 weak #5).

Round-2 facts: crop-level serif CER ≈ 0 (serif IS in the training font
mix), but PAGE-level serif CER = 12.9% greedy.  The difference must come
from the serving path between page and crop.  This probe splits it:

  A. full fused path            (detect -> crop -> decode)   = the 12.9%
  B. ground-truth boxes + the SAME device crop+decode        (detection removed)
  C. detection recall/IoU on serif vs sans                   (box quality)

If B ≈ 0 while A is high, the recognizer is fine and detection/box
framing on serif pages is the culprit (e.g. serif words merging into one
component, or boxes clipping ascenders) — fix detection, don't retrain.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from scripts.check_quality import PAGE_H, PAGE_W, make_pages  # noqa: E402


def main():
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from marie_tpu.check import compare_results
    from marie_tpu.ocr.ocr_engine import PipelineOcrEngine
    from marie_tpu.ocr.util import _craft_box_processor, _trocr_processor

    box = _craft_box_processor()
    icr = _trocr_processor(beam_size=1)
    engine = PipelineOcrEngine(box, icr)

    for font in ("sans", "serif"):
        pages, truths = make_pages(4, seed=11, font=font)
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

        # A: full fused path
        results = engine.extract(pages)
        rep = compare_results(golden, results, iou_threshold=0.4)
        print(
            f"{font} A full-path: cer={rep['recognition']['cer']:.4f} "
            f"recall={rep['detection']['recall']:.4f} "
            f"iou={rep['detection']['mean_iou']:.4f}",
            flush=True,
        )

        # B: ground-truth boxes through the SAME device crop+decode
        from marie_tpu.check import character_error_rate

        cer_vals = []
        for page, truth in zip(pages, truths):
            padded, scale, hw = box.prep_page(
                page if page.ndim == 2 else page
            )
            import jax.numpy as jnp

            page_dev = jnp.asarray(padded)
            gt_boxes = np.asarray([b for _, b in truth], np.float32)
            words = icr.recognize_from_page(page_dev, gt_boxes, scale)
            for (t, _), w in zip(truth, words):
                cer_vals.append(character_error_rate(w["text"], t))
        print(f"{font} B gt-boxes:  cer={float(np.mean(cer_vals)):.4f}", flush=True)

        # C: box-size stats (does detection frame serif differently?)
        for page, truth in zip(pages[:1], truths[:1]):
            res = engine.extract([page])[0]
            det_h = [w["box"][3] for w in res["words"]]
            gt_h = [b[3] for _, b in truth]
            det_n, gt_n = len(det_h), len(gt_h)
            print(
                f"{font} C boxes: det={det_n} gt={gt_n} "
                f"med_h det={np.median(det_h):.1f} gt={np.median(gt_h):.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
