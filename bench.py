#!/usr/bin/env python
"""End-to-end OCR benchmark — prints ONE JSON line.

Workload (BASELINE.md config "batched fixed-shape-bucketed OCR"):
synthetic ground-truth pages (1024×768 DejaVu text) through the full
serving path — CRAFT detection forward + fused on-device CC
post-processing + line grouping + fused on-device crop+decode (TrOCR-fast
greedy, bf16).  When the in-repo on-TPU-trained checkpoints exist
(model_zoo/), the NEURAL detector (heatmap boxes) and trained recognizer
run and the detail reports REAL quality: detection recall/precision/IoU
and recognition CER vs the page ground truth.  Without checkpoints the
deterministic ink-box mode runs the identical compute graph.

Metric: pages/sec/chip end-to-end (best of two passes — the TPU relay in
this environment has >10x hour-scale throughput swings).  vs_baseline =
value / 50 (the BASELINE.json target of ≥50 pages/sec/chip on v5e).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

BASELINE_PAGES_PER_SEC = 50.0
PAGE_H, PAGE_W = 1024, 768
N_WARMUP_PAGES = 16  # matches the page_fuse_batch=16 group program
N_BENCH_PAGES = 16


def make_pages(n, seed=0, with_truth=False):
    """Synthetic text pages (DejaVu font — the distribution the in-repo
    synthetic recognizer checkpoint is trained on).  With ``with_truth``
    also returns per-page [(text, xywh), ...] ground truth."""
    from PIL import Image, ImageDraw, ImageFont

    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 20
        )
    except OSError:
        font = ImageFont.load_default()

    rng = np.random.default_rng(seed)
    words = [
        "invoice", "total", "amount", "2024", "payment", "due", "net",
        "terms", "claim", "policy", "member", "provider", "service",
        "balance", "statement", "account", "number", "date", "reference",
    ]
    pages, truths = [], []
    for k in range(n):
        img = Image.new("RGB", (PAGE_W, PAGE_H), (255, 255, 255))
        draw = ImageDraw.Draw(img)
        truth = []
        y = 40
        while y < PAGE_H - 70:
            x = 40
            while x < PAGE_W - 180:
                wtext = words[int(rng.integers(0, len(words)))]
                draw.text((x, y), wtext, fill=(0, 0, 0), font=font)
                bx = draw.textbbox((x, y), wtext, font=font)
                truth.append(
                    (wtext, [bx[0], bx[1], bx[2] - bx[0], bx[3] - bx[1]])
                )
                x = bx[2] + 18 + int(rng.integers(0, 30))
            y += 34 + int(rng.integers(0, 12))
        pages.append(np.asarray(img))
        truths.append(truth)
    return (pages, truths) if with_truth else pages


def main():
    import faulthandler

    faulthandler.dump_traceback_later(180, repeat=True, exit=False)
    import jax

    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from marie_tpu.boxes.craft_box_processor import BoxProcessorCraft
    from marie_tpu.document.trocr_ocr_processor import TrOcrProcessor
    from marie_tpu.models.configs import CraftConfig, TrOCRConfig
    from marie_tpu.ocr.ocr_engine import PipelineOcrEngine
    from marie_tpu.preprocess import BucketSpec

    platform = jax.devices()[0].platform

    repo = os.path.dirname(os.path.abspath(__file__))
    craft_ckpt = os.path.join(repo, "model_zoo", "craft-synth")
    if os.path.isdir(craft_ckpt):
        from marie_tpu.registry.checkpoints import load_params

        box = BoxProcessorCraft(
            config=CraftConfig.base(),
            variables=load_params(craft_ckpt),
            box_source="heatmap",
            text_threshold=0.6,
            low_text=0.4,
            bucket_spec=BucketSpec(shapes=((PAGE_H, PAGE_W),)),
            param_dtype="bfloat16",
        )
        detector_desc = "craft-base TRAINED heatmap + on-device CC"
    else:
        box = BoxProcessorCraft(
            config=CraftConfig.base(),
            box_source="ink",
            min_area=4,
            bucket_spec=BucketSpec(shapes=((PAGE_H, PAGE_W),)),
            param_dtype="bfloat16",
        )
        detector_desc = "craft-base fwd + on-device CC (ink boxes)"
    # use the in-repo synthetic-trained checkpoint when present — turns the
    # CER/IoU columns into real quality numbers instead of random-weight noise
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "model_zoo", "trocr-fast-synth")
    params = None
    trained = False
    if os.path.isdir(ckpt):
        try:
            from marie_tpu.registry.checkpoints import load_params

            params = load_params(ckpt)
            trained = True
        except Exception:  # noqa: BLE001 — fall back to random weights
            params = None
    icr = TrOcrProcessor(
        config=TrOCRConfig.fast(), params=params, beam_size=1,
        param_dtype="bfloat16", batch_sizes=(32, 128, 256),
    )
    engine = PipelineOcrEngine(box, icr)

    warm = make_pages(N_WARMUP_PAGES, seed=123)
    t0 = time.time()
    icr.warmup(page_hw=(PAGE_H, PAGE_W))  # pre-compile fused crop+decode
    print(f"warmup decode done {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    engine.extract(warm)
    compile_s = time.time() - t0
    print(f"warmup all done {compile_s:.0f}s", file=sys.stderr, flush=True)

    # two timed passes, best wins: the TPU here sits behind a shared relay
    # whose latency spikes would otherwise dominate run-to-run noise
    pages, truths = make_pages(N_BENCH_PAGES, seed=7, with_truth=True)
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        results = engine.extract(pages)
        dt = min(dt, time.time() - t0)

    # quality vs ground truth (detection recall/IoU always; CER meaningful
    # only with the trained checkpoint)
    from marie_tpu.check import compare_results

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
    quality = compare_results(golden, results, iou_threshold=0.4)

    n_words = sum(len(r["words"]) for r in results)
    pages_per_sec = N_BENCH_PAGES / dt
    out = {
        "metric": "end_to_end_ocr_throughput",
        "value": round(pages_per_sec, 2),
        "unit": "pages/sec/chip",
        "vs_baseline": round(pages_per_sec / BASELINE_PAGES_PER_SEC, 3),
        "detail": {
            "platform": platform,
            "page_shape": [PAGE_H, PAGE_W],
            "pages": N_BENCH_PAGES,
            "total_words": n_words,
            "words_per_sec": round(n_words / dt, 1),
            "p50_page_latency_ms": round(dt / N_BENCH_PAGES * 1000, 1),
            "compile_s": round(compile_s, 1),
            "recognizer": (
                "trocr-fast greedy bf16 (synthetic-trained ckpt)"
                if trained
                else "trocr-fast greedy bf16 (random init)"
            ),
            "detector": detector_desc,
            "detection_recall": quality["detection"]["recall"],
            "detection_precision": quality["detection"]["precision"],
            "detection_mean_iou": quality["detection"]["mean_iou"],
            "recognition_cer": quality["recognition"]["cer"],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
