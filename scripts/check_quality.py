"""Quality oracle — the reference's check_* harness pattern
(tests/integration/check_extract_pipeline.py): run the real engines over
ground-truth pages on the TPU and print a quality table with
IN-DISTRIBUTION and OUT-OF-DISTRIBUTION columns (VERDICT r1 #7).

Distributions:
  in_dist      — DejaVu Sans, clean (the training font)
  ood_serif    — DejaVu Serif (held-out font)
  ood_mono     — DejaVu Sans Mono (held-out font)
  ood_noise    — training font + gaussian noise
  ood_jpeg     — training font + JPEG q=35 compression
  ood_rotate   — training font + ±2° rotation

Decoders: greedy (default engine), beam-5, voting ensemble ('best').

    python scripts/check_quality.py [--pages 4] [--decoders greedy,beam5,voting]
"""

import argparse
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PAGE_H, PAGE_W = 1024, 768
FONTS = {
    "sans": "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "serif": "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "mono": "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
}
WORDS = (
    "invoice total amount 2024 payment due net terms claim policy member "
    "provider service balance statement account number date reference"
).split()


def make_pages(n, seed=0, font="sans", perturb=None):
    """Ground-truth pages; perturb in {None, noise, jpeg, rotate}."""
    from PIL import Image, ImageFont

    try:
        fnt = ImageFont.truetype(FONTS[font], 20)
    except OSError:
        fnt = ImageFont.load_default()
    rng = np.random.default_rng(seed)
    pages, truths = [], []
    for _ in range(n):
        from PIL import ImageDraw

        img = Image.new("RGB", (PAGE_W, PAGE_H), (255, 255, 255))
        draw = ImageDraw.Draw(img)
        truth = []
        y = 40
        while y < PAGE_H - 70:
            x = 40
            while x < PAGE_W - 180:
                wtext = WORDS[int(rng.integers(0, len(WORDS)))]
                draw.text((x, y), wtext, fill=(0, 0, 0), font=fnt)
                bx = draw.textbbox((x, y), wtext, font=fnt)
                truth.append((wtext, [bx[0], bx[1], bx[2] - bx[0], bx[3] - bx[1]]))
                x = bx[2] + 18 + int(rng.integers(0, 30))
            y += 34 + int(rng.integers(0, 12))
        page = np.asarray(img, np.uint8)

        if perturb == "noise":
            page = np.clip(
                page.astype(np.float32) + rng.normal(0, 18, page.shape), 0, 255
            ).astype(np.uint8)
        elif perturb == "jpeg":
            buf = io.BytesIO()
            Image.fromarray(page).save(buf, "JPEG", quality=35)
            page = np.asarray(Image.open(buf).convert("RGB"))
        elif perturb == "rotate":
            angle = float(rng.uniform(-2.0, 2.0))
            rot = Image.fromarray(page).rotate(
                angle, resample=Image.BILINEAR, fillcolor=(255, 255, 255)
            )
            page = np.asarray(rot)
            # rotate the truth boxes around the page centre (as loose
            # axis-aligned hulls) so detection IoU stays meaningful
            cx, cy = PAGE_W / 2, PAGE_H / 2
            rad = -np.radians(angle)
            cos, sin = np.cos(rad), np.sin(rad)
            new_truth = []
            for t, (bx0, by0, bw, bh) in truth:
                corners = np.array(
                    [[bx0, by0], [bx0 + bw, by0], [bx0, by0 + bh], [bx0 + bw, by0 + bh]],
                    np.float32,
                )
                rel = corners - [cx, cy]
                rotd = rel @ np.array([[cos, -sin], [sin, cos]], np.float32).T + [cx, cy]
                x0, y0 = rotd.min(0)
                x1, y1 = rotd.max(0)
                new_truth.append((t, [float(x0), float(y0), float(x1 - x0), float(y1 - y0)]))
            truth = new_truth
        pages.append(page)
        truths.append(truth)
    return pages, truths


DISTRIBUTIONS = {
    "in_dist": dict(font="sans", perturb=None),
    "ood_serif": dict(font="serif", perturb=None),
    "ood_mono": dict(font="mono", perturb=None),
    "ood_noise": dict(font="sans", perturb="noise"),
    "ood_jpeg": dict(font="sans", perturb="jpeg"),
    "ood_rotate": dict(font="sans", perturb="rotate"),
}


def build_engines(decoders):
    from marie_tpu.ocr.util import (
        _craft_box_processor,
        _crnn_processor,
        _trocr_processor,
    )
    from marie_tpu.ocr.ocr_engine import PipelineOcrEngine
    from marie_tpu.ocr.voting_ocr_engine import VotingOcrEngine

    box = _craft_box_processor()
    engines = {}
    if "greedy" in decoders:
        engines["greedy"] = PipelineOcrEngine(box, _trocr_processor(beam_size=1))
    if "beam5" in decoders:
        engines["beam5"] = PipelineOcrEngine(box, _trocr_processor(beam_size=5))
    if "voting" in decoders:
        engines["voting"] = VotingOcrEngine(
            box_processor=box,
            ocr_processors=[_trocr_processor(beam_size=5), _crnn_processor()],
        )
    return engines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=4)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument(
        "--decoders", default="greedy,beam5,voting",
        help="comma list of greedy,beam5,voting",
    )
    ap.add_argument(
        "--dists", default=",".join(DISTRIBUTIONS),
        help="comma list of distribution names",
    )
    args = ap.parse_args()

    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    from marie_tpu.check import compare_results

    engines = build_engines(args.decoders.split(","))
    table = {}
    for dist in args.dists.split(","):
        spec = DISTRIBUTIONS[dist]
        pages, truths = make_pages(args.pages, seed=args.seed, **spec)
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
        for name, engine in engines.items():
            results = engine.extract(pages)
            rep = compare_results(golden, results, iou_threshold=0.4)
            table[f"{dist}/{name}"] = {
                "cer": rep["recognition"]["cer"],
                "detection_recall": rep["detection"]["recall"],
                "detection_iou": rep["detection"]["mean_iou"],
            }
            print(f"{dist}/{name}: {table[f'{dist}/{name}']}", file=sys.stderr, flush=True)

    # detector-only quality for the alternative trained detectors
    for det_name, evaluator in (("textfusenet", _eval_textfusenet),):
        try:
            row = evaluator(args.pages, args.seed)
            if row:
                table[f"detector/{det_name}"] = row
                print(f"detector/{det_name}: {row}", file=sys.stderr, flush=True)
        except Exception as ex:  # noqa: BLE001 — optional checkpoint
            print(f"detector/{det_name} skipped: {ex!r}", file=sys.stderr)

    print(json.dumps({"pages_per_config": args.pages, "quality": table}, indent=1))
    return 0


def _eval_textfusenet(n_pages: int, seed: int):
    """Detection-only eval of the trained TextFuseNet-analog checkpoint
    on held-out synthetic pages (recall/precision/IoU at 0.4)."""
    import numpy as np

    from marie_tpu.boxes.textfusenet_box_processor import (
        BoxProcessorTextFuseNet,
    )
    from marie_tpu.preprocess import BucketSpec
    from marie_tpu.registry.zoo import zoo_checkpoint
    from marie_tpu.train.textfusenet import render_page_tfn

    if zoo_checkpoint("textfusenet-synth") is None:
        return None
    proc = BoxProcessorTextFuseNet(
        page_hw=(512, 384), bucket_spec=BucketSpec(shapes=((512, 384),))
    )
    rng = np.random.default_rng(seed + 766)
    tp = fp = fn = 0
    ious = []
    for _ in range(n_pages):
        page, _, wb, wv, _, _ = render_page_tfn(rng, (512, 384))
        gt = wb[wv]
        boxes, _ = proc.detect_words(page)
        pred = (
            np.stack(
                [boxes[:, 0], boxes[:, 1],
                 boxes[:, 0] + boxes[:, 2], boxes[:, 1] + boxes[:, 3]], -1
            )
            if len(boxes)
            else np.zeros((0, 4))
        )
        used = np.zeros(len(pred), bool)
        for g in gt:
            best, bi = 0.0, -1
            for i, p in enumerate(pred):
                if used[i]:
                    continue
                ix = max(0.0, min(g[2], p[2]) - max(g[0], p[0]))
                iy = max(0.0, min(g[3], p[3]) - max(g[1], p[1]))
                inter = ix * iy
                u = (
                    (g[2] - g[0]) * (g[3] - g[1])
                    + (p[2] - p[0]) * (p[3] - p[1])
                    - inter
                )
                iou = inter / u if u > 0 else 0.0
                if iou > best:
                    best, bi = iou, i
            if best >= 0.4:
                tp += 1
                used[bi] = True
                ious.append(best)
            else:
                fn += 1
        fp += int((~used).sum())
    return {
        "detection_recall": round(tp / max(tp + fn, 1), 3),
        "detection_precision": round(tp / max(tp + fp, 1), 3),
        "detection_iou": round(float(np.mean(ious)) if ious else 0.0, 3),
    }


if __name__ == "__main__":
    raise SystemExit(main())
