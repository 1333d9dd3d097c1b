"""Dense-layout detection diagnosis (VERDICT r4 #6: ood_dense recall).

The r5 dense-data retrain measured recall 0.7665 vs the incumbent's
0.7674 — IDENTICAL, so the ceiling is structural, not training data.
This probe separates the candidate causes on real ood_dense pages:

  a. component-budget saturation: kept components ≈ max_components
     (budget truncation drops whole words);
  b. word MERGING: one detected box covers >= 2 ground-truth words
     (tight 6-12 px gaps vanish on the stride-2 heatmap grid);
  c. outright misses: truth words no box touches (heatmap holes);
  d. matcher artifacts: boxes exist and overlap 1:1 but IoU < 0.4
     (framing off — box too large/small).

    python scripts/probe_dense.py [--detector craft-s2d2-dense-stage]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from scripts.check_quality import (  # noqa: E402
    DISTRIBUTIONS,
    PAGE_H,
    PAGE_W,
    make_pages,
)


def iou_xywh(a, b):
    ax0, ay0, aw, ah = a
    bx0, by0, bw, bh = b
    ix0, iy0 = max(ax0, bx0), max(ay0, by0)
    ix1, iy1 = min(ax0 + aw, bx0 + bw), min(ay0 + ah, by0 + bh)
    iw, ih = max(ix1 - ix0, 0), max(iy1 - iy0, 0)
    inter = iw * ih
    return inter / (aw * ah + bw * bh - inter + 1e-9)


def overlap_frac_of_truth(box, truth):
    """Intersection area / truth area (merge detection: a big merged box
    covers each member word almost fully but IoU vs each is low)."""
    ax0, ay0, aw, ah = box
    bx0, by0, bw, bh = truth
    ix0, iy0 = max(ax0, bx0), max(ay0, by0)
    ix1, iy1 = min(ax0 + aw, bx0 + bw), min(ay0 + ah, by0 + bh)
    inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
    return inter / (bw * bh + 1e-9)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--detector", default=None,
                    help="model_zoo dir name (default: serving ladder)")
    ap.add_argument("--max-components", type=int, default=768)
    ap.add_argument("--pages", type=int, default=2)
    args = ap.parse_args()

    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    # the oracle's own dense engine (max_components=768, 640 compact
    # slots): every program is already in the persistent cache from the
    # quality runs; jitted programs are weight-agnostic, so a stage
    # checkpoint swaps in via `variables` with zero recompiles
    from scripts.check_quality import build_engines

    engine = build_engines(["greedy"], dense=True)["greedy"]
    box = engine.box_processor
    if args.detector:
        import jax
        import jax.numpy as jnp

        from marie_tpu.registry.checkpoints import load_params
        from marie_tpu.utils.dtype import cast_floats

        # same bf16 cast + device commit as the processor's own init —
        # a dtype mismatch would silently retrace every program
        box.variables = jax.device_put(cast_floats(load_params(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "model_zoo", args.detector,
            )
        ), jnp.bfloat16))
    spec = DISTRIBUTIONS["ood_dense"]
    pages, truths = make_pages(args.pages, seed=11, **spec)

    total = {"truth": 0, "matched": 0, "merged_members": 0, "missed": 0,
             "framing": 0, "boxes": 0}
    results = engine.extract(pages)
    for k, (page, truth) in enumerate(zip(pages, truths)):
        boxes = np.asarray(
            [w["box"] for w in results[k]["words"]], np.float32
        ).reshape(-1, 4)
        n_det = len(boxes)
        tboxes = [t[1] for t in truth]
        # greedy IoU>=0.4 matching (compare_results semantics)
        matched_t = set()
        used_b = set()
        pairs = []
        for ti, tb in enumerate(tboxes):
            best, bi = 0.0, -1
            for bj, db in enumerate(boxes):
                if bj in used_b:
                    continue
                v = iou_xywh(db, tb)
                if v > best:
                    best, bi = v, bj
            if best >= 0.4:
                matched_t.add(ti)
                used_b.add(bi)
                pairs.append((ti, bi, best))
        # classify the unmatched truths
        merged = missed = framing = 0
        box_cover = np.zeros(n_det, np.int32)
        for ti, tb in enumerate(tboxes):
            for bj, db in enumerate(boxes):
                if overlap_frac_of_truth(db, tb) >= 0.6:
                    box_cover[bj] += 1
        multi = set(np.nonzero(box_cover >= 2)[0].tolist())
        for ti, tb in enumerate(tboxes):
            if ti in matched_t:
                continue
            cov = [bj for bj, db in enumerate(boxes)
                   if overlap_frac_of_truth(db, tb) >= 0.6]
            if any(bj in multi for bj in cov):
                merged += 1
            elif cov:
                framing += 1
            else:
                missed += 1
        total["truth"] += len(tboxes)
        total["matched"] += len(matched_t)
        total["merged_members"] += merged
        total["missed"] += missed
        total["framing"] += framing
        total["boxes"] += n_det
        # spatial signature of the losses: top-k budget truncation (the
        # stats keep components by min-linear-index order) would cluster
        # misses at the page BOTTOM; heatmap-confidence losses scatter
        miss_y = sorted(
            tb[1] for ti, tb in enumerate(tboxes) if ti not in matched_t
        )
        hist = np.histogram(
            miss_y, bins=8, range=(0, PAGE_H)
        )[0].tolist() if miss_y else []
        print(
            f"page {k}: truth={len(tboxes)} det_boxes={n_det} "
            f"matched={len(matched_t)} merged_members={merged} "
            f"missed={missed} framing={framing} "
            f"budget={args.max_components} miss_y_hist={hist}",
            flush=True,
        )
    r = total["matched"] / max(total["truth"], 1)
    print(
        f"TOTAL recall={r:.4f} truth={total['truth']} boxes={total['boxes']} "
        f"merged={total['merged_members']} missed={total['missed']} "
        f"framing={total['framing']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
