"""Train the LayoutLM classifier + indexer on synthetic documents (on-TPU)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--out-dir", type=str, default="/root/repo/model_zoo")
    args = ap.parse_args()

    from marie_tpu.train.layout import (
        train_layout_classifier,
        train_layout_indexer,
    )
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    _, _, clf_acc, _ = train_layout_classifier(
        steps=args.steps,
        checkpoint_path=os.path.join(args.out_dir, "layout-classifier-synth"),
    )
    _, _, ner_acc, _ = train_layout_indexer(
        steps=args.steps,
        checkpoint_path=os.path.join(args.out_dir, "layout-indexer-synth"),
    )
    print(f"CLASSIFIER_ACC={clf_acc:.4f} NER_TOKEN_ACC={ner_acc:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
