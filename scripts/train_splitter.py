"""Train the page boundary/continuation splitter head (on-TPU)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--out", type=str, default="/root/repo/model_zoo/layout-splitter-synth")
    args = ap.parse_args()

    from marie_tpu.train.layout import train_layout_splitter
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    _, _, metrics, _ = train_layout_splitter(
        steps=args.steps, checkpoint_path=args.out,
    )
    print("SPLITTER_EVAL=" + json.dumps(metrics))
    print("DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
