"""Train the document-boundary corner regressor on synthetic scans (on-TPU)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--out", type=str, default="/root/repo/model_zoo/boundary-synth")
    args = ap.parse_args()

    from marie_tpu.train.boundary import train_boundary_device
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    _, _, metrics = train_boundary_device(
        steps=args.steps, batch_size=args.batch_size, checkpoint_path=args.out,
    )
    print("BOUNDARY_EVAL=" + json.dumps(metrics))
    print("DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
