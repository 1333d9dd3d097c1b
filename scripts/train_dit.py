"""Train the DiT detector on synthetic pages (on-TPU)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--out", type=str, default="/root/repo/model_zoo/dit-synth")
    args = ap.parse_args()

    from marie_tpu.train.dit import train_dit_device
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    train_dit_device(
        steps=args.steps, batch_size=args.batch_size, checkpoint_path=args.out,
    )
    print("DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
