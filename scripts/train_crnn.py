"""Train the CRNN/CTC recognizer on synthetic words (on-TPU)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from marie_tpu.train.crnn import train_crnn_device
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    _, _, cer = train_crnn_device(
        steps=args.steps, batch_size=args.batch_size, checkpoint_path=args.out
    )
    print(f"FINAL_CER={cer:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
