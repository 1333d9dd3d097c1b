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
    ap.add_argument("--preset", type=str, default="base",
                    choices=["base", "s1"],
                    help="base = stride-2 head; s1 = 2x2 sub-pixel phase "
                         "head (stride-1 output grid)")
    args = ap.parse_args()

    from marie_tpu.models.configs import ViTConfig
    from marie_tpu.train.dit import train_dit_device
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    config = {"base": ViTConfig.dit_synth,
              "s1": ViTConfig.dit_synth_s1}[args.preset]()
    train_dit_device(
        config=config,
        steps=args.steps, batch_size=args.batch_size, checkpoint_path=args.out,
    )
    print("DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
