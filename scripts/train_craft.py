"""Train the CRAFT detector on synthetic pages (on-TPU)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument(
        "--preset",
        choices=("base", "fast", "fast_s2", "fast_s2d2", "fast_s4d4", "tiny"),
        default="base",
        help="CraftConfig preset (fast = 32ch serving trunk; fast_s2 = "
        "space-to-depth stem, stride-4 heatmap)",
    )
    args = ap.parse_args()

    from marie_tpu.models.configs import CraftConfig
    from marie_tpu.train.craft import train_craft_device
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    train_craft_device(
        config=getattr(CraftConfig, args.preset)(),
        steps=args.steps, batch_size=args.batch_size,
        checkpoint_path=args.out,
    )
    print("DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
