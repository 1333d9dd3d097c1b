"""Train the TextFuseNet-analog fusion detector on synthetic pages."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--preset", type=str, default="synth",
                    choices=["synth", "s2"],
                    help="s2 = stride-2 sub-pixel word/char head")
    ap.add_argument(
        "--out", type=str, default="/root/repo/model_zoo/textfusenet-synth"
    )
    args = ap.parse_args()

    from marie_tpu.models.textfusenet import TextFuseNetConfig
    from marie_tpu.train.textfusenet import train_textfusenet_device
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = (TextFuseNetConfig.synth_s2() if args.preset == "s2"
           else TextFuseNetConfig.synth())
    train_textfusenet_device(
        config=cfg, steps=args.steps, batch_size=args.batch_size,
        checkpoint_path=args.out,
    )
    print("DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
