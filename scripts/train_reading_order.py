"""Train the reading-order ranker (LayoutReader analog) on synthetic layouts."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--out-dir", type=str, default="/root/repo/model_zoo")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from marie_tpu.train.reading_order import train_reading_order_device
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    _, _, pair_acc, tau = train_reading_order_device(
        steps=args.steps,
        batch_size=args.batch,
        checkpoint_path=os.path.join(args.out_dir, "reading-order-synth"),
    )
    print(f"PAIR_ACC={pair_acc:.4f} KENDALL_TAU={tau:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
