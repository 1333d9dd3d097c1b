"""Train the serving recognizer on synthetic words (on-TPU).

    python scripts/train_recognizer.py --steps 2000 --out /root/repo/model_zoo/trocr-fast-synth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init_params(name):
    """Resolve --init-from as a zoo slot name OR a checkpoint path."""
    if not name:
        return None
    from marie_tpu.registry.checkpoints import load_params
    from marie_tpu.registry.zoo import zoo_checkpoint

    ckpt = name if os.path.isdir(name) else zoo_checkpoint(name)
    if ckpt is None:
        raise SystemExit(f"--init-from checkpoint not found: {name}")
    return load_params(ckpt)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--preset", type=str, default="fast",
                    choices=["fast", "fast2", "fast3", "fast3g2", "fast3g2d6", "tiny"])
    ap.add_argument("--rotate-deg", type=float, default=0.0,
                    help="baseline-tilt augmentation range (serving crops "
                         "off a rotated page carry the tilt)")
    ap.add_argument("--text-mode", default="lexicon",
                    choices=["lexicon", "open"],
                    help="open = open-vocabulary mix (random n-grams, "
                         "pseudo-words, codes, punctuation)")
    ap.add_argument("--font-sizes", default="18,24,30",
                    help="comma list of training font sizes (add 14 for "
                         "dense-page small-glyph coverage)")
    ap.add_argument("--bold-p", type=float, default=0.0,
                    help="probability of stroke-width synthetic bold")
    ap.add_argument("--shear-p", type=float, default=0.0,
                    help="probability of affine-shear synthetic italic")
    ap.add_argument("--dither-p", type=float, default=0.0,
                    help="probability of ordered-dither binarization "
                         "(u1d 1-bit upload robustness)")
    ap.add_argument("--init-from", type=str, default=None,
                    help="zoo checkpoint name to warm-start from "
                         "(same architecture)")
    args = ap.parse_args()

    from marie_tpu.models.configs import TrOCRConfig
    from marie_tpu.train.recognizer import train_recognizer_device
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    config = {"fast": TrOCRConfig.fast, "fast2": TrOCRConfig.fast_v2,
              "fast3": TrOCRConfig.fast_v3,
              "fast3g2": TrOCRConfig.fast_v3_g2,
              "fast3g2d6": TrOCRConfig.fast_v3_g2_d6,
              "tiny": TrOCRConfig.tiny}[args.preset]()
    _, _, cer = train_recognizer_device(
        config=config,
        steps=args.steps,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        rotate_deg=args.rotate_deg,
        checkpoint_path=args.out,
        text_mode=args.text_mode,
        font_sizes=tuple(int(s) for s in args.font_sizes.split(",")),
        bold_p=args.bold_p,
        shear_p=args.shear_p,
        dither_p=args.dither_p,
        init_params=_init_params(args.init_from),
    )
    print(f"FINAL_CER={cer:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
