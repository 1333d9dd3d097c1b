"""Hello-marie quickstart — the reference ships ``examples/hello-marie``
as the first-contact demo.  This one needs NO input files: it renders a
small synthetic invoice page with PIL, runs the trained TPU stack on it
(fused detect → crop → decode in one XLA program), and prints the words
and a searchable-PDF path.

    python examples/hello_marie.py [--out /tmp/hello_marie.pdf]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marie_tpu.utils.platform import honor_jax_platforms  # noqa: E402

honor_jax_platforms()


def make_demo_page(width: int = 576, height: int = 768) -> np.ndarray:
    # 576x768 fits the smallest page bucket — fastest first compile
    from PIL import Image, ImageDraw, ImageFont

    img = Image.new("RGB", (width, height), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 24
        )
        small = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 18
        )
    except OSError:
        font = small = ImageFont.load_default()
    rows = [
        ("INVOICE", font, 60),
        ("invoice number 12345", small, 140),
        ("date 11/02/2024", small, 180),
        ("service consulting", small, 260),
        ("amount 1500.00", small, 300),
        ("total due 1500.00", font, 380),
    ]
    for text, f, y in rows:
        draw.text((60, y), text, fill=(0, 0, 0), font=f)
    return np.asarray(img)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hello_marie.pdf")
    args = ap.parse_args()

    from marie_tpu.ocr.util import get_known_ocr_engines
    from marie_tpu.renderer import PdfRenderer

    page = make_demo_page()
    engine = get_known_ocr_engines()["default"]
    results = engine.extract([page])

    words = results[0]["words"]
    print(f"read {len(words)} words:")
    for w in words:
        print(f"  {w['text']!r:22} box={w['box']} conf={w['confidence']}")

    PdfRenderer().render([page], results, output_filename=args.out)
    print(f"searchable PDF written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
