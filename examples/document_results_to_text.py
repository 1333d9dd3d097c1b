"""Convert saved OCR result JSONs to plain-text files — usage parity
with the reference's ``examples/document_results_to_text.py`` (walks a
directory of per-document ``meta``/results JSON and writes one ``.txt``
per document via ``meta_to_text``; no models are loaded).

    python examples/document_results_to_text.py <src_dir> <output_dir>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marie_tpu.utils.platform import honor_jax_platforms  # noqa: E402

honor_jax_platforms()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("src_dir")
    ap.add_argument("output_dir")
    args = ap.parse_args()

    from marie_tpu.ocr.util import meta_to_text

    os.makedirs(args.output_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(args.src_dir)):
        if not name.lower().endswith(".json"):
            continue
        src = os.path.join(args.src_dir, name)
        dst = os.path.join(
            args.output_dir, os.path.splitext(name)[0] + ".txt"
        )
        try:
            meta_to_text(src, text_output_path=dst)
            count += 1
            print(f"{src} -> {dst}")
        except Exception as ex:  # noqa: BLE001 — keep walking the dir
            print(f"skipped {src}: {ex!r}", file=sys.stderr)
    print(f"converted {count} documents")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
