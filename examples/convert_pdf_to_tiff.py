"""PDF/image -> multi-page TIFF conversion — usage parity with the
reference's ``examples/convert_pdf_to_tiff.py`` (docs_from_file ->
frames -> merged TIFF, keyed by the frame hash).

    python examples/convert_pdf_to_tiff.py <input_file> [out_dir]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input_file")
    ap.add_argument("out_dir", nargs="?", default="/tmp/marie/tiff-out")
    args = ap.parse_args()

    from marie_tpu.helper import ensure_exists
    from marie_tpu.utils.docs import frames_from_file, save_frames_as_tiff
    from marie_tpu.utils.image_utils import hash_frames_fast

    frames = frames_from_file(args.input_file)
    checksum = hash_frames_fast(frames)
    ensure_exists(args.out_dir)
    out = os.path.join(args.out_dir, f"{checksum}.tif")
    save_frames_as_tiff(frames, out)
    print(f"{len(frames)} frame(s) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
