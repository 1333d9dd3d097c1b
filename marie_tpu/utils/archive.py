"""Asset archive helpers — zip/tiff merging for pipeline delivery
(reference ``marie/utils/zip_ops.py merge_zip`` and
``marie/utils/tiff_ops.py merge_tiff``)."""

import os
import zipfile
from typing import Callable, List, Optional

import numpy as np


def merge_zip(src_dir: str, zip_path: str) -> List[str]:
    """Zip every file under ``src_dir`` (flat, sorted) into ``zip_path``;
    returns the archived names.  A missing/empty dir yields an empty
    archive rather than an error (reference merge_zip contract)."""
    names: List[str] = []
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        if os.path.isdir(src_dir):
            for base, _, files in os.walk(src_dir):
                for f in sorted(files):
                    full = os.path.join(base, f)
                    arcname = os.path.relpath(full, src_dir)
                    zf.write(full, arcname)
                    names.append(arcname)
    return names


def merge_tiff(
    src_dir: str,
    tiff_path: str,
    sort_key: Optional[Callable[[str], object]] = None,
) -> int:
    """Merge every raster image under ``src_dir`` into one multi-page
    TIFF in ``sort_key`` order; returns the page count (reference
    merge_tiff — page assets to a single G4-style document)."""
    from PIL import Image

    if not os.path.isdir(src_dir):
        return 0
    files = [
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if os.path.isfile(os.path.join(src_dir, f))
    ]
    files.sort(key=sort_key or (lambda p: p))
    pages = []
    for f in files:
        try:
            img = Image.open(f)
            img.load()
            pages.append(img)
        except Exception:  # noqa: BLE001 — skip non-image files
            continue
    if not pages:
        return 0
    first, rest = pages[0], pages[1:]
    # explicit format: delivery names like `{prefix}.tif.clean` have no
    # PIL-recognizable extension.  packbits: near-raw encode speed at a
    # fraction of the bytes (uncompressed gray pages are ~2.4 MB each —
    # pure disk I/O on the delivery path); G4 for 1-bit pages
    comp = "group4" if first.mode == "1" else "packbits"
    first.save(
        tiff_path, format="TIFF", save_all=True, append_images=rest,
        compression=comp,
    )
    return len(pages)
