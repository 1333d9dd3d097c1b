"""On-chip single-page latency breakdown (VERDICT r3 #6: p50 <25 ms).

BENCH_r03 measured single-page p50 at 48 ms vs 9.9 ms/page batched; this
probe splits one `engine.extract([page])` into dispatch (host preprocess +
upload + program launch) vs collect (device completion + host decode) to
show where the fixed cost lives (device program? relay round-trip? host
python?), and times a few candidate knobs:

  - default engine (page_fuse_batch=16 program padded to 1 page)
  - rec_slots/compact_slots shrunk (smaller decode batch for 1 page)
  - upload formats u8/u4/u2

    python scripts/probe_single.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_page(h=1024, w=768, words=140, seed=0):
    from PIL import Image, ImageDraw, ImageFont

    rng = np.random.default_rng(seed)
    img = Image.new("L", (w, h), 255)
    d = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 18
        )
    except Exception:
        font = ImageFont.load_default()
    wordlist = ["invoice", "total", "2024", "amount", "claim", "member"]
    y = 30
    while y < h - 40 and words > 0:
        x = 30
        while x < w - 120 and words > 0:
            d.text((x, y), wordlist[int(rng.integers(len(wordlist)))], fill=0,
                   font=font)
            x += int(rng.integers(90, 140))
            words -= 1
        y += 30
    return np.asarray(img, dtype=np.uint8)


def probe(engine, page, label, n=5):
    from marie_tpu.ocr.fused import (
        fused_collect_many,
        fused_dispatch_stream,
        handle_page_count,
    )
    from marie_tpu.enums import PSMode

    engine.extract([page])  # warm/compile
    tot, disp, coll = [], [], []
    for _ in range(n):
        t0 = time.time()
        handles = []
        for handle in fused_dispatch_stream(
            engine.box_processor, engine.ocr_processor, [page],
            rec_slots=getattr(engine, "rec_slots", 256),
            page_batch=getattr(engine, "page_fuse_batch", 1),
            compact_slots=getattr(engine, "compact_slots", 192),
            upload_format=getattr(engine, "upload_format", "u8"),
        ):
            handles.append(handle)
        t1 = time.time()
        for handle in handles:
            fused_collect_many(
                engine.box_processor, engine.ocr_processor, [handle],
                [PSMode.SPARSE] * handle_page_count(handle),
            )
        t2 = time.time()
        tot.append(t2 - t0)
        disp.append(t1 - t0)
        coll.append(t2 - t1)
    med = sorted(tot)[len(tot) // 2]
    print(
        f"{label}: total p50 {med*1e3:.1f} ms (best {min(tot)*1e3:.1f}) | "
        f"dispatch {sorted(disp)[n//2]*1e3:.1f} ms | "
        f"collect {sorted(coll)[n//2]*1e3:.1f} ms",
        flush=True,
    )


def main() -> int:
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    from marie_tpu.ocr.util import get_known_ocr_engines

    page = make_page()
    engine = get_known_ocr_engines()["default"]
    probe(engine, page, "default(pb16)")

    for fmt in ("u8", "u4", "u2"):
        engine.upload_format = fmt
        probe(engine, page, f"upload={fmt}")
    engine.upload_format = "u4"

    # smaller per-page decode budget: geometric bound for a 140-word page
    for slots in (256, 128):
        engine.rec_slots = slots
        engine.compact_slots = slots
        probe(engine, page, f"slots={slots}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
