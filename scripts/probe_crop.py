"""Isolate the fused program's crop/unpack cost (round 5).

RTT-corrected bench deltas put crop_decode at 6.71 ms/page while the
standalone encoder+prefill+greedy path measures ~3.2 (probe_decode) —
leaving ~3.5 ms/page unexplained between the box stats and the decode.
This probe times, on one page batch at the serving shape:

  unpack    — u2 -> u8 page expansion alone
  crop      — crop_resize_pallas over realistic word boxes
  fused d1  — the full compact program with decode_steps=1
  fused     — the full compact program with the serving step budget

so (fused - fused_d1) isolates decode and (fused_d1 - detect) isolates
crop+glue inside the REAL program (deltas cancel the ~25 ms relay RTT).

    python scripts/probe_crop.py [--pages 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def timed(fn, n=3):
    import jax

    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn()
        jax.device_get(out)
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=16)
    ap.add_argument("--slots", type=int, default=160)
    args = ap.parse_args()

    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from bench import make_pages  # the exact bench workload
    from marie_tpu.boxes.craft_box_processor import (
        BoxProcessorCraft, _detect_batch_jit,
    )
    from marie_tpu.document.trocr_ocr_processor import TrOcrProcessor
    from marie_tpu.models.configs import CraftConfig, TrOCRConfig
    from marie_tpu.ocr.fused import (
        _fused_pages_compact, _pallas_crop_default,
    )
    from marie_tpu.ops.pallas.crop_resize import crop_resize_pallas
    from marie_tpu.preprocess import BucketSpec
    from marie_tpu.registry.checkpoints import load_params
    from marie_tpu.utils.pack4 import pack2

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    box = BoxProcessorCraft(
        config=CraftConfig.fast_s2d2(),
        variables=load_params(os.path.join(repo, "model_zoo", "craft-s2d2-synth")),
        box_source="heatmap", text_threshold=0.6, low_text=0.4,
        max_components=384,
        bucket_spec=BucketSpec(shapes=((1024, 768),)),
        param_dtype="bfloat16",
    )
    icr = TrOcrProcessor(
        config=TrOCRConfig.fast_v3_g2_d6(),
        params=load_params(
            os.path.join(repo, "model_zoo", "trocr-fast3g2d6ov-synth")
        ),
        beam_size=1, param_dtype="bfloat16",
    )

    n = args.pages
    pages = make_pages(n, seed=7)
    preps = [box.prep_page(p) for p in pages]
    batch_np = np.stack([p[0] for p in preps])
    packed_np = pack2(batch_np)
    clip = jnp.asarray(
        [[p[2][1] * p[1], p[2][0] * p[1]] for p in preps], jnp.float32
    )
    packed = jax.device_put(packed_np)
    plain = jax.device_put(batch_np)

    # --- unpack alone ---
    from marie_tpu.ocr.fused import _unpack_page

    @jax.jit
    def unpack_only(x):
        return jax.vmap(lambda p: _unpack_page(p, bits=2))(x).sum()

    t_unpack = timed(lambda: unpack_only(packed))

    # --- crop alone: realistic per-page boxes (~140 words) ---
    rng = np.random.default_rng(0)
    n_crops = n * args.slots
    bw = rng.uniform(40, 160, n_crops)
    bh = rng.uniform(18, 30, n_crops)
    x0 = rng.uniform(20, 748 - bw)
    y0 = rng.uniform(20, 1004 - bh)
    boxes = jnp.asarray(np.stack([x0, y0, x0 + bw, y0 + bh], -1), jnp.float32)
    pidx = jnp.asarray(np.repeat(np.arange(n), args.slots), jnp.int32)

    @jax.jit
    def crop_only(pg, pi, bx):
        crops, eff = crop_resize_pallas(pg, pi, bx, icr.crop_h, icr.crop_w)
        return crops.sum() + eff.sum()

    t_crop = timed(lambda: crop_only(plain, pidx, boxes))

    # --- detect only (same program bench uses) ---
    rgb = jnp.repeat(jnp.asarray(batch_np)[..., None], 3, axis=-1)
    detect_args = (
        box.model, box.variables, rgb, box.text_threshold, box.low_text,
        box.link_threshold, box.max_components, box.box_source,
    )
    t_detect = timed(lambda: _detect_batch_jit(*detect_args)["scores"].sum())

    # --- full fused at decode_steps=1 vs serving budget ---
    def fused(steps):
        return _fused_pages_compact(
            box.model, box.variables, icr.model, icr.params, packed, clip,
            jnp.int32(n), box.text_threshold, box.low_text,
            box.link_threshold, float(box.min_area), float(box.box_expand),
            box.max_components, box.box_source, n * args.slots,
            icr.crop_h, icr.crop_w, icr.compute_dtype, steps,
            _pallas_crop_default(), 2,
        )[1]

    t_f1 = timed(lambda: fused(1))
    t_full = timed(lambda: fused(icr.decode_steps))

    print(f"pages={n} slots={args.slots} decode_steps={icr.decode_steps}")
    print(f"unpack(u2)      {t_unpack*1e3:8.1f} ms ({t_unpack/n*1e3:6.2f} ms/page, RTT-inc)")
    print(f"crop pallas     {t_crop*1e3:8.1f} ms ({t_crop/n*1e3:6.2f} ms/page, RTT-inc)")
    print(f"detect          {t_detect*1e3:8.1f} ms ({t_detect/n*1e3:6.2f} ms/page, RTT-inc)")
    print(f"fused steps=1   {t_f1*1e3:8.1f} ms ({t_f1/n*1e3:6.2f} ms/page, RTT-inc)")
    print(f"fused full      {t_full*1e3:8.1f} ms ({t_full/n*1e3:6.2f} ms/page, RTT-inc)")
    print("--- RTT-free deltas ---")
    print(f"decode (full - steps1)        {(t_full-t_f1)/n*1e3:6.2f} ms/page")
    print(f"crop+enc+glue (steps1-detect) {(t_f1-t_detect)/n*1e3:6.2f} ms/page")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
