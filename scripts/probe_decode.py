"""On-chip crop+decode stage anatomy for the SERVING recognizer.

Splits the fused program's dominant stage (bench r5: crop_decode 6.71
ms/page of 12.34 total with the open-vocab GQA-2 d6 checkpoint, up from
3.82 with the 4-layer lexicon model) into:

  encode      — ViT forward over the crop batch (MXU-bound)
  prefill     — cross-KV projection of the encoder output
  decode      — greedy while_loop to the step budget (HBM-bound)

at the exact serving shape (B = pages x compact_slots rows of 48x320
bf16 crops), so the round's device work targets the real consumer.

    python scripts/probe_decode.py [--pages 16] [--slots 160]
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
    ap.add_argument("--steps", type=int, default=17)
    args = ap.parse_args()

    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from marie_tpu.document.trocr_ocr_processor import TrOcrProcessor
    from marie_tpu.models import trocr as trocr_mod
    from marie_tpu.models.configs import TrOCRConfig
    from marie_tpu.registry.checkpoints import load_params

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(repo, "model_zoo", "trocr-fast3g2d6ov-synth")
    cfg = TrOCRConfig.fast_v3_g2_d6()
    icr = TrOcrProcessor(
        config=cfg, params=load_params(ckpt), beam_size=1,
        param_dtype="bfloat16",
    )
    model, params = icr.model, icr.params

    B = args.pages * args.slots
    rng = np.random.default_rng(0)
    crops = jnp.asarray(
        rng.integers(0, 255, (B, icr.crop_h, icr.crop_w, 1), np.uint8),
        jnp.bfloat16,
    ) / 255.0
    crops = jnp.repeat(crops, 3, axis=-1)
    crops = jax.device_put(crops)

    @jax.jit
    def encode_only(x):
        enc = model.apply(params, x, method=model.encode)
        return enc.sum()

    @jax.jit
    def encode_prefill(x):
        enc = model.apply(params, x, method=model.encode)
        kvs = model.apply(params, enc, method=model.prefill)
        return sum(k.sum() for k, v in kvs) + sum(v.sum() for k, v in kvs)

    @jax.jit
    def full_greedy(x):
        toks, lens, conf = trocr_mod.greedy_decode(
            model, params, x, max_steps=args.steps
        )
        return toks.sum() + lens.sum() + conf.sum()

    t_enc = timed(lambda: encode_only(crops))
    t_pre = timed(lambda: encode_prefill(crops))
    t_all = timed(lambda: full_greedy(crops))

    n = args.pages
    print(f"shape: B={B} crops {icr.crop_h}x{icr.crop_w} bf16, "
          f"{args.pages} pages x {args.slots} slots, steps={args.steps}")
    print(f"encode        {t_enc*1e3:8.1f} ms  ({t_enc/n*1e3:6.2f} ms/page)")
    print(f"prefill delta {max(t_pre-t_enc,0)*1e3:8.1f} ms  "
          f"({max(t_pre-t_enc,0)/n*1e3:6.2f} ms/page)")
    print(f"decode delta  {max(t_all-t_pre,0)*1e3:8.1f} ms  "
          f"({max(t_all-t_pre,0)/n*1e3:6.2f} ms/page)")
    print(f"total greedy  {t_all*1e3:8.1f} ms  ({t_all/n*1e3:6.2f} ms/page)")

    # encoder FLOPs utilisation
    try:
        flops = float(
            encode_only.lower(crops).compile().cost_analysis()["flops"]
        )
        mfu = flops / t_enc / 197e12
        print(f"encode flops {flops/1e9:.1f} GF -> MFU {mfu:.3f}")
    except Exception as ex:  # noqa: BLE001
        print(f"cost analysis unavailable: {ex!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
