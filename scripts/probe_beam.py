"""Beam-vs-greedy pathology probe (VERDICT r4 #1 tail: beam-5 usable).

Round-5 oracle with the v7 open-vocab recognizer: beam-5 ties greedy on
6/11 distributions but regresses serif (0 -> 0.0166) and serif_bold
(0.0069 -> 0.0362).  This probe renders word crops from the regressing
distributions, decodes them greedy AND beam, and prints every
disagreement with the beam's top hypotheses + raw/normalized scores at
several length penalties — separating two candidate causes:

  a. length-normalization pathology: a short (dropped-char) hypothesis
     whose per-token logprob is higher wins after dividing by length;
  b. genuine search find: beam finds a higher-likelihood WRONG sequence
     the model truly prefers (calibration, not decode, is at fault).

    python scripts/probe_beam.py [--font serif_bold] [--n 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from scripts.check_quality import FONTS, HELDOUT_WORDS, WORDS, _decorate  # noqa: E402


def render_crops(font_path, words, h, w, seed=0):
    from PIL import Image, ImageDraw, ImageFont

    rng = np.random.default_rng(seed)
    font = ImageFont.truetype(font_path, 20)
    crops, texts = [], []
    for wd in words:
        wd = _decorate(rng, wd)
        img = Image.new("L", (w * 3, h * 3), 255)
        d = ImageDraw.Draw(img)
        d.text((8, 8), wd, fill=0, font=font)
        bx = d.textbbox((8, 8), wd, font=font)
        crop = np.asarray(img)[
            max(bx[1] - 2, 0):bx[3] + 2, max(bx[0] - 2, 0):bx[2] + 2
        ]
        # aspect-preserving resize onto the h x w canvas (squeeze on
        # overflow — the serving crop path's round-4 contract)
        ch, cw = crop.shape
        scale = min(h / ch, w / cw)
        nw = min(max(int(cw * scale), 1), w)
        nh = min(max(int(ch * scale), 1), h)
        im = Image.fromarray(crop).resize((nw, nh), Image.BILINEAR)
        canvas = np.full((h, w), 255, np.uint8)
        canvas[:nh, :nw] = np.asarray(im)
        crops.append(canvas)
        texts.append(wd)
    return np.stack(crops), texts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--font", default="serif_bold", choices=sorted(FONTS))
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--heldout", action="store_true")
    args = ap.parse_args()

    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from marie_tpu.models.trocr import beam_decode, greedy_decode
    from marie_tpu.ocr.util import _trocr_processor

    icr = _trocr_processor(beam_size=1)
    model, params, tok = icr.model, icr.params, icr.tokenizer
    h, w = icr.crop_h, icr.crop_w

    lex = HELDOUT_WORDS if args.heldout else WORDS
    words = [lex[i % len(lex)] for i in range(args.n)]
    crops_np, texts = render_crops(FONTS[args.font], words, h, w)
    crops = jnp.asarray(crops_np)[..., None].repeat(3, -1).astype(
        icr.compute_dtype
    )

    g_tokens, g_len, g_conf = jax.device_get(
        greedy_decode(model, params, crops, icr.decode_steps)
    )
    mismatch_rows = []
    for lp in (1.0, 0.5, 0.0):
        b_tokens, b_len, b_conf = jax.device_get(
            beam_decode(model, params, crops, 5, lp)
        )
        wrong_g = wrong_b = 0
        rows = []
        for i, truth in enumerate(texts):
            g = tok.decode(g_tokens[i])
            bm = tok.decode(b_tokens[i])
            wrong_g += g != truth
            wrong_b += bm != truth
            if g != bm:
                rows.append(
                    f"  truth={truth!r:24} greedy={g!r:24} (conf "
                    f"{g_conf[i]:.3f})  beam={bm!r:24} (conf {b_conf[i]:.3f})"
                )
        print(
            f"len_penalty={lp}: greedy wrong {wrong_g}/{len(texts)}, "
            f"beam wrong {wrong_b}/{len(texts)}, disagreements {len(rows)}",
            flush=True,
        )
        if lp == 1.0:
            mismatch_rows = rows
    print("\ndisagreements at len_penalty=1.0:")
    for r in mismatch_rows[:30]:
        print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
