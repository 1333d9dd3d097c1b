"""CRAFT detector training with synthetic page supervision.

Targets come free with synthetic pages: every rendered word's box is
known, so the region heatmap target is the (slightly shrunk) word-box
mask and the affinity target links horizontally-adjacent words on a line
(the CRAFT linking signal at word granularity).  Fully convolutional —
train at a small page bucket, serve at any bucket.  Device-resident like
the other trainers.
"""

import time
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from marie_tpu.logging_core import MarieLogger
from marie_tpu.models.configs import CraftConfig
from marie_tpu.models.craft import CRAFT


def render_page_with_targets(
    rng: np.random.Generator,
    page_hw: Tuple[int, int] = (512, 384),
    font_sizes: Tuple[int, ...] = (14, 18, 22, 26),
    out_stride: int = 2,
    dense_p: float = 0.35,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (page uint8 [H,W,3], targets uint8 [H/s,W/s,2] in 0..255).

    With probability ``dense_p`` the page renders in DENSE layout:
    two tight columns, small font (12-16), 4-12px word gaps and lines
    that nearly touch — the oracle's ood_dense distribution (500+
    words/page).  A detector trained only on sparse layouts merges
    adjacent words and drops lines there (measured recall 0.718)."""
    from PIL import Image, ImageDraw, ImageFont

    h, w = page_hw
    words = (
        "invoice total amount payment due net terms claim policy member "
        "provider service balance statement account number date reference "
        "name address phone code group plan 2024 1500 375.20 11/02/2023"
    ).split()
    # FOUR font families: round-3 diagnosis (scripts/diagnose_serif.py)
    # showed serif-page CER 12.9% came ENTIRELY from detector box framing
    # (det median box height 13px vs truth 15px — clipped ascenders;
    # ground-truth boxes through the same crop+decode give CER 0.0000)
    # because detection had only ever seen DejaVu Sans
    font_files = (
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
    )
    fonts = []
    for path in font_files:
        for s in font_sizes:
            try:
                fonts.append(ImageFont.truetype(path, s))
            except OSError:
                pass
    if not fonts:
        fonts = [ImageFont.load_default()]

    img = Image.new("RGB", (w, h), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    region = np.zeros((h // out_stride, w // out_stride), np.float32)
    affinity = np.zeros((h // out_stride, w // out_stride), np.float32)

    dense = rng.random() < dense_p
    if dense:
        # one face+size per page (dense real documents are one face);
        # columns split the page with a narrow gutter
        fs = int(rng.choice((12, 14, 16)))
        page_fonts = []
        for path in font_files:
            try:
                page_fonts.append(ImageFont.truetype(path, fs))
            except OSError:
                pass
        dense_font = (
            page_fonts[int(rng.integers(0, len(page_fonts)))]
            if page_fonts else fonts[0]
        )
        n_cols = 2 if rng.random() < 0.7 else 1
        gutter = int(rng.integers(12, 25))
        col_w = (w - (n_cols + 1) * gutter) // n_cols
        col_ranges = [
            (gutter + c * (col_w + gutter),
             gutter + c * (col_w + gutter) + col_w)
            for c in range(n_cols)
        ]
        word_gap = (3, 13)       # 4-12px inclusive of jitter
        line_gap = (2, 7)        # y += fs + U[2,6]
    else:
        word_gap = (10, 40)

    def _place_words(x_start, x_end, y, font):
        x = x_start
        prev_box = None
        while x < x_end:
            text = str(rng.choice(words))
            draw.text((x, y), text, fill=(0, 0, 0), font=font)
            bx = draw.textbbox((x, y), text, font=font)
            if dense and bx[2] > x_end:
                # dense columns: word overflows the column — blank it out
                # (keeps the gutter clean; sparse pages keep overflow
                # words like real right-margin text)
                draw.rectangle((bx[0], bx[1], bx[2], bx[3]),
                               fill=(255, 255, 255))
                break
            # region: word box shrunk ~10% per side IN PAGE PIXELS before
            # quantizing to the heatmap grid — a grid-cell shrink floor
            # would eat 4px/side at stride 4 (27% of a 15px word; measured
            # boxes 10px vs truth 15px, CER 0.61)
            px0, py0, px1, py1 = bx
            # horizontal shrink 10% (keeps adjacent words separable);
            # vertical only 5% — the inter-LINE gap provides vertical
            # separation, and 10% vertical shrink made detected boxes
            # systematically short (13 px vs 15 px truth), clipping
            # ascenders: serif-page CER stuck at 6.5%
            sxp = max((px1 - px0) // 10, 2)
            syp = max((py1 - py0) // 20, 1)
            x0 = (px0 + sxp) // out_stride
            y0 = (py0 + syp) // out_stride
            x1 = max((px1 - sxp) // out_stride, x0 + 1)
            y1 = max((py1 - syp) // out_stride, y0 + 1)
            region[y0:y1, x0:x1] = 1.0
            # affinity: bridge ONLY the inter-word gap (between UNSHRUNK
            # edges) — the shrink margins stay empty on both sides, so
            # the CC mask (region|affinity) keeps a below-threshold moat
            # between a word's region and the line's affinity band.
            # Bridging shrunk-edge to shrunk-edge merges the whole line
            # into ONE component (measured: 22 boxes for 133 words).
            ux0 = px0 // out_stride  # unshrunk grid left edge
            ux1 = -(-px1 // out_stride)  # unshrunk grid right edge (ceil)
            if prev_box is not None:
                q_ux1 = prev_box[2]
                ay0 = max(y0, prev_box[0])
                ay1 = min(y1, prev_box[1])
                if ay1 > ay0 and ux0 > q_ux1:
                    affinity[ay0:ay1, q_ux1:ux0] = 1.0
            prev_box = (y0, y1, ux1)
            x = bx[2] + int(rng.integers(*word_gap))

    if dense:
        for cx0, cx1 in col_ranges:
            y = int(rng.integers(10, 30))
            fs = dense_font.size
            while y < h - fs - 10:
                _place_words(cx0, cx1, y, dense_font)
                y += fs + int(rng.integers(*line_gap))
    else:
        y = int(rng.integers(10, 40))
        while y < h - 40:
            font = fonts[int(rng.integers(0, len(fonts)))]
            _place_words(int(rng.integers(10, 40)), w - 80, y, font)
            y += int(rng.integers(26, 44))

    page = np.asarray(img, np.uint8)
    # resolution augmentation (25%): fax/200-DPI pages reach detection as
    # soft glyphs after a downscale — blur the PAGE only (the box targets
    # are geometric and unchanged); matches the oracle's ood_lowres row
    if rng.random() < 0.25:
        f = float(rng.uniform(0.5, 0.75))
        small = img.resize(
            (max(1, int(w * f)), max(1, int(h * f))), Image.BILINEAR
        )
        page = np.asarray(
            small.resize((w, h), Image.BILINEAR), np.uint8
        )
    targets = (np.stack([region, affinity], axis=-1) * 255).astype(np.uint8)
    return page, targets


def train_craft_device(
    config: Optional[CraftConfig] = None,
    steps: int = 4000,
    batch_size: int = 4,
    dataset_size: int = 256,
    page_hw: Tuple[int, int] = (512, 384),
    learning_rate: float = 5e-4,
    steps_per_dispatch: int = 25,
    refresh_every: int = 1000,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
):
    logger = MarieLogger("train-craft")
    config = config or CraftConfig.base()
    model = CRAFT(config)

    def render_block(block_seed):
        rng = np.random.default_rng(block_seed)
        pages, targets = [], []
        for _ in range(dataset_size):
            p, t = render_page_with_targets(
                rng, page_hw, out_stride=config.out_stride
            )
            pages.append(p)
            targets.append(t)
        return jnp.asarray(np.stack(pages)), jnp.asarray(np.stack(targets))

    logger.info(f"rendering {dataset_size} training pages...")
    t0 = time.time()
    data_pages, data_targets = render_block(seed)
    logger.info(f"rendered+uploaded in {time.time() - t0:.1f}s")

    warmup = max(steps // 10, 1)
    schedule = optax.warmup_cosine_decay_schedule(0.0, learning_rate, warmup, steps)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-4)
    )

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, *page_hw, 3), jnp.float32)
    )
    # split mutable batch stats from params (BatchNorm trains)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = jax.jit(optimizer.init)(params)

    @jax.jit
    def run_block(params, batch_stats, opt_state, key, pages_ref, targets_ref):
        def one_step(carry, step_key):
            params, batch_stats, opt_state = carry
            k_idx, k_sigma, k_noise = jax.random.split(step_key, 3)
            idx = jax.random.randint(k_idx, (batch_size,), 0, dataset_size)
            images = pages_ref[idx].astype(jnp.float32) / 255.0
            # gaussian-noise augmentation (sigma 0..0.08 ~ 0..20/255):
            # scanned documents are noisy, and a clean-pages-only detector
            # measured recall 0.0 on the noise OOD distribution
            sigma = jax.random.uniform(
                k_sigma, (batch_size, 1, 1, 1), minval=0.0, maxval=0.08
            )
            images = jnp.clip(
                images + sigma * jax.random.normal(k_noise, images.shape),
                0.0, 1.0,
            )
            targets = targets_ref[idx].astype(jnp.float32) / 255.0

            def loss_fn(p):
                out, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    images, train=True, mutable=["batch_stats"],
                )
                # weighted MSE: text pixels are sparse — upweight positives
                weight = 1.0 + 9.0 * targets
                loss = (weight * (out - targets) ** 2).mean()
                return loss, mutated["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), loss

        keys = jax.random.split(key, steps_per_dispatch)
        (params, batch_stats, opt_state), losses = jax.lax.scan(
            one_step, (params, batch_stats, opt_state), keys
        )
        return params, batch_stats, opt_state, losses.mean()

    t0 = time.time()
    key = jax.random.PRNGKey(seed + 1)
    done = 0
    next_refresh = refresh_every
    while done < steps:
        if refresh_every and done >= next_refresh:
            data_pages, data_targets = render_block(seed + 1 + done)
            next_refresh += refresh_every
            logger.info(f"dataset refreshed at step {done}")
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, mean_loss = run_block(
            params, batch_stats, opt_state, sub, data_pages, data_targets
        )
        done += steps_per_dispatch
        if done % 250 == 0:
            logger.info(
                f"step {done}/{steps} loss={float(mean_loss):.5f} "
                f"({(time.time() - t0) / done:.3f}s/step)"
            )

    variables = {"params": params, "batch_stats": batch_stats}
    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(variables), checkpoint_path)
        logger.info(f"saved checkpoint to {checkpoint_path}")
    return model, variables
