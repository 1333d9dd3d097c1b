"""TextFuseNet training on synthetic pages with char-level supervision.

The reference trains TextFuseNet on character- and word-annotated text
datasets (SynthText-style); the same free supervision exists here by
construction — the renderer knows every word box AND every character
box (cumulative ``textlength`` advances).  Targets at stride 2, pooled
to the head's stride 4 on device:

* word region + affinity (CRAFT formulation, shared with train_craft)
* char-center map (per-character shrunk boxes)
* global text/non-text segmentation mask (union of word boxes)
* refinement supervision: jittered GT word boxes as positive candidates
  (delta target recovers the GT box) + random background boxes as
  negatives, through the full fuse module with GT char boxes.
"""

import time
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from marie_tpu.logging_core import MarieLogger
from marie_tpu.models.textfusenet import TextFuseNet, TextFuseNetConfig


def render_page_tfn(
    rng: np.random.Generator,
    page_hw: Tuple[int, int] = (512, 384),
    font_sizes: Tuple[int, ...] = (14, 18, 22, 26),
    max_words: int = 128,
    max_chars: int = 512,
):
    """-> (page u8 [H,W,3], targets u8 [H/2,W/2,4], word_boxes f32 [K,4],
    word_valid bool [K], char_boxes f32 [M,4], char_valid bool [M]).

    Target channels: word region, word affinity, char centers, seg mask.
    Boxes are xyxy in FULL-page pixels.
    """
    from PIL import Image, ImageDraw, ImageFont

    h, w = page_hw
    words = (
        "invoice total amount payment due net terms claim policy member "
        "provider service balance statement account number date reference "
        "name address phone code group plan 2024 1500 375.20 11/02/2023"
    ).split()
    # multi-font: single-font detector training was the measured cause of
    # the serif-page CER cliff in the CRAFT path (train/craft.py) — the
    # same fix applies here
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
    t = np.zeros((h // 2, w // 2, 4), np.float32)
    wboxes, cboxes = [], []

    y = int(rng.integers(10, 40))
    while y < h - 40:
        x = int(rng.integers(10, 40))
        font = fonts[int(rng.integers(0, len(fonts)))]
        prev_box = None
        while x < w - 80:
            text = str(rng.choice(words))
            draw.text((x, y), text, fill=(0, 0, 0), font=font)
            bx = draw.textbbox((x, y), text, font=font)
            wboxes.append([bx[0], bx[1], bx[2], bx[3]])
            x0, y0, x1, y1 = (v // 2 for v in bx)
            sx, sy = max((x1 - x0) // 10, 1), max((y1 - y0) // 10, 1)
            t[y0 + sy : y1 - sy, x0 + sx : x1 - sx, 0] = 1.0  # word region
            if prev_box is not None:
                px1 = prev_box[2]
                ay0 = max(y0 + sy, prev_box[1])
                ay1 = min(y1 - sy, prev_box[3])
                if ay1 > ay0 and x0 > px1:
                    t[ay0:ay1, px1:x0, 1] = 1.0               # affinity
            prev_box = (x0, y0, x1, y1)
            t[y0:y1, x0:x1, 3] = 1.0                          # seg mask
            # per-character boxes via cumulative advances
            off = 0.0
            for ch in text:
                adv = draw.textlength(ch, font=font)
                cx0, cx1 = bx[0] + off, bx[0] + off + adv
                off += adv
                if adv < 1:
                    continue
                cboxes.append([cx0, bx[1], cx1, bx[3]])
                gx0, gx1 = int(cx0) // 2, int(cx1) // 2
                gy0, gy1 = y0, y1
                csx = max((gx1 - gx0) // 4, 0)
                csy = max((gy1 - gy0) // 4, 1)
                t[gy0 + csy : gy1 - csy, gx0 + csx : max(gx1 - csx, gx0 + 1),
                  2] = 1.0                                    # char centers
            x = bx[2] + int(rng.integers(10, 40))
        y += int(rng.integers(26, 44))

    def _pad(arr, n):
        a = np.zeros((n, 4), np.float32)
        v = np.zeros((n,), bool)
        k = min(len(arr), n)
        if k:
            a[:k] = np.asarray(arr[:k], np.float32)
            v[:k] = True
        return a, v

    wb, wv = _pad(wboxes, max_words)
    cb, cv = _pad(cboxes, max_chars)
    return (
        np.asarray(img),
        (t * 255).astype(np.uint8),
        wb, wv, cb, cv,
    )


def train_textfusenet_device(
    config: Optional[TextFuseNetConfig] = None,
    steps: int = 2000,
    batch_size: int = 4,
    dataset_size: int = 128,
    page_hw: Tuple[int, int] = (512, 384),
    learning_rate: float = 3e-4,
    steps_per_dispatch: int = 25,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
):
    logger = MarieLogger("train-textfusenet")
    cfg = config or TextFuseNetConfig.synth()
    model = TextFuseNet(cfg)
    k, m = cfg.max_words, cfg.max_chars

    logger.info(f"rendering {dataset_size} pages at {page_hw}...")
    t0 = time.time()
    rng = np.random.default_rng(seed)
    pages, targets, wbs, wvs, cbs, cvs = [], [], [], [], [], []
    for _ in range(dataset_size):
        p, t, wb, wv, cb, cv = render_page_tfn(
            rng, page_hw, max_words=k, max_chars=m
        )
        pages.append(p); targets.append(t); wbs.append(wb)
        wvs.append(wv); cbs.append(cb); cvs.append(cv)
    data = dict(
        pages=jnp.asarray(np.stack(pages)),
        targets=jnp.asarray(np.stack(targets)),
        wb=jnp.asarray(np.stack(wbs)), wv=jnp.asarray(np.stack(wvs)),
        cb=jnp.asarray(np.stack(cbs)), cv=jnp.asarray(np.stack(cvs)),
    )
    logger.info(f"rendered+uploaded in {time.time() - t0:.1f}s")

    warmup = max(steps // 10, 1)
    schedule = optax.warmup_cosine_decay_schedule(0.0, learning_rate, warmup, steps)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-4)
    )
    params = jax.jit(lambda key, x: model.init(key, x, method="init_probe"))(
        jax.random.PRNGKey(seed), jnp.zeros((1, *page_hw, 3), jnp.float32)
    )
    opt_state = jax.jit(optimizer.init)(params)

    def bce(pred, target, eps=1e-6):
        p = jnp.clip(pred, eps, 1 - eps)
        return -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p)).mean()

    def loss_fn(p, images, t_head, t_seg4, wb, wv, cb, cv, key):
        out = model.apply(p, images, method=TextFuseNet.dense)
        l_word = bce(out["word"][..., 0], t_head[..., 0]) + bce(
            out["word"][..., 1], t_head[..., 1]
        )
        l_char = bce(out["char"][..., 0], t_head[..., 2])
        # the global seg branch stays at stride 4 regardless of the
        # word/char head stride
        l_seg = optax.sigmoid_binary_cross_entropy(
            out["seg_logits"][..., 0], t_seg4
        ).mean()

        # refinement: per-sample jittered positives + shuffled negatives
        def one(feat, segf, wb_i, wv_i, cb_i, cv_i, key_i):
            k1, k2, k3 = jax.random.split(key_i, 3)
            bw = wb_i[:, 2] - wb_i[:, 0]
            bh = wb_i[:, 3] - wb_i[:, 1]
            jit_amt = jax.random.uniform(k1, wb_i.shape, minval=-0.15,
                                         maxval=0.15)
            scalewh = jnp.stack([bw, bh, bw, bh], axis=-1)
            pos = wb_i + jit_amt * scalewh
            # negatives: roll the boxes to random offsets (off-text crops)
            shift = jax.random.uniform(
                k2, (wb_i.shape[0], 2), minval=40.0, maxval=120.0
            )
            neg = wb_i + jnp.concatenate([shift, shift], axis=-1)
            half = wb_i.shape[0] // 2
            use_neg = jnp.arange(wb_i.shape[0]) >= half
            cand = jnp.where(use_neg[:, None], neg, pos) / 4.0  # grid coords
            score, refined = model.apply(
                p, feat, segf, cand, wv_i, cb_i / 4.0, cv_i,
                method=TextFuseNet.fuse,
            )
            lbl = jnp.where(use_neg, 0.0, 1.0) * wv_i
            l_score = (
                optax.sigmoid_binary_cross_entropy(
                    jnp.log(jnp.clip(score, 1e-6, 1 - 1e-6))
                    - jnp.log(jnp.clip(1 - score, 1e-6, 1 - 1e-6)),
                    lbl,
                )
                * wv_i
            ).sum() / jnp.clip(wv_i.sum(), 1.0)
            # box regression only on positives: recover GT from jittered
            pos_mask = (~use_neg) & wv_i
            l_box = (
                jnp.abs(refined - wb_i / 4.0).mean(-1) * pos_mask
            ).sum() / jnp.clip(pos_mask.sum(), 1.0)
            return l_score, l_box

        keys = jax.random.split(key, images.shape[0])
        l_scores, l_boxes = jax.vmap(one)(
            out["p3"], out["seg_feat"], wb, wv, cb, cv, keys
        )
        l_fuse = l_scores.mean() + 0.2 * l_boxes.mean()
        return l_word + l_char + l_seg + l_fuse

    @jax.jit
    def run_block(params, opt_state, key):
        def one_step(carry, step_key):
            params, opt_state = carry
            kidx, kloss = jax.random.split(step_key)
            idx = jax.random.randint(kidx, (batch_size,), 0, dataset_size)
            images = data["pages"][idx].astype(jnp.float32) / 255.0
            t2 = data["targets"][idx].astype(jnp.float32) / 255.0
            t4 = jax.lax.reduce_window(
                t2, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
            # sub-pixel head trains on the native stride-2 targets; the
            # seg branch is stride-4 either way
            t_head = t2 if cfg.head_stride == 2 else t4
            loss, grads = jax.value_and_grad(loss_fn)(
                params, images, t_head, t4[..., 3], data["wb"][idx],
                data["wv"][idx], data["cb"][idx], data["cv"][idx], kloss,
            )
            updates, new_opt = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt), loss

        keys = jax.random.split(key, steps_per_dispatch)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        return params, opt_state, losses.mean()

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    done = 0
    while done < steps:
        key, sub = jax.random.split(key)
        params, opt_state, mean_loss = run_block(params, opt_state, sub)
        done += steps_per_dispatch
        logger.info(
            f"step {done}/{steps} loss={float(mean_loss):.4f} "
            f"({time.time() - t0:.0f}s)"
        )

    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(params), checkpoint_path)
        logger.info(f"saved checkpoint -> {checkpoint_path}")
    return params
