"""pix2pix overlay-cleanup training on synthetic dirty/clean page pairs.

The reference ships a pre-trained pix2pix that removes form overlays from
scans (``/root/reference/marie/overlay/overlay.py:30``, vendored model
``marie/models/pix2pix/models/pix2pix_model.py:6``).  Weights do not ship
with this environment, so the TPU build trains its own: synthetic clean
text pages are composited with form artifacts (rules, boxes, shaded
regions, stamp ellipses, dotted lines) drawn UNDER the text — the
generator learns to reproduce the text-only page.  Standard pix2pix
objective: LSGAN PatchGAN discriminator + L1(λ=100), trained with the
device-resident scan recipe shared by the other trainers.
"""

import time
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from marie_tpu.logging_core import MarieLogger
from marie_tpu.models.configs import Pix2PixConfig
from marie_tpu.models.pix2pix import ResnetGenerator

_WORDS = (
    "invoice total amount payment due net terms claim policy member "
    "provider service balance statement account number date reference "
    "name address phone code group plan 2024 1500 375.20 11/02/2023"
).split()

_OVERLAY_COLORS = [
    (160, 160, 160), (120, 120, 120), (190, 190, 190),  # form grays
    (90, 110, 200), (70, 130, 90), (200, 120, 110),     # blue/green/red tints
]


def render_overlay_pair(
    rng: np.random.Generator, page_hw: Tuple[int, int] = (512, 384)
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (clean u8 [H,W,3], dirty u8 [H,W,3], overlay_mask u8 [H,W]).

    The overlay layer is drawn first, text second — so a rule crossing a
    word leaves the glyph pixels intact (the form was printed under the
    text), which is the reference's real-world geometry."""
    from PIL import Image, ImageDraw, ImageFont

    h, w = page_hw
    try:
        fonts = [
            ImageFont.truetype(
                "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", s
            )
            for s in (14, 18, 22)
        ]
    except OSError:
        fonts = [ImageFont.load_default()]

    overlay = Image.new("RGB", (w, h), (255, 255, 255))
    od = ImageDraw.Draw(overlay)

    def color():
        return _OVERLAY_COLORS[int(rng.integers(0, len(_OVERLAY_COLORS)))]

    # horizontal / vertical rules
    for _ in range(int(rng.integers(2, 8))):
        y = int(rng.integers(0, h))
        od.line([(0, y), (w, y)], fill=color(), width=int(rng.integers(1, 4)))
    for _ in range(int(rng.integers(0, 4))):
        x = int(rng.integers(0, w))
        od.line([(x, 0), (x, h)], fill=color(), width=int(rng.integers(1, 3)))
    def ri(lo, hi):
        return int(rng.integers(lo, max(hi, lo + 1)))

    # form boxes
    for _ in range(int(rng.integers(1, 5))):
        x0, y0 = ri(0, w - 60), ri(0, h - 40)
        x1 = min(x0 + ri(50, min(220, max(w - x0, 51))), w - 1)
        y1 = min(y0 + ri(25, min(120, max(h - y0, 26))), h - 1)
        od.rectangle([x0, y0, x1, y1], outline=color(), width=ri(1, 3))
    # shaded regions (light fills)
    for _ in range(int(rng.integers(0, 3))):
        x0, y0 = ri(0, w - 80), ri(0, h - 40)
        x1 = min(x0 + ri(60, min(240, max(w - x0, 61))), w - 1)
        y1 = min(y0 + ri(20, min(90, max(h - y0, 21))), h - 1)
        g = ri(205, 240)
        od.rectangle([x0, y0, x1, y1], fill=(g, g, g))
    # stamp ellipses
    for _ in range(int(rng.integers(0, 3))):
        x0, y0 = ri(0, w - 100), ri(0, h - 60)
        od.ellipse(
            [x0, y0, x0 + ri(60, 120), y0 + ri(30, 60)],
            outline=color(), width=ri(2, 4),
        )
    # dotted lines
    for _ in range(int(rng.integers(0, 4))):
        y = int(rng.integers(0, h))
        c = color()
        for x in range(0, w, 8):
            od.line([(x, y), (x + 3, y)], fill=c, width=1)

    clean = Image.new("RGB", (w, h), (255, 255, 255))
    cd = ImageDraw.Draw(clean)
    dd = ImageDraw.Draw(overlay)  # text goes ON TOP of the overlay layer

    y = int(rng.integers(10, 40))
    while y < h - 40:
        x = int(rng.integers(10, 40))
        font = fonts[int(rng.integers(0, len(fonts)))]
        while x < w - 80:
            text = str(rng.choice(_WORDS))
            cd.text((x, y), text, fill=(0, 0, 0), font=font)
            dd.text((x, y), text, fill=(0, 0, 0), font=font)
            bx = cd.textbbox((x, y), text, font=font)
            x = bx[2] + int(rng.integers(10, 40))
        y += int(rng.integers(26, 44))

    clean_np = np.asarray(clean, np.uint8)
    dirty_np = np.asarray(overlay, np.uint8)
    mask = (np.abs(clean_np.astype(np.int16) - dirty_np.astype(np.int16)).max(-1) > 12)
    return clean_np, dirty_np, mask.astype(np.uint8) * 255


class PatchDiscriminator(nn.Module):
    """70×70 PatchGAN (pix2pix reference ``networks.py`` NLayerDiscriminator)."""

    base_channels: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.base_channels
        h = nn.Conv(f, (4, 4), strides=(2, 2), padding="SAME")(x)
        h = nn.leaky_relu(h, 0.2)
        for mult in (2, 4):
            h = nn.Conv(f * mult, (4, 4), strides=(2, 2), padding="SAME")(h)
            h = nn.GroupNorm(num_groups=None, group_size=1)(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(f * 8, (4, 4), padding="SAME")(h)
        h = nn.GroupNorm(num_groups=None, group_size=1)(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding="SAME")(h)  # patch logits


def train_overlay_device(
    config: Optional[Pix2PixConfig] = None,
    steps: int = 3000,
    batch_size: int = 4,
    dataset_size: int = 192,
    page_hw: Tuple[int, int] = (512, 384),
    learning_rate: float = 2e-4,
    l1_weight: float = 100.0,
    steps_per_dispatch: int = 25,
    refresh_every: int = 1000,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
):
    logger = MarieLogger("train-overlay")
    config = config or Pix2PixConfig.synth()
    gen = ResnetGenerator(config)
    disc = PatchDiscriminator()

    def render_block(block_seed):
        rng = np.random.default_rng(block_seed)
        cleans, dirties = [], []
        for _ in range(dataset_size):
            c, d, _ = render_overlay_pair(rng, page_hw)
            cleans.append(c)
            dirties.append(d)
        return jnp.asarray(np.stack(dirties)), jnp.asarray(np.stack(cleans))

    logger.info(f"rendering {dataset_size} overlay pairs...")
    t0 = time.time()
    data_x, data_y = render_block(seed)  # x=dirty, y=clean
    logger.info(f"rendered+uploaded in {time.time() - t0:.1f}s")

    g_opt = optax.adam(learning_rate, b1=0.5)
    d_opt = optax.adam(learning_rate, b1=0.5)

    h, w = page_hw
    g_params = jax.jit(gen.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3), jnp.float32)
    )
    d_params = jax.jit(disc.init)(
        jax.random.PRNGKey(seed + 1), jnp.zeros((1, h, w, 6), jnp.float32)
    )
    g_state = jax.jit(g_opt.init)(g_params)
    d_state = jax.jit(d_opt.init)(d_params)

    @jax.jit
    def run_block(g_params, d_params, g_state, d_state, key, xs, ys):
        def one_step(carry, k):
            g_params, d_params, g_state, d_state = carry
            idx = jax.random.randint(k, (batch_size,), 0, dataset_size)
            x = xs[idx].astype(jnp.float32) / 127.5 - 1.0
            y = ys[idx].astype(jnp.float32) / 127.5 - 1.0

            # --- discriminator (LSGAN): real(x,y)->1, fake(x,G(x))->0
            def d_loss_fn(dp):
                fake = gen.apply(g_params, x)
                real_logit = disc.apply(dp, jnp.concatenate([x, y], -1))
                fake_logit = disc.apply(
                    dp, jnp.concatenate([x, jax.lax.stop_gradient(fake)], -1)
                )
                return 0.5 * (
                    ((real_logit - 1.0) ** 2).mean() + (fake_logit**2).mean()
                )

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
            d_updates, d_state = d_opt.update(d_grads, d_state, d_params)
            d_params = optax.apply_updates(d_params, d_updates)

            # --- generator: fool D + L1 to the clean target
            def g_loss_fn(gp):
                fake = gen.apply(gp, x)
                fake_logit = disc.apply(d_params, jnp.concatenate([x, fake], -1))
                gan = ((fake_logit - 1.0) ** 2).mean()
                l1 = jnp.abs(fake - y).mean()
                return gan + l1_weight * l1, l1

            (g_loss, l1), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                g_params
            )
            g_updates, g_state = g_opt.update(g_grads, g_state, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            return (g_params, d_params, g_state, d_state), (d_loss, g_loss, l1)

        keys = jax.random.split(key, steps_per_dispatch)
        carry, losses = jax.lax.scan(
            one_step, (g_params, d_params, g_state, d_state), keys
        )
        return carry, tuple(v.mean() for v in losses)

    t0 = time.time()
    key = jax.random.PRNGKey(seed + 2)
    done = 0
    next_refresh = refresh_every
    while done < steps:
        if refresh_every and done >= next_refresh:
            data_x, data_y = render_block(seed + 1 + done)
            next_refresh += refresh_every
            logger.info(f"dataset refreshed at step {done}")
        key, sub = jax.random.split(key)
        (g_params, d_params, g_state, d_state), (dl, gl, l1) = run_block(
            g_params, d_params, g_state, d_state, sub, data_x, data_y
        )
        done += steps_per_dispatch
        if done % 250 == 0:
            logger.info(
                f"step {done}/{steps} d={float(dl):.4f} g={float(gl):.4f} "
                f"l1={float(l1):.5f} ({(time.time() - t0) / done:.3f}s/step)"
            )

    metrics = evaluate_overlay(gen, g_params, page_hw, seed=seed + 9999)
    logger.info(f"eval: {metrics}")

    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(g_params), checkpoint_path)
        logger.info(f"saved generator to {checkpoint_path}")
    return gen, g_params, metrics


def evaluate_overlay(gen, g_params, page_hw=(512, 384), n_pages: int = 32, seed: int = 123):
    """Held-out overlay-removal quality: mask F1 (predicted changed pixels
    vs true overlay pixels) + residual L1 on the cleaned page."""
    rng = np.random.default_rng(seed)
    cleans, dirties, masks = [], [], []
    for _ in range(n_pages):
        c, d, m = render_overlay_pair(rng, page_hw)
        cleans.append(c)
        dirties.append(d)
        masks.append(m)
    x = jnp.asarray(np.stack(dirties), jnp.float32) / 127.5 - 1.0
    fake = jax.jit(gen.apply)(g_params, x)
    fake_np, x_np = jax.device_get((fake, x))

    true_mask = np.stack(masks) > 0
    pred_mask = np.abs(fake_np - x_np).mean(-1) > 0.15
    tp = float((pred_mask & true_mask).sum())
    fp = float((pred_mask & ~true_mask).sum())
    fn = float((~pred_mask & true_mask).sum())
    precision = tp / max(tp + fp, 1.0)
    recall = tp / max(tp + fn, 1.0)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)

    clean_ref = np.stack(cleans).astype(np.float32) / 127.5 - 1.0
    residual_l1 = float(np.abs(fake_np - clean_ref).mean())
    return {
        "mask_precision": round(precision, 4),
        "mask_recall": round(recall, 4),
        "mask_f1": round(f1, 4),
        "residual_l1": round(residual_l1, 5),
    }
