"""DiT detector training on the CRAFT synthetic page supervision.

The reference's DEFAULT detector is DiT + Mask R-CNN
(``/root/reference/marie/boxes/dit/ulim_dit_box_processor.py:356``); the
TPU re-design (``marie_tpu/boxes/dit_box_processor.py``) keeps the ViT
backbone but replaces the proposal head with a dense region/affinity
heatmap, so it trains on exactly the same free supervision as CRAFT —
rendered word boxes.  Targets render directly at the head grid
(``cfg.head_stride``).
"""

import time
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from marie_tpu.boxes.dit_box_processor import DiTDetector
from marie_tpu.logging_core import MarieLogger
from marie_tpu.models.configs import ViTConfig
from marie_tpu.train.craft import render_page_with_targets


def train_dit_device(
    config: Optional[ViTConfig] = None,
    steps: int = 3000,
    batch_size: int = 8,
    dataset_size: int = 256,
    learning_rate: float = 3e-4,
    steps_per_dispatch: int = 25,
    refresh_every: int = 1000,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    font_sizes: Tuple[int, ...] = (7, 9, 11, 13, 18, 22),
    full_page_font_sizes: Tuple[int, ...] = (14, 18, 20, 24, 28),
):
    logger = MarieLogger("train-dit")
    config = config or ViTConfig.dit_synth()
    model = DiTDetector(config)
    page_hw: Tuple[int, int] = tuple(config.image_size)

    # HALF the dataset is serving-matched: the serving processor hands the
    # model full pages (1024x768, ~20px text) downscaled to the model
    # bucket with cv2.INTER_AREA (boxes/dit_box_processor.py:detect_words)
    # — anti-aliased ~10px glyphs that natively-rendered small PIL fonts
    # do NOT imitate (native-small-font training measured recall 0.084 on
    # downscaled pages; native-large-font-only measured 0.149).  The other
    # half keeps native small-size renders for pages served at 1:1 scale.
    #
    # Targets render DIRECTLY at the head grid (cfg.head_stride of the
    # input; 2x that for the 2x-rendered half) — an earlier version
    # rendered at stride 2 and max-pooled down, which fattened the region
    # and affinity bands enough to close the shrink moat between them and
    # merged every LINE into one component (measured recall 0.0, 17
    # boxes for 134 words ~= the line count).
    head_stride = config.head_stride

    def render_block(block_seed):
        import cv2

        rng = np.random.default_rng(block_seed)
        h, w = page_hw
        pages, targets = [], []
        for i in range(dataset_size):
            if i % 2 == 0:
                p2, t = render_page_with_targets(
                    rng, (h * 2, w * 2), font_sizes=full_page_font_sizes,
                    out_stride=head_stride * 2,
                )
                p = cv2.resize(p2, (w, h), interpolation=cv2.INTER_AREA)
            else:
                p, t = render_page_with_targets(
                    rng, page_hw, font_sizes=font_sizes,
                    out_stride=head_stride,
                )
            pages.append(p)
            targets.append(t)
        return jnp.asarray(np.stack(pages)), jnp.asarray(np.stack(targets))

    logger.info(f"rendering {dataset_size} training pages at {page_hw}...")
    t0 = time.time()
    data_pages, data_targets = render_block(seed)
    logger.info(f"rendered+uploaded in {time.time() - t0:.1f}s")

    warmup = max(steps // 10, 1)
    schedule = optax.warmup_cosine_decay_schedule(0.0, learning_rate, warmup, steps)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-4)
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, *page_hw, 3), jnp.float32)
    )
    opt_state = jax.jit(optimizer.init)(params)

    @jax.jit
    def run_block(params, opt_state, key, pages_ref, targets_ref):
        def one_step(carry, step_key):
            params, opt_state = carry
            idx = jax.random.randint(step_key, (batch_size,), 0, dataset_size)
            images = pages_ref[idx].astype(jnp.float32) / 255.0
            # targets already at the head grid (see render_block)
            targets = targets_ref[idx].astype(jnp.float32) / 255.0

            def loss_fn(p):
                out = model.apply(p, images)
                weight = 1.0 + 9.0 * targets
                return (weight * (out - targets) ** 2).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        keys = jax.random.split(key, steps_per_dispatch)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        return params, opt_state, losses.mean()

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
        params, opt_state, mean_loss = run_block(
            params, opt_state, sub, data_pages, data_targets
        )
        done += steps_per_dispatch
        if done % 250 == 0:
            logger.info(
                f"step {done}/{steps} loss={float(mean_loss):.5f} "
                f"({(time.time() - t0) / done:.3f}s/step)"
            )

    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(params), checkpoint_path)
        logger.info(f"saved checkpoint to {checkpoint_path}")
    return model, params
