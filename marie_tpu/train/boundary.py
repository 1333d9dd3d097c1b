"""Boundary-registration training: regress the page quad inside synthetic
scans (skew, offset, scale, perspective jitter, dark/noisy backgrounds).

Reference capability:
``/root/reference/marie/components/document_registration/unilm_dit.py:100``
(trained DiT+MaskRCNN boundary + fit_to_page).  Here the scans are
composited ON DEVICE inside the training scan — clean pages upload once,
each step samples fresh geometry with jax.random and warps via the
homography compositor (models/boundary.py) — so the data pipeline costs
zero host round trips.
"""

import time
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from marie_tpu.logging_core import MarieLogger
from marie_tpu.models.boundary import BoundaryNet, composite_scan, quad_iou
from marie_tpu.models.configs import BoundaryConfig


def _sample_quad(key, canvas_hw: Tuple[int, int]):
    """Random page quad inside the canvas: rotation ±12°, scale 0.55–0.97,
    centred with margin, per-corner perspective jitter ≤2%.

    The scale range reaches 0.97 because serving sees near-full-frame
    scans (round-3 oracle: scale 0.92 scans put every corner 28 px off a
    0.55–0.88-trained regressor — an OOD cliff the silhouette refinement
    hides on high-contrast pages but the CNN prior should not have)."""
    ch, cw = canvas_hw
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    angle = jax.random.uniform(k1, (), minval=-12.0, maxval=12.0) * jnp.pi / 180.0
    scale = jax.random.uniform(k2, (), minval=0.55, maxval=0.97)
    hw2 = jnp.asarray([cw, ch], jnp.float32) * scale / 2.0
    # rect corners centred at origin (tl, tr, br, bl)
    base = jnp.asarray(
        [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]], jnp.float32
    ) * hw2
    c, s = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.asarray([[c, -s], [s, c]])
    pts = base @ rot.T
    # keep the rotated quad inside the canvas with a small margin
    ext = jnp.abs(pts).max(axis=0)
    margin = 4.0
    lo = ext + margin
    hi = jnp.asarray([cw, ch], jnp.float32) - ext - margin
    hi = jnp.maximum(hi, lo + 1.0)
    center = lo + jax.random.uniform(k3, (2,)) * (hi - lo)
    pts = pts + center
    jitter = jax.random.uniform(k4, (4, 2), minval=-0.02, maxval=0.02) * jnp.asarray(
        [cw, ch], jnp.float32
    )
    pts = jnp.clip(pts + jitter, 2.0, jnp.asarray([cw - 3.0, ch - 3.0]))
    bg = jax.random.uniform(k5, (), minval=15.0, maxval=110.0)
    return pts, bg


def _make_scan(key, doc, canvas_hw):
    kq, kn = jax.random.split(key)
    quad, bg = _sample_quad(kq, canvas_hw)
    noise = jax.random.uniform(kn, canvas_hw, minval=-18.0, maxval=18.0)
    canvas = composite_scan(doc, quad, canvas_hw, bg, noise)
    return canvas, quad


def train_boundary_device(
    config: Optional[BoundaryConfig] = None,
    steps: int = 3000,
    batch_size: int = 16,
    dataset_size: int = 128,
    learning_rate: float = 4e-4,
    steps_per_dispatch: int = 25,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
):
    from marie_tpu.train.craft import render_page_with_targets

    logger = MarieLogger("train-boundary")
    config = config or BoundaryConfig()
    model = BoundaryNet(config)
    ih, iw = config.input_hw

    rng = np.random.default_rng(seed)
    logger.info(f"rendering {dataset_size} document pages...")
    docs = np.stack(
        [render_page_with_targets(rng, (ih, iw))[0] for _ in range(dataset_size)]
    )
    docs_dev = jnp.asarray(docs)

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, max(steps // 10, 1), steps
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-4)
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, ih, iw, 3), jnp.float32)
    )
    opt_state = jax.jit(optimizer.init)(params)
    norm = jnp.asarray([iw - 1.0, ih - 1.0], jnp.float32)

    @jax.jit
    def run_block(params, opt_state, key, docs_ref):
        def one_step(carry, step_key):
            params, opt_state = carry
            ki, kg = jax.random.split(step_key)
            idx = jax.random.randint(ki, (batch_size,), 0, dataset_size)
            scans, quads = jax.vmap(
                lambda k, d: _make_scan(k, d, (ih, iw))
            )(jax.random.split(kg, batch_size), docs_ref[idx])
            x = scans.astype(jnp.float32) / 255.0
            target = (quads / norm).reshape(batch_size, 8)

            def loss_fn(p):
                pred = model.apply(p, x)
                return ((pred - target) ** 2).mean()

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
    while done < steps:
        key, sub = jax.random.split(key)
        params, opt_state, loss = run_block(params, opt_state, sub, docs_dev)
        done += steps_per_dispatch
        if done % 250 == 0:
            logger.info(
                f"step {done}/{steps} loss={float(loss):.6f} "
                f"({(time.time() - t0) / done:.3f}s/step)"
            )

    metrics = evaluate_boundary(model, params, config, seed=seed + 777)
    logger.info(f"eval: {metrics}")

    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(params), checkpoint_path)
        logger.info(f"saved to {checkpoint_path}")
    return model, params, metrics


def evaluate_boundary(model, params, config, n_pages: int = 64, seed: int = 777):
    """Held-out corner error (px, at model resolution) + mean quad IoU."""
    from marie_tpu.train.craft import render_page_with_targets

    ih, iw = config.input_hw
    rng = np.random.default_rng(seed)
    docs = jnp.asarray(
        np.stack([render_page_with_targets(rng, (ih, iw))[0] for _ in range(n_pages)])
    )
    key = jax.random.PRNGKey(seed)
    scans, quads = jax.jit(
        jax.vmap(lambda k, d: _make_scan(k, d, (ih, iw)))
    )(jax.random.split(key, n_pages), docs)
    norm = jnp.asarray([iw - 1.0, ih - 1.0], jnp.float32)
    pred = jax.jit(model.apply)(params, scans.astype(jnp.float32) / 255.0)
    pred_px = pred.reshape(n_pages, 4, 2) * norm
    err = jnp.abs(pred_px - quads)
    ious = jax.jit(
        jax.vmap(lambda p, t: quad_iou(p, t, (ih, iw)))
    )(pred_px, quads)
    pred_np, quads_np, err_np, ious_np = jax.device_get(
        (pred_px, quads, err, ious)
    )
    del pred_np, quads_np
    return {
        "corner_mae_px": round(float(err_np.mean()), 3),
        "corner_p95_px": round(float(np.percentile(err_np, 95)), 3),
        "mean_quad_iou": round(float(ious_np.mean()), 4),
    }
