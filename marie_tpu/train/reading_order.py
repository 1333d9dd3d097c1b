"""Train the reading-order ranker on synthetic document layouts.

The reference ships LayoutReader weights trained on ReadingBank
(``/root/reference/marie/document/layoutreader/text_layout.py``); no
external datasets exist in this environment, so we synthesise the same
*kinds* of layouts ReadingBank covers — single/multi column pages,
headers, and row-major tables — with known ground-truth reading order,
and train the one-pass ranker of
:mod:`marie_tpu.models.reading_order` with a pairwise logistic
ranking loss.

The model is geometry-only (boxes, no text), tiny (<1M params), and the
batch is generated on host (pure box math) — training runs in minutes on
CPU or TPU alike.
"""

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from marie_tpu.models.reading_order import ReadingOrderConfig, ReadingOrderModel


# ----------------------------------------------------------------------
# synthetic layout generation (ReadingBank-style pages, known order)
# ----------------------------------------------------------------------

def _gen_column_words(rng, x0, x1, y0, y1, word_h):
    """Lines of words filling [x0,x1]x[y0,y1] top-to-bottom, left-to-right.

    Covers both granularities the OCR stack produces: word boxes (the
    usual input) and whole-line boxes (when ordering merged lines), plus
    tight-to-sparse line spacing so column structure — not absolute gap
    size — is what the model learns.
    """
    boxes = []
    y = y0
    line_gap = word_h * rng.uniform(0.3, 2.5)
    line_mode = rng.random() < 0.3  # one box per line (line-level ordering)
    while y + word_h <= y1:
        jy = rng.uniform(-0.15, 0.15) * word_h
        if line_mode:
            w = rng.uniform(0.5, 1.0) * (x1 - x0)
            boxes.append([x0, y + jy, x0 + w, y + jy + word_h])
        else:
            x = x0
            while x < x1 - 0.01:
                w = rng.uniform(0.02, 0.12) * (x1 - x0) / 0.3
                w = min(w, x1 - x)
                if w < 0.008:
                    break
                boxes.append([x, y + jy, x + w, y + jy + word_h])
                x += w + rng.uniform(0.004, 0.02)
        y += word_h + line_gap
    return boxes


def _gen_table_words(rng, y0, y1):
    """Row-major table: reading order is row by row, cell by cell."""
    rows = rng.integers(3, 8)
    cols = rng.integers(2, 5)
    boxes = []
    row_h = (y1 - y0) / rows
    col_w = 0.9 / cols
    for r in range(rows):
        for c in range(cols):
            cx0 = 0.05 + c * col_w + rng.uniform(0.0, 0.01)
            cy0 = y0 + r * row_h + rng.uniform(0.0, 0.1) * row_h
            w = rng.uniform(0.3, 0.8) * col_w
            h = rng.uniform(0.3, 0.6) * row_h
            boxes.append([cx0, cy0, cx0 + w, cy0 + h])
    return boxes


def gen_page(rng, max_boxes: int) -> Tuple[np.ndarray, int]:
    """One synthetic page -> (boxes [max_boxes,4] xyxy in [0,1], n_valid).

    Boxes are emitted IN reading order; the caller shuffles.
    Layout families: single column / two column / three column /
    header + columns / row-major table.
    """
    kind = rng.integers(0, 5)
    word_h = rng.uniform(0.01, 0.045)
    boxes = []
    y_top = rng.uniform(0.03, 0.1)
    if kind == 0:  # single column
        boxes = _gen_column_words(rng, 0.06, 0.94, y_top, 0.95, word_h)
    elif kind in (1, 2):  # 2 or 3 columns, column-major reading
        ncol = kind + 1
        gap = rng.uniform(0.02, 0.14)
        cw = (0.88 - gap * (ncol - 1)) / ncol
        y_bot = rng.uniform(0.45, 0.95)
        for c in range(ncol):
            cx0 = 0.06 + c * (cw + gap)
            boxes.extend(
                _gen_column_words(rng, cx0, cx0 + cw, y_top, y_bot, word_h)
            )
    elif kind == 3:  # full-width header block, then two columns
        hdr_bot = y_top + rng.uniform(0.05, 0.12)
        boxes = _gen_column_words(rng, 0.06, 0.94, y_top, hdr_bot, word_h * 1.4)
        gap = 0.03
        cw = (0.88 - gap) / 2
        for c in range(2):
            cx0 = 0.06 + c * (cw + gap)
            boxes.extend(
                _gen_column_words(rng, cx0, cx0 + cw, hdr_bot + 0.03, 0.95, word_h)
            )
    else:  # table
        boxes = _gen_table_words(rng, y_top, rng.uniform(0.6, 0.95))

    boxes = boxes[:max_boxes]
    n = len(boxes)
    out = np.zeros((max_boxes, 4), np.float32)
    if n:
        out[:n] = np.asarray(boxes, np.float32)
    return out, n


def make_batch(rng, batch: int, max_boxes: int):
    """Shuffled batch: (boxes [B,N,4], ranks [B,N] int32, n_valid [B])."""
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    ranks = np.zeros((batch, max_boxes), np.int32)
    n_valid = np.zeros((batch,), np.int32)
    for b in range(batch):
        page, n = gen_page(rng, max_boxes)
        n = max(n, 2)
        perm = rng.permutation(n)
        boxes[b, :n] = page[perm]
        ranks[b, :n] = perm  # row i is reading-position perm[i]
        ranks[b, n:] = max_boxes + 1  # pads rank after everything
        n_valid[b] = n
    return boxes, ranks, n_valid


# ----------------------------------------------------------------------
# loss / metrics
# ----------------------------------------------------------------------

def pairwise_rank_loss(scores, ranks, n_valid):
    """Logistic loss over all valid ordered pairs: wants s_i < s_j whenever
    box i reads before box j."""
    n = scores.shape[1]
    pos = jnp.arange(n)
    valid = pos[None, :] < n_valid[:, None]  # [B,N]
    pair_valid = valid[:, :, None] & valid[:, None, :]
    before = ranks[:, :, None] < ranks[:, None, :]  # i reads before j
    mask = (pair_valid & before).astype(jnp.float32)
    diff = scores[:, :, None] - scores[:, None, :]  # want negative
    loss = jax.nn.softplus(diff) * mask
    correct = ((diff < 0) & (mask > 0)).astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)
    return loss.sum() / denom, correct.sum() / denom


def kendall_tau(order_pred: np.ndarray, order_true: np.ndarray) -> float:
    """Kendall rank correlation between two permutations of 0..n-1."""
    n = len(order_pred)
    if n < 2:
        return 1.0
    pos_pred = np.empty(n, np.int64)
    pos_pred[order_pred] = np.arange(n)
    pos_true = np.empty(n, np.int64)
    pos_true[order_true] = np.arange(n)
    a = pos_pred[:, None] < pos_pred[None, :]
    b = pos_true[:, None] < pos_true[None, :]
    iu = np.triu_indices(n, 1)
    agree = (a[iu] == b[iu]).sum()
    total = len(iu[0])
    return float(2.0 * agree / total - 1.0)


# ----------------------------------------------------------------------
# training
# ----------------------------------------------------------------------

def train_reading_order(
    steps: int = 3000,
    batch_size: int = 32,
    config: Optional[ReadingOrderConfig] = None,
    lr: float = 3e-4,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    log_every: int = 200,
):
    """Returns (model, params, final pairwise accuracy, eval mean tau)."""
    cfg = config or ReadingOrderConfig.base()
    model = ReadingOrderModel(cfg)
    rng = np.random.default_rng(seed)

    boxes0, _, n0 = make_batch(rng, batch_size, cfg.max_boxes)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.asarray(boxes0), jnp.asarray(n0)
    )
    warmup = min(100, max(steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(steps - warmup, 1), lr * 0.05
    )
    tx = optax.adamw(sched, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, boxes, ranks, n_valid):
        def loss_fn(p):
            scores = model.apply(p, boxes, n_valid)
            return pairwise_rank_loss(scores, ranks, n_valid)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    acc = 0.0
    for i in range(steps):
        boxes, ranks, n_valid = make_batch(rng, batch_size, cfg.max_boxes)
        params, opt_state, loss, acc = step_fn(
            params, opt_state, jnp.asarray(boxes), jnp.asarray(ranks),
            jnp.asarray(n_valid),
        )
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(
                f"step {i}: loss={float(loss):.4f} pair_acc={float(acc):.4f}",
                flush=True,
            )

    tau = evaluate_reading_order(model, params, cfg, seed=seed + 1)
    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(params, checkpoint_path)
    return model, params, float(acc), tau


def train_reading_order_device(
    steps: int = 4000,
    batch_size: int = 64,
    pool_pages: int = 4096,
    steps_per_dispatch: int = 500,
    config: Optional[ReadingOrderConfig] = None,
    lr: float = 3e-4,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
):
    """Device-resident training (same pattern as ``train/recognizer.py``):
    a pool of synthetic pages is generated on host ONCE and uploaded as a
    jit *argument*; page sampling, permutation shuffling, and the whole
    optimiser loop run on-device under ``lax.scan`` — one dispatch per
    ``steps_per_dispatch`` steps instead of one per step."""
    cfg = config or ReadingOrderConfig.base()
    model = ReadingOrderModel(cfg)
    rng = np.random.default_rng(seed)
    nb = cfg.max_boxes

    pool_boxes = np.zeros((pool_pages, nb, 4), np.float32)
    pool_n = np.zeros((pool_pages,), np.int32)
    for p in range(pool_pages):
        page, n = gen_page(rng, nb)
        pool_boxes[p] = page
        pool_n[p] = max(n, 2)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        jnp.zeros((batch_size, nb, 4), jnp.float32),
        jnp.full((batch_size,), 2, jnp.int32),
    )
    warmup = min(200, max(steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(steps - warmup, 1), lr * 0.05
    )
    tx = optax.adamw(sched, weight_decay=1e-4)
    opt_state = tx.init(params)
    pos = jnp.arange(nb)

    @jax.jit
    def train_chunk(params, opt_state, key, pb, pn):
        def body(carry, key):
            params, opt_state = carry
            k_page, k_perm = jax.random.split(key)
            idx = jax.random.randint(k_page, (batch_size,), 0, pool_pages)
            page = pb[idx]
            n = pn[idx]
            u = jax.random.uniform(k_perm, (batch_size, nb))
            u = u + (pos[None, :] >= n[:, None]) * 1e9
            perm = jnp.argsort(u, axis=1)
            boxes = jnp.take_along_axis(page, perm[:, :, None], axis=1)
            ranks = jnp.where(pos[None, :] < n[:, None], perm, nb + 1).astype(
                jnp.int32
            )

            def loss_fn(p):
                scores = model.apply(p, boxes, n)
                return pairwise_rank_loss(scores, ranks, n)

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), (loss, acc)

        keys = jax.random.split(key, steps_per_dispatch)
        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, losses[-1], accs[-1]

    pb = jnp.asarray(pool_boxes)
    pn = jnp.asarray(pool_n)
    key = jax.random.PRNGKey(seed + 7)
    acc = 0.0
    done = 0
    while done < steps:
        key, sub = jax.random.split(key)
        params, opt_state, loss, acc = train_chunk(params, opt_state, sub, pb, pn)
        loss, acc = jax.device_get((loss, acc))
        done += steps_per_dispatch
        print(
            f"step {done}: loss={float(loss):.4f} pair_acc={float(acc):.4f}",
            flush=True,
        )

    tau = evaluate_reading_order(model, params, cfg, seed=seed + 1)
    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(params), checkpoint_path)
    return model, params, float(acc), tau


def evaluate_reading_order(
    model, params, cfg: ReadingOrderConfig, pages: int = 64, seed: int = 1
) -> float:
    """Mean Kendall tau of predicted vs true order over fresh pages."""
    from marie_tpu.models.reading_order import _score_boxes

    rng = np.random.default_rng(seed)
    boxes, ranks, n_valid = make_batch(rng, pages, cfg.max_boxes)
    scores = np.asarray(
        _score_boxes(
            model, params, jnp.asarray(boxes), jnp.asarray(n_valid)
        )
    )
    taus = []
    for b in range(pages):
        n = int(n_valid[b])
        pred = np.argsort(scores[b, :n], kind="stable")
        true = np.argsort(ranks[b, :n], kind="stable")
        taus.append(kendall_tau(pred, true))
    return float(np.mean(taus))
