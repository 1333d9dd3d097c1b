"""Training for the LayoutLM-family heads on synthetic labeled documents.

Classifier: pages are composed from class-specific keyword pools
(invoice / correspondence / claim) mixed with shared filler — the model
learns document-type classification from content+layout.

Indexer/NER: synthetic key-value forms ("Field Name: value") with BIO
labels derived from construction — KEY tokens are field names, VALUE
tokens are the fillers (amounts/dates/ids).

Both trainers follow the device-resident recipe (dataset uploaded once,
multi-step scan dispatches).
"""

import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from marie_tpu.components.word_tokenizer import HashWordTokenizer
from marie_tpu.logging_core import MarieLogger
from marie_tpu.models.configs import LayoutLMConfig

CLASS_POOLS: Dict[str, List[str]] = {
    "invoice": "invoice subtotal tax total remit payment terms net due bill".split(),
    "correspondence": "dear sincerely regards letter notice inform request please".split(),
    "claim": "claim member patient provider diagnosis procedure benefit copay".split(),
}
_FILLER = "the and for with from of on at this that company date page".split()

KEY_POOL = "name address phone date amount total account member policy".split()


def _random_value(rng) -> str:
    kind = rng.integers(0, 3)
    if kind == 0:
        return f"{rng.integers(0, 100000) / 100:.2f}"
    if kind == 1:
        return f"{rng.integers(1, 13):02d}/{rng.integers(1, 29):02d}/{rng.integers(1990, 2030)}"
    return f"ID{rng.integers(10000, 99999)}"


def synth_classified_page(rng, label_idx: int, n_words: int = 60):
    """-> (words, boxes, label_idx). ~40% class words, rest filler."""
    pool = list(CLASS_POOLS.values())[label_idx]
    words, boxes = [], []
    x, y = 20, 20
    for _ in range(n_words):
        w = pool[rng.integers(0, len(pool))] if rng.random() < 0.4 else (
            _FILLER[rng.integers(0, len(_FILLER))]
        )
        words.append(w)
        bw = 8 * len(w) + 4
        boxes.append([x, y, bw, 14])
        x += bw + 10
        if x > 700:
            x, y = 20, y + 24
    return words, boxes


def synth_kv_page(rng, n_pairs: int = 12):
    """-> (words, boxes, bio_labels) for 'Key Name : value' lines.

    labels: 0=O, 1=B-KEY, 2=I-KEY, 3=B-VALUE, 4=I-VALUE.
    """
    words, boxes, labels = [], [], []
    y = 20
    for _ in range(n_pairs):
        x = 20
        key_len = int(rng.integers(1, 3))
        for i in range(key_len):
            w = KEY_POOL[rng.integers(0, len(KEY_POOL))]
            words.append(w)
            boxes.append([x, y, 8 * len(w) + 4, 14])
            labels.append(1 if i == 0 else 2)
            x += 8 * len(w) + 12
        # a filler word between some pairs (O)
        if rng.random() < 0.3:
            f = _FILLER[rng.integers(0, len(_FILLER))]
            words.append(f)
            boxes.append([x, y, 8 * len(f) + 4, 14])
            labels.append(0)
            x += 8 * len(f) + 12
        val = _random_value(rng)
        words.append(val)
        boxes.append([x, y, 8 * len(val) + 4, 14])
        labels.append(3)
        y += 26
    return words, boxes, labels


HEADER_POOL = (
    "invoice statement claim notice memo corporation llc incorporated "
    "street suite attn regarding dear account summary remittance"
).split()
_CONT_POOL = "continued carried forward subtotal".split()


def synth_split_page(rng, is_boundary: bool, n_body_words: int = 50):
    """-> (words, boxes) for splitter training.

    Boundary (first) pages open with a letterhead block and usually a
    'page 1 of N' marker; continuation pages carry 'page k of N' (k>1)
    and sometimes 'continued' — mirroring what the reference's page
    classifier learns from real bundles
    (/root/reference/marie/components/document_splitter/transformers.py:30)."""
    words, boxes = [], []
    y = 16

    def put_line(line_words, y):
        x = 20
        for w in line_words:
            words.append(w)
            boxes.append([x, y, 8 * len(w) + 4, 14])
            x += 8 * len(w) + 12
        return y + 24

    total = int(rng.integers(2, 9))
    if is_boundary:
        for _ in range(int(rng.integers(2, 4))):  # letterhead block
            line = [
                HEADER_POOL[rng.integers(0, len(HEADER_POOL))]
                for _ in range(int(rng.integers(2, 5)))
            ]
            y = put_line(line, y)
        if rng.random() < 0.7:
            y = put_line(["page", "1", "of", str(total)], y)
    else:
        k = int(rng.integers(2, total + 1)) if total >= 2 else 2
        if rng.random() < 0.6:
            y = put_line(["page", str(k), "of", str(total)], y)
        if rng.random() < 0.5:
            y = put_line([_CONT_POOL[rng.integers(0, len(_CONT_POOL))]], y)
    # body filler
    x = 20
    for _ in range(n_body_words):
        w = _FILLER[rng.integers(0, len(_FILLER))]
        words.append(w)
        boxes.append([x, y, 8 * len(w) + 4, 14])
        x += 8 * len(w) + 12
        if x > 700:
            x, y = 20, y + 24
    return words, boxes


def train_layout_splitter(
    config: Optional[LayoutLMConfig] = None,
    steps: int = 1500,
    batch_size: int = 32,
    dataset_size: int = 2048,
    learning_rate: float = 3e-4,
    steps_per_dispatch: int = 25,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
):
    """Train the page boundary/continuation classifier behind
    LayoutDocumentSplitter (components/document_splitter)."""
    from marie_tpu.models.layoutlm import LayoutLMv3ForSequenceClassification

    logger = MarieLogger("train-splitter")
    labels = ("continuation", "boundary")
    config = config or LayoutLMConfig.synth(num_labels=len(labels))
    model = LayoutLMv3ForSequenceClassification(config)
    tokenizer = HashWordTokenizer(config.vocab_size)
    rng = np.random.default_rng(seed)

    def encode_random_size(pages_list):
        """Encode with a RANDOM page size per page so the classifier is
        robust to whatever physical page the boxes arrive normalized by
        (PageInput defaults to content extent at inference)."""
        l = config.max_seq_len
        n = len(pages_list)
        tokens = np.zeros((n, l), np.int32)
        boxes_arr = np.zeros((n, l, 4), np.int32)
        seq_len = np.ones((n,), np.int32)
        for i, (words, wboxes) in enumerate(pages_list):
            ps = (int(rng.integers(600, 1400)), int(rng.integers(300, 1400)))
            t, b, ln = tokenizer.encode_page(words, wboxes, ps, l, config.max_2d_pos)
            tokens[i], boxes_arr[i], seq_len[i] = t, b, max(ln, 1)
        return tokens, boxes_arr, seq_len

    pages, ys = [], []
    for _ in range(dataset_size):
        is_boundary = bool(rng.random() < 0.5)
        pages.append(synth_split_page(rng, is_boundary))
        ys.append(int(is_boundary))
    tokens, boxes, seq_len = encode_random_size(pages)
    data = tuple(
        jnp.asarray(a) for a in (tokens, boxes, seq_len, np.asarray(ys, np.int32))
    )

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, max(steps // 10, 1), steps
    )
    optimizer = optax.adamw(schedule, weight_decay=0.01)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), data[0][:1], data[1][:1], data[2][:1], None
    )
    opt_state = jax.jit(optimizer.init)(params)

    @jax.jit
    def run_block(params, opt_state, key, toks, bxs, lens, ys):
        def one_step(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(k, (batch_size,), 0, dataset_size)

            def loss_fn(p):
                logits = model.apply(p, toks[idx], bxs[idx], lens[idx], None)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, ys[idx]
                ).mean()

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
        params, opt_state, loss = run_block(params, opt_state, sub, *data)
        done += steps_per_dispatch
        if done % 250 == 0:
            logger.info(
                f"step {done}/{steps} loss={float(loss):.4f} "
                f"({(time.time() - t0) / done:.3f}s/step)"
            )

    # held-out: page accuracy + whole-bundle split accuracy
    test_pages, test_ys, bundles = [], [], []
    for _ in range(64):  # 64 bundles of 2-4 docs x 1-4 pages
        bundle = []
        for _ in range(int(rng.integers(2, 5))):
            n_pages_doc = int(rng.integers(1, 5))
            for p in range(n_pages_doc):
                bundle.append(len(test_pages))
                is_boundary = p == 0
                test_pages.append(synth_split_page(rng, is_boundary))
                test_ys.append(int(is_boundary))
        bundles.append(bundle)
    tt, tb, tl = encode_random_size(test_pages)
    logits = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c, None))(
        params, jnp.asarray(tt), jnp.asarray(tb), jnp.asarray(tl)
    )
    pred = np.asarray(logits).argmax(-1)
    page_acc = float((pred == np.asarray(test_ys)).mean())
    bundle_ok = 0
    for bundle in bundles:
        truth = [test_ys[i] for i in bundle]
        got = [int(pred[i]) for i in bundle]
        got[0] = 1  # first page always a boundary (splitter semantics)
        truth[0] = 1
        bundle_ok += int(got == truth)
    split_acc = bundle_ok / max(len(bundles), 1)
    logger.info(f"held-out page accuracy={page_acc:.4f} split accuracy={split_acc:.4f}")
    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(params), checkpoint_path)
        logger.info(f"saved to {checkpoint_path}")
    return model, params, {"page_acc": page_acc, "split_acc": split_acc}, config


def _encode_pages(pages, tokenizer, cfg, page_size=(760, 400)):
    l = cfg.max_seq_len
    n = len(pages)
    tokens = np.zeros((n, l), np.int32)
    boxes = np.zeros((n, l, 4), np.int32)
    seq_len = np.ones((n,), np.int32)
    for i, (words, wboxes) in enumerate(pages):
        t, b, ln = tokenizer.encode_page(words, wboxes, page_size, l, cfg.max_2d_pos)
        tokens[i], boxes[i], seq_len[i] = t, b, max(ln, 1)
    return tokens, boxes, seq_len


def train_layout_classifier(
    labels: Sequence[str] = tuple(CLASS_POOLS),
    config: Optional[LayoutLMConfig] = None,
    steps: int = 1500,
    batch_size: int = 32,
    dataset_size: int = 2048,
    learning_rate: float = 3e-4,
    steps_per_dispatch: int = 25,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    tokenizer=None,
    shuffle_words: bool = False,
):
    from marie_tpu.models.layoutlm import LayoutLMv3ForSequenceClassification

    logger = MarieLogger("train-classifier")
    config = config or LayoutLMConfig(
        vocab_size=8192, hidden_dim=256, num_layers=4, num_heads=4,
        mlp_dim=1024, max_seq_len=128, use_image=False,
        num_labels=len(labels),
    )
    model = LayoutLMv3ForSequenceClassification(config)
    # shuffle_words: permute the word sequence per page so the model
    # reads layout from the 2D boxes, not the sequence position — the
    # on-device chain (ocr/fused_chain.py) feeds words in CC-slot order,
    # which differs from the synthetic reading order
    tokenizer = tokenizer or HashWordTokenizer(config.vocab_size)
    rng = np.random.default_rng(seed)

    pages, ys = [], []
    for _ in range(dataset_size):
        li = int(rng.integers(0, len(labels)))
        words, boxes = synth_classified_page(rng, li)
        if shuffle_words:
            perm = rng.permutation(len(words))
            words = [words[j] for j in perm]
            boxes = [boxes[j] for j in perm]
        pages.append((words, boxes))
        ys.append(li)
    tokens, boxes, seq_len = _encode_pages(pages, tokenizer, config)
    data = tuple(
        jnp.asarray(a) for a in (tokens, boxes, seq_len, np.asarray(ys, np.int32))
    )

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, max(steps // 10, 1), steps
    )
    optimizer = optax.adamw(schedule, weight_decay=0.01)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), data[0][:1], data[1][:1], data[2][:1], None
    )
    opt_state = jax.jit(optimizer.init)(params)

    @jax.jit
    def run_block(params, opt_state, key, toks, bxs, lens, ys):
        def one_step(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(k, (batch_size,), 0, dataset_size)

            def loss_fn(p):
                logits = model.apply(p, toks[idx], bxs[idx], lens[idx], None)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, ys[idx]
                ).mean()

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
        params, opt_state, loss = run_block(params, opt_state, sub, *data)
        done += steps_per_dispatch
        if done % 250 == 0:
            logger.info(
                f"step {done}/{steps} loss={float(loss):.4f} "
                f"({(time.time() - t0) / done:.3f}s/step)"
            )

    # held-out accuracy
    test_pages, test_ys = [], []
    for _ in range(256):
        li = int(rng.integers(0, len(labels)))
        words, bxs = synth_classified_page(rng, li)
        if shuffle_words:
            perm = rng.permutation(len(words))
            words = [words[j] for j in perm]
            bxs = [bxs[j] for j in perm]
        test_pages.append((words, bxs))
        test_ys.append(li)
    tt, tb, tl = _encode_pages(test_pages, tokenizer, config)
    logits = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c, None))(
        params, jnp.asarray(tt), jnp.asarray(tb), jnp.asarray(tl)
    )
    acc = float((np.asarray(logits).argmax(-1) == np.asarray(test_ys)).mean())
    logger.info(f"held-out accuracy={acc:.4f}")
    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(params), checkpoint_path)
        logger.info(f"saved to {checkpoint_path}")
    return model, params, acc, config


def train_layout_indexer(
    labels: Sequence[str] = ("O", "B-KEY", "I-KEY", "B-VALUE", "I-VALUE"),
    config: Optional[LayoutLMConfig] = None,
    steps: int = 1500,
    batch_size: int = 32,
    dataset_size: int = 2048,
    learning_rate: float = 3e-4,
    steps_per_dispatch: int = 25,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    tokenizer=None,
    shuffle_words: bool = False,
):
    from marie_tpu.models.layoutlm import LayoutLMv3ForTokenClassification

    logger = MarieLogger("train-indexer")
    config = config or LayoutLMConfig(
        vocab_size=8192, hidden_dim=256, num_layers=4, num_heads=4,
        mlp_dim=1024, max_seq_len=128, use_image=False,
        num_labels=len(labels),
    )
    model = LayoutLMv3ForTokenClassification(config)
    tokenizer = tokenizer or HashWordTokenizer(config.vocab_size)
    rng = np.random.default_rng(seed)
    l = config.max_seq_len

    pages, tags = [], []
    for _ in range(dataset_size):
        words, boxes, bio = synth_kv_page(rng)
        if shuffle_words:
            perm = rng.permutation(len(words))
            words = [words[j] for j in perm]
            boxes = [boxes[j] for j in perm]
            bio = [bio[j] for j in perm]
        pages.append((words, boxes))
        row = np.zeros((l,), np.int32)
        row[: min(len(bio), l)] = bio[:l]
        tags.append(row)
    tokens, boxes, seq_len = _encode_pages(pages, tokenizer, config)
    data = tuple(
        jnp.asarray(a)
        for a in (tokens, boxes, seq_len, np.stack(tags))
    )

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, max(steps // 10, 1), steps
    )
    optimizer = optax.adamw(schedule, weight_decay=0.01)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), data[0][:1], data[1][:1], data[2][:1], None
    )
    opt_state = jax.jit(optimizer.init)(params)

    @jax.jit
    def run_block(params, opt_state, key, toks, bxs, lens, ys):
        def one_step(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(k, (batch_size,), 0, dataset_size)

            def loss_fn(p):
                logits = model.apply(p, toks[idx], bxs[idx], lens[idx], None)
                per = optax.softmax_cross_entropy_with_integer_labels(
                    logits, ys[idx]
                )
                mask = (
                    jnp.arange(logits.shape[1])[None, :] < lens[idx][:, None]
                ).astype(jnp.float32)
                return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)

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
        params, opt_state, loss = run_block(params, opt_state, sub, *data)
        done += steps_per_dispatch
        if done % 250 == 0:
            logger.info(
                f"step {done}/{steps} loss={float(loss):.4f} "
                f"({(time.time() - t0) / done:.3f}s/step)"
            )

    # held-out token accuracy
    correct = total = 0
    tp_rows = []
    for _ in range(128):
        words, boxes_, bio = synth_kv_page(rng)
        if shuffle_words:
            perm = rng.permutation(len(words))
            words = [words[j] for j in perm]
            boxes_ = [boxes_[j] for j in perm]
            bio = [bio[j] for j in perm]
        tp_rows.append(((words, boxes_), bio))
    tt, tb, tl = _encode_pages([p for p, _ in tp_rows], tokenizer, config)
    logits = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c, None))(
        params, jnp.asarray(tt), jnp.asarray(tb), jnp.asarray(tl)
    )
    pred = np.asarray(logits).argmax(-1)
    for i, (_, bio) in enumerate(tp_rows):
        n = min(len(bio), l)
        correct += int((pred[i, :n] == np.asarray(bio[:n])).sum())
        total += n
    acc = correct / max(total, 1)
    logger.info(f"held-out token accuracy={acc:.4f}")
    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(params), checkpoint_path)
        logger.info(f"saved to {checkpoint_path}")
    return model, params, acc, config
