"""Fused OCR → classify → NER chain: the WHOLE page pipeline in ONE
XLA program — a page never leaves the device between detect, recognize,
classify and extract.

The reference chains these as separate host-mediated stages
(``/root/reference/marie/pipe/base_pipeline.py:66`` →
``extract_pipeline.py:447``: OCR result dicts are re-tokenized on host
and fed to LayoutLM classifier/indexer models in separate passes).
TPU-first re-design (BASELINE configs 3-4): the fused compact program's
decode output is hashed to LayoutLM word ids ON DEVICE
(:class:`~marie_tpu.components.word_tokenizer.RollingWordTokenizer`
defines the hash over recognizer char ids — device and host compute the
identical uint32 arithmetic), the per-page kept rows are gathered into
fixed-length sequences with their bucketized boxes, and the
classification + token-classification heads run in the same program.

Row alignment: identical to ``_fused_pages_compact`` (page-major
kept-first order); the page-local j-th kept word's NER label is
``ner_labels[p, j]``.
"""

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.boxes.craft_box_processor import _detect_core
from marie_tpu.components.word_tokenizer import _RESERVED
from marie_tpu.models.trocr import greedy_decode
from marie_tpu.ocr.fused import (
    _crop_batch,
    _geometric_step_caps,
    _mesh_replicated_params,
    _norm_pack_bits,
    _pallas_crop_default,
    _unpack_bits,
)


def rolling_word_ids(tokens: jnp.ndarray, vocab_size: int,
                     pad_id: int = 2) -> jnp.ndarray:
    """[T, S] decoded char ids -> [T] LayoutLM word ids (device side of
    RollingWordTokenizer: h = Σ (tok+1)·31^pos over non-pad chars)."""
    s = tokens.shape[-1]
    # 31^pos mod 2^32, precomputed as constants — fully vectorized
    # (python-int arithmetic masked to 32 bits: numpy scalar multiply
    # would emit an overflow RuntimeWarning on the intended wraparound)
    pows = np.array(
        [pow(31, i, 1 << 32) for i in range(s)], dtype=np.uint32
    )
    mask = tokens != pad_id
    contrib = jnp.where(
        mask, (tokens.astype(jnp.uint32) + 1) * jnp.asarray(pows), 0
    )
    h = contrib.sum(axis=-1, dtype=jnp.uint32)
    return (_RESERVED + h % jnp.uint32(vocab_size - _RESERVED)).astype(
        jnp.int32
    )


@partial(
    jax.jit,
    static_argnames=(
        "craft_model",
        "trocr_model",
        "cls_model",
        "ner_model",
        "text_threshold",
        "low_text",
        "link_threshold",
        "min_area",
        "box_expand",
        "max_components",
        "box_source",
        "total_slots",
        "out_h",
        "out_w",
        "dtype",
        "max_steps",
        "pallas_crop",
        "packed",
        "seq_len_cap",
        "word_vocab",
        "coord_buckets",
    ),
)
def _fused_pages_chain(
    craft_model,
    craft_vars,
    trocr_model,
    trocr_params,
    cls_model,
    cls_params,
    ner_model,
    ner_params,
    pages_u8: jnp.ndarray,
    clip_whs: jnp.ndarray,
    n_real: jnp.ndarray,
    text_threshold: float,
    low_text: float,
    link_threshold: float,
    min_area: float,
    box_expand: float,
    max_components: int,
    box_source: str,
    total_slots: int,
    out_h: int,
    out_w: int,
    dtype,
    max_steps: int,
    pallas_crop: bool,
    packed: bool,
    seq_len_cap: int,
    word_vocab: int,
    coord_buckets: int,
):
    """detect + select + crop + decode + hash + classify + NER, one
    program.  Same selection/compaction contract as
    ``_fused_pages_compact``; additionally returns per-page class logits
    and per-row NER label ids/scores."""
    if packed:
        pages_u8 = _unpack_bits(pages_u8, _norm_pack_bits(packed))
    if pages_u8.ndim == 3:
        crop_src = pages_u8
        pages_u8 = jnp.repeat(pages_u8[..., None], 3, axis=-1)
    else:
        crop_src = pages_u8
    p = pages_u8.shape[0]

    stats = _detect_core(
        craft_model, craft_vars, pages_u8, text_threshold, low_text,
        link_threshold, max_components, box_source,
    )

    m = stats["boxes"].shape[1]
    stride = stats["stride"][0].astype(jnp.float32)
    score_floor = 0.0 if box_source == "ink" else text_threshold
    min_area_grid = min_area / (stride / 2.0) ** 2
    keep = (
        stats["valid"]
        & (stats["scores"] >= score_floor)
        & (stats["areas"] >= min_area_grid)
        & (jnp.arange(p)[:, None] < n_real)
    )  # [P, M]

    flat_keep = keep.reshape(-1)
    gid = jnp.arange(p * m)
    order = jnp.argsort(jnp.where(flat_keep, gid, p * m + gid))[:total_slots]
    sel_keep = flat_keep[order]
    page_of = (order // m).astype(jnp.int32)

    b = stats["boxes"].reshape(p * m, 4)[order].astype(jnp.float32) * stride
    bw = b[:, 2] - b[:, 0]
    bh = b[:, 3] - b[:, 1]
    b = b + jnp.stack([-bw, -bh, bw, bh], axis=-1) * box_expand
    clip = clip_whs[page_of]  # [T, 2]
    hi = jnp.stack([clip[:, 0], clip[:, 1], clip[:, 0], clip[:, 1]], axis=-1)
    b = jnp.clip(b, 0.0, hi)
    b = jnp.where(sel_keep[:, None], b, jnp.asarray([0.0, 0.0, 1.0, 1.0]))

    crops, eff_w = _crop_batch(crop_src, page_of, b, out_h, out_w, pallas_crop)
    if crops.ndim == 3:
        crops = jnp.repeat(crops[..., None], 3, axis=-1)
    tokens, _, conf = greedy_decode(
        trocr_model, trocr_params, crops.astype(dtype), max_steps,
        active=sel_keep,
        step_caps=_geometric_step_caps(eff_w, out_h, max_steps),
    )

    # ---- device-side LayoutLM featureization -------------------------
    word_ids = rolling_word_ids(tokens, word_vocab)  # [T]
    # bucketized xyxy boxes (HashWordTokenizer.encode_page convention)
    scale4 = jnp.concatenate([clip, clip], axis=-1)  # [T, 4] w,h,w,h
    nbox = jnp.clip(
        (b / jnp.maximum(scale4, 1.0) * (coord_buckets - 1)).astype(jnp.int32),
        0, coord_buckets - 1,
    )  # [T, 4]

    # per-page gather: page p's kept rows are contiguous at offset
    # cumsum(counts[:p]) (the compaction is page-major kept-first)
    counts = keep.sum(axis=1)  # [P]
    offsets = jnp.cumsum(counts) - counts  # exclusive
    l = seq_len_cap
    rows = offsets[:, None] + jnp.arange(l)[None, :]  # [P, L]
    valid = jnp.arange(l)[None, :] < counts[:, None]
    rows = jnp.clip(rows, 0, total_slots - 1)
    page_tokens = jnp.where(valid, word_ids[rows], 0)  # PAD_ID = 0
    page_boxes = jnp.where(valid[..., None], nbox[rows], 0)
    seq_len = jnp.minimum(jnp.maximum(counts, 1), l).astype(jnp.int32)

    cls_logits = cls_model.apply(
        cls_params, page_tokens, page_boxes, seq_len, None
    )  # [P, n_classes]
    ner_logits = ner_model.apply(
        ner_params, page_tokens, page_boxes, seq_len, None
    )  # [P, L, n_labels]
    ner_probs = jax.nn.softmax(ner_logits, axis=-1)
    ner_labels = jnp.argmax(ner_logits, axis=-1).astype(jnp.int32)
    ner_scores = jnp.max(ner_probs, axis=-1)

    return (
        stats, tokens, conf,
        cls_logits, ner_labels, ner_scores,
    )


def fused_ocr_chain(
    box_processor,
    ocr_processor,
    classifier,
    indexer,
    pages,
    clip_whs=None,
    *,
    n_real: Optional[int] = None,
    total_slots: Optional[int] = None,
    compact_slots: int = 192,
    mesh=None,
    packed: bool = False,
    pallas_crop: Optional[bool] = None,
):
    """PUBLIC kwargs-stable chained entry (BASELINE configs 3-4).

    ``classifier`` / ``indexer`` are the LayoutLM head components
    (:class:`LayoutDocumentClassifier` /
    :class:`LayoutDocumentIndexer`-compatible: ``.model``, ``.params``,
    ``.config``) trained with the RollingWordTokenizer.  Sequence cap is
    the head's ``max_seq_len``.  Returns
    (stats, tokens, conf, cls_logits, ner_labels, ner_scores).
    """
    import jax.sharding as jsh

    bp, op = box_processor, ocr_processor
    pack_bits = _norm_pack_bits(packed)
    p = int(pages.shape[0])
    if clip_whs is None:
        h = int(pages.shape[1])
        w = int(pages.shape[2]) * (8 // pack_bits if pack_bits else 1)
        clip_whs = np.tile(np.asarray([[w, h]], np.float32), (p, 1))
    if total_slots is None:
        total_slots = p * compact_slots
    if n_real is None:
        n_real = p
    if pallas_crop is None:
        pallas_crop = _pallas_crop_default()

    craft_vars, trocr_params = bp.variables, op.params
    cls_params, ner_params = classifier.params, indexer.params
    if mesh is not None:
        n_dev = int(np.prod(mesh.devices.shape))
        if p % n_dev:
            raise ValueError(
                f"page batch {p} not divisible by mesh devices {n_dev}"
            )
        batch_sharding = jsh.NamedSharding(
            mesh, jsh.PartitionSpec(mesh.axis_names)
        )
        pages = jax.device_put(pages, batch_sharding)
        clip_whs = jax.device_put(
            clip_whs if hasattr(clip_whs, "sharding")
            else np.asarray(clip_whs, np.float32),
            batch_sharding,
        )
        craft_vars = _mesh_replicated_params(bp, "variables", mesh)
        trocr_params = _mesh_replicated_params(op, "params", mesh)
        cls_params = _mesh_replicated_params(classifier, "params", mesh)
        ner_params = _mesh_replicated_params(indexer, "params", mesh)
    else:
        pages = jnp.asarray(pages)
        clip_whs = jnp.asarray(clip_whs, jnp.float32)

    seq_cap = min(classifier.config.max_seq_len, indexer.config.max_seq_len)
    assert classifier.config.vocab_size == indexer.config.vocab_size
    # AOT program zoo (same contract as fused_ocr_pages): dynamic
    # positions are the param trees + page batch + clip + n_real
    from marie_tpu.utils.program_zoo import zoo_call

    all_args = (
        bp.model, craft_vars, op.model, trocr_params,
        classifier.model, cls_params, indexer.model, ner_params,
        pages, clip_whs, jnp.int32(n_real),
        bp.text_threshold, bp.low_text, bp.link_threshold,
        float(bp.min_area), float(bp.box_expand),
        bp.max_components, bp.box_source, int(total_slots),
        op.crop_h, op.crop_w, op.compute_dtype, op.decode_steps,
        bool(pallas_crop), pack_bits,
        int(seq_cap), int(classifier.config.vocab_size),
        int(classifier.config.max_2d_pos),
    )
    static_repr = (
        f"{type(bp.model).__name__}{bp.model.cfg}|"
        f"{type(op.model).__name__}{op.model.cfg}|"
        f"{type(classifier.model).__name__}{classifier.config}|"
        f"{type(indexer.model).__name__}{indexer.config}|"
        f"{bp.text_threshold}|{bp.low_text}|{bp.link_threshold}|"
        f"{bp.min_area}|{bp.box_expand}|{bp.max_components}|"
        f"{bp.box_source}|{total_slots}|{op.crop_h}|{op.crop_w}|"
        f"{op.compute_dtype}|{op.decode_steps}|{pallas_crop}|{pack_bits}|"
        f"{seq_cap}"
    )
    return zoo_call(
        "fused_pages_chain", _fused_pages_chain, all_args,
        dynamic_idx=(1, 3, 5, 7, 8, 9, 10), static_repr=static_repr,
    )
