"""Single-program page OCR: detection + box selection + crop + decode in
ONE XLA program per page.

The reference runs detection (``boxes/craft_box_processor.py``) and
recognition (``document/trocr_ocr_processor.py``) as separate GPU passes
with OpenCV box post-processing on host in between.  The repo's two-phase
pipeline already keeps pixels on device; this module removes the LAST
host round trip: the CRAFT forward, connected components, score/area box
filtering, top-K selection, crop_resize, and the full greedy decode run
as one fused program — per page ONE dispatch goes out and ONE result
struct comes back.  Under a high-latency device link (the axon relay)
this halves per-page round trips; on directly-attached TPUs it removes a
host sync and lets XLA overlap detection epilogue with encoder prologue.

Row alignment contract: the device keeps boxes with
``valid & score >= floor & area >= min_area`` and decodes them in
ascending component-slot order.  The host applies the IDENTICAL
predicate to the same fetched stats (``detect_collect(return_rows=True)``)
so the j-th surviving host box is exactly decoded row j — no index
arrays cross the wire.
"""

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.boxes.craft_box_processor import _detect_core, _detect_jit
from marie_tpu.models.trocr import greedy_decode
from marie_tpu.ops.pallas.crop_resize import crop_resize_pallas
from marie_tpu.preprocess.ops import crop_resize_pages


def _geometric_step_caps(eff_w, out_h: int, max_steps: int):
    """Per-row decode budget from crop geometry: a glyph is ~out_h/2 px
    wide after height normalization, so eff_w bounds the character count
    (+3 slack for EOS and narrow glyphs).  Keeps one noisy never-EOS row
    from holding the whole decode batch to max_steps."""
    glyph_w = max(out_h // 2, 1)
    # +4 slack covers thin-glyph runs (i/l/1 compress well below the
    # average glyph width) and the EOS step; the CER oracle pins the
    # truncation risk of this bound
    return jnp.clip(
        eff_w.astype(jnp.int32) // glyph_w + 4, 6, max_steps
    ).astype(jnp.int32)


def _crop_batch(crop_src, page_of, b, out_h, out_w, pallas_crop: bool):
    """Crop extraction: the Pallas slab-DMA kernel on TPU grayscale
    stacks (~8x the gather path), XLA gathers elsewhere.

    The Pallas kernel reads a contiguous ~192-row slab per crop; a box
    taller than the usable window would be top-anchor-clamped (TPU and
    CPU would produce different crops for e.g. merged multi-line
    components).  A ``lax.cond`` routes the whole batch through the XLA
    gather path whenever any box exceeds the window — the common
    all-short-boxes batch still pays only the Pallas cost."""
    if pallas_crop and crop_src.ndim == 3:
        from marie_tpu.ops.pallas.crop_resize import _ROW_ALIGN, DEFAULT_WINDOW

        usable = DEFAULT_WINDOW - _ROW_ALIGN
        bh = b[:, 3] - b[:, 1]
        return jax.lax.cond(
            jnp.any(bh >= usable),
            lambda: crop_resize_pages(crop_src, page_of, b, out_h, out_w),
            lambda: crop_resize_pallas(crop_src, page_of, b, out_h, out_w),
        )
    return crop_resize_pages(crop_src, page_of, b, out_h, out_w)


def _pallas_crop_default() -> bool:
    import jax as _jax

    return _jax.devices()[0].platform == "tpu"


def _unpack4(packed_u8: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of :func:`marie_tpu.utils.pack4.pack4`:
    [..., W//2] packed nibbles -> [..., W] uint8 (nibble * 17).

    Lane-friendly formulation: repeat along the minor dim then select
    hi/lo nibble by column parity — no [..., 2] trailing dim appears
    (TPU would pad it to 128 lanes)."""
    rep = jnp.repeat(packed_u8, 2, axis=-1)
    col = jax.lax.broadcasted_iota(jnp.int32, rep.shape, rep.ndim - 1)
    nib = jnp.where(col % 2 == 0, rep >> 4, rep & 0xF)
    return nib * jnp.uint8(17)


def _unpack2(packed_u8: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of :func:`marie_tpu.utils.pack4.pack2`:
    [..., W//4] 2-bit quads -> [..., W] uint8 (level * 85), same
    lane-friendly repeat+select formulation as :func:`_unpack4`."""
    rep = jnp.repeat(packed_u8, 4, axis=-1).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, rep.shape, rep.ndim - 1)
    lvl = (rep >> ((3 - col % 4) * 2)) & 0x3
    return (lvl * 85).astype(jnp.uint8)


def _unpack1(packed_u8: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of :func:`marie_tpu.utils.pack4.pack1`:
    [..., W//8] bit-packed -> [..., W] uint8 (bit * 255), same
    lane-friendly repeat+select formulation as :func:`_unpack4`."""
    rep = jnp.repeat(packed_u8, 8, axis=-1).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, rep.shape, rep.ndim - 1)
    bit = (rep >> (7 - col % 8)) & 0x1
    return (bit * 255).astype(jnp.uint8)


def _norm_pack_bits(packed) -> int:
    """Normalize the ``packed`` flag: False/None -> 0 (unpacked),
    True -> 4 (u4, the original bool API), else 1, 2 or 4."""
    if packed is True:
        return 4
    if not packed:
        return 0
    bits = int(packed)
    if bits not in (1, 2, 4):
        raise ValueError(f"pack bits must be 1, 2 or 4, got {packed!r}")
    return bits


def _unpack_bits(pages_u8: jnp.ndarray, bits: int) -> jnp.ndarray:
    if bits == 4:
        return _unpack4(pages_u8)
    if bits == 2:
        return _unpack2(pages_u8)
    if bits == 1:
        return _unpack1(pages_u8)
    return pages_u8


@partial(jax.jit, static_argnames=("bits",))
def _unpack_page(packed_u8: jnp.ndarray, bits: int = 4) -> jnp.ndarray:
    """Standalone unpack for the rare overflow-recognition path."""
    return _unpack_bits(packed_u8, bits)


# back-compat alias (tests / external callers)
def _unpack4_page(packed_u8: jnp.ndarray) -> jnp.ndarray:
    return _unpack_page(packed_u8, bits=4)


@partial(
    jax.jit,
    static_argnames=(
        "craft_model",
        "trocr_model",
        # float thresholds are STATIC on purpose: baking them as constants
        # lets XLA fold them into the conv epilogue / reduce kernels — the
        # same program with traced scalar thresholds measured 3.4x slower
        # (95 vs 27.7 ms/page); they come from engine config, so one
        # compile per configuration
        "text_threshold",
        "low_text",
        "link_threshold",
        "min_area",
        "box_expand",
        "max_components",
        "box_source",
        "rec_slots",
        "out_h",
        "out_w",
        "dtype",
        "max_steps",
        "pallas_crop",
    ),
)
def _fused_page(
    craft_model,
    craft_vars,
    trocr_model,
    trocr_params,
    page_u8: jnp.ndarray,  # [H, W, 3] uint8, bucket-padded
    clip_wh: jnp.ndarray,  # [2] float32: scaled-original (w, h) crop clip
    text_threshold: float,
    low_text: float,
    link_threshold: float,
    min_area: float,
    box_expand: float,
    max_components: int,
    box_source: str,
    rec_slots: int,
    out_h: int,
    out_w: int,
    dtype,
    max_steps: int,
    pallas_crop: bool = False,
):
    if page_u8.ndim == 2:
        # grayscale upload (1/3 the host->device bytes — the transfer is
        # a top-3 cost through a relay AND on PCIe); channel-identical
        # pages expand back to RGB on device, bit-identical results.
        # Crops gather from the channel-free [H, W] view (a trailing
        # C=1/C=3 dim is lane-padded to 128 on TPU — 42-128x the bytes)
        crop_src = page_u8[None]  # [1, H, W]
        page_u8 = jnp.repeat(page_u8[..., None], 3, axis=-1)
    else:
        crop_src = page_u8[None]  # [1, H, W, 3]
    stats = _detect_jit(
        craft_model, craft_vars, page_u8,
        text_threshold, low_text, link_threshold, max_components, box_source,
    )
    boxes = stats["boxes"].astype(jnp.float32)  # [M,4] xyxy grid coords
    scores = stats["scores"]
    areas = stats["areas"]
    valid = stats["valid"]
    stride = stats["stride"].astype(jnp.float32)

    # identical predicate to BoxProcessorCraft.detect_collect
    score_floor = 0.0 if box_source == "ink" else text_threshold
    min_area_grid = min_area / (stride / 2.0) ** 2
    keep = valid & (scores >= score_floor) & (areas >= min_area_grid)

    # kept slots first, in ascending slot order (matches host nonzero order)
    m = boxes.shape[0]
    slot = jnp.arange(m)
    sel = jnp.argsort(jnp.where(keep, slot, m + slot))[:rec_slots]
    sel_keep = keep[sel]

    b = boxes[sel] * stride  # grid -> padded-page pixels
    bw = b[:, 2] - b[:, 0]
    bh = b[:, 3] - b[:, 1]
    b = b + jnp.stack([-bw, -bh, bw, bh], axis=-1) * box_expand
    lo = jnp.zeros((4,), jnp.float32)
    hi = jnp.stack([clip_wh[0], clip_wh[1], clip_wh[0], clip_wh[1]])
    b = jnp.clip(b, lo, hi)
    b = jnp.where(sel_keep[:, None], b, jnp.asarray([0.0, 0.0, 1.0, 1.0]))

    crops, eff_w = _crop_batch(
        crop_src, jnp.zeros((b.shape[0],), jnp.int32), b, out_h, out_w,
        pallas_crop,
    )
    if crops.ndim == 3:
        crops = jnp.repeat(crops[..., None], 3, axis=-1)
    tokens, _, conf = greedy_decode(
        trocr_model, trocr_params, crops.astype(dtype), max_steps,
        step_caps=_geometric_step_caps(eff_w, out_h, max_steps),
    )
    return stats, tokens, conf


@partial(
    jax.jit,
    static_argnames=(
        "craft_model",
        "trocr_model",
        # float thresholds are STATIC on purpose: baking them as constants
        # lets XLA fold them into the conv epilogue / reduce kernels — the
        # same program with traced scalar thresholds measured 3.4x slower
        # (95 vs 27.7 ms/page); they come from engine config, so one
        # compile per configuration
        "text_threshold",
        "low_text",
        "link_threshold",
        "min_area",
        "box_expand",
        "max_components",
        "box_source",
        "rec_slots",
        "out_h",
        "out_w",
        "dtype",
        "max_steps",
        "pallas_crop",
    ),
)
def _fused_pages(
    craft_model,
    craft_vars,
    trocr_model,
    trocr_params,
    pages_u8: jnp.ndarray,  # [P, H, W, 3] uint8, same bucket
    clip_whs: jnp.ndarray,  # [P, 2] float32
    text_threshold: float,
    low_text: float,
    link_threshold: float,
    min_area: float,
    box_expand: float,
    max_components: int,
    box_source: str,
    rec_slots: int,
    out_h: int,
    out_w: int,
    dtype,
    max_steps: int,
    pallas_crop: bool = False,
):
    """Page-batched fused program: P pages in ONE execution.

    BATCH-NATIVE: the CRAFT forward and the recogniser run once on
    [P, ...] batches (``vmap(single_page)`` would push the convs through
    the batching rule — measured 4-5x slower, see ``_detect_core``);
    only the elementwise box selection is vmapped.  Per page a fixed
    ``rec_slots`` recognition rows are decoded (kept slots first, slot
    order — the same row-alignment contract as ``_fused_page``)."""
    if pages_u8.ndim == 3:
        crop_src = pages_u8  # channel-free [P, H, W] for the crop gathers
        pages_rgb = jnp.repeat(pages_u8[..., None], 3, axis=-1)
    else:
        crop_src = pages_u8
        pages_rgb = pages_u8
    p = pages_rgb.shape[0]

    stats = _detect_core(
        craft_model, craft_vars, pages_rgb, text_threshold, low_text,
        link_threshold, max_components, box_source,
    )
    stride = stats["stride"][0].astype(jnp.float32)
    score_floor = 0.0 if box_source == "ink" else text_threshold
    min_area_grid = min_area / (stride / 2.0) ** 2

    def select(boxes_p, scores_p, areas_p, valid_p, clip_p):
        # identical predicate + ordering to BoxProcessorCraft.detect_collect
        keep = valid_p & (scores_p >= score_floor) & (areas_p >= min_area_grid)
        m = boxes_p.shape[0]
        slot = jnp.arange(m)
        sel = jnp.argsort(jnp.where(keep, slot, m + slot))[:rec_slots]
        sel_keep = keep[sel]
        b = boxes_p[sel].astype(jnp.float32) * stride
        bw = b[:, 2] - b[:, 0]
        bh = b[:, 3] - b[:, 1]
        b = b + jnp.stack([-bw, -bh, bw, bh], axis=-1) * box_expand
        hi = jnp.stack([clip_p[0], clip_p[1], clip_p[0], clip_p[1]])
        b = jnp.clip(b, jnp.zeros((4,), jnp.float32), hi)
        b = jnp.where(sel_keep[:, None], b, jnp.asarray([0.0, 0.0, 1.0, 1.0]))
        return b, sel_keep

    b, keep = jax.vmap(select)(
        stats["boxes"], stats["scores"], stats["areas"], stats["valid"],
        clip_whs,
    )  # [P, rec_slots, 4], [P, rec_slots]

    page_of = jnp.repeat(jnp.arange(p, dtype=jnp.int32), rec_slots)
    crops, eff_w = _crop_batch(
        crop_src, page_of, b.reshape(-1, 4), out_h, out_w, pallas_crop
    )
    if crops.ndim == 3:
        crops = jnp.repeat(crops[..., None], 3, axis=-1)
    tokens, _, conf = greedy_decode(
        trocr_model, trocr_params, crops.astype(dtype), max_steps,
        active=keep.reshape(-1),
        step_caps=_geometric_step_caps(eff_w, out_h, max_steps),
    )
    return (
        stats,
        tokens.reshape(p, rec_slots, -1),
        conf.reshape(p, rec_slots),
    )


@partial(
    jax.jit,
    static_argnames=(
        "craft_model",
        "trocr_model",
        # float thresholds are STATIC on purpose: baking them as constants
        # lets XLA fold them into the conv epilogue / reduce kernels — the
        # same program with traced scalar thresholds measured 3.4x slower
        # (95 vs 27.7 ms/page); they come from engine config, so one
        # compile per configuration
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
    ),
)
def _fused_pages_compact(
    craft_model,
    craft_vars,
    trocr_model,
    trocr_params,
    pages_u8: jnp.ndarray,  # [P, H, W, 3] or [P, H, W] uint8, same bucket
    clip_whs: jnp.ndarray,  # [P, 2] float32
    n_real: jnp.ndarray,  # scalar int32: pages before ladder padding
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
    pallas_crop: bool = False,
    packed: bool = False,
):
    """Page-batched fused OCR with GLOBAL crop compaction.

    ``_fused_pages`` decodes ``rec_slots`` crops per page even though a
    typical page fills barely half of them — the recogniser burns its
    encoder and decode-scan on empty slots.  Here the kept boxes of ALL
    pages are compacted into ONE cross-page crop batch of ``total_slots``
    rows (kept boxes first, page-major then slot-ascending — the host
    reproduces this order from the fetched stats, so row alignment still
    needs no index arrays), sized for the page batch's aggregate word
    count rather than per-page worst case.

    Row alignment contract: global row of page p's j-th kept box =
    (total kept boxes of pages < p) + j; rows >= ``total_slots`` fall
    back to the per-page overflow path in ``fused_collect_many``.
    Ladder-padding duplicate pages (slots >= ``n_real``) are excluded
    from compaction so they neither consume budget nor shift rows.
    """
    if packed:
        # packed grayscale upload (u4 [P, H, W//2] / u2 [P, H, W//4] /
        # u1 [P, H, W//8] — half / quarter / eighth the bytes of the
        # already-1/3 grayscale path over the host->device link, the
        # dominant serving cost on bandwidth-limited relays); unpacked
        # once here, shared by detection and crops
        pages_u8 = _unpack_bits(pages_u8, _norm_pack_bits(packed))
    if pages_u8.ndim == 3:
        # grayscale upload: detection needs the 3-channel page, but crops
        # gather from the channel-FREE [P, H, W] stack (well-tiled minor
        # dims — a trailing C=1 dim would be lane-padded 128x) and expand
        # channels on the [T, out_h, out_w] result instead
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

    # global selection: kept boxes first, page-major then slot order
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
        active=sel_keep, step_caps=_geometric_step_caps(eff_w, out_h, max_steps),
    )
    return stats, tokens, conf


def _mesh_replicated_params(processor, attr: str, mesh):
    """Replicate a processor's param tree over ``mesh`` ONCE (cached on
    the processor keyed by mesh) — re-placing per call would re-transfer
    the whole weight tree every execution."""
    import jax.sharding as jsh

    cache = getattr(processor, "_mesh_param_cache", None)
    if cache is None:
        cache = {}
        processor._mesh_param_cache = cache
    key = (attr, id(mesh))
    if key not in cache:
        repl = jsh.NamedSharding(mesh, jsh.PartitionSpec())
        cache[key] = jax.device_put(getattr(processor, attr), repl)
    return cache[key]


def fused_ocr_pages(
    box_processor,
    ocr_processor,
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
    """PUBLIC kwargs-stable fused OCR entry: detect + select + crop +
    decode one same-bucket page batch in a single program.

    Thresholds/decode config come from the processors; callers never
    touch the private positional signature (``_fused_pages_compact``),
    so signature evolution cannot silently break them.

    Args:
      pages: [P, H, W] / [P, H, W, 3] uint8 (numpy or device array); with
        ``packed`` a [P, H, W//2] 4-bit stack (:mod:`marie_tpu.utils.pack4`).
      clip_whs: [P, 2] float32 crop-clip (w, h) per page; defaults to the
        full page extent.
      n_real: pages before ladder padding (defaults to P).
      total_slots: global recognition-row budget (defaults to
        ``P * compact_slots``).
      mesh: optional ``jax.sharding.Mesh`` — the page batch is sharded
        over every mesh device (batch dim must divide the device count)
        and both model param trees are replicated (cached per mesh), so
        one call runs data-parallel over the local mesh: the TPU-native
        analog of the reference's replica-per-GPU scaling
        (``/root/reference/config/service/marie.yml:199``).

    Returns (stats, tokens, conf) exactly as the fused program emits
    them (row-alignment contract in the module docstring).
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
    if mesh is not None:
        n_dev = len(mesh.devices.reshape(-1))
        if p % n_dev:
            raise ValueError(
                f"page batch {p} not divisible by mesh devices {n_dev}"
            )
        batch_sharding = jsh.NamedSharding(
            mesh, jsh.PartitionSpec(mesh.axis_names)
        )
        # device_put is a no-op for arrays already placed with this
        # sharding (the prefetching uploader pre-places them)
        pages = jax.device_put(pages, batch_sharding)
        clip_whs = jax.device_put(
            clip_whs if hasattr(clip_whs, "sharding")
            else np.asarray(clip_whs, np.float32),
            batch_sharding,
        )
        craft_vars = _mesh_replicated_params(bp, "variables", mesh)
        trocr_params = _mesh_replicated_params(op, "params", mesh)
    else:
        pages = jnp.asarray(pages)
        clip_whs = jnp.asarray(clip_whs, jnp.float32)

    # route through the AOT program zoo: a cold process deserializes the
    # pinned executable (~0.01 s measured on-chip) instead of paying
    # compile+load (~1 s cached, minutes uncached through the relay).
    # Dynamic positions: craft_vars(1), trocr_params(3), pages(4),
    # clip_whs(5), n_real(6) — everything else is static_argnames.
    from marie_tpu.utils.program_zoo import zoo_call

    all_args = (
        bp.model, craft_vars, op.model, trocr_params, pages, clip_whs,
        jnp.int32(n_real),
        bp.text_threshold, bp.low_text, bp.link_threshold,
        float(bp.min_area), float(bp.box_expand),
        bp.max_components, bp.box_source, int(total_slots),
        op.crop_h, op.crop_w, op.compute_dtype, op.decode_steps,
        bool(pallas_crop), pack_bits,
    )
    static_repr = (
        f"{type(bp.model).__name__}{bp.model.cfg}|"
        f"{type(op.model).__name__}{op.model.cfg}|"
        f"{bp.text_threshold}|{bp.low_text}|{bp.link_threshold}|"
        f"{bp.min_area}|{bp.box_expand}|{bp.max_components}|"
        f"{bp.box_source}|{total_slots}|{op.crop_h}|{op.crop_w}|"
        f"{op.compute_dtype}|{op.decode_steps}|{pallas_crop}|{pack_bits}"
    )
    return zoo_call(
        "fused_pages_compact", _fused_pages_compact, all_args,
        dynamic_idx=(1, 3, 4, 5, 6), static_repr=static_repr,
    )


def supports_fused_page(box_processor, ocr_processor) -> bool:
    """Duck-typed gate: CRAFT-style detector + greedy TrOCR recogniser."""
    return (
        hasattr(box_processor, "prep_page")
        and hasattr(box_processor, "detect_collect")
        and hasattr(ocr_processor, "tokenizer")
        and hasattr(ocr_processor, "decode_steps")
        and getattr(ocr_processor, "beam_size", 0) == 1
    )


def _plan_groups(preps, page_batch: int) -> List[List[int]]:
    """Split the prepped page list into same-bucket runs of <= page_batch."""
    groups: List[List[int]] = []
    i = 0
    while i < len(preps):
        bucket = preps[i][0].shape
        group = [i]
        while (
            i + len(group) < len(preps)
            and preps[i + len(group)][0].shape == bucket
            and len(group) < page_batch
        ):
            group.append(i + len(group))
        groups.append(group)
        i += len(group)
    return groups


#: per-call (stack_s, pack_s, put_s, mbytes) rows, appended only when
#: MARIE_TRACE_UPLOADS is set — lets perf probes split host prep from
#: wire time without monkeypatching
UPLOAD_TRACE: List[Tuple[float, float, float, float]] = []


def _upload_group(preps, group, page_batch, upload_format: str = "u8",
                  mesh=None):
    """Host prep + device upload for one group (runs on the uploader
    thread): ladder-pad the stack, drop identical channels, optionally
    pack to 4 bits/pixel (native loop — halves the link bytes again),
    device_put (sharded over ``mesh`` when given and divisible).
    Returns (batch_dev, clip_dev, psize, packed, mesh_used)."""
    import os
    import time as _time

    trace = bool(os.environ.get("MARIE_TRACE_UPLOADS"))
    t0 = _time.time() if trace else 0.0
    psize = _ladder_size(len(group), page_batch)
    rows = group + [group[-1]] * (psize - len(group))
    stack = np.stack([preps[k][0] for k in rows])
    if _is_grayscale(stack):
        stack = stack[..., 0]  # upload 1/3 the bytes
    t1 = _time.time() if trace else 0.0
    packed = 0
    if (
        upload_format == "u4"
        and stack.ndim == 3
        and stack.shape[-1] % 2 == 0
    ):
        from marie_tpu.utils.pack4 import pack4

        stack = pack4(stack)
        packed = 4
    elif (
        upload_format == "u2"
        and stack.ndim == 3
        and stack.shape[-1] % 4 == 0
    ):
        from marie_tpu.utils.pack4 import pack2

        stack = pack2(stack)
        packed = 2
    elif (
        upload_format == "u1"
        and stack.ndim == 3
        and stack.shape[-1] % 8 == 0
    ):
        from marie_tpu.utils.pack4 import pack1

        stack = pack1(stack)
        packed = 1
    elif (
        upload_format == "u1d"
        and stack.ndim == 3
        and stack.shape[-1] % 8 == 0
    ):
        # ordered-dither 1-bit: same wire format/device unpack as u1,
        # but gray levels survive as spatial bit density (hard-threshold
        # u1 measured CER +0.064 on anti-aliased serif-bold pages)
        from marie_tpu.utils.pack4 import pack1d

        stack = pack1d(stack)
        packed = 1
    t2 = _time.time() if trace else 0.0
    clip_np = np.asarray(
        [[preps[k][2][1] * preps[k][1], preps[k][2][0] * preps[k][1]]
         for k in rows],
        np.float32,
    )
    sharding = None
    if mesh is not None:
        import jax.sharding as jsh

        n_dev = int(np.prod(mesh.devices.shape))
        if psize % n_dev == 0:
            sharding = jsh.NamedSharding(
                mesh, jsh.PartitionSpec(mesh.axis_names)
            )
    batch = jax.device_put(stack, sharding) if sharding else jax.device_put(stack)
    clip = jax.device_put(clip_np, sharding) if sharding else jax.device_put(clip_np)
    if trace:
        UPLOAD_TRACE.append(
            (t1 - t0, t2 - t1, _time.time() - t2, stack.nbytes / 1e6)
        )
    return batch, clip, psize, packed, (mesh if sharding else None)


def fused_dispatch_stream(box_processor, ocr_processor, images,
                          rec_slots: int = 256, page_batch: int = 4,
                          compact_slots: int = 192, max_in_flight: int = 4,
                          upload_format: str = "u8", mesh=None,
                          chain=None):
    """Dispatch fused OCR for many pages, YIELDING one handle per
    upload group as soon as its program is in flight.

    Groups of >= 2 pages run the globally-compacted program
    (:func:`_fused_pages_compact`) with ``psize * compact_slots`` total
    recognition rows shared across the group — pages over the average
    borrow budget from pages under it; a batch that overflows the global
    budget finishes through the per-page overflow path on collect.

    Host prep + device_put + dispatch all run on ONE background worker
    thread (uploads stay ordered and saturate the link); the caller
    collects each yielded handle while later groups upload — a 3-stage
    software pipeline (upload | device compute | host collect) in which
    the collect stage genuinely overlaps the upload stage.  The earlier
    design dispatched every group before the first collect, so the
    host-side collect Python (~16 ms/page on this box) ran strictly
    AFTER the full upload phase (timeline-probed: 2.0 s of uploads, then
    1.0 s of collects, zero overlap).  The reference streams with
    prefetch-limited concurrency the same way
    (``/root/reference/marie/serve/stream/__init__.py:229``).

    ``max_in_flight`` bounds dispatched-but-uncollected groups so a long
    page list cannot pile unbounded result buffers on the device."""
    import queue as _queue
    import threading

    bp, op = box_processor, ocr_processor
    # 2-D (grayscale) frames stay 2-D through prep — 1/3 the host copy +
    # upload bytes with no channel-equality scan; the device programs
    # expand channels through _np_rgb.
    preps = [
        bp.prep_page(im if im.ndim == 2 else _np_rgb(im)) for im in images
    ]
    groups = _plan_groups(preps, page_batch)
    q: "_queue.Queue" = _queue.Queue(maxsize=max(max_in_flight, 1))

    def _work():
        try:
            for group in groups:
                # single pages route through the SAME compact program
                # family as batches (psize=1 ladder rung): the old
                # `_fused_page` fast path uploaded the page UNPACKED
                # (4-8x the bytes of the packed formats — measured 57.5
                # ms single-page p50 on a 24 MB/s relay window, mostly
                # wire time) and added a whole extra executable to the
                # cold-start/compile-cache budget
                batch, clip, psize, packed, mesh_used = _upload_group(
                    preps, group, page_batch, upload_format, mesh
                )
                total_slots = psize * compact_slots
                metas = [(preps[k][1], preps[k][2]) for k in group]
                if chain is not None:
                    # classify + NER run IN the same program
                    # (ocr/fused_chain.py — BASELINE configs 3-4: no host
                    # hop between OCR and heads)
                    from marie_tpu.ocr.fused_chain import fused_ocr_chain

                    classifier, indexer = chain
                    stats, tokens, conf, cls_logits, ner_labels, ner_scores = (
                        fused_ocr_chain(
                            bp, op, classifier, indexer, batch, clip,
                            n_real=len(group), total_slots=total_slots,
                            mesh=mesh_used, packed=packed,
                        )
                    )
                    q.put(("ok", (
                        "gcc", stats, tokens, conf, (batch, packed), metas,
                        total_slots, (cls_logits, ner_labels, ner_scores),
                    )))
                    continue
                stats, tokens, conf = fused_ocr_pages(
                    bp, op, batch, clip,
                    n_real=len(group), total_slots=total_slots,
                    mesh=mesh_used, packed=packed,
                )
                # ONE group handle for the whole stack — per-page device
                # slicing would spend the executions the batch just saved
                q.put(("ok", (
                    "gc", stats, tokens, conf, (batch, packed), metas,
                    total_slots,
                )))
        except BaseException as exc:  # noqa: BLE001 — relay to consumer
            q.put(("err", exc))
            return
        q.put(("end", None))

    threading.Thread(target=_work, daemon=True, name="fused-upload").start()
    while True:
        kind, val = q.get()
        if kind == "end":
            return
        if kind == "err":
            raise val
        yield val


def fused_dispatch_many(box_processor, ocr_processor, images,
                        rec_slots: int = 256, page_batch: int = 4,
                        compact_slots: int = 192, prefetch: bool = True,
                        upload_format: str = "u8", mesh=None,
                        chain=None):
    """List form of :func:`fused_dispatch_stream` — drains the stream and
    returns one handle per upload group.  Callers that hold every handle
    before collecting (the sharded dryrun, region extraction) keep this
    API; the serving engine iterates the stream so collects overlap
    uploads.  ``prefetch`` is accepted for back-compat (the worker-thread
    stream always prefetches; with one group there is nothing to
    overlap)."""
    del prefetch  # the stream's worker thread is the prefetcher
    return list(fused_dispatch_stream(
        box_processor, ocr_processor, images,
        rec_slots=rec_slots, page_batch=page_batch,
        compact_slots=compact_slots,
        max_in_flight=max(len(images), 1),
        upload_format=upload_format, mesh=mesh, chain=chain,
    ))


def handle_page_count(handle) -> int:
    """Pages covered by one dispatch handle."""
    return len(handle[5]) if handle[0] in ("gc", "gcc", "g") else 1


def _ladder_size(n: int, cap: int) -> int:
    """Smallest power-of-two >= n (capped): bounds compiled program count."""
    s = 1
    while s < n and s < cap:
        s *= 2
    return min(s, cap)


def _is_grayscale(stack: np.ndarray) -> bool:
    """All channels identical? (sampled check + full verify on a hit)."""
    if stack.ndim != 4 or stack.shape[-1] != 3:
        return False
    probe = stack[..., ::16, ::16, :]
    if not (
        np.array_equal(probe[..., 0], probe[..., 1])
        and np.array_equal(probe[..., 0], probe[..., 2])
    ):
        return False
    return bool(
        np.array_equal(stack[..., 0], stack[..., 1])
        and np.array_equal(stack[..., 0], stack[..., 2])
    )


def _np_rgb(image: np.ndarray) -> np.ndarray:
    if image.ndim == 2:
        return np.stack([image] * 3, axis=-1)
    if image.shape[-1] == 4:
        return image[..., :3]
    return image


def _dev_rgb(page_dev):
    """Expand a grayscale-uploaded device page back to RGB (rare tail
    path: overflow recognition needs the RGB page)."""
    if page_dev.ndim == 2:
        return jnp.repeat(page_dev[..., None], 3, axis=-1)
    return page_dev


def _dispatch_prepped(bp, op, padded, scale, hw, rec_slots):
    if padded.ndim == 3 and _is_grayscale(padded[None]):
        padded = padded[..., 0]
    page_dev = jnp.asarray(padded)
    h, w = hw
    clip_wh = jnp.asarray([w * scale, h * scale], jnp.float32)
    stats, tokens, conf = _fused_page(
        bp.model, bp.variables, op.model, op.params, page_dev, clip_wh,
        bp.text_threshold, bp.low_text, bp.link_threshold,
        float(bp.min_area), float(bp.box_expand),
        bp.max_components, bp.box_source, rec_slots,
        op.crop_h, op.crop_w, op.compute_dtype, op.decode_steps,
        _pallas_crop_default(),
    )
    return ("s", stats, tokens, conf, page_dev, scale, hw, rec_slots)


def fused_dispatch(box_processor, ocr_processor, image: np.ndarray,
                   rec_slots: int = 256):
    """Upload one page and launch the fused program WITHOUT waiting."""
    bp, op = box_processor, ocr_processor
    padded, scale, (h, w) = bp.prep_page(image)
    return _dispatch_prepped(bp, op, padded, scale, (h, w), rec_slots)


def fused_collect_many(
    box_processor, ocr_processor, handles, pms_modes
) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[Dict[str, Any]]]]:
    """Collect fused handles (single-page or page-batched groups) with ONE
    device→host transfer for everything.

    Returns per page: (boxes_int xywh organized, scores, lines,
    line_bboxes, word dicts aligned to the organized boxes).
    """
    bp, op = box_processor, ocr_processor
    if not handles:
        return []
    fetched = jax.device_get(
        [
            (h[1], h[2], h[3]) + ((h[7],) if h[0] == "gcc" else ())
            for h in handles
        ]
    )

    out = []
    page_i = 0
    for handle, fetch in zip(handles, fetched):
        stats_host, tokens_host, conf_host = fetch[:3]
        chain_host = fetch[3] if len(fetch) > 3 else None
        # decode the WHOLE handle's token matrix in one vectorised pass
        # (models/tokenizer.py decode_batch) — the per-word python decode
        # loop was 3-5 ms/page of collect time on this box's single core
        toks_np = np.asarray(tokens_host)
        flat_texts = op.tokenizer.decode_batch(
            toks_np.reshape(-1, toks_np.shape[-1])
        )
        slot_stride = toks_np.shape[-2] if toks_np.ndim == 3 else 0
        # member: (stats, tokens, conf, row_base, slot_budget, page_fn,
        #          scale, hw, extra) — row_base/slot_budget express the
        # row alignment contract: page-local decoded row r lives at
        # tokens[row_base + r] and overflows past slot_budget TOTAL rows;
        # extra carries chained per-page classification/NER when present.
        if handle[0] in ("gc", "gcc"):
            # globally-compacted group: ONE token array for all pages,
            # page p's rows start after the kept counts of pages < p
            (pages_dev, packed), metas, total_slots = (
                handle[4], handle[5], handle[6]
            )
            members = []
            offset = 0
            for s in range(len(metas)):
                stats_i = {k: stats_host[k][s] for k in stats_host}
                extra = None
                if chain_host is not None:
                    cls_logits, ner_labels, ner_scores = chain_host
                    extra = {
                        "cls_logits": cls_logits[s],
                        "ner_labels": ner_labels[s],
                        "ner_scores": ner_scores[s],
                    }
                members.append(
                    (stats_i, flat_texts, conf_host, offset, total_slots,
                     lambda s=s: _dev_rgb(
                         _unpack_page(
                             pages_dev[s], bits=_norm_pack_bits(packed)
                         )
                         if packed
                         else pages_dev[s]
                     ),
                     metas[s][0], metas[s][1], extra)
                )
                offset += _kept_count(bp, stats_i)
        elif handle[0] == "g":
            _, _, _, _, pages_dev, metas, rec_slots = handle
            members = [
                (
                    {k: stats_host[k][s] for k in stats_host},
                    flat_texts[s * slot_stride:(s + 1) * slot_stride],
                    conf_host[s],
                    0,
                    rec_slots,
                    lambda s=s: _dev_rgb(pages_dev[s]),
                    metas[s][0],
                    metas[s][1],
                    None,
                )
                for s in range(len(metas))
            ]
        else:
            _, _, _, _, page_dev, scale, hw, rec_slots = handle
            members = [
                (stats_host, flat_texts, conf_host, 0, rec_slots,
                 lambda: _dev_rgb(page_dev), scale, hw, None)
            ]
        for (stats_i, texts_i, conf_i, row_base, budget, page_fn, scale,
             (h, w), extra) in members:
            xywh, scores, rows = bp.detect_collect(
                (None, None, scale, (h, w)), stats=stats_i, return_rows=True
            )
            boxes_int, scores_o, lines, line_bboxes, order = bp.organize_boxes(
                xywh, scores, (h, w), pms_modes[page_i], return_order=True
            )
            words: List[Dict[str, Any]] = []
            overflow: List[int] = []  # organized positions past the budget
            rows_j = (
                row_base + np.asarray(rows)[np.asarray(order)]
            ).tolist()
            conf_list = np.asarray(conf_i, np.float64).tolist()
            for j, row in enumerate(rows_j):
                if row < budget:
                    words.append(
                        {
                            "text": texts_i[row],
                            "confidence": conf_list[row],
                        }
                    )
                else:
                    words.append({"text": "", "confidence": 0.0})
                    overflow.append(j)
            if overflow:
                # budget exhausted — recognise the tail with the regular
                # fused-crop path (rare; one extra dispatch)
                tail = np.asarray([boxes_int[j] for j in overflow], np.float32)
                fut = op.recognize_dispatch(page_fn(), tail, scale)
                for j, wd in zip(overflow, op.recognize_collect(fut)):
                    words[j] = wd
            if extra is not None:
                # chained on-device heads: ner_labels[page-local kept row]
                # aligns by the SAME row contract as the decode tokens
                ner_l = extra["ner_labels"]
                ner_s = extra["ner_scores"]
                for j in range(len(boxes_int)):
                    r = int(rows[order[j]])
                    if r < len(ner_l):
                        words[j]["ner_label_id"] = int(ner_l[r])
                        words[j]["ner_score"] = float(ner_s[r])
                logits = np.asarray(extra["cls_logits"], np.float32)
                probs = np.exp(logits - logits.max())
                probs /= probs.sum()
                extra = {
                    "classification": {
                        "label_id": int(logits.argmax()),
                        "score": float(probs.max()),
                    }
                }
            out.append((boxes_int, scores_o, lines, line_bboxes, words, extra))
            page_i += 1
    return out


def _kept_count(bp, stats) -> int:
    """Device keep-predicate replica (see ``_fused_pages_compact``): how
    many component slots of one page's stats survive on device and thus
    occupy compacted recognition rows."""
    stride = float(np.asarray(stats.get("stride", 2)))
    # compare in float32 on the raw fetched arrays — the device compares
    # f32 stats against the f32-rounded threshold constants, and a python
    # float here would promote to float64 and disagree for scores exactly
    # equal to f32(threshold) (e.g. 0.7), shifting every later row
    floor = np.float32(0.0 if bp.box_source == "ink" else bp.text_threshold)
    min_area = np.float32(bp.min_area) / np.float32(stride / 2.0) ** 2
    keep = (
        np.asarray(stats["valid"])
        & (np.asarray(stats["scores"], dtype=np.float32) >= floor)
        & (np.asarray(stats["areas"], dtype=np.float32) >= min_area)
    )
    return int(keep.sum())
