"""Connected components on device — iterative label propagation.

The reference does CRAFT box extraction with OpenCV
``connectedComponentsWithStats`` on host
(``/root/reference/marie/models/craft/craft_utils.py:25``), which forces a
device→host sync per page.  Here CC runs on the TPU as fixed-shape label
propagation: each masked pixel starts with its linear index as label and
repeatedly takes the min over its neighbourhood.  Plain propagation needs
O(component diameter) sweeps; we slash that with a masked min-scan along
rows and columns each iteration (labels jump across whole runs in one
sweep), giving O(log diameter)-ish convergence for blob-like text regions.

``component_boxes`` then compacts labels into a fixed number of slots and
computes per-component stats with segment reductions — still on device,
still static shapes.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _masked_min_scan(lbl: jnp.ndarray, mask: jnp.ndarray, big, axis: int) -> jnp.ndarray:
    """Masked min over each contiguous run along ``axis``, both directions.

    Within a contiguous masked run, every pixel receives the run's min
    label; unmasked pixels reset the carry so labels never leak across
    gaps.  Implemented as a SEGMENTED min with ``lax.associative_scan``
    (the classic segmented-scan monoid): log2(W) parallel steps instead
    of W sequential scan steps — on a 512-wide heatmap this cut the CC
    stage ~an order of magnitude (each sweep was 896 serial steps).
    Scanning the column axis directly (instead of transposing) keeps the
    sweep free of physical [H, W] transposes.
    """
    v = jnp.where(mask, lbl, big)
    boundary = ~mask

    def combine(a, b):
        av, ab = a
        bv, bb = b
        return (jnp.where(bb, bv, jnp.minimum(av, bv)), ab | bb)

    fwd, _ = jax.lax.associative_scan(combine, (v, boundary), axis=axis)
    bwd, _ = jax.lax.associative_scan(
        combine, (v, boundary), axis=axis, reverse=True
    )
    return jnp.minimum(fwd, bwd)


@partial(jax.jit, static_argnames=("num_iters",))
def connected_components(mask: jnp.ndarray, num_iters: int = 64) -> jnp.ndarray:
    """Label 8-connected components of a boolean mask [H, W].

    Runs at most ``num_iters`` propagation sweeps but exits early once the
    labels stop changing (text blobs converge in a handful of sweeps; the
    bound only matters for adversarial snake-shaped masks).

    Returns int32 labels [H, W]: background = -1, components labelled by the
    minimum linear index of their pixels (NOT compacted — see
    :func:`component_boxes`).
    """
    h, w = mask.shape
    big = jnp.int32(h * w)
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(mask, lin, big)

    def neighbor_min(lbl):
        p = jnp.pad(lbl, 1, constant_values=big)
        m = lbl
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                m = jnp.minimum(m, p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w])
        return jnp.where(mask, m, big)

    def sweep(lbl):
        lbl = neighbor_min(lbl)
        lbl = jnp.where(mask, _masked_min_scan(lbl, mask, big, axis=1), big)
        lbl = _masked_min_scan(lbl, mask, big, axis=0)
        return jnp.where(mask, lbl, big)

    def cond(state):
        i, _, changed = state
        return (i < num_iters) & changed

    def body(state):
        i, lbl, _ = state
        new = sweep(lbl)
        return i + 1, new, jnp.any(new != lbl)

    _, labels, _ = jax.lax.while_loop(cond, body, (0, labels, True))
    return jnp.where(mask, labels, -1)


@partial(jax.jit, static_argnames=("max_components",))
def component_boxes_reduce(
    labels: jnp.ndarray,
    scores: jnp.ndarray | None = None,
    max_components: int = 256,
):
    """Sort-free :func:`component_boxes` — identical outputs.

    The sort-based version pays one 4-operand full-pixel ``lax.sort``
    (H·W elements, log²-depth bitonic passes on TPU).  Here the K
    representatives come from ``lax.top_k`` (O(N·logK)) and the per-slot
    stats from masked broadcast-reductions over [N, K] — pure VPU work
    that XLA fuses without materialising the broadcast.  Wins when K is
    small relative to H·W (the production shape: 256 slots on a
    512×384 heatmap grid); kept alongside the sort version, which wins
    for huge K.
    """
    h, w = labels.shape
    flat = labels.reshape(-1)
    n = flat.shape[0]
    lin = jnp.arange(n, dtype=jnp.int32)

    # representatives: pixels whose label equals their own linear index;
    # top_k over the NEGATED rank = the K smallest label ids, ascending
    is_rep = (flat == lin) & (flat >= 0)
    rep_rank = jnp.where(is_rep, lin, n)
    neg_top, _ = jax.lax.top_k(-rep_rank, max_components)
    rep_sorted = -neg_top  # [K] ascending label ids (n where empty)
    valid = rep_sorted < n

    # [N, K] membership, fused into the reductions below.  Component
    # labels ARE min linear indices, so y0 = label // w comes free; y1
    # needs only a max-linear-index pass (the max index has the max row)
    # — 5 broadcast-reduction passes instead of 6.
    match = flat[:, None] == rep_sorted[None, :]
    xs = (lin % w).astype(jnp.float32)[:, None]
    big = jnp.float32(n)

    x0 = jnp.min(jnp.where(match, xs, big), axis=0)
    y0 = (rep_sorted // w).astype(jnp.float32)
    x1 = jnp.max(jnp.where(match, xs, -1.0), axis=0)
    max_lin = jnp.max(jnp.where(match, lin[:, None], -1), axis=0)
    y1 = (max_lin // w).astype(jnp.float32)
    areas = jnp.sum(match, axis=0, dtype=jnp.int32)

    boxes = jnp.stack([x0, y0, x1 + 1.0, y1 + 1.0], axis=-1)
    boxes = jnp.where(valid[:, None], boxes, 0.0)

    if scores is not None:
        sc = scores.reshape(-1).astype(jnp.float32)[:, None]
        smax = jnp.max(jnp.where(match, sc, 0.0), axis=0)
        smax = jnp.where(valid, smax, 0.0)
    else:
        smax = valid.astype(jnp.float32)

    return {
        "boxes": boxes.astype(jnp.float32),
        "areas": jnp.where(valid, areas, 0),
        "scores": smax.astype(jnp.float32),
        "valid": valid,
    }


@partial(jax.jit, static_argnames=("max_components",))
def component_boxes_reduce2(
    labels: jnp.ndarray,
    scores: jnp.ndarray | None = None,
    max_components: int = 256,
):
    """Two-stage projection variant of :func:`component_boxes_reduce` —
    identical outputs, smaller live intermediates.

    The one-stage reduce materialises an [H·W, K] intermediate (the
    ``where``-masked broadcast) before each reduction — ~300 MB per stat
    pass at the production 512×384 grid with K=384, which makes the stage
    HBM-bound (measured ~20× above its VPU-compute floor).  Here every
    stat is computed from ROW/COLUMN projections of the membership
    predicate: reduce over one spatial axis first (the [H, W, K] compare
    fuses into that reduction), so nothing larger than [max(H, W), K]
    ever lives in memory:

      x0/x1  from  colhit[w, k]  = any_h  match
      y1     from  rowhit[h, k]  = any_w  match    (y0 is free: labels are
                                                    min linear indices)
      area   from  colcnt[w, k]  = sum_h  match
      score  from  rowmax[h, k]  = max_w  masked score
    """
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    lin = jnp.arange(n, dtype=jnp.int32)

    is_rep = (flat == lin) & (flat >= 0)
    rep_rank = jnp.where(is_rep, lin, n)
    neg_top, _ = jax.lax.top_k(-rep_rank, max_components)
    rep_sorted = -neg_top  # [K] ascending label ids (n where empty)
    valid = rep_sorted < n

    match = labels[:, :, None] == rep_sorted[None, None, :]  # fused per pass

    colhit = jnp.any(match, axis=0)  # [W, K]
    xs = jnp.arange(w, dtype=jnp.float32)[:, None]
    big = jnp.float32(n)
    x0 = jnp.min(jnp.where(colhit, xs, big), axis=0)
    x1 = jnp.max(jnp.where(colhit, xs, -1.0), axis=0)

    rowhit = jnp.any(match, axis=1)  # [H, K]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    y1 = jnp.max(jnp.where(rowhit, ys, -1.0), axis=0)
    y0 = (rep_sorted // w).astype(jnp.float32)

    colcnt = jnp.sum(match, axis=0, dtype=jnp.int32)  # [W, K]
    areas = jnp.sum(colcnt, axis=0)

    boxes = jnp.stack([x0, y0, x1 + 1.0, y1 + 1.0], axis=-1)
    boxes = jnp.where(valid[:, None], boxes, 0.0)

    if scores is not None:
        sc = scores.astype(jnp.float32)[:, :, None]
        rowmax = jnp.max(jnp.where(match, sc, 0.0), axis=1)  # [H, K]
        smax = jnp.where(valid, jnp.max(rowmax, axis=0), 0.0)
    else:
        smax = valid.astype(jnp.float32)

    return {
        "boxes": boxes.astype(jnp.float32),
        "areas": jnp.where(valid, areas, 0),
        "scores": smax.astype(jnp.float32),
        "valid": valid,
    }


@partial(jax.jit, static_argnames=("max_components", "max_runs_per_row"))
def component_boxes_runs(
    labels: jnp.ndarray,
    scores: jnp.ndarray | None = None,
    max_components: int = 256,
    max_runs_per_row: int = 48,
):
    """Run-compaction variant of :func:`component_boxes_reduce2` —
    identical outputs whenever every row intersects at most
    ``max_runs_per_row`` components (rows beyond that drop their
    rightmost runs, shrinking the affected boxes).

    reduce2's cost is the K-way membership test at every PIXEL:
    H·W·K compare+select per stat pass (~75M at the production
    512×384/K=384 shape).  But after CC every contiguous masked run in a
    row belongs to ONE component, so the pixel grid first compacts to
    per-row runs (stage 1: H·W·R work against the run budget R ≪ K),
    and the K-way test then runs over H·R runs instead of H·W pixels
    (stage 2: H·R·K) — ~4× fewer compare+select ops at R=48 and far
    smaller live intermediates.  Stage-1 tensors are laid out [H, R, W]
    so every reduction runs along the 384-wide lane axis.
    """
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    lin = jnp.arange(n, dtype=jnp.int32)

    is_rep = (flat == lin) & (flat >= 0)
    rep_rank = jnp.where(is_rep, lin, n)
    neg_top, _ = jax.lax.top_k(-rep_rank, max_components)
    rep_sorted = -neg_top  # [K] ascending label ids (n where empty)
    valid = rep_sorted < n

    # stage 1: compact each row's masked pixels into per-run stats.
    mask = labels >= 0
    left = jnp.pad(mask[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    run_of_pixel = jnp.cumsum((mask & ~left).astype(jnp.int32), axis=1) - 1
    r = max_runs_per_row
    # [H, R, W] membership — fused into each reduction below
    memb = mask[:, None, :] & (
        run_of_pixel[:, None, :] == jnp.arange(r, dtype=jnp.int32)[None, :, None]
    )
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    bigf = jnp.float32(n)
    x0r = jnp.min(jnp.where(memb, xs, bigf), axis=2).reshape(-1)  # [H*R]
    x1r = jnp.max(jnp.where(memb, xs, -1.0), axis=2).reshape(-1)
    cntr = jnp.sum(memb, axis=2, dtype=jnp.int32).reshape(-1)
    labr = jnp.min(
        jnp.where(memb, labels[:, None, :], n), axis=2
    ).reshape(-1)  # a run is one component: min == its label
    ysr = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.float32)[:, None], (h, r)
    ).reshape(-1)

    # stage 2: K-way membership over runs (empty runs carry label n,
    # which only matches EMPTY rep slots — masked off via ``valid``).
    match = labr[:, None] == rep_sorted[None, :]  # [H*R, K]
    x0 = jnp.min(jnp.where(match, x0r[:, None], bigf), axis=0)
    x1 = jnp.max(jnp.where(match, x1r[:, None], -1.0), axis=0)
    y1 = jnp.max(jnp.where(match, ysr[:, None], -1.0), axis=0)
    y0 = (rep_sorted // w).astype(jnp.float32)  # labels are min linear idx
    areas = jnp.sum(jnp.where(match, cntr[:, None], 0), axis=0)

    boxes = jnp.stack([x0, y0, x1 + 1.0, y1 + 1.0], axis=-1)
    boxes = jnp.where(valid[:, None], boxes, 0.0)

    if scores is not None:
        scr = jnp.max(
            jnp.where(memb, scores.astype(jnp.float32)[:, None, :], 0.0), axis=2
        ).reshape(-1)
        smax = jnp.where(
            valid, jnp.max(jnp.where(match, scr[:, None], 0.0), axis=0), 0.0
        )
    else:
        smax = valid.astype(jnp.float32)

    return {
        "boxes": boxes.astype(jnp.float32),
        "areas": jnp.where(valid, areas, 0).astype(jnp.int32),
        "scores": smax.astype(jnp.float32),
        "valid": valid,
    }


@partial(jax.jit, static_argnames=("max_components", "max_runs_per_row",
                                   "num_iters"))
def component_boxes_runs_cc(
    mask: jnp.ndarray,
    scores: jnp.ndarray | None = None,
    max_components: int = 256,
    max_runs_per_row: int = 48,
    num_iters: int = 32,
):
    """Mask -> component box stats ENTIRELY in the run domain — the
    pixel label grid is never materialised.

    :func:`connected_components` iterates pad/min/scan sweeps over the
    full [H, W] pixel grid (~1.8 ms/page of the fused program at the
    512x384 production grid — the largest single device line after the
    round-5 kernel work).  But a row's masked pixels compact to <= R
    runs (R=48 covers document layouts; same budget/degradation contract
    as :func:`component_boxes_runs`), and component structure is fully
    determined by run-interval overlap between adjacent rows — so label
    propagation can run over the [H, R] run table (~24K elements vs 196K
    pixels), with pointer-jumping to converge in O(log diameter) rounds.

    Identical outputs to
    ``component_boxes_runs(connected_components(mask), scores)``:
    component identity is the min linear PIXEL index (run ids are
    (row, x-ordered slot), so min run id == min pixel index's run), reps
    come from the same ascending top-k over pixel indices, and the K-way
    stats match.  8-connectivity: runs [a0,a1] and [b0,b1] in ADJACENT
    rows connect iff a0 <= b1+1 and a1 >= b0-1; same-row runs are never
    directly connected (a >= 1-pixel gap with nothing above/below is
    disconnected under 8-conn).
    """
    h, w = mask.shape
    n = h * w
    r = max_runs_per_row
    big = jnp.int32(h * r)  # invalid RUN id sentinel

    # --- row compaction (same construction as component_boxes_runs) ---
    left = jnp.pad(mask[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    run_of_pixel = jnp.cumsum((mask & ~left).astype(jnp.int32), axis=1) - 1
    memb = mask[:, None, :] & (
        run_of_pixel[:, None, :] == jnp.arange(r, dtype=jnp.int32)[None, :, None]
    )
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    bigf = jnp.float32(n)
    x0r = jnp.min(jnp.where(memb, xs, bigf), axis=2)  # [H, R]
    x1r = jnp.max(jnp.where(memb, xs, -1.0), axis=2)
    cntr = jnp.sum(memb, axis=2, dtype=jnp.int32)
    valid_run = cntr > 0
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, r))
    # pixel index of each run's first pixel — the component's identity
    # is the min of these over its runs
    pix_of_run = jnp.where(
        valid_run, ys * w + x0r.astype(jnp.int32), jnp.int32(n)
    ).reshape(-1)  # [H*R]

    # --- label propagation over the run graph ---
    run_ids = jnp.arange(h * r, dtype=jnp.int32).reshape(h, r)
    lbl = jnp.where(valid_run, run_ids, big)  # min RUN id per component

    def overlap(x0a, x1a, x0b, x1b, va, vb):
        # [H-1, R, R]: run i of row r vs run j of row r+1 (8-conn dilate)
        o = (
            (x0a[:, :, None] <= x1b[:, None, :] + 1.0)
            & (x1a[:, :, None] >= x0b[:, None, :] - 1.0)
            & va[:, :, None]
            & vb[:, None, :]
        )
        return o

    ov = overlap(
        x0r[:-1], x1r[:-1], x0r[1:], x1r[1:], valid_run[:-1], valid_run[1:]
    )

    def sweep(lbl):
        up = lbl[:-1]  # [H-1, R]
        dn = lbl[1:]
        # row r+1 takes min over overlapping runs of row r, and vice versa
        dn_new = jnp.min(
            jnp.where(ov, up[:, :, None], big), axis=1
        )  # [H-1, R]
        up_new = jnp.min(
            jnp.where(ov, dn[:, None, :], big), axis=2
        )  # [H-1, R]
        out = jnp.minimum(
            lbl,
            jnp.concatenate([up_new, jnp.full((1, r), big)], axis=0),
        )
        out = jnp.minimum(
            out,
            jnp.concatenate([jnp.full((1, r), big), dn_new], axis=0),
        )
        # pointer jumping: label <- label-of-the-run-my-label-names (x2)
        flat = out.reshape(-1)
        padded = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
        idx = jnp.minimum(flat, h * r)  # big -> the sentinel slot
        flat = jnp.minimum(flat, padded[idx])
        idx = jnp.minimum(flat, h * r)
        flat = jnp.minimum(flat, padded[idx])
        return jnp.where(valid_run, flat.reshape(h, r), big)

    def cond(state):
        i, _, changed = state
        return (i < num_iters) & changed

    def body(state):
        i, cur, _ = state
        new = sweep(cur)
        return i + 1, new, jnp.any(new != cur)

    _, lbl, _ = jax.lax.while_loop(cond, body, (0, lbl, True))

    # --- reps: same ascending-pixel-index top-k as the pixel kernels ---
    flat_lbl = lbl.reshape(-1)  # final min run id per run
    is_root = valid_run.reshape(-1) & (flat_lbl == run_ids.reshape(-1))
    root_pix = jnp.where(is_root, pix_of_run, n)
    neg_top, _ = jax.lax.top_k(-root_pix, max_components)
    rep_sorted = -neg_top  # ascending pixel labels (n where empty)
    valid = rep_sorted < n

    # component key per run = pixel index of its root run
    padded_pix = jnp.concatenate([pix_of_run, jnp.array([n], jnp.int32)])
    labr = padded_pix[jnp.minimum(flat_lbl, h * r)]  # [H*R]

    match = labr[:, None] == rep_sorted[None, :]  # [H*R, K]
    x0f = x0r.reshape(-1)
    x1f = x1r.reshape(-1)
    ysf = ys.astype(jnp.float32).reshape(-1)
    x0 = jnp.min(jnp.where(match, x0f[:, None], bigf), axis=0)
    x1 = jnp.max(jnp.where(match, x1f[:, None], -1.0), axis=0)
    y1 = jnp.max(jnp.where(match, ysf[:, None], -1.0), axis=0)
    y0 = (rep_sorted // w).astype(jnp.float32)
    areas = jnp.sum(jnp.where(match, cntr.reshape(-1)[:, None], 0), axis=0)

    boxes = jnp.stack([x0, y0, x1 + 1.0, y1 + 1.0], axis=-1)
    boxes = jnp.where(valid[:, None], boxes, 0.0)

    if scores is not None:
        scr = jnp.max(
            jnp.where(memb, scores.astype(jnp.float32)[:, None, :], 0.0),
            axis=2,
        ).reshape(-1)
        smax = jnp.where(
            valid, jnp.max(jnp.where(match, scr[:, None], 0.0), axis=0), 0.0
        )
    else:
        smax = valid.astype(jnp.float32)

    return {
        "boxes": boxes.astype(jnp.float32),
        "areas": jnp.where(valid, areas, 0).astype(jnp.int32),
        "scores": smax.astype(jnp.float32),
        "valid": valid,
    }


@partial(jax.jit, static_argnames=("max_components",))
def component_boxes(
    labels: jnp.ndarray,
    scores: jnp.ndarray | None = None,
    max_components: int = 256,
):
    """Per-component stats from a label map.

    Args:
      labels: [H, W] int32 from :func:`connected_components` (-1 = background).
      scores: optional [H, W] float map; per-component max is reported
        (CRAFT uses the region-heatmap max as the word confidence).
      max_components: fixed component budget K (extra components are dropped
        deterministically by label order).

    Returns dict of fixed-shape arrays:
      boxes: [K, 4] xyxy (float32), zeros for empty slots
      areas: [K] pixel counts (int32)
      scores: [K] per-component max score (float32; 0 where empty)
      valid: [K] bool
    """
    h, w = labels.shape
    flat = labels.reshape(-1)
    lin = jnp.arange(h * w, dtype=jnp.int32)

    # representatives: pixels whose label equals their own linear index
    is_rep = (flat == lin) & (flat >= 0)
    # order representatives by linear index; take first K
    rep_rank = jnp.where(is_rep, lin, h * w)
    rep_sorted = jnp.sort(rep_rank)[:max_components]  # [K] label ids or h*w
    valid = rep_sorted < h * w

    # map every pixel's label -> slot via searchsorted over sorted rep labels
    slot = jnp.searchsorted(rep_sorted, flat)
    slot = jnp.clip(slot, 0, max_components - 1)
    hit = (jnp.take(rep_sorted, slot) == flat) & (flat >= 0)
    seg = jnp.where(hit, slot, max_components)  # overflow bucket K

    ys = (lin // w).astype(jnp.float32)
    xs = (lin % w).astype(jnp.float32)
    num = max_components + 1
    n = flat.shape[0]

    # Per-component stats WITHOUT scatters: segment reductions via
    # scatter-add serialize catastrophically on TPU when many pixels
    # share a segment (every component does).  Instead: ONE multi-operand
    # sort by segment id, then log-depth segmented scans — the last
    # element of each sorted segment holds the segment reduction.
    sc = (
        scores.reshape(-1).astype(jnp.float32)
        if scores is not None
        else hit.astype(jnp.float32)
    )
    seg_s, xs_s, ys_s, sc_s = jax.lax.sort(
        (seg.astype(jnp.int32), xs, ys, sc), num_keys=1
    )
    starts = jnp.searchsorted(seg_s, jnp.arange(num + 1))  # [num+1]
    counts = starts[1:] - starts[:-1]  # [num]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), seg_s[1:] != seg_s[:-1]]
    )

    def seg_scan(vals, op):
        def combine(a, b):
            av, ab = a
            bv, bb = b
            return (jnp.where(bb, bv, op(av, bv)), ab | bb)

        out, _ = jax.lax.associative_scan(combine, (vals, is_start))
        return out

    last = jnp.clip(starts[1:] - 1, 0, n - 1)  # last element per segment
    x0 = seg_scan(xs_s, jnp.minimum)[last]
    y0 = seg_scan(ys_s, jnp.minimum)[last]
    x1 = seg_scan(xs_s, jnp.maximum)[last]
    y1 = seg_scan(ys_s, jnp.maximum)[last]
    smax_all = seg_scan(sc_s, jnp.maximum)[last]
    nonempty = counts > 0
    areas = jnp.where(nonempty, counts, 0).astype(jnp.int32)[:max_components]

    boxes = jnp.stack([x0, y0, x1 + 1.0, y1 + 1.0], axis=-1)[:max_components]
    boxes = jnp.where((valid & nonempty[:max_components])[:, None], boxes, 0.0)

    if scores is not None:
        smax = jnp.where(
            valid & nonempty[:max_components], smax_all[:max_components], 0.0
        )
    else:
        smax = valid.astype(jnp.float32)

    return {
        "boxes": boxes.astype(jnp.float32),
        "areas": areas,
        "scores": smax.astype(jnp.float32),
        "valid": valid,
    }
