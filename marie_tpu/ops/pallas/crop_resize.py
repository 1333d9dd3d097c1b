"""Pallas crop+resize kernel — word-crop extraction at DMA speed.

The XLA formulation (``preprocess/ops.crop_resize_pages``) lowers the
separable bilinear resize to row/column gathers; TPU gathers issue one
row at a time and measured ~400x off memory-bound (8.3 ms/page of the
fused OCR program at 16 pages x 192 crops).  This kernel restates the
same math TPU-natively:

  crop = (V / 255) @ slab @ M

* ``slab``  — a [WINDOW, W] uint8 row window of the source page, DMA'd
  HBM→VMEM per crop (double-buffered: crop i+1's slab transfers while
  crop i computes);
* ``V``     — [out_h, WINDOW] vertical interpolation matrix (two
  nonzeros per row: 1-ly at y0, ly at y1), built in-kernel from iota;
* ``M``     — [W, out_w] horizontal interpolation matrix, likewise.

Two small MXU matmuls per crop replace ~96 row gathers.  Bit-parity
with the gather path is at float tolerance (same arithmetic, different
accumulation order); the fused-OCR parity tests pin the decoded text.

Bound: a crop's source rows must fit the WINDOW (default 192 rows).
Word boxes are ~15-40 px tall; boxes taller than WINDOW-1 px resample
from the clamped window (top-anchored) — a graceful degradation for
pathological inputs, not silent corruption.  The caller keeps the XLA
path for RGB stacks and non-TPU backends.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# slab height: 192 usable rows + 32 alignment headroom (DMA offsets into
# the [P, H, W] page stack must start on a sublane-tile boundary, so
# row_start aligns DOWN to 32 and the window absorbs the slack)
DEFAULT_WINDOW = 224
_ROW_ALIGN = 32


def _kernel(
    page_idx_ref,  # scalar-prefetch [N] int32
    row_block_ref,  # scalar-prefetch [N] int32: slab start row / _ROW_ALIGN
    y0_ref,  # scalar-prefetch [N] f32
    bh_ref,  # scalar-prefetch [N] f32
    x0_ref,  # scalar-prefetch [N] f32
    effw_ref,  # scalar-prefetch [N] f32
    xstep_ref,  # scalar-prefetch [N] f32: x sampling step (squeeze-aware)
    pages_ref,  # [P, H, W] uint8 (ANY/HBM)
    out_ref,  # [1, out_h, out_w] f32
    slab_ref,  # scratch [2, WINDOW, W] uint8
    sem_ref,  # DMA sems [2]
    *,
    out_h: int,
    out_w: int,
    window: int,
    n_crops: int,
):
    i = pl.program_id(0)
    h = pages_ref.shape[1]
    w = pages_ref.shape[2]
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    # the DMA offset is written as block*_ROW_ALIGN so Mosaic can PROVE
    # sublane-tile alignment (a pre-aligned scalar is not provable)
    @pl.when(i == 0)
    def _first():
        pltpu.make_async_copy(
            pages_ref.at[
                page_idx_ref[0], pl.ds(row_block_ref[0] * _ROW_ALIGN, window)
            ],
            slab_ref.at[0],
            sem_ref.at[0],
        ).start()

    @pl.when(i + 1 < n_crops)
    def _prefetch():
        pltpu.make_async_copy(
            pages_ref.at[
                page_idx_ref[i + 1],
                pl.ds(row_block_ref[i + 1] * _ROW_ALIGN, window),
            ],
            slab_ref.at[nxt],
            sem_ref.at[nxt],
        ).start()

    pltpu.make_async_copy(
        pages_ref.at[
            page_idx_ref[i], pl.ds(row_block_ref[i] * _ROW_ALIGN, window)
        ],
        slab_ref.at[slot],
        sem_ref.at[slot],
    ).wait()

    y0 = y0_ref[i]
    bh = bh_ref[i]
    x0 = x0_ref[i]
    eff_w = effw_ref[i]
    row_start = (row_block_ref[i] * _ROW_ALIGN).astype(jnp.float32)
    step = bh / out_h

    # vertical interpolation matrix V [out_h, window]
    r = jax.lax.broadcasted_iota(jnp.int32, (out_h, window), 0).astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (out_h, window), 1).astype(jnp.float32)
    sy = jnp.clip(y0 + (r + 0.5) * step - 0.5, 0.0, h - 1.0)
    y0i = jnp.floor(sy)
    ly = sy - y0i
    rel0 = jnp.clip(y0i - row_start, 0.0, window - 1.0)
    rel1 = jnp.clip(jnp.minimum(y0i + 1.0, h - 1.0) - row_start, 0.0, window - 1.0)
    v = jnp.where(k == rel0, 1.0 - ly, 0.0) + jnp.where(k == rel1, ly, 0.0)
    v = v * (1.0 / 255.0)

    # Mosaic has no direct uint8->float32 cast; go through int32
    slab = slab_ref[slot].astype(jnp.int32).astype(jnp.float32)  # [window, W]
    rows = jnp.dot(v, slab, preferred_element_type=jnp.float32)  # [out_h, W]

    # horizontal interpolation matrix M [W, out_w]
    wi = jax.lax.broadcasted_iota(jnp.int32, (w, out_w), 0).astype(jnp.float32)
    j = jax.lax.broadcasted_iota(jnp.int32, (w, out_w), 1).astype(jnp.float32)
    # x-step widens when the aspect-preserved width would overflow out_w
    # (squeeze-on-overflow — matches preprocess/ops.crop_resize_pages)
    sx = jnp.clip(x0 + (j + 0.5) * xstep_ref[i] - 0.5, 0.0, w - 1.0)
    x0i = jnp.floor(sx)
    lx = sx - x0i
    x1i = jnp.minimum(x0i + 1.0, w - 1.0)
    m = jnp.where(wi == x0i, 1.0 - lx, 0.0) + jnp.where(wi == x1i, lx, 0.0)

    crop = jnp.dot(rows, m, preferred_element_type=jnp.float32)  # [out_h, out_w]

    pad = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1).astype(jnp.float32) >= eff_w
    out_ref[0] = jnp.where(pad, 1.0, crop)


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "window", "interpret")
)
def crop_resize_pallas(
    pages: jnp.ndarray,  # [P, H, W] uint8 page stack (grayscale)
    page_idx: jnp.ndarray,  # [N] int32
    boxes: jnp.ndarray,  # [N, 4] xyxy float
    out_h: int,
    out_w: int,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
):
    """Drop-in for the grayscale case of
    :func:`marie_tpu.preprocess.ops.crop_resize_pages` — returns
    (crops [N, out_h, out_w] float32 in [0,1], eff_w [N] int32)."""
    n = boxes.shape[0]
    p, h, w = pages.shape
    x0, y0, x1, y1 = (boxes[:, i] for i in range(4))
    bh = jnp.maximum(y1 - y0, 1.0)
    bw = jnp.maximum(x1 - x0, 1.0)
    eff_w = jnp.minimum(jnp.round(bw * (out_h / bh)), out_w)

    sy0 = jnp.clip(y0 + 0.5 * (bh / out_h) - 0.5, 0.0, h - 1.0)
    row_start = jnp.clip(
        jnp.floor(sy0).astype(jnp.int32), 0, max(h - window, 0)
    )
    # pass the BLOCK index; the kernel multiplies by _ROW_ALIGN in-place
    # so the DMA offset is provably tile-aligned
    row_block = row_start // _ROW_ALIGN

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # pages stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, out_h, out_w),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, window, w), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    crops = pl.pallas_call(
        functools.partial(
            _kernel, out_h=out_h, out_w=out_w, window=window, n_crops=n
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w), jnp.float32),
        interpret=interpret,
    )(
        page_idx.astype(jnp.int32),
        row_block,
        y0.astype(jnp.float32),
        bh.astype(jnp.float32),
        x0.astype(jnp.float32),
        eff_w.astype(jnp.float32),
        jnp.maximum(bh / out_h, bw / out_w).astype(jnp.float32),
        pages,
    )
    return crops, eff_w.astype(jnp.int32)
