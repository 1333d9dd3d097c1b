"""Fused multi-head attention (flash-attention style) for TPU.

The recognition stack's hot op: the reference profiles show `aten::bmm` +
`aten::_softmax` dominating TrOCR inference
(``/root/reference/docs/docs/models/bouding-boxes.md:20-24``).  On TPU we
fuse QK^T → online-softmax → PV into one Pallas kernel so the [S,S]
attention matrix never round-trips to HBM.

Layout: q [B, H, Sq, D], k/v [B, H, Skv, D], D padded to 128.
Grid: (B*H, Sq/BLOCK_Q); the kv loop runs inside the kernel with running
max/sum (online softmax).  Supports causal masking and kv length masking
(padded batches).

Falls back to a pure-jnp implementation when shapes don't tile or when
running on CPU (tests force `interpret=True` instead).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_KV = 128
_NEG_INF = -1e30


def _attention_reference(q, k, v, *, causal=False, kv_len=None, sm_scale=1.0):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    skv = k.shape[2]
    if kv_len is not None:
        mask = jnp.arange(skv)[None, None, None, :] < kv_len[:, None, None, None]
        logits = jnp.where(mask, logits, _NEG_INF)
    if causal:
        sq = q.shape[2]
        cm = jnp.arange(sq)[:, None] >= jnp.arange(skv)[None, :] - (skv - sq)
        logits = jnp.where(cm[None, None], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32)).astype(q.dtype)


def _flash_kernel(
    kv_len_ref,  # scalar-prefetch [B*H] int32
    q_ref,  # [1, BLOCK_Q, D]
    k_ref,  # [1, Skv, D]
    v_ref,  # [1, Skv, D]
    o_ref,  # [1, BLOCK_Q, D]
    *,
    sm_scale: float,
    causal: bool,
    block_kv: int,
    skv: int,
    sq: int,
):
    block_q = q_ref.shape[1]
    d = q_ref.shape[2]
    bh_idx = pl.program_id(0)
    q_idx = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * sm_scale
    kv_len = kv_len_ref[bh_idx]

    num_kv_blocks = skv // block_kv

    def body(kv_i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kv_i * block_kv, block_kv), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kv_i * block_kv, block_kv), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [Bq, Bkv]

        kv_pos = kv_i * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1
        )
        mask = kv_pos < kv_len
        if causal:
            q_pos = q_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            mask = mask & (q_pos >= kv_pos - (skv - sq))
        s = jnp.where(mask, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)

    if causal:
        # skip kv blocks entirely above the diagonal for this q block
        hi = jnp.minimum(
            num_kv_blocks,
            pl.cdiv((q_idx + 1) * block_q + (skv - sq), block_kv),
        )
    else:
        hi = num_kv_blocks
    acc, m, l = jax.lax.fori_loop(0, hi, body, (acc0, m0, l0))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_kv", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: jnp.ndarray | None = None,
    causal: bool = False,
    sm_scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    interpret: bool = False,
):
    """Fused attention. q [B,H,Sq,D], k/v [B,H,Skv,D] -> [B,H,Sq,D].

    kv_len: optional [B] int32 valid kv lengths (right-padding mask).
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)

    block_q = min(block_q, sq)
    block_kv = min(block_kv, skv)
    tile_ok = (
        sq % block_q == 0 and skv % block_kv == 0 and d % 128 == 0 and d <= 256
    )
    on_tpu = jax.devices()[0].platform == "tpu"
    if not tile_ok or (not on_tpu and not interpret):
        return _attention_reference(
            q, k, v, causal=causal, kv_len=kv_len, sm_scale=sm_scale
        )

    if kv_len is None:
        kv_len = jnp.full((b,), skv, jnp.int32)
    kv_len = kv_len.astype(jnp.int32)

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    kv_len_bh = jnp.repeat(kv_len, h)  # [B*H]

    kernel = functools.partial(
        _flash_kernel,
        sm_scale=sm_scale,
        causal=causal,
        block_kv=block_kv,
        skv=skv,
        sq=sq,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, kvl: (bh, qi, 0)),
            pl.BlockSpec((1, skv, d), lambda bh, qi, kvl: (bh, 0, 0)),
            pl.BlockSpec((1, skv, d), lambda bh, qi, kvl: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, kvl: (bh, qi, 0)),
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(kv_len_bh, qf, kf, vf)
    return out.reshape(b, h, sq, d)
