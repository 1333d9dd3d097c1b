"""Shared transformer building blocks (flax.linen, setup-style).

Design for TPU decode throughput:

* full-sequence attention routes through the fused Pallas kernel
  (:mod:`marie_tpu.ops.pallas.flash_attention`) when shapes tile;
* incremental decode threads an explicit functional KV cache through
  ``lax.scan`` carries (no linen mutable collections), so the whole decode
  loop compiles to ONE program;
* cross-attention K/V are projected **once** per sequence (prefill) and
  reused every decode step — the projections live in a dedicated
  :class:`KVProjection` submodule so prefill and step share parameters.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from marie_tpu.ops.pallas.flash_attention import flash_attention

Array = jnp.ndarray
KV = Tuple[Array, Array]  # ([B,H,L,Dh], [B,H,L,Dh])

_NEG_INF = -1e30


def _split_heads(x: Array, num_heads: int) -> Array:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: Array) -> Array:
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def _masked_attention(q: Array, k: Array, v: Array, mask: Optional[Array]) -> Array:
    """Plain attention for short query lengths (decode steps). q [B,H,Lq,Dh].

    Supports grouped/multi-query K/V: when k/v carry G < H heads
    (H % G == 0), each group of H/G query heads shares one K/V head —
    the stored (and HBM-read) K/V shrinks by H/G, the dominant
    per-decode-step traffic for cross-attention (see
    DecoderConfig.cross_kv_heads)."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, q.dtype))
    h, g = q.shape[1], k.shape[1]
    if g == h:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        if mask is not None:
            logits = jnp.where(mask, logits, _NEG_INF)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    b, _, lq, _ = q.shape
    qg = q.reshape(b, g, h // g, lq, dh)
    logits = jnp.einsum("bgmqd,bgkd->bgmqk", qg * scale, k)
    if mask is not None:
        # mask comes in as [B,1|H,Lq,Lk]-broadcastable; add the group dim
        logits = jnp.where(mask[:, :, None], logits, _NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bgmqk,bgkd->bgmqd", probs, v)
    return out.reshape(b, h, lq, dh)


class KVProjection(nn.Module):
    num_heads: int
    model_dim: int

    def setup(self):
        dh = self.model_dim // self.num_heads
        self.k_proj = nn.DenseGeneral((self.num_heads, dh), name="k")
        self.v_proj = nn.DenseGeneral((self.num_heads, dh), name="v")

    def __call__(self, x_kv: Array) -> KV:
        k = self.k_proj(x_kv).transpose(0, 2, 1, 3)
        v = self.v_proj(x_kv).transpose(0, 2, 1, 3)
        return k, v


class SelfAttention(nn.Module):
    """Self-attention with optional causal masking and decode cache."""

    num_heads: int
    model_dim: int

    def setup(self):
        dh = self.model_dim // self.num_heads
        self.q_proj = nn.DenseGeneral((self.num_heads, dh), name="q")
        self.kv_proj = KVProjection(self.num_heads, self.model_dim, name="kv")
        self.out_proj = nn.DenseGeneral(self.model_dim, axis=(-2, -1), name="out")

    def __call__(
        self,
        x: Array,
        *,
        causal: bool = False,
        kv_len: Optional[Array] = None,
        cache: Optional[KV] = None,
        cache_index: Optional[Array] = None,
    ) -> Tuple[Array, Optional[KV]]:
        q = self.q_proj(x).transpose(0, 2, 1, 3)  # [B,H,Lq,Dh]
        k, v = self.kv_proj(x)

        if cache is not None:
            ck, cv = cache
            ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, cache_index, 0))
            cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, cache_index, 0))
            pos = jnp.arange(ck.shape[2])
            mask = (pos <= cache_index)[None, None, None, :]
            out = _masked_attention(q, ck, cv, mask)
            new_cache: Optional[KV] = (ck, cv)
        else:
            out = flash_attention(q, k, v, kv_len=kv_len, causal=causal)
            new_cache = None

        return self.out_proj(out.transpose(0, 2, 1, 3)), new_cache

    @staticmethod
    def init_cache(batch: int, num_heads: int, max_len: int, head_dim: int, dtype=jnp.float32) -> KV:
        shape = (batch, num_heads, max_len, head_dim)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


class CrossAttention(nn.Module):
    """Cross-attention over externally-projected K/V (prefilled once)."""

    num_heads: int
    model_dim: int

    def setup(self):
        dh = self.model_dim // self.num_heads
        self.q_proj = nn.DenseGeneral((self.num_heads, dh), name="q")
        self.out_proj = nn.DenseGeneral(self.model_dim, axis=(-2, -1), name="out")

    def __call__(self, x: Array, kv: KV, kv_len: Optional[Array] = None) -> Array:
        q = self.q_proj(x).transpose(0, 2, 1, 3)
        k, v = kv
        mask = None
        if kv_len is not None:
            pos = jnp.arange(k.shape[2])
            mask = pos[None, None, None, :] < kv_len[:, None, None, None]
        out = _masked_attention(q, k, v, mask)
        return self.out_proj(out.transpose(0, 2, 1, 3))


class MlpBlock(nn.Module):
    mlp_dim: int
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_dim = self.out_dim or x.shape[-1]
        h = nn.Dense(self.mlp_dim, name="fc1")(x)
        h = nn.gelu(h)
        return nn.Dense(out_dim, name="fc2")(h)


class EncoderLayer(nn.Module):
    num_heads: int
    model_dim: int
    mlp_dim: int

    def setup(self):
        self.ln1 = nn.LayerNorm()
        self.attn = SelfAttention(self.num_heads, self.model_dim)
        self.ln2 = nn.LayerNorm()
        self.mlp = MlpBlock(self.mlp_dim)

    def __call__(self, x: Array, kv_len: Optional[Array] = None) -> Array:
        y, _ = self.attn(self.ln1(x), kv_len=kv_len)
        x = x + y
        return x + self.mlp(self.ln2(x))


class DecoderLayer(nn.Module):
    """Pre-LN decoder layer: causal self-attn → cross-attn → MLP.

    ``cross_kv_heads < num_heads`` stores grouped/multi-query cross K/V
    (MQA at 1): every decode step re-reads the whole prefilled cross-KV
    from HBM, so shrinking it by H/G directly cuts the decode stage's
    bandwidth floor (round-3 probe: cross-KV reads dominate decode)."""

    num_heads: int
    model_dim: int
    mlp_dim: int
    cross_kv_heads: Optional[int] = None

    def setup(self):
        self.ln1 = nn.LayerNorm()
        self.self_attn = SelfAttention(self.num_heads, self.model_dim)
        self.ln2 = nn.LayerNorm()
        g = self.cross_kv_heads or self.num_heads
        # grouped K/V keep the per-head width (model_dim // num_heads);
        # KVProjection(num_heads=g, model_dim=g*dh) yields [B,g,L,dh]
        dh = self.model_dim // self.num_heads
        self.cross_kv = KVProjection(g, g * dh)
        self.cross_attn = CrossAttention(self.num_heads, self.model_dim)
        self.ln3 = nn.LayerNorm()
        self.mlp = MlpBlock(self.mlp_dim)

    def compute_cross_kv(self, enc: Array) -> KV:
        return self.cross_kv(enc)

    def __call__(
        self,
        x: Array,
        cross: KV,
        enc_len: Optional[Array] = None,
        self_cache: Optional[KV] = None,
        cache_index: Optional[Array] = None,
    ):
        y, new_cache = self.self_attn(
            self.ln1(x), causal=self_cache is None, cache=self_cache,
            cache_index=cache_index,
        )
        x = x + y
        x = x + self.cross_attn(self.ln2(x), cross, kv_len=enc_len)
        x = x + self.mlp(self.ln3(x))
        return x, new_cache


def sinusoidal_positions(length: int, dim: int, dtype=jnp.float32) -> Array:
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    i = jnp.arange(dim // 2, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(10000.0, 2 * i / dim)
    emb = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)
    return emb.astype(dtype)
