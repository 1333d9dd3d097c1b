"""ViT encoder (flax) — shared by TrOCR and the DiT-style detector backbone.

Capability parity with the reference's DeiT/BEiT encoders
(``/root/reference/marie/boxes/dit/ditod/beit.py``, TrOCR's DeiT encoder in
``/root/reference/marie/models/unilm/trocr``), built NHWC with static
sequence lengths so XLA tiles patches straight onto the MXU.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from marie_tpu.models.configs import ViTConfig
from marie_tpu.models.layers import EncoderLayer

Array = jnp.ndarray


class PatchEmbed(nn.Module):
    patch_size: int | Tuple[int, int]  # int = square, tuple = (ph, pw)
    hidden_dim: int

    @nn.compact
    def __call__(self, images: Array) -> Array:
        """[B, H, W, C] -> [B, H/ph * W/pw, D] via a strided conv."""
        p = self.patch_size
        phw = (p, p) if isinstance(p, int) else tuple(p)
        x = nn.Conv(
            self.hidden_dim,
            kernel_size=phw,
            strides=phw,
            padding="VALID",
            name="proj",
        )(images)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class ViTEncoder(nn.Module):
    cfg: ViTConfig

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(c.patch_size, c.hidden_dim)
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, c.seq_len, c.hidden_dim),
        )
        if c.use_cls_token:
            self.cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, c.hidden_dim)
            )
        self.layers = [
            EncoderLayer(c.num_heads, c.hidden_dim, c.mlp_dim, name=f"layer_{i}")
            for i in range(c.num_layers)
        ]
        self.ln_f = nn.LayerNorm()

    def __call__(self, images: Array) -> Array:
        """[B, H, W, C] -> [B, S, D] encoder states."""
        x = self.patch_embed(images)
        if self.cfg.use_cls_token:
            cls = jnp.broadcast_to(
                self.cls_token, (x.shape[0], 1, x.shape[-1])
            ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        for layer in self.layers:
            x = layer(x)
        return self.ln_f(x)

    def feature_grid(self, images: Array) -> Array:
        """[B, H, W, C] -> [B, H/p, W/p, D] spatial features (detector use)."""
        x = self(images)
        c = self.cfg
        if c.use_cls_token:
            x = x[:, 1:]
        ph, pw = c.patch_hw
        h = c.image_size[0] // ph
        w = c.image_size[1] // pw
        return x.reshape(x.shape[0], h, w, x.shape[-1])
