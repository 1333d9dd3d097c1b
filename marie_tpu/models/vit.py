"""ViT encoder (flax) — shared by TrOCR and the DiT-style detector backbone.

Capability parity with the reference's DeiT/BEiT encoders
(``/root/reference/marie/boxes/dit/ditod/beit.py``, TrOCR's DeiT encoder in
``/root/reference/marie/models/unilm/trocr``), built NHWC with static
sequence lengths so XLA tiles patches straight onto the MXU.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from marie_tpu.models.configs import ViTConfig
from marie_tpu.models.layers import EncoderLayer

Array = jnp.ndarray


class PatchEmbed(nn.Module):
    patch_size: int
    hidden_dim: int

    @nn.compact
    def __call__(self, images: Array) -> Array:
        """[B, H, W, C] -> [B, H/p * W/p, D] via a strided conv."""
        x = nn.Conv(
            self.hidden_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
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
        h = c.image_size[0] // c.patch_size
        w = c.image_size[1] // c.patch_size
        return x.reshape(x.shape[0], h, w, x.shape[-1])
