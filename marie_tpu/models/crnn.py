"""CRNN scene-text recognizer with CTC head (flax).

Capability parity with the reference's four-stage recognizer
(``/root/reference/marie/models/icr/model.py:25`` — TPS → VGG/ResNet
features → BiLSTM → CTC/Attn).  TPU-first choices: NHWC convs; the
BiLSTM becomes a bidirectional ``nn.RNN`` over the width axis (scan-based,
static length); decode is the on-device CTC collapse
(:func:`marie_tpu.ops.ctc_greedy_decode`).  TPS spatial transformer is
replaced by the page-level deskew in preprocessing (the TPU pipeline
rectifies crops before batching, so a per-crop STN is redundant).
"""

import jax.numpy as jnp
from flax import linen as nn

from marie_tpu.models.configs import CRNNConfig

Array = jnp.ndarray


class ConvBlock(nn.Module):
    features: int
    pool: tuple | None = (2, 2)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        if self.pool:
            x = nn.max_pool(x, self.pool, strides=self.pool)
        return x


class ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1))(x)
        return nn.relu(x + h)


class CRNN(nn.Module):
    """[B, 32, W, 1] grayscale crops -> [B, W/4, num_classes] CTC logits."""

    cfg: CRNNConfig

    @nn.compact
    def __call__(self, images: Array, train: bool = False) -> Array:
        c = self.cfg
        f = c.feature_dim
        x = images
        if c.backbone == "resnet":
            x = ConvBlock(f // 4, pool=(2, 2))(x, train)  # 16 x W/2
            x = ResBlock(f // 2)(x, train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 8 x W/4
            x = ResBlock(f)(x, train)
            x = nn.max_pool(x, (2, 1), strides=(2, 1))  # 4 x W/4
            x = ResBlock(f)(x, train)
            x = nn.max_pool(x, (2, 1), strides=(2, 1))  # 2 x W/4
            x = nn.Conv(f, (2, 1), padding="VALID")(x)  # 1 x W/4
        else:  # vgg
            x = ConvBlock(f // 4, pool=(2, 2))(x, train)
            x = ConvBlock(f // 2, pool=(2, 2))(x, train)  # 8 x W/4
            x = ConvBlock(f, pool=(2, 1))(x, train)  # 4 x W/4
            x = ConvBlock(f, pool=(2, 1))(x, train)  # 2 x W/4
            x = nn.Conv(f, (2, 1), padding="VALID")(x)  # 1 x W/4

        seq = x[:, 0]  # [B, T, F] — height squeezed to 1

        # bidirectional LSTM x2 (sequence modeling stage)
        for i in range(2):
            fwd = nn.RNN(nn.OptimizedLSTMCell(c.hidden_dim), name=f"lstm_fwd_{i}")
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(c.hidden_dim), reverse=True,
                keep_order=True, name=f"lstm_bwd_{i}",
            )
            seq = jnp.concatenate([fwd(seq), bwd(seq)], axis=-1)
            seq = nn.Dense(c.hidden_dim, name=f"lstm_proj_{i}")(seq)

        return nn.Dense(c.num_classes, name="ctc_head")(seq)
