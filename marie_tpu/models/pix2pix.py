"""pix2pix generator for document overlay cleanup (flax).

Capability parity with the reference's vendored pix2pix
(``/root/reference/marie/models/pix2pix/models/networks.py`` —
``resnet_9blocks`` generator used by
``/root/reference/marie/overlay/overlay.py:30`` to segment form overlays
from scans).  Instance norm is implemented with ``nn.GroupNorm(groups=C)``;
the architecture is c7s1-64, d128, d256, R256×9, u128, u64, c7s1-3+tanh.
"""

import jax.numpy as jnp
from flax import linen as nn

from marie_tpu.models.configs import Pix2PixConfig

Array = jnp.ndarray


def _inorm(x: Array) -> Array:
    return nn.GroupNorm(num_groups=None, group_size=1)(x)


class ResnetBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        h = _inorm(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME")(h)
        h = _inorm(h)
        return x + h


class ResnetGenerator(nn.Module):
    """[B, H, W, C] in [-1,1] -> [B, H, W, C] in [-1,1]."""

    cfg: Pix2PixConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = self.cfg.base_channels
        # c7s1-f
        h = nn.Conv(f, (7, 7), padding="SAME")(x)
        h = nn.relu(_inorm(h))
        # downsampling d2f, d4f
        h = nn.Conv(2 * f, (3, 3), strides=(2, 2), padding="SAME")(h)
        h = nn.relu(_inorm(h))
        h = nn.Conv(4 * f, (3, 3), strides=(2, 2), padding="SAME")(h)
        h = nn.relu(_inorm(h))
        # resnet blocks
        for i in range(self.cfg.num_res_blocks):
            h = ResnetBlock(4 * f, name=f"res_{i}")(h)
        # upsampling
        h = nn.ConvTranspose(2 * f, (3, 3), strides=(2, 2), padding="SAME")(h)
        h = nn.relu(_inorm(h))
        h = nn.ConvTranspose(f, (3, 3), strides=(2, 2), padding="SAME")(h)
        h = nn.relu(_inorm(h))
        # c7s1-out
        h = nn.Conv(self.cfg.out_channels, (7, 7), padding="SAME")(h)
        return nn.tanh(h)
