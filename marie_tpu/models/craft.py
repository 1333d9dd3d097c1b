"""CRAFT text detector (flax) — character-region + affinity heatmaps.

Capability parity with the reference's CRAFT
(``/root/reference/marie/models/craft/craft.py:31`` — VGG16-BN basenet +
U-Net upsampling + 2-channel head at stride 2), built NHWC for TPU.  The
post-processing (``getDetBoxes``/``adjustResultCoordinates`` in
``craft_utils.py:257,268`` — OpenCV connected components on host) is
replaced by on-device thresholding + connected components + component
boxes (see :func:`marie_tpu.boxes.craft_box_processor`).
"""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from marie_tpu.models.configs import CraftConfig

Array = jnp.ndarray


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class VGGStage(nn.Module):
    features: int
    num_convs: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for _ in range(self.num_convs):
            x = ConvBNRelu(self.features)(x, train)
        return x


class UpBlock(nn.Module):
    """double-conv block fusing an upsampled map with a skip connection
    (CRAFT's ``double_conv``)."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x: Array, skip: Array, train: bool = False) -> Array:
        # resize to the skip's spatial dims then concat
        _, h, w, _ = skip.shape
        x = _resize(x, (h, w))
        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNRelu(self.mid, kernel=1)(x, train)
        x = ConvBNRelu(self.out, kernel=3)(x, train)
        return x


def _resize(x: Array, hw: Tuple[int, int]) -> Array:
    import jax

    b, h, w, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")


class CRAFT(nn.Module):
    """[B, H, W, C] float in [0,1] -> [B, H/2, W/2, 2] (region, affinity)."""

    cfg: CraftConfig

    @nn.compact
    def __call__(self, images: Array, train: bool = False) -> Array:
        c = self.cfg.base_channels
        f = self.cfg.stem_stride
        if f > 1:
            # space-to-depth stem: [B,H,W,C] -> [B,H/f,W/f,f*f*C]; stage1
            # then runs at /f — no information loss, f^2 fewer positions
            # for the memory-bound full-res stage (the whole network and
            # the output grid shift log2(f) levels)
            b, h, w, ch = images.shape
            images = images.reshape(b, h // f, f, w // f, f, ch)
            images = images.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // f, w // f, f * f * ch
            )
        s1 = VGGStage(c, 2, name="stage1")(images, train)  # /1
        x = nn.max_pool(s1, (2, 2), strides=(2, 2))
        s2 = VGGStage(2 * c, 2, name="stage2")(x, train)  # /2
        x = nn.max_pool(s2, (2, 2), strides=(2, 2))
        s3 = VGGStage(4 * c, 3, name="stage3")(x, train)  # /4
        x = nn.max_pool(s3, (2, 2), strides=(2, 2))
        s4 = VGGStage(8 * c, 3, name="stage4")(x, train)  # /8
        x = nn.max_pool(s4, (2, 2), strides=(2, 2))
        s5 = VGGStage(8 * c, 3, name="stage5")(x, train)  # /16

        # U-Net decoder with skip fusion (CRAFT upconv1..4)
        u = UpBlock(8 * c, 4 * c, name="up1")(s5, s4, train)  # /8
        u = UpBlock(4 * c, 2 * c, name="up2")(u, s3, train)  # /4
        u = UpBlock(2 * c, c, name="up3")(u, s2, train)  # /2
        # head: conv stack to 2-channel heatmap at /2 (CRAFT conv_cls)
        h = ConvBNRelu(c, name="head1")(u, train)
        h = ConvBNRelu(c // 2 or 1, name="head2")(h, train)
        nc = self.cfg.num_classes
        if self.cfg.head_d2s:
            # sub-pixel head: f x f phase maps, depth-to-space back down
            # to the stride-2 grid (keeps stride-2 box framing over an
            # s2d-stem trunk; f = stem_stride so the shifts cancel)
            out = nn.Conv(nc * f * f, (1, 1), name="head_out")(h)
            b, hh, ww, _ = out.shape
            out = out.reshape(b, hh, ww, f, f, nc)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, f * hh, f * ww, nc
            )
        else:
            out = nn.Conv(nc, (1, 1), name="head_out")(h)
        return nn.sigmoid(out)
