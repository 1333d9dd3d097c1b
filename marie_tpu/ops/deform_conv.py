"""Deformable convolution v1/v2 — gather-based XLA implementation.

Equivalent of the reference's detectron2 CUDA kernels
(``deform_conv_cuda.cu`` + ``deform_conv_cuda_kernel.cu``,
``/root/reference/marie/models/textfusenet/detectron2/layers/csrc/deformable/``).
The CUDA im2col-with-offsets kernel becomes: bilinear-gather the deformed
sampling grid into an im2col tensor, then one big matmul (MXU-friendly) —
the canonical TPU formulation of deformable conv.

Only the TextFuseNet detector path needs this op (SURVEY.md §2.6 item 1).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_sample_nchw(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """feat [C,H,W], ys/xs [...]-shaped float coords -> [C, ...]. Zeros OOB."""
    h, w = feat.shape[-2:]
    oob = (ys <= -1.0) | (ys >= h) | (xs <= -1.0) | (xs >= w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    flat = feat.reshape(feat.shape[0], -1)

    def take(yi, xi):
        return flat[:, (yi * w + xi).reshape(-1)].reshape((feat.shape[0],) + ys.shape)

    hy, hx = 1.0 - ly, 1.0 - lx
    val = (
        take(y0i, x0i) * (hy * hx)
        + take(y0i, x1i) * (hy * lx)
        + take(y1i, x0i) * (ly * hx)
        + take(y1i, x1i) * (ly * lx)
    )
    return jnp.where(oob, 0.0, val)


@partial(jax.jit, static_argnames=("stride", "padding", "dilation"))
def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Deformable conv (v2 when ``mask`` is given, v1 otherwise).

    Args:
      x: [N, C_in, H, W]
      offsets: [N, 2*Kh*Kw, H_out, W_out] — (dy, dx) interleaved per tap,
        matching the torchvision/detectron2 layout.
      weight: [C_out, C_in, Kh, Kw]
      mask: optional [N, Kh*Kw, H_out, W_out] modulation (deform conv v2).
      bias: optional [C_out].

    Returns [N, C_out, H_out, W_out].
    """
    n, c_in, h, w = x.shape
    c_out, _, kh, kw = weight.shape
    h_out = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    w_out = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # base sampling grid: [Kh*Kw, H_out, W_out]
    oy = jnp.arange(h_out) * stride - padding
    ox = jnp.arange(w_out) * stride - padding
    ky = jnp.arange(kh) * dilation
    kx = jnp.arange(kw) * dilation
    # base grid as [kh, kw, H_out, W_out]
    by = oy[None, None, :, None] + (ky[:, None])[:, :, None, None] * jnp.ones(
        (1, kw, 1, 1)
    )
    bx = ox[None, None, None, :] + (kx[None, :])[:, :, None, None] * jnp.ones(
        (kh, 1, 1, 1)
    )
    by = jnp.broadcast_to(by, (kh, kw, h_out, w_out)).reshape(kh * kw, h_out, w_out)
    bx = jnp.broadcast_to(bx, (kh, kw, h_out, w_out)).reshape(kh * kw, h_out, w_out)

    off = offsets.reshape(n, kh * kw, 2, h_out, w_out)
    sample_y = by[None] + off[:, :, 0]
    sample_x = bx[None] + off[:, :, 1]

    def one_image(feat, ys, xs, m):
        # cols: [C_in, K, H_out, W_out]
        cols = _bilinear_sample_nchw(feat, ys, xs)
        if m is not None:
            cols = cols * m[None]
        # matmul: [C_out, C_in*K] @ [C_in*K, H_out*W_out]
        cols2 = cols.reshape(c_in * kh * kw, h_out * w_out)
        w2 = weight.reshape(c_out, c_in * kh * kw)
        out = jnp.dot(w2, cols2, preferred_element_type=jnp.float32)
        return out.reshape(c_out, h_out, w_out)

    if mask is not None:
        out = jax.vmap(one_image)(x, sample_y, sample_x, mask)
    else:
        out = jax.vmap(lambda f, ys, xs: one_image(f, ys, xs, None))(
            x, sample_y, sample_x
        )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out.astype(x.dtype)
