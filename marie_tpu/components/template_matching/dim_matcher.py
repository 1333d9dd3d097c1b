"""Learned template matching over the trained detector trunk.

Counterparts of the reference's learned matchers
(``/root/reference/marie/components/template_matching/dim_template_matching.py:541``
— deep feature matching — and ``vqnnf_template_matching.py`` — vector-
quantized nearest-neighbour fields).  TPU re-design: both run as ONE
convolution program over the page's feature grid.

* :class:`DIMTemplateMatcher` — cosine-similarity matching on L2-
  normalized feature maps from the trained CRAFT trunk (stage3, stride
  4).  The template's feature patch is the conv kernel; local feature
  norms come from a box-filter conv, so the score map is exact cosine
  similarity — robust to noise, brightness and contrast changes that
  break raw-pixel NCC.
* :class:`VQNNFTemplateMatcher` — the quantized variant: a small k-means
  codebook built from the template's features; page features assign to
  nearest codeword and the score map counts codeword agreements (a
  nearest-neighbour-field vote), matching the reference's VQNNF role at
  a fraction of its 3.7k LoC.
"""

from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.components.template_matching.base import (
    BaseTemplateMatcher,
    TemplateMatchResult,
)
from marie_tpu.models.configs import CraftConfig
from marie_tpu.models.craft import CRAFT
from marie_tpu.ops import nms


@partial(jax.jit, static_argnames=("model", "layer"))
def _trunk_features(model, variables, image_u8, layer: str = "stage3"):
    """[H,W,3] uint8 -> L2-normalized feature grid [H/s, W/s, C] from the
    named CRAFT backbone stage (stage3 = stride 4)."""
    from marie_tpu.preprocess.ops import normalize_page

    rgb = normalize_page(image_u8)
    vdt = jax.tree_util.tree_leaves(variables)[0].dtype
    _, state = model.apply(
        variables,
        rgb[None].astype(vdt),
        capture_intermediates=lambda mdl, _: mdl.name == layer,
    )
    feats = state["intermediates"]
    # walk to the captured stage output
    node = feats
    while isinstance(node, dict):
        if "__call__" in node:
            node = node["__call__"][0]
            break
        node = node[next(iter(node))]
    grid = node[0].astype(jnp.float32)  # [h, w, C]
    return grid / jnp.maximum(
        jnp.linalg.norm(grid, axis=-1, keepdims=True), 1e-6
    )


@partial(jax.jit, static_argnames=("th", "tw", "max_peaks"))
def _cosine_match_jit(page_feats, tpl_feats, th: int, tw: int, max_peaks: int):
    """Cosine-similarity map + top-K NMS'd peaks (feature-grid coords)."""
    t = tpl_feats
    t_norm = jnp.sqrt(jnp.sum(t * t) + 1e-6)
    img = page_feats[None]  # NHWC
    kern = t[:, :, :, None]  # HWIO
    corr = jax.lax.conv_general_dilated(
        img, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    # local norm of the page feature patch under the kernel footprint
    sq = jnp.sum(page_feats * page_feats, axis=-1)
    ones = jnp.ones((th, tw, 1, 1), jnp.float32)
    local = jax.lax.conv_general_dilated(
        sq[None, :, :, None], ones, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    score = corr / (jnp.sqrt(jnp.maximum(local, 1e-6)) * t_norm)

    flat = score.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_peaks)
    w_out = score.shape[1]
    ys = (idx // w_out).astype(jnp.float32)
    xs = (idx % w_out).astype(jnp.float32)
    boxes = jnp.stack([xs, ys, xs + tw, ys + th], axis=-1)
    keep, _ = nms(boxes, scores, iou_threshold=0.3)
    return boxes, scores, keep


def _kmeans(feats: np.ndarray, k: int, iters: int = 8, seed: int = 0):
    """Tiny host-side k-means for the template codebook. feats [N, C]."""
    rng = np.random.default_rng(seed)
    k = min(k, len(feats))
    centers = feats[rng.choice(len(feats), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((feats[:, None, :] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            sel = feats[assign == j]
            if len(sel):
                centers[j] = sel.mean(0)
    return centers


@partial(jax.jit, static_argnames=("th", "tw", "max_peaks"))
def _vq_match_jit(page_codes_onehot, tpl_codes_onehot, th: int, tw: int,
                  max_peaks: int):
    """Codeword-agreement score map: fraction of footprint positions whose
    page codeword equals the template codeword (the NNF vote)."""
    img = page_codes_onehot[None]  # [1,h,w,K]
    kern = tpl_codes_onehot[:, :, :, None]  # [th,tw,K,1]
    hits = jax.lax.conv_general_dilated(
        img, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    score = hits / float(th * tw)
    flat = score.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_peaks)
    w_out = score.shape[1]
    ys = (idx // w_out).astype(jnp.float32)
    xs = (idx % w_out).astype(jnp.float32)
    boxes = jnp.stack([xs, ys, xs + tw, ys + th], axis=-1)
    keep, _ = nms(boxes, scores, iou_threshold=0.3)
    return boxes, scores, keep


class _TrunkMatcher(BaseTemplateMatcher):
    """Shared trunk-feature plumbing for the learned matchers."""

    stride = 4  # stage3 grid

    def __init__(self, variables=None, config: Optional[CraftConfig] = None,
                 max_peaks: int = 32, **kwargs):
        super().__init__(**kwargs)
        if variables is None and config is None:
            from marie_tpu.registry.zoo import zoo_params

            variables = zoo_params("craft-synth")
            if variables is not None:
                config = CraftConfig.base()
        self.config = config or CraftConfig.base()
        self.model = CRAFT(self.config)
        if variables is None:
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
        self.variables = variables
        self.max_peaks = max_peaks

    def _grid(self, image: np.ndarray) -> jnp.ndarray:
        img = np.asarray(image)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        # pad to the trunk's stride multiple (16 through stage3's pools)
        h, w = img.shape[:2]
        ph = (h + 15) // 16 * 16
        pw = (w + 15) // 16 * 16
        if (ph, pw) != (h, w):
            pad = np.full((ph, pw, 3), 255, np.uint8)
            pad[:h, :w] = img
            img = pad
        return _trunk_features(self.model, self.variables, jnp.asarray(img))

    def _emit(self, boxes, scores, keep, threshold, limit, label, fi, out):
        picked = 0
        for box, score, k in zip(boxes, scores, keep):
            if not k or score < threshold or picked >= limit:
                continue
            x0, y0, x1, y1 = (float(v) * self.stride for v in box)
            out.append(
                TemplateMatchResult(
                    bbox=[int(x0), int(y0), int(x1 - x0), int(y1 - y0)],
                    label=label,
                    score=float(score),
                    similarity=float(score),
                    frame_index=fi,
                )
            )
            picked += 1


class DIMTemplateMatcher(_TrunkMatcher):
    def match(self, frames: Sequence[np.ndarray], score_threshold: float = 0.6,
              max_matches_per_template: int = 5) -> List[TemplateMatchResult]:
        out: List[TemplateMatchResult] = []
        tpl_feats = [
            (tpl, np.asarray(self._grid(tpl["image"])))
            for tpl in self._templates
        ]
        for fi, frame in enumerate(frames):
            page = self._grid(frame)
            for tpl, tf in tpl_feats:
                th, tw = tf.shape[:2]
                if th > page.shape[0] or tw > page.shape[1]:
                    continue
                boxes, scores, keep = jax.device_get(
                    _cosine_match_jit(page, jnp.asarray(tf), th, tw, self.max_peaks)
                )
                self._emit(boxes, scores, keep, score_threshold,
                           max_matches_per_template, tpl["label"], fi, out)
        return out


class VQNNFTemplateMatcher(_TrunkMatcher):
    def __init__(self, codebook_size: int = 16, **kwargs):
        super().__init__(**kwargs)
        self.codebook_size = codebook_size

    def _codebook(self, tpl_grid: np.ndarray) -> np.ndarray:
        return _kmeans(
            tpl_grid.reshape(-1, tpl_grid.shape[-1]), self.codebook_size
        )

    @staticmethod
    def _assign_onehot(grid: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
        d = (
            jnp.sum(grid * grid, -1, keepdims=True)
            - 2.0 * jnp.einsum("hwc,kc->hwk", grid, centers)
            + jnp.sum(centers * centers, -1)[None, None]
        )
        return jax.nn.one_hot(jnp.argmin(d, -1), centers.shape[0])

    def match(self, frames: Sequence[np.ndarray], score_threshold: float = 0.5,
              max_matches_per_template: int = 5) -> List[TemplateMatchResult]:
        out: List[TemplateMatchResult] = []
        prepped = []
        for tpl in self._templates:
            tg = np.asarray(self._grid(tpl["image"]))
            centers = jnp.asarray(self._codebook(tg))
            tpl_onehot = self._assign_onehot(jnp.asarray(tg), centers)
            prepped.append((tpl, centers, tpl_onehot))
        for fi, frame in enumerate(frames):
            page = self._grid(frame)
            for tpl, centers, tpl_onehot in prepped:
                th, tw = tpl_onehot.shape[:2]
                if th > page.shape[0] or tw > page.shape[1]:
                    continue
                page_onehot = self._assign_onehot(page, centers)
                boxes, scores, keep = jax.device_get(
                    _vq_match_jit(page_onehot, tpl_onehot, th, tw, self.max_peaks)
                )
                self._emit(boxes, scores, keep, score_threshold,
                           max_matches_per_template, tpl["label"], fi, out)
        return out
