"""Flax model zoo — TPU-native counterparts of the reference's ML payload.

Reference model inventory (SURVEY.md §2.4):
  CRAFT text detector        -> marie_tpu.models.craft
  TrOCR recognizer           -> marie_tpu.models.trocr
  CRNN (CTC) recognizer      -> marie_tpu.models.crnn
  LayoutLMv3 heads           -> marie_tpu.models.layoutlm
  pix2pix overlay GAN        -> marie_tpu.models.pix2pix
  shared transformer layers  -> marie_tpu.models.layers / vit

All models are flax.linen modules operating on NHWC bfloat16-friendly
shapes with static sequence lengths.
"""

from marie_tpu.models import configs

__all__ = ["configs"]
