"""Hand-written Pallas TPU kernels for the hottest ops.

XLA fuses the bulk of the compute (convs/matmuls onto the MXU); kernels
live here only where manual control of VMEM/DMA wins: fused attention for
the recognition decoder, and (planned) tiled NMS for very large box
budgets.
"""

from marie_tpu.ops.pallas.flash_attention import flash_attention

__all__ = ["flash_attention"]
