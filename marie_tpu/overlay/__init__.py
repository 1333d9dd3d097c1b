from marie_tpu.overlay.overlay import OverlayProcessor

__all__ = ["OverlayProcessor"]
