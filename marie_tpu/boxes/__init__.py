from marie_tpu.boxes.box_processor import BoxProcessor, PSMode
from marie_tpu.boxes.craft_box_processor import BoxProcessorCraft
from marie_tpu.boxes.line_processor import find_line_number, line_merge

__all__ = [
    "BoxProcessor",
    "PSMode",
    "BoxProcessorCraft",
    "BoxProcessorTextFuseNet",
    "line_merge",
    "find_line_number",
]


def __getattr__(name):
    # lazy: the fusion detector pulls in roi_align/flax only when used
    if name == "BoxProcessorTextFuseNet":
        from marie_tpu.boxes.textfusenet_box_processor import (
            BoxProcessorTextFuseNet,
        )

        return BoxProcessorTextFuseNet
    raise AttributeError(name)
