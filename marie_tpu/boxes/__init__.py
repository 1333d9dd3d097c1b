from marie_tpu.boxes.box_processor import BoxProcessor, PSMode
from marie_tpu.boxes.craft_box_processor import BoxProcessorCraft
from marie_tpu.boxes.line_processor import find_line_number, line_merge

__all__ = [
    "BoxProcessor",
    "PSMode",
    "BoxProcessorCraft",
    "line_merge",
    "find_line_number",
]
