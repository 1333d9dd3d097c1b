"""Shared test helpers: synthetic document pages."""

from typing import List, Tuple

import numpy as np


def synth_page(
    words: List[Tuple[str, int, int]],
    size: Tuple[int, int] = (480, 640),
    char_w: int = 8,
    char_h: int = 14,
) -> Tuple[np.ndarray, List[List[int]]]:
    """Render fake 'words' as solid black blocks on a white page.

    Each word is (text, x, y); its box width is len(text)*char_w.
    Returns (page uint8 [H,W,3], xywh boxes).
    """
    h, w = size
    page = np.full((h, w, 3), 255, np.uint8)
    boxes = []
    for text, x, y in words:
        bw = max(len(text) * char_w, 4)
        bh = char_h
        page[y : y + bh, x : x + bw] = 0
        boxes.append([x, y, bw, bh])
    return page, boxes


def synth_text_page(
    lines: List[str],
    size: Tuple[int, int] = (480, 640),
    origin: Tuple[int, int] = (40, 40),
    line_gap: int = 28,
) -> Tuple[np.ndarray, List[List[int]], List[str]]:
    """Render real text with PIL's default font.

    Returns (page uint8, per-word xywh boxes, word texts).
    """
    from PIL import Image, ImageDraw

    h, w = size
    img = Image.new("RGB", (w, h), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    boxes, texts = [], []
    x0, y0 = origin
    for li, line in enumerate(lines):
        x = x0
        y = y0 + li * line_gap
        for word in line.split():
            bbox = draw.textbbox((x, y), word)
            draw.text((x, y), word, fill=(0, 0, 0))
            bx0, by0, bx1, by1 = bbox
            boxes.append([bx0, by0, bx1 - bx0, by1 - by0])
            texts.append(word)
            x = bx1 + 10
    return np.asarray(img), boxes, texts
