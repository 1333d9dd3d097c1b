"""Template matching base (reference:
``/root/reference/marie/components/template_matching/base.py:32`` —
few-shot visual matching of labelled template snippets over pages;
definitions carry (label, template image, optional text))."""

import dataclasses
from abc import abstractmethod
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from marie_tpu.jaml import JAMLCompatible
from marie_tpu.logging_core import MarieLogger


@dataclasses.dataclass
class TemplateMatchResult:
    bbox: List[int]  # xywh in page coords
    label: str
    score: float
    similarity: float
    frame_index: int = 0


class BaseTemplateMatcher(JAMLCompatible):
    def __init__(self, **kwargs):
        self.logger = MarieLogger(type(self).__name__)
        self._templates: List[Dict[str, Any]] = []

    def add_template(
        self, label: str, template: np.ndarray, text: Optional[str] = None
    ) -> None:
        self._templates.append(
            {"label": label, "image": template, "text": text}
        )

    def load_definitions(self, definitions: Sequence[Dict[str, Any]]) -> None:
        """Definitions: [{label, template (array | path), text?}]."""
        for d in definitions:
            tpl = d["template"]
            if isinstance(tpl, str):
                from PIL import Image

                tpl = np.asarray(Image.open(tpl).convert("RGB"))
            self.add_template(d["label"], np.asarray(tpl), d.get("text"))

    @abstractmethod
    def match(
        self,
        frames: Sequence[np.ndarray],
        score_threshold: float = 0.8,
        max_matches_per_template: int = 5,
    ) -> List[TemplateMatchResult]: ...

    def run(self, frames, **kwargs) -> List[TemplateMatchResult]:
        return self.match(frames, **kwargs)
