from marie_tpu.components.template_matching.base import (
    BaseTemplateMatcher,
    TemplateMatchResult,
)
from marie_tpu.components.template_matching.ncc_matcher import NCCTemplateMatcher
from marie_tpu.components.template_matching.composite import CompositeTemplateMatcher

__all__ = [
    "BaseTemplateMatcher",
    "TemplateMatchResult",
    "NCCTemplateMatcher",
    "CompositeTemplateMatcher",
]
