"""LLM-prompted entity extraction (reference ``marie/subzero/gen.py``).

The reference prototypes NER-by-prompting: build a JSON-extraction prompt
over a label set, run an LLM (vLLM there), and parse the JSON answer.
Here the generation backend is pluggable — any ``fn(prompt) -> str``
(an HF ``transformers`` pipeline, a remote endpoint, a test fake) — and
the parse is hardened: fenced/embedded JSON is located, labels are
whitelisted, and non-list values coerce to lists so a sloppy model answer
still yields the declared schema.
"""

import json
import re
from typing import Callable, Dict, List, Optional, Sequence

from marie_tpu.logging_core import MarieLogger


def generate_prompt(labels: Sequence[str], text: str) -> str:
    """Build the extraction prompt (reference ``generate_prompt``,
    subzero/gen.py:7 — same contract: entities verbatim from the text,
    one list per label, empty list when absent)."""
    lines = [
        "Extract the entities for the following labels from the given "
        "text and provide the results in JSON format.",
        "- Entities must be extracted exactly as mentioned in the text.",
        "- Return each entity under its label without creating new labels.",
        "- Provide a list of entities for each label; if no entities are "
        "found for a label, return an empty list.",
        "",
        "labels:",
    ]
    lines += [f"- {label}" for label in labels]
    schema = "{\n" + "".join(f'  "{label}": [],\n' for label in labels) + "}"
    lines += ["", "JSON structure:", schema, "", "TEXT:", text]
    return "\n".join(lines)


def parse_entities(
    output: str, labels: Sequence[str]
) -> Dict[str, List[str]]:
    """Parse a model answer into ``{label: [entities...]}`` restricted to
    the declared labels.  Tolerates code fences, leading prose, and
    scalar-instead-of-list values; an unparseable answer yields all-empty
    lists rather than raising."""
    result: Dict[str, List[str]] = {label: [] for label in labels}
    raw = output.strip()
    # strip markdown fences, find the first {...} block
    raw = re.sub(r"^```(?:json)?|```$", "", raw, flags=re.MULTILINE).strip()
    start = raw.find("{")
    if start == -1:
        return result
    depth = 0
    end = -1
    for i, ch in enumerate(raw[start:], start):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    if end == -1:
        return result
    try:
        parsed = json.loads(raw[start:end])
    except json.JSONDecodeError:
        return result
    if not isinstance(parsed, dict):
        return result
    for label in labels:
        value = parsed.get(label, [])
        if isinstance(value, str):
            value = [value]
        elif not isinstance(value, list):
            value = [str(value)]
        result[label] = [str(v) for v in value if v not in (None, "")]
    return result


class LLMNerExtractor:
    """Prompt-an-LLM entity extractor with a pluggable backend.

    ``generate_fn(prompt: str) -> str`` supplies the model; when omitted,
    a local HF ``transformers`` text-generation pipeline is built from
    ``model_name`` on first use (gated — a missing model surfaces as
    ``is_available() == False``, matching how other optional backends in
    this framework degrade).
    """

    def __init__(
        self,
        labels: Sequence[str],
        generate_fn: Optional[Callable[[str], str]] = None,
        model_name: Optional[str] = None,
        max_new_tokens: int = 512,
    ):
        self.labels = list(labels)
        self.logger = MarieLogger("LLMNerExtractor")
        self._generate = generate_fn
        self._model_name = model_name
        self._max_new_tokens = max_new_tokens
        self._load_error: Optional[str] = None

    def _backend(self) -> Optional[Callable[[str], str]]:
        if self._generate is not None:
            return self._generate
        if self._load_error is not None:
            return None
        if not self._model_name:
            self._load_error = "no generate_fn and no model_name configured"
            return None
        try:
            from transformers import pipeline

            pipe = pipeline(
                "text-generation", model=self._model_name, device=-1
            )

            def _hf_generate(prompt: str) -> str:
                out = pipe(
                    prompt,
                    max_new_tokens=self._max_new_tokens,
                    return_full_text=False,
                )
                return out[0]["generated_text"]

            self._generate = _hf_generate
            return self._generate
        except Exception as ex:  # noqa: BLE001 — optional backend
            self._load_error = repr(ex)
            self.logger.warning(f"LLM backend unavailable: {ex!r}")
            return None

    def is_available(self) -> bool:
        return self._backend() is not None

    def extract(self, text: str) -> Dict[str, List[str]]:
        """Run the prompt → generate → parse loop for one text."""
        backend = self._backend()
        if backend is None:
            raise RuntimeError(
                f"LLM backend unavailable: {self._load_error}"
            )
        prompt = generate_prompt(self.labels, text)
        answer = backend(prompt)
        return parse_entities(answer, self.labels)

    def extract_batch(
        self, texts: Sequence[str]
    ) -> List[Dict[str, List[str]]]:
        return [self.extract(t) for t in texts]
