"""Engine registry (reference: ``/root/reference/marie/ocr/util.py:89``
``get_known_ocr_engines`` — mock/default/best)."""

from typing import Dict, Optional

from marie_tpu.ocr.ocr_engine import OcrEngine
from marie_tpu.registry.zoo import zoo_checkpoint as _zoo_checkpoint


def _trocr_processor(beam_size: int = 1):
    from marie_tpu.document.trocr_ocr_processor import TrOcrProcessor
    from marie_tpu.models.configs import TrOCRConfig

    import os as _os

    # preference ladder of GATE-GREEN slots only: full-height-patch
    # fast_v2 (20 enc tokens — 3x less encoder+cross-KV cost, see
    # ARCHITECTURE "crop+decode anatomy") > fast.  Staged/rejected
    # presets never appear here — a future commit of a rejected name
    # must not silently ship it (ADVICE r3).  MARIE_RECOGNIZER pins any
    # KNOWN preset checkpoint explicitly (experiments, ops rollback).
    known = {"trocr-fast3g2d6ov-synth": TrOCRConfig.fast_v3_g2_d6,
             "trocr-fast3g2ov-synth": TrOCRConfig.fast_v3_g2,
             "trocr-fast3g2-synth": TrOCRConfig.fast_v3_g2,
             "trocr-fast3-synth": TrOCRConfig.fast_v3,
             "trocr-fast2ov-synth": TrOCRConfig.fast_v2,
             "trocr-fast2-synth": TrOCRConfig.fast_v2,
             "trocr-fast-synth": TrOCRConfig.fast}
    # slots above the live default are ONLY ever created by the
    # promotion gate's --require-eval A/B (scripts/promote_checkpoint.py)
    ladder = [("trocr-fast3g2d6ov-synth", TrOCRConfig.fast_v3_g2_d6),
              ("trocr-fast3g2ov-synth", TrOCRConfig.fast_v3_g2),
              ("trocr-fast2ov-synth", TrOCRConfig.fast_v2),
              ("trocr-fast2-synth", TrOCRConfig.fast_v2),
              ("trocr-fast-synth", TrOCRConfig.fast)]
    prefer = _os.environ.get("MARIE_RECOGNIZER")
    if prefer:
        ladder = ([(prefer, known[prefer])] if prefer in known else []) + [
            l for l in ladder if l[0] != prefer
        ]
    params, config = None, TrOCRConfig.fast()
    for name, cfg_fn in ladder:
        ckpt = _zoo_checkpoint(name)
        if ckpt:
            from marie_tpu.registry.checkpoints import load_params

            params, config = load_params(ckpt), cfg_fn()
            break
    return TrOcrProcessor(
        config=config, params=params, beam_size=beam_size,
        param_dtype="bfloat16",
    )


def _upload_format() -> str:
    """Serving default for page upload packing: u4 (4-bit grayscale —
    half the host->device bytes at <= 8/255 per-pixel error, measured
    CER-identical across the 8-distribution oracle).  ``MARIE_UPLOAD_FORMAT``
    pins u8 (lossless), u2 (quarter bytes, worst-case CER +0.0003 on
    the oracle, the bench default), u1 (eighth bytes, hard-threshold
    binarized — measured CER +0.064 on serif-bold, NOT gateable) or u1d
    (eighth bytes, ordered-dither binarized — gate on the oracle before
    pinning)."""
    import os

    return os.environ.get("MARIE_UPLOAD_FORMAT", "u4")


def _craft_box_processor(max_components: int = 384):
    """Trained heatmap detector when the checkpoint exists; deterministic
    ink-boxes otherwise (identical compute graph either way)."""
    from marie_tpu.boxes.craft_box_processor import BoxProcessorCraft

    from marie_tpu.models.configs import CraftConfig

    # preference ladder: s2d-stem + subpixel-head trunk (stride-2 output
    # off a half-res conv stack, ~4x less fwd FLOPs) > half-width fast >
    # base.  MARIE_DETECTOR pins a specific checkpoint (A/B evals, ops
    # rollback).
    import os as _os

    ladder = [("craft-s2d2-synth", CraftConfig.fast_s2d2()),
              ("craft-s4d4-synth", CraftConfig.fast_s4d4()),
              ("craft-fast-synth", CraftConfig.fast()),
              ("craft-synth", CraftConfig.base())]
    prefer = _os.environ.get("MARIE_DETECTOR")
    if prefer:
        ladder = [l for l in ladder if l[0] == prefer] + ladder
    for name, cfg in ladder:
        ckpt = _zoo_checkpoint(name)
        if ckpt:
            from marie_tpu.registry.checkpoints import load_params

            return BoxProcessorCraft(
                config=cfg,
                variables=load_params(ckpt), box_source="heatmap",
                text_threshold=0.6, low_text=0.4, link_threshold=0.4,
                # production serving defaults — bf16 trunk (MXU-native)
                # and a 384-slot component budget: box stats scale
                # linearly in K and ~140 words/page leaves 2.7x headroom
                # (bench.py matches); dense-page callers raise it
                max_components=max_components, param_dtype="bfloat16",
            )
    return BoxProcessorCraft(
        box_source="ink", min_area=4, max_components=max_components
    )


def _crnn_processor():
    from marie_tpu.document.crnn_ocr_processor import CrnnOcrProcessor

    variables = None
    ckpt = _zoo_checkpoint("crnn-synth")
    if ckpt:
        from marie_tpu.registry.checkpoints import load_params

        variables = load_params(ckpt)
    return CrnnOcrProcessor(variables=variables)


def get_known_ocr_engines(
    device: str = "tpu", engine: Optional[str] = None
) -> Dict[str, OcrEngine]:
    """Build the known engines. ``engine`` restricts to one name.

    * ``mock``    — canned results, no models
    * ``default`` — CRAFT + TrOCR greedy (loads the in-repo synthetic-trained
                    checkpoint when present)
    * ``best``    — CRAFT detection + voting ensemble (TrOCR beam-5 + CRNN)
    * ``chained`` — default + LayoutLM classification/NER heads in the SAME
                    compiled program (ocr/fused_chain.py; BASELINE configs
                    3-4) — falls back to ``default`` behaviour when the
                    chain checkpoints are absent
    """
    engines: Dict[str, OcrEngine] = {}
    names = [engine] if engine else ["mock", "default", "best", "chained"]

    for name in names:
        if name == "mock":
            from marie_tpu.ocr.mock_ocr_engine import MockOcrEngine

            engines["mock"] = MockOcrEngine()
        elif name == "default":
            from marie_tpu.ocr.ocr_engine import PipelineOcrEngine

            engines["default"] = PipelineOcrEngine(
                _craft_box_processor(), _trocr_processor(beam_size=1),
                upload_format=_upload_format(),
            )
        elif name == "chained":
            from marie_tpu.components.document_classifier import (
                LayoutDocumentClassifier,
            )
            from marie_tpu.components.document_indexer import (
                LayoutDocumentIndexer,
            )
            from marie_tpu.ocr.ocr_engine import PipelineOcrEngine

            engines["chained"] = PipelineOcrEngine(
                _craft_box_processor(),
                _trocr_processor(beam_size=1),
                classifier=LayoutDocumentClassifier.from_zoo_chain(),
                indexer=LayoutDocumentIndexer.from_zoo_chain(),
                upload_format=_upload_format(),
            )
        elif name == "best":
            from marie_tpu.ocr.voting_ocr_engine import VotingOcrEngine

            engines["best"] = VotingOcrEngine(
                box_processor=_craft_box_processor(),
                ocr_processors=[
                    _trocr_processor(beam_size=5),
                    _crnn_processor(),
                ],
            )
    return engines


def meta_to_text(meta_or_path, text_output_path: str = None) -> str:
    """OCR result metadata (list of page results, or a path to their
    JSON) -> plain text via the TextRenderer (reference
    ``marie/ocr/util.py:44`` ``meta_to_text`` — frames are synthesised
    from each page's ``meta.imageSize`` so only the JSON is needed)."""
    import json as _json
    import os as _os
    import tempfile as _tempfile

    import numpy as _np

    from marie_tpu.renderer import TextRenderer

    if isinstance(meta_or_path, (str, _os.PathLike)):
        with open(meta_or_path) as f:
            results = _json.load(f)
    else:
        results = meta_or_path
    if isinstance(results, dict):
        results = [results]

    frames = [
        _np.zeros(
            (r["meta"]["imageSize"]["height"], r["meta"]["imageSize"]["width"], 3),
            dtype=_np.uint8,
        )
        for r in results
    ]
    if text_output_path is None:
        fd, text_output_path = _tempfile.mkstemp(suffix=".txt")
        _os.close(fd)
    TextRenderer().render(frames, results, output_filename=text_output_path)
    with open(text_output_path) as f:
        return f.read()
