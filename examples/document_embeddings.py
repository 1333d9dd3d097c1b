"""Document-similarity demo — usage parity with the reference's
``examples/document_embeddings.py`` (OCR two documents, embed the
extracted text, print cosine similarity).  Re-based on the TPU-native
stack: text comes from the fused OCR engine and the embeddings provider
is pluggable (hashing — dependency-free — or HF transformers).

    python examples/document_embeddings.py <file_a> <file_b> [--provider hashing|transformers]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marie_tpu.utils.platform import honor_jax_platforms  # noqa: E402

honor_jax_platforms()


def cos_sim(a: np.ndarray, b: np.ndarray) -> float:
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("file_a")
    ap.add_argument("file_b")
    ap.add_argument(
        "--provider", default="hashing", choices=["hashing", "transformers"]
    )
    args = ap.parse_args()

    from marie_tpu.ocr.util import get_known_ocr_engines, meta_to_text
    from marie_tpu.utils.docs import frames_from_file

    if args.provider == "transformers":
        from marie_tpu.embeddings.transformers_embeddings import (
            TransformersEmbeddings,
        )

        provider = TransformersEmbeddings()
    else:
        from marie_tpu.embeddings.hashing import HashingEmbeddings

        provider = HashingEmbeddings()

    engine = get_known_ocr_engines()["default"]
    texts = []
    for path in (args.file_a, args.file_b):
        results = engine.extract(frames_from_file(path))
        texts.append(meta_to_text(results))

    emb = provider.get_embeddings(texts)
    print(f"cosine similarity: {cos_sim(emb[0], emb[1]):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
