"""Self-contained word-level tokenizer for layout models.

The reference loads HuggingFace tokenizers with downloaded vocab files
(``document_classifier/transformers.py``); this environment has no model
assets, so the default maps words to stable hash buckets (a standard
feature-hashing vocabulary).  A real subword tokenizer can be plugged in
via the same interface when vocab files exist locally.
"""

import hashlib
from typing import List, Sequence, Tuple

import numpy as np

PAD_ID = 0
CLS_ID = 1
_RESERVED = 2


class HashWordTokenizer:
    def __init__(self, vocab_size: int = 50265, lowercase: bool = True):
        self.vocab_size = vocab_size
        self.lowercase = lowercase

    def token_id(self, word: str) -> int:
        if self.lowercase:
            word = word.lower()
        h = hashlib.md5(word.encode()).digest()
        return _RESERVED + int.from_bytes(h[:4], "little") % (
            self.vocab_size - _RESERVED
        )

    def encode_page(
        self,
        words: Sequence[str],
        boxes: Sequence[Sequence[float]],
        page_size: Tuple[int, int],
        max_len: int,
        coord_buckets: int = 1024,
    ):
        """-> (tokens [max_len], norm_boxes [max_len, 4], seq_len int).

        Boxes come in as xywh page pixels, go out as xyxy bucket coords —
        the LayoutLM convention (0..coord_buckets).
        """
        pw, ph = max(page_size[0], 1), max(page_size[1], 1)
        n = min(len(words), max_len)
        tokens = np.full((max_len,), PAD_ID, np.int32)
        nboxes = np.zeros((max_len, 4), np.int32)
        for i in range(n):
            tokens[i] = self.token_id(words[i])
            x, y, w, h = boxes[i]
            nboxes[i] = [
                int(x / pw * (coord_buckets - 1)),
                int(y / ph * (coord_buckets - 1)),
                int(min((x + w) / pw, 1.0) * (coord_buckets - 1)),
                int(min((y + h) / ph, 1.0) * (coord_buckets - 1)),
            ]
        return tokens, np.clip(nboxes, 0, coord_buckets - 1), n


class RollingWordTokenizer:
    """Word→id map computable ON DEVICE from TrOCR char-token rows.

    ``HashWordTokenizer`` hashes the word STRING with md5 — fine when the
    host re-tokenizes OCR output, impossible inside an XLA program.  This
    tokenizer defines the id as a position-weighted sum of the word's
    recognizer char ids:

        h = Σ_t (char_id_t + 1) · 31^t   (mod 2^32)
        id = RESERVED + h mod (vocab_size - RESERVED)

    so the fused OCR program can hash its own decode output and feed the
    LayoutLM heads without a host round trip (BASELINE configs 3-4:
    "classification and NER heads run in the same compiled program").
    The host side (training / eval) encodes the word with the SAME
    recognizer charset and computes the identical uint32 arithmetic —
    bit-equal ids on both sides.
    """

    def __init__(self, vocab_size: int = 8192, char_tokenizer=None):
        from marie_tpu.models.tokenizer import CharTokenizer

        self.vocab_size = vocab_size
        self.char_tokenizer = char_tokenizer or CharTokenizer()

    def token_id(self, word: str) -> int:
        ids = self.char_tokenizer.encode(word, add_eos=False)
        h, p = 0, 1  # uint32 wraparound via explicit masking
        for i in ids:
            h = (h + (i + 1) * p) & 0xFFFFFFFF
            p = (p * 31) & 0xFFFFFFFF
        return _RESERVED + h % (self.vocab_size - _RESERVED)

    def encode_page(
        self,
        words: Sequence[str],
        boxes: Sequence[Sequence[float]],
        page_size: Tuple[int, int],
        max_len: int,
        coord_buckets: int = 1024,
    ):
        """Same contract as HashWordTokenizer.encode_page (xywh pixels ->
        tokens + xyxy bucket boxes + seq_len)."""
        pw, ph = max(page_size[0], 1), max(page_size[1], 1)
        n = min(len(words), max_len)
        tokens = np.full((max_len,), PAD_ID, np.int32)
        nboxes = np.zeros((max_len, 4), np.int32)
        for i in range(n):
            tokens[i] = self.token_id(words[i])
            x, y, w, h = boxes[i]
            nboxes[i] = [
                int(x / pw * (coord_buckets - 1)),
                int(y / ph * (coord_buckets - 1)),
                int(min((x + w) / pw, 1.0) * (coord_buckets - 1)),
                int(min((y + h) / ph, 1.0) * (coord_buckets - 1)),
            ]
        return tokens, np.clip(nboxes, 0, coord_buckets - 1), n
